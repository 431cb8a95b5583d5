"""NIC (Show and Tell) decoder.

Re-design of ``NIC_RNNDecoder`` (reference: nic.py:61-175): word embedding,
2-layer LSTM with the image embedding prepended as step 0, vocab head.
The packed-sequence forward (nic.py:104-118) becomes one ``lax.scan`` over
the fixed [B, L+1] rectangle with loss-side masking; greedy ``sample`` /
``batch_sample`` (nic.py:126-175) become a single scan with the argmax fed
back (note: the LSTM is primed by the image embedding, so step 0 usually
predicts <start> — the reference's eval detokenizer skips <start> tokens,
nic.py:438-439, and ours does the same).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from depth_image_captioning_pub_tpu.models.initializers import (
    torch_bias, torch_linear_kernel)
from depth_image_captioning_pub_tpu.ops.lstm import (
    LSTMCellParams, StackedLSTMParams, stacked_lstm, stacked_lstm_step)

Dtype = Any


class NICDecoder(nn.Module):
    vocab_size: int
    dim_embedding: int = 300
    dim_hidden: int = 128
    num_layers: int = 2
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        p, b = torch_linear_kernel, torch_bias
        # torch nn.Embedding default init is N(0,1); the reference does NOT
        # re-init NIC's embedding (no _reset_parameters in NIC_RNNDecoder).
        self.embed = self.param("embed", nn.initializers.normal(1.0),
                                (self.vocab_size, self.dim_embedding))
        layers = []
        for li in range(self.num_layers):
            d_in = self.dim_embedding if li == 0 else self.dim_hidden
            layers.append(LSTMCellParams(
                self.param(f"lstm{li}_w_ih", p, (d_in, 4 * self.dim_hidden)),
                self.param(f"lstm{li}_w_hh", p, (self.dim_hidden, 4 * self.dim_hidden)),
                # torch nn.LSTM biases use bound 1/sqrt(hidden)
                self.param(f"lstm{li}_b_ih", b(self.dim_hidden), (4 * self.dim_hidden,)),
                self.param(f"lstm{li}_b_hh", b(self.dim_hidden), (4 * self.dim_hidden,)),
            ))
        self.lstm = StackedLSTMParams(tuple(layers))
        self.out_w = self.param("out_w", p, (self.dim_hidden, self.vocab_size))
        self.out_b = self.param("out_b", b(self.dim_hidden), (self.vocab_size,))

    def _zero_state(self, bsz: int) -> Tuple[jax.Array, jax.Array]:
        shape = (self.num_layers, bsz, self.dim_hidden)
        z = jnp.zeros(shape, dtype=self.dtype)
        return z, z

    def __call__(self, features: jax.Array, captions: jax.Array, *,
                 train: bool = False,
                 rng: Optional[jax.Array] = None) -> jax.Array:
        """Teacher forcing: returns logits [B, L, vocab].

        Step 0 consumes the image embedding and predicts captions[:, 0]
        (= <start>); step t>0 consumes captions[:, t-1] and predicts
        captions[:, t] — the reference's packed loss over the image step
        included (nic.py:102-118, :282-285).
        """
        emb = jnp.take(self.embed, captions[:, :-1], axis=0)
        xs = jnp.concatenate([features[:, None, :].astype(emb.dtype), emb],
                             axis=1)                       # [B, L, E]
        h0, c0 = self._zero_state(xs.shape[0])
        outs, _, _ = stacked_lstm(self.lstm, xs.astype(self.dtype), h0, c0)
        if train and self.dropout > 0.0:
            if rng is None:
                raise ValueError("rng required for dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, outs.shape)
            outs = jnp.where(keep, outs / (1.0 - self.dropout), 0.0)
        return outs @ self.out_w + self.out_b

    def greedy_sample(self, features: jax.Array, *,
                      max_length: int = 30,
                      use_pallas: bool = False,
                      pallas_mesh=None) -> jax.Array:
        """Batched greedy decode, one lax.scan (reference: nic.py:150-175).

        ``use_pallas`` runs the whole sequence in ONE kernel launch with
        the embedding table, stacked-LSTM weights, and vocab head
        VMEM-resident (ops/pallas/nic_seq.py — the NIC twin of the
        attention decoder's whole-sequence kernel; greedy only, beam
        stays on the XLA search). ``pallas_mesh`` shards the kernel
        batch-wise over a multi-chip mesh, same dispatch as the
        attention kernels.
        """
        if use_pallas:
            return self._greedy_sample_pallas(features,
                                              max_length=max_length,
                                              mesh=pallas_mesh)
        bsz = features.shape[0]
        h, c = self._zero_state(bsz)
        x0 = features.astype(self.dtype)

        def step(carry, _):
            x, h, c = carry
            out, h, c = stacked_lstm_step(self.lstm, x, h, c)
            logits = out @ self.out_w + self.out_b
            token = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
            nxt = jnp.take(self.embed, token, axis=0).astype(self.dtype)
            return (nxt, h, c), token

        _, tokens = jax.lax.scan(step, (x0, h, c), None, length=max_length)
        return jnp.swapaxes(tokens, 0, 1)

    def _greedy_sample_pallas(self, features: jax.Array, *,
                              max_length: int, mesh=None) -> jax.Array:
        """Whole-sequence kernel path (ops/pallas/nic_seq.py); tokens
        match the XLA scan (bit-identical in CPU interpret mode, pinned
        by tests/test_nic_pallas.py)."""
        from depth_image_captioning_pub_tpu.ops.pallas.nic_seq import (
            fused_nic_greedy_decode, pack_nic_weights)
        if self.dtype != jnp.float32:
            raise ValueError("pallas NIC decode requires a float32 decoder "
                             f"(got dtype={self.dtype})")
        interpret = jax.default_backend() == "cpu"
        w = pack_nic_weights(self.lstm, self.out_w, self.out_b, self.embed)
        x0 = features.astype(self.dtype)
        bsz = x0.shape[0]
        pad = (-bsz) % 8   # Mosaic needs batch blocks divisible by 8
        if pad:
            x0 = jnp.concatenate([x0, jnp.repeat(x0[:1], pad, axis=0)], 0)
        tokens = fused_nic_greedy_decode(x0, w, max_length=max_length,
                                         interpret=interpret, mesh=mesh)
        return tokens[:bsz]

    def stochastic_sample(self, features: jax.Array, rng: jax.Array, *,
                          max_length: int = 30, temperature: float = 1.0,
                          top_k: int = 0, top_p: float = 1.0) -> jax.Array:
        """The greedy scan with ``jax.random.categorical`` over filtered
        logits (ops/decode.filtered_logits) instead of argmax — the NIC
        twin of AttentionDecoder.stochastic_sample (new; the reference is
        greedy-only, nic.py:150-175). Deterministic per ``rng``;
        temperature -> 0 or top_k=1 reproduces greedy argmax."""
        from depth_image_captioning_pub_tpu.ops.decode import filtered_logits
        bsz = features.shape[0]
        h, c = self._zero_state(bsz)
        x0 = features.astype(self.dtype)

        def step(carry, t):
            x, h, c = carry
            out, h, c = stacked_lstm_step(self.lstm, x, h, c)
            logits = (out @ self.out_w + self.out_b).astype(jnp.float32)
            filt = filtered_logits(logits, temperature=temperature,
                                   top_k=top_k, top_p=top_p)
            token = jax.random.categorical(
                jax.random.fold_in(rng, t), filt).astype(jnp.int32)
            nxt = jnp.take(self.embed, token, axis=0).astype(self.dtype)
            return (nxt, h, c), token

        _, tokens = jax.lax.scan(step, (x0, h, c), jnp.arange(max_length))
        return jnp.swapaxes(tokens, 0, 1)

    def beam_sample(self, features: jax.Array, end_id: int, *,
                    beam_size: int = 5, max_length: int = 30,
                    length_penalty: float = 0.0, early_exit: bool = False):
        """Batched beam search (new capability; reference is greedy-only).

        The LSTM is primed by the image embedding at step 0 (nic.py:150-175),
        so the first step ignores the fed-back token.
        """
        from depth_image_captioning_pub_tpu.ops.decode import (
            beam_search, tile_for_beams)
        batch = features.shape[0]
        h0, c0 = self._zero_state(batch * beam_size)
        feat_tiled = tile_for_beams(features.astype(self.dtype), beam_size)
        # beam_search gathers state along dim 0, so carry [B*W, layers, H]
        h0, c0 = jnp.swapaxes(h0, 0, 1), jnp.swapaxes(c0, 0, 1)

        def step_fn(state, prev, t):
            h = jnp.swapaxes(state["h"], 0, 1)
            c = jnp.swapaxes(state["c"], 0, 1)
            emb = jnp.take(self.embed, prev, axis=0).astype(self.dtype)
            x = jnp.where(t == 0, feat_tiled, emb)
            out, h, c = stacked_lstm_step(self.lstm, x, h, c)
            logits = out @ self.out_w + self.out_b
            return ({"h": jnp.swapaxes(h, 0, 1), "c": jnp.swapaxes(c, 0, 1)},
                    jax.nn.log_softmax(logits.astype(jnp.float32), -1))

        return beam_search(step_fn, {"h": h0, "c": c0}, batch,
                           start_id=0, end_id=end_id, beam_size=beam_size,
                           max_length=max_length,
                           length_penalty=length_penalty,
                           early_exit=early_exit)
