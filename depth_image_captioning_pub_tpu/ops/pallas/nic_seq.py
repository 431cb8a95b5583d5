"""Whole-sequence NIC greedy decode as ONE Pallas TPU kernel.

The NIC family (Show and Tell; reference nic.py:150-175) decodes with a
2-layer LSTM primed by the image embedding — no attention, so its 30-step
XLA scan is even more launch-overhead-bound than the attention decoder's.
This is the NIC twin of decode_seq.fused_greedy_decode: the entire greedy
loop runs in one launch with the embedding table, the stacked-LSTM
weights, and the vocab head resident in VMEM; the recurrent h/c per layer
never round-trips through HBM.

Same Mosaic idioms as decode_seq (see its notes): one-hot matmul for the
embedding lookup, token accumulation through a full-width time mask,
float32 matmul accumulators. The time loop is a fixed-length fori_loop —
NICDecoder.greedy_sample's XLA scan has no end_id early exit, and the
kernel matches it output-for-output (bit-identical in interpret mode,
pinned by tests/test_nic_pallas.py).

Layer math mirrors ops/lstm.stacked_lstm_step exactly: per layer
``gates = x @ w_ih + h @ w_hh + (b_ih + b_hh)`` split (i, f, g, o),
``c' = sig(f) c + sig(i) tanh(g)``, ``h' = sig(o) tanh(c')``, the last
layer's h' feeds the vocab head. Biases are pre-summed on the host side
(pack_nic_weights) — one VMEM vector instead of two.

Multi-chip: ``mesh`` routes through decode_seq.shard_over_batch (one
kernel launch per device on its batch shard), identical to the attention
kernels.

Validation status: CPU interpret-mode bit-equality is pinned
(tests/test_nic_pallas.py); validated on REAL Mosaic in round 4
(tools/chip_check_nic_pallas.py, run on chip 2026-08-20): compiled + ran,
100.0000% token agreement with the XLA scan at batch 256 (near-tie argmax
flips remain POSSIBLE on other weight draws — the documented
--pallas-decode caveat), shard_map dispatch exactly equal to the direct
kernel call, timing ~1.0-1.27x the XLA scan.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from depth_image_captioning_pub_tpu.ops.pallas.decode_seq import (
    _VMEM_BUDGET, _VMEM_LIMIT, shard_over_batch)


class NICSeqWeights(NamedTuple):
    """Flat weight bundle; ``layer_mats`` is (w_ih_0, w_hh_0, b_0, w_ih_1,
    w_hh_1, b_1, ...) with b = b_ih + b_hh reshaped to [1, 4H]."""
    layer_mats: Tuple[jax.Array, ...]
    w_out: jax.Array   # [H, V]
    b_out: jax.Array   # [1, V]
    embed: jax.Array   # [V, E]


def pack_nic_weights(lstm, out_w, out_b, embed) -> NICSeqWeights:
    """Bundle NICDecoder params (an ops/lstm.StackedLSTMParams plus the
    vocab head and embedding table) for the kernel."""
    mats = []
    for cell in lstm.layers:
        mats.extend([cell.w_ih, cell.w_hh,
                     (cell.b_ih + cell.b_hh)[None, :]])
    return NICSeqWeights(tuple(mats), out_w, out_b[None, :], embed)


def _pick_block(bsz: int, weight_bytes: int, per_batch_bytes: int) -> int:
    for blk in (64, 32, 16, 8):
        if bsz % blk:
            continue
        if blk * per_batch_bytes + weight_bytes <= _VMEM_BUDGET:
            return blk
    return 8


def _make_kernel(max_length: int, num_layers: int):
    def kernel(*refs):
        x0_ref = refs[0]
        h_refs = refs[1:1 + num_layers]
        c_refs = refs[1 + num_layers:1 + 2 * num_layers]
        mats = refs[1 + 2 * num_layers:1 + 5 * num_layers]
        w_out_ref, b_out_ref, embed_ref = refs[-4:-1]
        tok_out_ref = refs[-1]
        blk = x0_ref.shape[0]
        vocab = w_out_ref.shape[1]

        def step(t, carry):
            x, hs, cs, acc = carry
            hs_new, cs_new = [], []
            for li in range(num_layers):
                w_ih, w_hh, b = mats[3 * li:3 * li + 3]
                gates = (jnp.dot(x, w_ih[:],
                                 preferred_element_type=jnp.float32)
                         + jnp.dot(hs[li], w_hh[:],
                                   preferred_element_type=jnp.float32)
                         + b[:])
                i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
                c_new = jax.nn.sigmoid(f_g) * cs[li].astype(jnp.float32) \
                    + jax.nn.sigmoid(i_g) * jnp.tanh(g_g)
                h_new = jax.nn.sigmoid(o_g) * jnp.tanh(c_new)
                hs_new.append(h_new.astype(hs[li].dtype))
                cs_new.append(c_new.astype(cs[li].dtype))
                x = hs_new[li]
            logits = jnp.dot(x, w_out_ref[:],
                             preferred_element_type=jnp.float32) \
                + b_out_ref[:]
            token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            tmask = (jax.lax.broadcasted_iota(
                jnp.int32, acc.shape, 1) == t).astype(jnp.int32)
            acc = acc + token[:, None] * tmask
            onehot = (token[:, None]
                      == jax.lax.broadcasted_iota(jnp.int32, (blk, vocab), 1)
                      ).astype(embed_ref.dtype)
            emb_next = jnp.dot(onehot, embed_ref[:],
                               preferred_element_type=jnp.float32)
            return (emb_next.astype(x0_ref.dtype), tuple(hs_new),
                    tuple(cs_new), acc)

        carry0 = (x0_ref[:], tuple(r[:] for r in h_refs),
                  tuple(r[:] for r in c_refs),
                  jnp.zeros((blk, max_length), jnp.int32))
        _, _, _, acc = jax.lax.fori_loop(0, max_length, step, carry0)
        tok_out_ref[:] = acc

    return kernel


def fused_nic_greedy_decode(features: jax.Array, w: NICSeqWeights, *,
                            max_length: int = 30,
                            interpret: bool = False,
                            mesh=None) -> jax.Array:
    """Whole-sequence NIC greedy decode; returns tokens [B, max_length]
    int32. ``features`` is the projected image embedding [B, E] that
    primes the LSTM at step 0 (NICDecoder.greedy_sample). B must be a
    multiple of 8 (pad first, as the decoder wrapper does). ``mesh``
    data-parallelizes over its first axis via shard_map."""
    impl = functools.partial(_fused_nic_greedy_decode,
                             max_length=max_length, interpret=interpret)
    if mesh is not None and mesh.size > 1:
        return shard_over_batch(impl, mesh, [features], w)
    return impl(features, w)


@functools.partial(jax.jit, static_argnames=("max_length", "interpret"))
def _fused_nic_greedy_decode(features: jax.Array, w: NICSeqWeights, *,
                             max_length: int = 30,
                             interpret: bool = False) -> jax.Array:
    bsz, e = features.shape
    assert bsz % 8 == 0, f"batch {bsz} must be a multiple of 8"
    num_layers = len(w.layer_mats) // 3
    hdim = w.w_out.shape[0]
    flat_w = list(w.layer_mats) + [w.w_out, w.b_out, w.embed]
    weight_bytes = sum(int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize
                       for x in flat_w)
    itemsize = jnp.dtype(features.dtype).itemsize
    # per-row residency: x + per-layer h/c + the [1, max_length] token row
    per_batch = itemsize * (e + 2 * num_layers * hdim) + 4 * max_length
    blk = _pick_block(bsz, weight_bytes, per_batch)
    grid = (bsz // blk,)

    def batch_spec(*shape):
        return pl.BlockSpec((blk,) + shape,
                            lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def weight_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    zeros = jnp.zeros((bsz, hdim), features.dtype)
    state_args = [features] + [zeros] * (2 * num_layers)
    in_specs = [batch_spec(e)] + [batch_spec(hdim)] * (2 * num_layers) \
        + [weight_spec(x) for x in flat_w]
    tokens = pl.pallas_call(
        _make_kernel(max_length, num_layers),
        grid=grid,
        in_specs=in_specs,
        out_specs=batch_spec(max_length),
        out_shape=jax.ShapeDtypeStruct((bsz, max_length), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*state_args, *flat_w)
    return tokens
