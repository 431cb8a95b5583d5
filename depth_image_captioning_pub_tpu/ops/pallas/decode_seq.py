"""Whole-sequence greedy decode as ONE Pallas TPU kernel.

The per-step fused kernel (decode_step.py) showed XLA's own fusion already
wins within a step; the remaining overhead is *between* steps — the 30-step
``lax.scan`` launches ~10 kernels per step. This kernel runs the entire
30-step greedy loop on-chip in one launch: weights (including the vocab
head and the embedding table) stay resident in VMEM for all steps, the
recurrent h/c never round-trips through HBM, and the only outputs are the
token matrix.

Implementation notes:
* grid over batch blocks sized to VMEM (v5e has 128MiB; we raise the scoped
  limit past the 16MiB default);
* the embedding lookup is a one-hot [blk,V] x [V,E] matmul — free on the
  MXU and it avoids per-row dynamic gathers;
* the time loop is ``jax.lax.fori_loop`` carrying (h, c, emb, tokens,
  done) as values; tokens accumulate through a full-width time mask
  (Mosaic cannot store 1-wide dynamic columns into the tiled int32
  output) and are written once after the loop.

Greedy only, soft attention only (the eval hot path); alphas are not
produced (the visualization path keeps the XLA scan). Correctness is
bit-checked against the XLA scan in interpreter mode; TPU timing recorded
in the module users' docstrings/bench notes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from depth_image_captioning_pub_tpu.ops.pallas.decode_step import (
    DecodeStepWeights)

_VMEM_BUDGET = 96 * 1024 * 1024
_VMEM_LIMIT = 110 * 1024 * 1024

def shard_over_batch(fn, mesh, batch_args, w):
    """Run ``fn(*batch_args, w)`` data-parallel over ``mesh``'s first axis.

    ``batch_args`` are batch-leading arrays (sharded on dim 0); ``w`` is a
    weights pytree (replicated). The global batch is first padded to a
    device-divisible size (repeating row 0 — decode of a padded row is
    discarded), and each shard then pads itself to the kernels' 8-row
    Mosaic granule before the pallas_call and slices the pad back off, so
    callers need no divisibility guarantees beyond batch >= 1.

    CONTRACT: every output leaf of ``fn`` must be batch-leading (dim 0 ==
    the padded local batch) — the out_specs P(axis) and the ``[:local]`` /
    ``[:bsz]`` pad-slicing apply to dim 0 of EVERY leaf. A non-batch-
    leading leaf (e.g. a per-step [T, B] record) would be sliced along the
    wrong axis; this is checked at trace time and raised loudly. Current
    callers (greedy tokens, BeamSeqOutputs, NIC tokens) all satisfy it.
    """
    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    bsz = batch_args[0].shape[0]
    gpad = (-bsz) % n

    def pad0(x, p):
        if not p:
            return x
        return jnp.concatenate([x, jnp.repeat(x[:1], p, axis=0)], axis=0)

    padded = [pad0(x, gpad) for x in batch_args]

    def body(*args):
        *bargs, wtree = args
        local = bargs[0].shape[0]
        lpad = (-local) % 8
        out = fn(*[pad0(x, lpad) for x in bargs], wtree)

        def take_batch(y):
            # trace-time contract check (shapes are static under shard_map)
            if y.ndim == 0 or y.shape[0] != local + lpad:
                raise ValueError(
                    "shard_over_batch: fn outputs must be batch-leading "
                    f"(leaf shape {y.shape}, local padded batch "
                    f"{local + lpad})")
            return y[:local]

        return jax.tree_util.tree_map(take_batch, out)

    from jax.sharding import PartitionSpec as P
    specs = tuple(P(axis) for _ in batch_args) + (P(),)
    out = jax.shard_map(body, mesh=mesh, in_specs=specs,
                        out_specs=P(axis), check_vma=False)(*padded, w)
    return jax.tree_util.tree_map(lambda y: y[:bsz], out)


class DecodeSeqWeights(NamedTuple):
    step: DecodeStepWeights
    w_out: jax.Array   # [H, V]
    b_out: jax.Array   # [1, V]
    embed: jax.Array   # [V, E]


def _pick_block(bsz: int, k: int, d: int, a: int, itemsize: int,
                weight_bytes: int) -> int:
    for blk in (64, 32, 16, 8):
        if bsz % blk:
            continue
        per_batch = blk * (k * d + k * a) * itemsize
        if 2 * per_batch + weight_bytes <= _VMEM_BUDGET:
            return blk
    return 8


def _make_kernel(max_length: int, start_id: int, end_id: int):
    """end_id >= 0 gives finished captions <end>-padding semantics (rows
    that emitted <end> keep emitting it) AND a true in-kernel early exit:
    the time loop is a lax.while_loop that stops once every row in the
    block has emitted <end>. Round 1's attempt failed on i1 VECTOR loop
    carries; carrying ``done`` as int32 and reducing to a scalar bool in
    the condition legalizes under Mosaic. end_id < 0 keeps the fixed
    fori_loop (reference semantics without <end> handling)."""

    def kernel(feat_ref, proj_ref, h0_ref, c0_ref,
               w_dec_ref, b_dec_ref, w_full_ref, b_full_ref,
               w_fb_ref, b_fb_ref, w_ih_e_ref, w_ih_c_ref, w_hh_ref,
               b_lstm_ref, w_out_ref, b_out_ref, embed_ref,
               tok_out_ref):
        blk = h0_ref.shape[0]
        vocab = w_out_ref.shape[1]
        feats = feat_ref[:]
        proj = proj_ref[:]

        def step(t, carry):
            h, c, emb, (acc, done) = carry
            dec = jnp.dot(h, w_dec_ref[:],
                          preferred_element_type=jnp.float32) + b_dec_ref[:]
            act = jnp.maximum(proj + dec[:, None, :].astype(proj.dtype), 0.0)
            b_, k_, a_ = act.shape
            e = jnp.dot(act.reshape(b_ * k_, a_), w_full_ref[:],
                        preferred_element_type=jnp.float32)
            e = e.reshape(b_, k_) + b_full_ref[0, 0]
            alpha = jax.nn.softmax(e, axis=-1)
            ctx = jax.lax.dot_general(
                alpha.astype(feats.dtype)[:, None, :], feats,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :]
            gate = jax.nn.sigmoid(
                jnp.dot(h, w_fb_ref[:], preferred_element_type=jnp.float32)
                + b_fb_ref[:])
            gated = (gate * ctx).astype(w_ih_c_ref.dtype)
            gates = (jnp.dot(emb, w_ih_e_ref[:],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(gated, w_ih_c_ref[:],
                               preferred_element_type=jnp.float32)
                     + jnp.dot(h, w_hh_ref[:],
                               preferred_element_type=jnp.float32)
                     + b_lstm_ref[:])
            i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f_g) * c.astype(jnp.float32) \
                + jax.nn.sigmoid(i_g) * jnp.tanh(g_g)
            h_new = jax.nn.sigmoid(o_g) * jnp.tanh(c_new)
            logits = jnp.dot(h_new.astype(w_out_ref.dtype), w_out_ref[:],
                             preferred_element_type=jnp.float32) \
                + b_out_ref[:]
            token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if end_id >= 0:
                # done carried as int32: Mosaic cannot legalize i1 vector
                # loop carries (scf.for/while with vpad i1 layouts)
                token = jnp.where(done > 0, end_id, token)
                done = jnp.maximum(done, (token == end_id).astype(jnp.int32))
            # Mosaic can't store a 1-wide dynamic column into the tiled
            # int32 output; accumulate with a full-width time mask instead
            # and write the whole block once after the loop.
            tmask = (jax.lax.broadcasted_iota(
                jnp.int32, acc.shape, 1) == t).astype(jnp.int32)
            acc = acc + token[:, None] * tmask
            # embedding lookup as one-hot matmul (no dynamic gathers)
            onehot = (token[:, None]
                      == jax.lax.broadcasted_iota(jnp.int32, (blk, vocab), 1)
                      ).astype(embed_ref.dtype)
            emb_next = jnp.dot(onehot, embed_ref[:],
                               preferred_element_type=jnp.float32)
            return (h_new.astype(h.dtype), c_new.astype(c.dtype),
                    emb_next.astype(emb.dtype), (acc, done))

        start_tok = jnp.full((blk,), start_id, jnp.int32)
        onehot0 = (start_tok[:, None]
                   == jax.lax.broadcasted_iota(
                       jnp.int32, (blk, vocab), 1)).astype(embed_ref.dtype)
        emb0 = jnp.dot(onehot0, embed_ref[:],
                       preferred_element_type=jnp.float32).astype(
                           h0_ref.dtype)
        acc0 = jnp.zeros((blk, max_length), jnp.int32)
        done0 = jnp.zeros((blk,), jnp.int32)
        if end_id >= 0:
            # True in-kernel early exit: while_loop with an all-int32
            # carry and a SCALAR condition. (Round 1's attempt failed on
            # i1 *vector* loop carries; keeping ``done`` int32 and
            # reducing to a scalar bool in the condition legalizes.)
            def cond(carry):
                t, _, _, _, _, done = carry
                return jnp.logical_and(t < max_length,
                                       jnp.sum(done) < blk)

            def body(carry):
                t, h, c, emb, acc, done = carry
                h, c, emb, (acc, done) = step(
                    t, (h, c, emb, (acc, done)))
                return (t + 1, h, c, emb, acc, done)

            carry0 = (jnp.int32(0), h0_ref[:], c0_ref[:], emb0, acc0,
                      done0)
            t_fin, _, _, _, acc, _ = jax.lax.while_loop(cond, body, carry0)
            # Early exit leaves slots t >= t_fin unwritten; the loop only
            # exits early when EVERY row is done, so those slots are all
            # <end> (matching the XLA early-exit path's output). When
            # t_fin == max_length no column qualifies.
            col = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
            acc = jnp.where(col >= t_fin, end_id, acc)
            tok_out_ref[:] = acc
        else:
            carry0 = (h0_ref[:], c0_ref[:], emb0, (acc0, done0))
            _, _, _, (acc, _) = jax.lax.fori_loop(0, max_length, step,
                                                  carry0)
            tok_out_ref[:] = acc

    return kernel


def fused_greedy_decode(features: jax.Array, features_proj: jax.Array,
                        h0: jax.Array, c0: jax.Array, w: DecodeSeqWeights,
                        *, max_length: int = 30, start_id: int = 0,
                        end_id: int = -1,
                        interpret: bool = False, mesh=None) -> jax.Array:
    """Whole-sequence greedy decode; returns tokens [B, max_length] int32.

    B must be a multiple of 8 (pad first, as greedy_sample does).
    ``end_id >= 0`` <end>-pads finished rows (same output as the XLA
    early-exit path; the kernel loop itself remains fixed-length).

    ``mesh`` (a 1-axis ``jax.sharding.Mesh``, multi-chip eval): pallas_call
    does not partition under GSPMD, so each device instead decodes its
    batch shard in its own kernel launch via shard_map — same tokens, no
    collectives (per-image decode is independent). Threaded down from
    ``make_caption_fn(pallas_mesh=...)``.
    """
    impl = functools.partial(_fused_greedy_decode, max_length=max_length,
                             start_id=start_id, end_id=end_id,
                             interpret=interpret)
    if mesh is not None and mesh.size > 1:
        return shard_over_batch(impl, mesh,
                                [features, features_proj, h0, c0], w)
    return impl(features, features_proj, h0, c0, w)


@functools.partial(jax.jit,
                   static_argnames=("max_length", "start_id", "end_id",
                                    "interpret"))
def _fused_greedy_decode(features: jax.Array, features_proj: jax.Array,
                         h0: jax.Array, c0: jax.Array, w: DecodeSeqWeights,
                         *, max_length: int = 30, start_id: int = 0,
                         end_id: int = -1,
                         interpret: bool = False) -> jax.Array:
    bsz, k, d = features.shape
    assert bsz % 8 == 0, f"batch {bsz} must be a multiple of 8"
    a = features_proj.shape[-1]
    hdim = h0.shape[-1]
    itemsize = jnp.dtype(features.dtype).itemsize
    flat_w = list(w.step) + [w.w_out, w.b_out, w.embed]
    weight_bytes = sum(int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize
                       for x in flat_w)
    blk = _pick_block(bsz, k, d, a, itemsize, weight_bytes)
    grid = (bsz // blk,)

    def batch_spec(*shape):
        return pl.BlockSpec((blk,) + shape,
                            lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def weight_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    in_specs = [batch_spec(k, d), batch_spec(k, a), batch_spec(hdim),
                batch_spec(hdim)] + [weight_spec(x) for x in flat_w]
    tokens = pl.pallas_call(
        _make_kernel(max_length, start_id, end_id),
        grid=grid,
        in_specs=in_specs,
        out_specs=batch_spec(max_length),
        out_shape=jax.ShapeDtypeStruct((bsz, max_length), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(features, features_proj, h0, c0, *flat_w)
    return tokens
