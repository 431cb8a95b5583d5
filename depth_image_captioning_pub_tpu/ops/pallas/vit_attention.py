"""Fused ViT attention (scores + softmax + weighted values) as one Pallas
TPU kernel, specialized for the DPT-hybrid's shape regime.

Motivation (measured, v5e, batch 64, 12 blocks, tokens padded 577->640):
the unfused XLA path materializes the [B, heads, N, N] score tensor in HBM
between the two attention matmuls and the softmax — ~45 ms of the 222 ms
depth-soft pipeline. At N=640, d=64 a whole (N, N) f32 score tile is only
1.6 MB, so no online/flash streaming softmax is needed: one kernel program
per (batch x head) keeps q/k/v and the scores resident in VMEM, runs an
exact row softmax in f32, and writes only the [N, d] output.

Numerics: scores accumulate in f32 and the softmax runs in f32 (the XLA
bf16 fast path softmaxes in bf16 — this kernel is *closer* to the f32
reference); weights are cast to the value dtype for the PV matmul exactly
like the XLA path. Padded keys (>= n_valid) get -inf scores -> exactly
zero weight, mirroring ViTBlock's masking.

The kernel is generic over (Z, N, d) but asserts the per-program VMEM
footprint stays small; callers keep the XLA path for shapes outside that
envelope (interpret=True makes it runnable in CPU tests).

Reference for the op being fused: Depth_caption_model/modules/midas/
vit.py:61-155 (timm ViT attention inside the hybrid backbone).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-program VMEM budget check: q/k/v/o tiles + f32 scores + bf16 probs.
_VMEM_SOFT_LIMIT = 32 * 1024 * 1024


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    q = q_ref[0]                                    # [N, d]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale                                   # [N, N] f32, VMEM-resident
    if n_valid < s.shape[1]:
        key_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_idx >= n_valid, -jnp.inf, s)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    # Mosaic requires 32-bit matmul accumulators; cast down on store.
    o = jax.lax.dot_general(p.astype(v.dtype), v,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(v.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "n_valid", "interpret"))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    scale: float, n_valid: int,
                    interpret: bool = False) -> jax.Array:
    """softmax(q @ k^T * scale, keys < n_valid) @ v, fused.

    q/k/v: [Z, N, d] (Z = batch * heads, flattened). Returns [Z, N, d]
    in v's dtype. ``n_valid`` masks padded key positions (pass N for none).
    """
    Z, N, d = q.shape
    # Footprint follows the INPUT dtype (bf16 on the inference path, f32 in
    # parity/CPU tests — the latter doubles the q/k/v/o and probs tiles):
    # f32 score tile + probs cast to v.dtype + q/k/v/o tiles.
    itemsize = jnp.dtype(q.dtype).itemsize
    per_program = 4 * N * N + itemsize * N * N + 4 * itemsize * N * d
    assert per_program < _VMEM_SOFT_LIMIT, (
        f"attention tile too large for whole-row kernel: {per_program}")
    spec = pl.BlockSpec((1, N, d), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_valid=n_valid),
        grid=(Z,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Z, N, d), v.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_SOFT_LIMIT * 2),
        interpret=interpret,
    )(q, k, v)
