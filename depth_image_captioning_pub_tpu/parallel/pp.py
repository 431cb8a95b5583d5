"""Pipeline parallelism over a ``stage`` mesh axis (GPipe schedule).

The reference is strictly single-device (SURVEY.md §2.3; reference
config.py:68) and every model here fits one chip, so — like tensor
parallelism in parallel/tp.py — pipelining is a first-class *option* for
scale-out, not a parity requirement. The idiomatic TPU construction is not
a runtime scheduler with send/recv threads (the GPU habit) but a single
jitted program: ``shard_map`` over a named ``stage`` mesh axis, a
``lax.scan`` over the M + S - 1 schedule steps, and ``lax.ppermute`` to
shift activations to the next stage over ICI each step. XLA overlaps the
permute with the next step's compute; the bubble is the usual
(S - 1) / (M + S - 1) and shrinks with more microbatches.

The natural pipelined stack in this framework is the DPT ViT encoder: 12
identical pre-LN blocks (models/dpt.py, reference vit.py:61-155) whose
weights dominate the depth model. Because every block has identical
parameter shapes, the per-stage weights are a *stacked* pytree with the
leading (block) axis sharded over ``stage`` — each device holds only its
own blocks' weights, which is the point of PP: weight memory scales 1/S.

Everything is differentiable (``ppermute`` transposes to the reverse
permute under AD), so the same schedule serves training; grads of the
stacked weights land sharded over ``stage`` exactly like the weights.

Exactness: the schedule only reorders *which device* computes each block;
the math per microbatch is the sequential fold. Outputs match the
unpipelined fold to FP reduction order (partitioning changes XLA's fusion
choices): bitwise for simple blocks, ~1e-6 relative for the ViT block's
attention/LayerNorm chains — pinned in tests/test_pipeline_parallel.py,
forward and grad.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

STAGE_AXIS = "stage"


def make_stage_mesh(n_stages: int,
                    devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D pipeline mesh over the first ``n_stages`` devices."""
    devices = list(devices) if devices is not None else jax.devices()
    if len(devices) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_stages]), (STAGE_AXIS,))


def stack_block_params(blocks: Sequence):
    """Stack per-block param pytrees (identical shapes) on a new leading
    (block) axis — the axis that shards over ``stage``."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def pipeline_stage_outputs(block_apply: Callable,
                           stacked_params,
                           x: jax.Array,
                           mesh: Mesh,
                           n_microbatches: int,
                           axis: str = STAGE_AXIS,
                           batch_axis: Optional[str] = None) -> jax.Array:
    """Run ``n_blocks`` chained ``block_apply`` calls as an S-stage pipeline.

    Args:
      block_apply: ``(one_block_params, act) -> act`` with unchanged shape.
      stacked_params: pytree whose leaves lead with the block axis
        (``n_blocks`` divisible by the mesh's stage count S).
      x: ``[B, ...]`` activations, ``B`` divisible by ``n_microbatches``
        (and, with ``batch_axis``, each microbatch by that axis's size).
      mesh: mesh containing ``axis`` (and ``batch_axis`` if given).
      n_microbatches: GPipe microbatch count M (bubble = (S-1)/(M+S-1)).
      batch_axis: optional mesh axis to ALSO shard each microbatch over —
        dp x pp composition on one mesh: every data row runs the same
        pipeline on its batch shard; no collectives cross the axes (the
        ppermute stays within each data row).

    Returns:
      ``[S, B, ...]`` — the activation after each stage's last block for the
      whole batch, i.e. after global block ``(s + 1) * n_blocks / S - 1``.
      Row ``S - 1`` is the full stack's output; earlier rows give exact
      intermediate taps when they align to stage boundaries (the DPT hooks
      (8, 11) align for S in {4, 12}; reference vit.py:370-371).
    """
    n_blocks = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    n_stages = mesh.shape[axis]
    if n_blocks % n_stages:
        raise ValueError(f"{n_blocks} blocks not divisible by "
                         f"{n_stages} stages")
    batch = x.shape[0]
    if batch % n_microbatches:
        raise ValueError(f"batch {batch} not divisible by "
                         f"M={n_microbatches} microbatches")
    n_mb = n_microbatches
    mb = batch // n_mb
    if batch_axis is not None and mb % mesh.shape[batch_axis]:
        raise ValueError(
            f"microbatch {mb} not divisible by mesh axis "
            f"{batch_axis!r}={mesh.shape[batch_axis]}")
    xs = x.reshape(n_mb, mb, *x.shape[1:])

    param_specs = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    in_spec = P(None, batch_axis)          # [M, mb, ...]: shard mb over dp
    out_spec = P(axis, batch_axis)         # [S*M, mb, ...]

    @partial(shard_map, mesh=mesh,
             in_specs=(param_specs, in_spec), out_specs=out_spec,
             check_vma=False)
    def run(local_params, inputs):
        stage = jax.lax.axis_index(axis)
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def apply_stage(act):
            def body(a, p):
                return block_apply(p, a), None
            out, _ = jax.lax.scan(body, act, local_params)
            return out

        def step(carry, t):
            act, buf = carry
            # Stage s processes microbatch j = t - s at schedule step t.
            j = t - stage
            inp = jax.lax.dynamic_index_in_dim(
                inputs, jnp.clip(t, 0, n_mb - 1), keepdims=False)
            res = apply_stage(jnp.where(stage == 0, inp, act))
            valid = (j >= 0) & (j < n_mb)
            jc = jnp.clip(j, 0, n_mb - 1)
            old = jax.lax.dynamic_index_in_dim(buf, jc, keepdims=False)
            buf = jax.lax.dynamic_update_index_in_dim(
                buf, jnp.where(valid, res, old), jc, 0)
            act = jax.lax.ppermute(res, axis, fwd)
            return (act, buf), None

        carry0 = (jnp.zeros_like(inputs[0]),
                  jnp.zeros_like(inputs))
        (_, buf), _ = jax.lax.scan(
            step, carry0, jnp.arange(n_mb + n_stages - 1))
        return buf                     # [M, mb, ...]; global [S*M, mb, ...]

    out = run(stacked_params, xs)
    return out.reshape(n_stages, batch, *x.shape[1:])


def shard_stacked_params(mesh: Mesh, stacked_params, axis: str = STAGE_AXIS):
    """Place stacked block params with the block axis over ``stage`` — each
    device then holds only its own stage's weights (1/S weight memory)."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda p: jax.device_put(p, sh),
                                  stacked_params)


def vit_taps_pipelined(dpt_params, tokens: jax.Array, mesh: Mesh,
                       n_microbatches: int, *,
                       n_valid: Optional[int] = None,
                       dim: int = 768, heads: int = 12,
                       dtype=jnp.float32, n_blocks: int = 12,
                       hooks: Tuple[int, int] = (8, 11),
                       axis: str = STAGE_AXIS) -> Tuple[jax.Array, ...]:
    """The DPT ViT stack (models/dpt.py block loop; reference
    vit.py:360-371) as a pipeline: returns the hook taps (after global
    blocks ``hooks``), each ``[B, N, D]`` with pad rows still attached.

    ``dpt_params``: the DPT model's ``params`` dict (containing
    ``block0..block{n-1}``). Hooks must land on stage boundaries — for the
    standard (8, 11) that means 4 or 12 stages.
    """
    from depth_image_captioning_pub_tpu.models.dpt import ViTBlock

    n_stages = mesh.shape[axis]
    per_stage = n_blocks // n_stages
    if per_stage == 0:
        raise ValueError(f"{n_stages} stages exceed {n_blocks} blocks")
    for h in hooks:
        if (h + 1) % per_stage:
            raise ValueError(
                f"hook {h} not on a stage boundary with {n_stages} stages "
                f"({per_stage} blocks/stage); use 4 or 12 stages for the "
                f"standard DPT hooks (8, 11)")

    block = ViTBlock(dim=dim, heads=heads, dtype=dtype)

    def block_apply(p, a):
        return block.apply({"params": p}, a, n_valid=n_valid)

    stacked = stack_block_params(
        [dpt_params[f"block{i}"] for i in range(n_blocks)])
    stage_out = pipeline_stage_outputs(
        block_apply, stacked, tokens, mesh, n_microbatches, axis=axis)
    return tuple(stage_out[(h + 1) // per_stage - 1] for h in hooks)
