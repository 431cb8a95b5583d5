"""jit/pjit-compiled train and eval steps.

One step factory replaces the reference's five copy-pasted epoch loops
(reference: base_train.py:24-246 soft, :248-461 hard; depth_train.py:27-643;
nic.py:178-356) — their bodies differ only in which encoder feeds the decoder,
whether an alpha regularizer is added, and whether a Gumbel temperature is
threaded. Each factory closes over the static model configuration and returns
a pure function ``(state, batch, rng, temp) -> (state, metrics)`` that XLA
compiles once; under a mesh, batches arrive sharded over the data axis and
XLA inserts the gradient all-reduce.

Design choices vs the reference:
* the frozen RGB backbone runs inside the same jitted step (no host round
  trip between "encoder" and "decoder" phases, and its activations never
  leave HBM); gradients for it are never materialized because only
  ``state.params`` is differentiated;
* ImageNet normalization happens on-device (ops/image_ops.py);
* AdamW == torch.optim.AdamW defaults (lr cfg, betas 0.9/0.999, eps 1e-8,
  weight_decay 0.01; reference: base_train.py:115). The reference constructs
  a MultiStepLR but never steps it (base_train.py:118-119) — we default to
  the constant LR it actually used and expose the schedule as an option.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from depth_image_captioning_pub_tpu.engine.losses import caption_loss, nic_loss
from depth_image_captioning_pub_tpu.ops.image_ops import (
    imagenet_normalize, to_unit_float)


@struct.dataclass
class TrainState:
    """Carried across steps. ``params`` is the *trainable* subtree only;
    ``frozen`` holds the stop-gradient weights (backbone, DPT);
    ``batch_stats`` holds the depth-CNN BatchNorm running stats."""

    params: Any
    opt_state: Any
    frozen: Any
    batch_stats: Any
    step: jax.Array


def make_optimizer(lr: float, lr_drop=None, gamma: float = 0.1,
                   steps_per_epoch: int = 0,
                   weight_decay: float = 0.01) -> optax.GradientTransformation:
    """AdamW with torch defaults; optional MultiStepLR-style decay
    (the reference defines but never activates it — off unless asked)."""
    if lr_drop:
        boundaries = {int(e) * steps_per_epoch: gamma for e in lr_drop}
        schedule = optax.piecewise_constant_schedule(lr, boundaries)
        return optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=weight_decay)
    return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=weight_decay)


def make_attention_train_step(
        encoder_apply: Callable,
        decoder_apply: Callable,
        optimizer: optax.GradientTransformation,
        alpha_reg: float = 0.0,
        depth_encoder_apply: Optional[Callable] = None,
        donate: bool = True,
        accum_steps: int = 1,
        features_input: bool = False) -> Callable:
    """Train step for base-soft/base-hard/depth-soft/depth-hard.

    ``decoder_apply(params, features, captions, depth_features, train, temp,
    rng)`` must return (logits, alphas). ``depth_encoder_apply(params,
    batch_stats, depth_maps, train)`` returns (depth_features, new_stats).

    ``features_input=True``: the batch carries precomputed frozen features
    (``batch["features"]``, engine/feature_cache.py) instead of pixels —
    normalization and the frozen encoder forward are skipped; pass the
    matching ``encoder_apply(features_input=True)`` variant.

    ``accum_steps`` > 1 accumulates gradients over that many microbatches
    inside the same jitted step (a ``lax.scan``), so activation memory
    scales 1/accum at a fixed effective batch — the TPU-native way to train
    beyond HBM limits without touching the data pipeline. EXACT by
    construction: each microbatch loss is normalized by the FULL batch's
    token/example counts (losses.py ``denoms``), so summed microbatch
    gradients equal the one-shot gradient for any length mix — including
    tail-padded rows (an all-pad microbatch contributes exactly zero). The
    split is STRIDED (row k of microbatch j is batch row ``j*accum + k``)
    so under a contiguously-sharded data mesh every microbatch stays
    balanced across devices with no resharding, and trailing pad rows
    spread across microbatches. BN running stats advance sequentially per
    microbatch; dropout/Gumbel noise uses per-microbatch rng splits. Batch
    size must divide by ``accum_steps``.
    """

    def loss_fn(params, frozen, batch_stats, batch, rng, temp, denoms=None):
        if features_input:
            inp = batch["features"]
        else:
            inp = imagenet_normalize(to_unit_float(batch["images"]))
        features = encoder_apply(frozen["encoder"], inp)
        features = jax.lax.stop_gradient(features)
        new_stats = batch_stats
        depth_features = None
        if depth_encoder_apply is not None:
            depth_features, new_stats = depth_encoder_apply(
                params["depth_encoder"], batch_stats, batch["depth"],
                train=True)
        logits, alphas = decoder_apply(
            params["decoder"], features, batch["captions"],
            depth_features, train=True, temp=temp, rng=rng)
        loss, metrics = caption_loss(
            logits, batch["captions"], batch["lengths"], alphas,
            batch.get("pad_mask"), alpha_reg, denoms=denoms)
        return loss, (metrics, new_stats)

    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array,
             temp: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        if accum_steps == 1:
            grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.frozen, state.batch_stats, batch, rng,
                temp)
        else:
            targets_len = batch["captions"].shape[1] - 1
            denoms = _global_denoms(batch, targets_len)
            grads, metrics, new_stats = _accum_grads(
                lambda p, s, mb, r: jax.grad(loss_fn, has_aux=True)(
                    p, state.frozen, s, mb, r, temp, denoms),
                state.params, state.batch_stats, batch, rng, accum_steps)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.frozen, new_stats,
                          state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _global_denoms(batch, targets_len: int):
    """(token_total, example_total) of the FULL batch, for exact-sum
    accumulation (losses.py ``denoms``)."""
    from depth_image_captioning_pub_tpu.engine.losses import token_mask
    mask = token_mask(batch["lengths"], targets_len, batch.get("pad_mask"))
    tok = jnp.maximum(mask.sum(), 1)
    pm = batch.get("pad_mask")
    ex = (jnp.maximum(pm.sum().astype(jnp.float32), 1.0) if pm is not None
          else jnp.float32(batch["captions"].shape[0]))
    return tok, ex


def _accum_grads(grad_fn: Callable, params, batch_stats, batch,
                 rng: jax.Array, accum_steps: int):
    """Summed gradient over ``accum_steps`` microbatches via ``lax.scan``.

    ``grad_fn(params, stats, microbatch, rng) -> (grads, (metrics, stats))``
    where the loss inside grad_fn is normalized by FULL-batch denominators
    (``_global_denoms``), so the sum of microbatch gradients/metrics IS the
    one-shot value. Stats thread through the scan carry (sequential BN
    updates). The split is strided — microbatch j holds batch rows
    ``j::accum_steps`` — keeping each microbatch balanced across a
    contiguously-sharded data mesh (no per-step resharding) and spreading
    trailing pad rows.
    """
    b = jax.tree_util.tree_leaves(batch)[0].shape[0]
    if b % accum_steps:
        raise ValueError(
            f"batch size {b} not divisible by accum_steps={accum_steps}")

    def split(x):
        # [B, ...] -> [accum, B/accum, ...] with micro[j, k] = x[k*accum + j]
        return x.reshape(b // accum_steps, accum_steps,
                         *x.shape[1:]).swapaxes(0, 1)

    micro = jax.tree_util.tree_map(split, batch)
    rngs = jax.random.split(rng, accum_steps)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)

    def body(carry, xs):
        g_acc, m_acc, stats = carry
        mb, r = xs
        g, (m, new_stats) = grad_fn(params, stats, mb, r)
        return (jax.tree_util.tree_map(jnp.add, g_acc, g),
                jax.tree_util.tree_map(jnp.add, m_acc, m), new_stats), None

    mb0 = jax.tree_util.tree_map(lambda x: x[0], micro)
    m_shape = jax.eval_shape(grad_fn, params, batch_stats, mb0,
                             rngs[0])[1][0]
    m_zero = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), m_shape)
    (g_sum, metrics, new_stats), _ = jax.lax.scan(
        body, (zeros, m_zero, batch_stats), (micro, rngs))
    return g_sum, metrics, new_stats


def make_attention_eval_step(
        encoder_apply: Callable,
        decoder_apply: Callable,
        alpha_reg: float = 0.0,
        depth_encoder_apply: Optional[Callable] = None,
        hard_eval_sampling: bool = False,
        features_input: bool = False) -> Callable:
    """Validation-loss step (teacher forcing, eval mode).

    For hard attention the reference's ``eval_forward`` swaps Gumbel-softmax
    for one-hot Gumbel-max sampling (base_caption_models.py:365-414) and
    drops the alpha penalty (base_train.py:435); soft keeps the penalty
    (base_train.py:208).
    """

    def step(state: TrainState, batch, rng):
        if features_input:
            inp = batch["features"]
        else:
            inp = imagenet_normalize(to_unit_float(batch["images"]))
        features = encoder_apply(state.frozen["encoder"], inp)
        depth_features = None
        if depth_encoder_apply is not None:
            depth_features, _ = depth_encoder_apply(
                state.params["depth_encoder"], state.batch_stats,
                batch["depth"], train=False)
        logits, alphas = decoder_apply(
            state.params["decoder"], features, batch["captions"],
            depth_features, train=False, temp=jnp.float32(1.0), rng=rng,
            hard_eval_sampling=hard_eval_sampling)
        _, metrics = caption_loss(
            logits, batch["captions"], batch["lengths"], alphas,
            batch.get("pad_mask"), alpha_reg)
        return metrics

    return jax.jit(step)


def make_nic_train_step(encoder_apply: Callable, decoder_apply: Callable,
                        optimizer: optax.GradientTransformation,
                        donate: bool = True,
                        accum_steps: int = 1,
                        features_input: bool = False) -> Callable:
    """NIC train step: trainable = decoder + encoder projection layer
    (reference: nic.py:243-245). ``encoder_apply(frozen_backbone,
    linear_params, images)`` returns [B, dim_embedding]. ``accum_steps``:
    see make_attention_train_step. ``features_input``: the batch carries
    cached pooled backbone outputs; only the trainable projection runs in
    the step (pass ``encoder_apply(features_input=True)``)."""

    def loss_fn(params, frozen, batch, rng, denom=None):
        if features_input:
            inp = batch["features"]
        else:
            inp = imagenet_normalize(to_unit_float(batch["images"]))
        features = encoder_apply(frozen["encoder"], params["enc_linear"],
                                 inp)
        logits = decoder_apply(params["decoder"], features,
                               batch["captions"], train=True, rng=rng)
        return nic_loss(logits, batch["captions"], batch["lengths"],
                        batch.get("pad_mask"), denom=denom)

    def step(state: TrainState, batch, rng):
        if accum_steps == 1:
            grads, metrics = jax.grad(loss_fn, has_aux=True)(
                state.params, state.frozen, batch, rng)
        else:
            # NIC targets are the unshifted captions (nic_loss): the token
            # denominator counts t < length over the full batch
            t = jnp.arange(batch["captions"].shape[1])[None, :]
            mask = t < batch["lengths"][:, None]
            if batch.get("pad_mask") is not None:
                mask = mask & batch["pad_mask"][:, None]
            denom = jnp.maximum(mask.sum(), 1)
            grads, metrics, _ = _accum_grads(
                lambda p, s, mb, r: _with_stats(
                    jax.grad(loss_fn, has_aux=True)(p, state.frozen, mb, r,
                                                    denom),
                    s),
                state.params, state.batch_stats, batch, rng, accum_steps)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.frozen, state.batch_stats,
                          state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _with_stats(grads_and_metrics, stats):
    """Adapt a stats-less (grads, metrics) pair to _accum_grads' contract."""
    g, m = grads_and_metrics
    return g, (m, stats)


def make_nic_eval_step(encoder_apply: Callable,
                       decoder_apply: Callable,
                       features_input: bool = False) -> Callable:
    def step(state: TrainState, batch):
        if features_input:
            inp = batch["features"]
        else:
            inp = imagenet_normalize(to_unit_float(batch["images"]))
        features = encoder_apply(state.frozen["encoder"],
                                 state.params["enc_linear"], inp)
        logits = decoder_apply(state.params["decoder"], features,
                               batch["captions"], train=False, rng=None)
        _, metrics = nic_loss(logits, batch["captions"], batch["lengths"],
                              batch.get("pad_mask"))
        return metrics

    return jax.jit(step)
