"""Masked sequence losses.

The reference computes cross-entropy over ``pack_padded_sequence``-flattened
logits with ``ignore_index=<null>`` (reference: base_train.py:111-112,
:156-160) — i.e. a mean over exactly the non-padding target tokens. Packing
is a CPU-side data-movement trick that XLA has no use for; the masked mean
below has the identical numerator and denominator over fixed shapes.

``pad_mask`` additionally zeroes the samples our fixed-shape pipeline
repeats to fill the final partial batch (the reference simply runs a smaller
last batch; its per-batch *mean* CE weights batches equally in the epoch
average, and so does ours since repeated rows are excluded from both sums).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def token_mask(lengths: jax.Array, num_steps: int,
               pad_mask: Optional[jax.Array] = None) -> jax.Array:
    """[B, T] validity mask: step t targets token t+1, valid iff t < len-1."""
    t = jnp.arange(num_steps)[None, :]
    mask = t < (lengths[:, None] - 1)
    if pad_mask is not None:
        mask = mask & pad_mask[:, None]
    return mask


def masked_cross_entropy(logits: jax.Array, targets: jax.Array,
                         mask: jax.Array,
                         denom: Optional[jax.Array] = None) -> jax.Array:
    """Mean CE over masked positions — packed-CE equivalent.

    logits [B, T, V], targets [B, T] int, mask [B, T] bool. ``denom``
    overrides the normalizer (gradient accumulation divides each
    microbatch's token-NLL sum by the FULL batch's token count so summed
    microbatch gradients equal the one-shot gradient exactly).
    """
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, targets[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    nll = logz - gold
    if denom is None:
        denom = jnp.maximum(mask.sum(), 1)
    return jnp.where(mask, nll, 0.0).sum() / denom


def doubly_stochastic_penalty(alphas: jax.Array, mask: jax.Array,
                              pad_mask: Optional[jax.Array] = None,
                              lam: float = 0.7,
                              example_denom: Optional[jax.Array] = None
                              ) -> jax.Array:
    """lam * mean((1 - sum_t alpha)^2) over batch x regions.

    Matches reference base_train.py:162: alphas at padded timesteps are zero
    there (pre-allocated zeros never written), so we zero masked steps before
    the time sum. Padding-duplicate rows are excluded from the mean.
    ``example_denom`` overrides the per-example normalizer (see
    masked_cross_entropy's ``denom``: exact gradient accumulation).
    """
    alphas = alphas.astype(jnp.float32) * mask[..., None]
    per = (1.0 - alphas.sum(axis=1)) ** 2          # [B, K]
    if example_denom is not None:
        w = (pad_mask.astype(jnp.float32)[:, None] if pad_mask is not None
             else jnp.ones((per.shape[0], 1), jnp.float32))
        return lam * (per * w).sum() / (example_denom * per.shape[1])
    if pad_mask is None:
        return lam * per.mean()
    w = pad_mask.astype(jnp.float32)[:, None]
    denom = jnp.maximum(w.sum() * per.shape[1], 1.0)
    return lam * (per * w).sum() / denom


def caption_loss(logits: jax.Array, captions: jax.Array, lengths: jax.Array,
                 alphas: Optional[jax.Array] = None,
                 pad_mask: Optional[jax.Array] = None,
                 alpha_reg: float = 0.0,
                 denoms: Optional[Tuple[jax.Array, jax.Array]] = None
                 ) -> Tuple[jax.Array, dict]:
    """Attention-model loss: CE(preds_t, captions[:, t+1]) + alpha penalty.

    logits [B, L-1, V] from teacher forcing; targets are captions shifted by
    one (reference: base_train.py:156-160 drops the <start> column).
    ``denoms=(token_total, example_total)`` switches both terms to explicit
    global normalizers so a microbatch returns its *contribution* to the
    full-batch loss — summing contributions reproduces the one-shot loss
    and gradient exactly (gradient accumulation, engine/steps.py).
    """
    targets = captions[:, 1:]
    mask = token_mask(lengths, targets.shape[1], pad_mask)
    tok_denom, ex_denom = denoms if denoms is not None else (None, None)
    ce = masked_cross_entropy(logits, targets, mask, denom=tok_denom)
    metrics = {"ce": ce}
    loss = ce
    if alpha_reg > 0.0 and alphas is not None:
        pen = doubly_stochastic_penalty(alphas, mask, pad_mask, alpha_reg,
                                        example_denom=ex_denom)
        metrics["alpha_penalty"] = pen
        loss = loss + pen
    metrics["loss"] = loss
    return loss, metrics


def nic_loss(logits: jax.Array, captions: jax.Array, lengths: jax.Array,
             pad_mask: Optional[jax.Array] = None,
             denom: Optional[jax.Array] = None) -> Tuple[jax.Array, dict]:
    """NIC loss: the image step predicts <start>, then shifted tokens.

    logits [B, L, V] where step 0 consumed the image embedding; targets are
    the full caption including <start> (reference: nic.py:282-285 packs
    captions with un-shifted lengths). ``denom``: see caption_loss.
    """
    t = jnp.arange(captions.shape[1])[None, :]
    mask = t < lengths[:, None]
    if pad_mask is not None:
        mask = mask & pad_mask[:, None]
    ce = masked_cross_entropy(logits, captions, mask, denom=denom)
    return ce, {"ce": ce, "loss": ce}
