"""Bahdanau grid attention — soft, Gumbel-softmax (hard train), Gumbel-max
(hard eval) — as pure functions over explicit weight arrays.

Re-design of the reference's three ``nn.Module`` attention classes
(reference: Captioning_models/attention.py:6-167) with one structural change
for TPU efficiency: the encoder-side projection ``W_z @ features`` is hoisted
out of the per-timestep path. The reference recomputes it inside every decode
step (attention.py:84, a [B,196,2048]x[2048,A] matmul, 30x per caption); here
callers compute ``project_features`` once per image and each step only pays
the [B,A] decoder projection and the [B,196,A] score reduction. The math is
identical.

Shapes: features [B, K, D] (K = 196 grid regions), hidden [B, H],
projected features [B, K, A], alpha [B, K].
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class AttentionParams(NamedTuple):
    """Weights of the scoring MLP (reference: attention.py:59-73)."""

    w_enc: jax.Array   # [D, A]  encoder_att.weight^T
    b_enc: jax.Array   # [A]
    w_dec: jax.Array   # [H, A]  decoder_att.weight^T
    b_dec: jax.Array   # [A]
    w_full: jax.Array  # [A]     full_att.weight (squeezed)
    b_full: jax.Array  # []      full_att.bias


def project_features(p: AttentionParams, features: jax.Array,
                     compute_dtype=None) -> jax.Array:
    """Precompute W_z·z + b_z once per image: [B,K,D] -> [B,K,A].

    ``compute_dtype`` (default: the feature dtype) is the arithmetic/output
    dtype. It matters when the caller keeps the feature tensor in a
    narrower STORAGE dtype (bf16) than the compute dtype (f32): the upcast
    happens inside this op (exact values; TPU dot decomposition may differ
    at the ulp level from projecting a materialized f32 copy — see
    :func:`soft_attention`). Runs once per image, outside the scan.
    """
    cd = compute_dtype or features.dtype
    return jnp.einsum("bkd,da->bka", features, p.w_enc,
                      preferred_element_type=cd) + p.b_enc


def attention_logits(p: AttentionParams, features_proj: jax.Array,
                     hidden: jax.Array) -> jax.Array:
    """Alignment scores e_t: [B,K] (reference: attention.py:84-87)."""
    dec = hidden @ p.w_dec + p.b_dec                       # [B, A]
    act = jax.nn.relu(features_proj + dec[:, None, :])     # [B, K, A]
    return jnp.einsum("bka,a->bk", act, p.w_full,
                      preferred_element_type=act.dtype) + p.b_full


def soft_attention(p: AttentionParams, features: jax.Array,
                   features_proj: jax.Array, hidden: jax.Array,
                   compute_dtype=None) -> Tuple[jax.Array, jax.Array]:
    """Soft attention context + weights (reference: attention.py:81-95).

    ``compute_dtype`` defaults to the feature dtype (the historical
    behavior); pass f32 with bf16-STORED features to read half the HBM
    bytes per step while keeping f32 alpha/context arithmetic on exactly
    upcast values (bit-identical to an f32 feature copy on CPU; on TPU
    the mixed dot's bf16-pass decomposition differs at the ulp level —
    see models/decoder.FEATURES_RESIDENT for the measured numbers).
    """
    cd = compute_dtype or features.dtype
    logits = attention_logits(p, features_proj, hidden)
    alpha = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    alpha = alpha.astype(cd)
    context = jnp.einsum("bk,bkd->bd", alpha, features,
                         preferred_element_type=cd)
    return context, alpha


def gumbel_softmax_attention(p: AttentionParams, features: jax.Array,
                             features_proj: jax.Array, hidden: jax.Array,
                             temp: jax.Array, key: jax.Array,
                             compute_dtype=None) -> Tuple[jax.Array, jax.Array]:
    """Hard attention, training path: Gumbel-softmax relaxation with scheduled
    temperature (reference: attention.py:132-148; noise g=-log(-log U) at
    attention.py:17-18 == standard Gumbel(0,1)). ``compute_dtype``: see
    :func:`soft_attention`."""
    cd = compute_dtype or features.dtype
    logits = attention_logits(p, features_proj, hidden)
    g = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    alpha = jax.nn.softmax((logits.astype(jnp.float32) + g) / temp, axis=1)
    alpha = alpha.astype(cd)
    context = jnp.einsum("bk,bkd->bd", alpha, features,
                         preferred_element_type=cd)
    return context, alpha


def gumbel_max_attention(p: AttentionParams, features: jax.Array,
                         features_proj: jax.Array, hidden: jax.Array,
                         key: jax.Array,
                         compute_dtype=None) -> Tuple[jax.Array, jax.Array]:
    """Hard attention, eval/inference path: Gumbel-max one-hot sample
    (reference: attention.py:150-167 ``Hard_sample`` / ``Gumbel_maxtrick``).
    ``compute_dtype``: see :func:`soft_attention` (the gather's upcast is
    trivially exact)."""
    cd = compute_dtype or features.dtype
    logits = attention_logits(p, features_proj, hidden)
    g = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    pos = jnp.argmax(logits.astype(jnp.float32) + g, axis=1)
    alpha = jax.nn.one_hot(pos, logits.shape[1], dtype=cd)
    # One-hot weighted sum == gather of the selected region's feature row.
    context = jnp.take_along_axis(features, pos[:, None, None], axis=1)
    context = context[:, 0, :].astype(cd)
    return context, alpha
