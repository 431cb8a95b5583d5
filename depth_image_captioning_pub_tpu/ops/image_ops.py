"""On-device image preprocessing.

The reference normalizes on host inside collate functions and DataLoader
transforms (reference: util.py:12-17, base_train.py:47-53). On TPU, the
normalize / resize / standardize chain is a handful of fused VPU ops, so we
ship raw [0,1] uint8-derived floats across PCIe once and do everything else
on-chip — halving host work and PCIe traffic for the depth path (which needs
both an ImageNet-normalized 224 view and a DPT-normalized 384 view of the
same pixels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def to_unit_float(images: jax.Array) -> jax.Array:
    """uint8 [0,255] -> float32 [0,1]; float input passes through.

    The pipeline ships raw uint8 pixels across PCIe (4x less traffic than
    float32; bitwise-identical to dividing on host, which is what
    ``T.ToTensor`` did in the reference) and converts on-device.
    """
    if jnp.issubdtype(images.dtype, jnp.integer):
        return images.astype(jnp.float32) / 255.0
    return images


def imagenet_normalize(images: jax.Array) -> jax.Array:
    """[B,H,W,3] in [0,1] -> ImageNet-normalized (reference: util.py:13)."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=images.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=images.dtype)
    return (images - mean) / std


def dpt_normalize(images: jax.Array) -> jax.Array:
    """mean=0.5/std=0.5 normalization for DPT input (reference: util.py:14-17)."""
    return images * 2.0 - 1.0


def resize_bilinear(images: jax.Array, hw) -> jax.Array:
    """Batch bilinear resize [B,H,W,C] -> [B,h,w,C].

    Stands in for ``T.Resize`` in the depth pipeline: 224->384 before DPT
    (util.py:14-15 — on square 224 inputs, Resize(384)+CenterCrop(384) is an
    exact 384x384 upscale) and 384->224 after (depth_train.py:67, :190).
    """
    b, _, _, c = images.shape
    # antialias=False: torch F.interpolate / torchvision tensor-mode Resize
    # (torch 1.9) do not antialias, and jax.image.resize defaults to True —
    # which silently changes every DOWNSCALE (e.g. depth 384->224,
    # depth_train.py:190) while leaving upscales untouched.
    return jax.image.resize(images, (b, hw[0], hw[1], c), method="bilinear",
                            antialias=False)


def standardize_depth_map(depth: jax.Array) -> jax.Array:
    """Per-image min-max to [0,1], NaN->0.5 first.

    Matches DPT_Depthestimator.standardize_depth_map (reference:
    DPT_model.py:43-61). depth: [B, H, W, 1] (or any [B, ...] layout).
    """
    depth = jnp.nan_to_num(depth, nan=0.5)
    flat = depth.reshape(depth.shape[0], -1)
    mins = flat.min(axis=1)
    maxs = flat.max(axis=1)
    shape = (depth.shape[0],) + (1,) * (depth.ndim - 1)
    dist = (maxs - mins).reshape(shape)
    mins = mins.reshape(shape)
    return (depth - mins) / dist
