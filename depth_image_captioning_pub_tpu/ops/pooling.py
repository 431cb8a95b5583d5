"""Pooling ops with torch-compatible semantics.

``nn.AdaptiveAvgPool2d`` appears at two load-bearing spots in the reference:
the RGB encoder replaces ResNet's GAP with ``AdaptiveAvgPool2d(14)`` to build
the 14x14 annotation grid (reference: base_caption_models.py:26 — on a 7x7
ResNet output this *upsamples* by bin duplication), and the depth CNN pools
its 7x7 map to 14x14 the same way (reference: depth_models.py:32).

Instead of a gather loop we express torch's exact bin arithmetic
(start=floor(i*In/Out), end=ceil((i+1)*In/Out)) as a dense [Out, In]
averaging matrix applied per spatial axis with einsum — a tiny static matmul
the MXU eats for free, and trivially differentiable.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool2d(x: jax.Array, output_size: int) -> jax.Array:
    """[B, H, W, C] -> [B, out, out, C], exact nn.AdaptiveAvgPool2d math."""
    mh = jnp.asarray(_pool_matrix(x.shape[1], output_size), dtype=x.dtype)
    mw = jnp.asarray(_pool_matrix(x.shape[2], output_size), dtype=x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x, preferred_element_type=x.dtype)
    return jnp.einsum("pw,bowc->bopc", mw, x, preferred_element_type=x.dtype)


def max_pool2d(x: jax.Array, window: int, stride: int | None = None,
               padding: int = 0) -> jax.Array:
    """[B, H, W, C] max pool, torch default stride = window
    (reference depth CNN: nn.MaxPool2d((3,3)), depth_models.py:34)."""
    stride = stride or window
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads)


def global_avg_pool(x: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, C] (ResNet GAP, used by the NIC encoder)."""
    return jnp.mean(x, axis=(1, 2))
