"""Initializers replicating torch defaults, for training-dynamics parity.

torch ``nn.Linear``/``nn.Conv2d`` default to kaiming_uniform(a=sqrt(5)) on the
weight — which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — and the same
bound on the bias. The reference additionally re-initializes its embedding and
vocab head to U(-0.1, 0.1) with zero head bias (reference:
base_caption_models.py:93-96). flax defaults (lecun_normal) are close but not
identical; matching the reference's init keeps loss curves comparable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); shape [in, out] (flax layout)."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_kernel(key, shape, dtype=jnp.float32):
    """Conv kernel [kh, kw, in_c, out_c]; fan_in = kh*kw*in_c."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def uniform_pm(scale: float):
    """U(-scale, scale) — embedding / vocab-head init (reference: :93-96)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init
