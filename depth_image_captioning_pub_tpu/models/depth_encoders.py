"""Trainable depth-map encoders.

Re-designs of ``Depth_CNN_endoder`` and ``Depth_MLP_endoder`` (reference:
depth_models.py:12-91). Both consume a standardized [B, 224, 224, 1] depth
map from the frozen DPT estimator and emit grid annotation vectors aligned
with the 14x14 RGB grid.

The CNN encoder trains its BatchNorms (unlike the frozen RGB backbone), so it
carries flax batch_stats; under data parallelism the batch statistics are
synchronized over the mesh with ``axis_name`` — the TPU-native equivalent of
what the single-device reference never had to think about.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from depth_image_captioning_pub_tpu.models.initializers import (
    torch_bias, torch_conv_kernel, torch_linear_kernel)
from depth_image_captioning_pub_tpu.ops.pooling import adaptive_avg_pool2d, max_pool2d

Dtype = Any


class DepthCNNEncoder(nn.Module):
    """3-conv depth encoder -> [B, 196, 2048].

    Spatial trace matches the reference comments (depth_models.py:19-47):
    224 -(7x7 s3 valid)-> 73 -(max3)-> 24 -(3x3)-> 22 -(max3)-> 7 -(1x1)-> 7
    -(adaptive avg)-> 14x14.
    """

    enc_img_size: int = 14
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: Optional[str] = None   # e.g. "data" to sync BN over mesh

    @nn.compact
    def __call__(self, depth: jax.Array, *, train: bool = False) -> jax.Array:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                param_dtype=jnp.float32,
                                axis_name=self.bn_axis_name if train else None,
                                name=name)

        x = depth.astype(self.dtype)
        x = nn.relu(bn("bn1")(nn.Conv(128, (7, 7), strides=(3, 3),
                                      padding="VALID", dtype=self.dtype,
                                      param_dtype=jnp.float32,
                                      kernel_init=torch_conv_kernel,
                                      name="conv1")(x)))
        x = max_pool2d(x, window=3)
        x = nn.relu(bn("bn2")(nn.Conv(512, (3, 3), padding="VALID",
                                      dtype=self.dtype,
                                      param_dtype=jnp.float32,
                                      kernel_init=torch_conv_kernel,
                                      name="conv2")(x)))
        x = max_pool2d(x, window=3)
        x = nn.relu(bn("bn3")(nn.Conv(2048, (1, 1), padding="VALID",
                                      dtype=self.dtype,
                                      param_dtype=jnp.float32,
                                      kernel_init=torch_conv_kernel,
                                      name="conv3")(x)))
        x = adaptive_avg_pool2d(x, self.enc_img_size)
        b = x.shape[0]
        return x.reshape(b, self.enc_img_size ** 2, x.shape[-1])


def img_to_patch(depth: jax.Array, patch: int = 16) -> jax.Array:
    """[B, H, W, 1] -> [B, (H/p)*(W/p), p*p] row-major patches.

    Equivalent of ``nn.Unfold(16, stride=16)`` + permute (reference:
    depth_models.py:79-91) for single-channel input: element order inside a
    patch is row-major, patches ordered row-major over the grid.
    """
    b, h, w, c = depth.shape
    assert c == 1 and h % patch == 0 and w % patch == 0
    gh, gw = h // patch, w // patch
    x = depth[..., 0].reshape(b, gh, patch, gw, patch)
    x = x.transpose(0, 1, 3, 2, 4)            # [B, gh, gw, p, p]
    return x.reshape(b, gh * gw, patch * patch)


class DepthMLPEncoder(nn.Module):
    """Per-patch MLP 256 -> 128 -> 64 -> 32, ReLU after every layer
    (reference: depth_models.py:58-84). Output concats with RGB features
    (fusion="concat", 2048+32=2080)."""

    dim_l1: int = 128
    dim_l2: int = 64
    dim_out: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, patches: jax.Array) -> jax.Array:
        x = patches.astype(self.dtype)
        for d, name in ((self.dim_l1, "l1"), (self.dim_l2, "l2"),
                        (self.dim_out, "l3")):
            x = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                         kernel_init=torch_linear_kernel,
                         bias_init=torch_bias(x.shape[-1]), name=name)(x)
            x = nn.relu(x)
        return x
