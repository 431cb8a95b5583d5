"""ResNet in flax.linen (NHWC, bfloat16-friendly).

The reference uses a frozen torchvision ResNet-152 (IMAGENET1K_V2) as the RGB
backbone for every model (reference: base_caption_models.py:23, nic.py:33).
This is a from-scratch NHWC implementation with torchvision's v1.5 block
structure (stride on the 3x3 conv of each bottleneck) so the torch-checkpoint
bridge (utils/torch_bridge.py) maps weights name-for-name; compute runs in
bfloat16 on the MXU with float32 batch-norm statistics.

The backbone is always frozen here (the reference never trains it:
@torch.no_grad() at base_caption_models.py:36, nic.py:50) so BatchNorm always
uses running averages — there is no train-mode BN path to carry.

``fold_bn`` + :func:`fold_batchnorm` fold those frozen BN affines into the
conv weights (exact math). Measured in-pipeline on v5e (tools/ab_fold_bn.py,
batch 500, A/B/A/B interleaved): 1.007x / 1.010x — a tie within the rig's
~1.5% run spread, because XLA already fuses the BN scale/shift into the
convolution epilogue; folding removes no HBM traffic. Kept as a tested
opt-in (useful on backends without conv-epilogue fusion), NOT the default:
the unfolded layout is the torch-bridge/parity layout, and bf16 rounding
placement differs (random-weight greedy tokens agree only ~92.7% through
30-step argmax cascades; trained weights sit further from argmax ties).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from depth_image_captioning_pub_tpu.ops.pooling import (
    adaptive_avg_pool2d, global_avg_pool, max_pool2d)

Dtype = Any

RESNET152_LAYERS = (3, 8, 36, 3)
RESNET50_LAYERS = (3, 4, 6, 3)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) bottleneck, torchvision v1.5 layout.

    ``fold_bn`` replaces each conv+BN pair with a single biased conv whose
    weights were pre-folded by :func:`fold_batchnorm` — exact math for a
    frozen backbone (BN with running stats is a per-channel affine, which
    composes into the conv weights/bias). Default off; the unfolded form is
    the weight-bridge/parity layout.
    """

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def bn(name):
            if self.fold_bn:
                return lambda y: y
            return nn.BatchNorm(use_running_average=True, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                param_dtype=jnp.float32, name=name)

        bias = self.fold_bn
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=bias, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=bias, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=bias,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=bias, dtype=self.dtype,
                               param_dtype=jnp.float32, name="ds_conv")(x)
            identity = bn("ds_bn")(identity)
        return nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    """Stem + 4 stages; returns the final [B, H/32, W/32, 2048] feature map.

    ``fold_bn``: consume :func:`fold_batchnorm`-folded parameters (biased
    convs, no BatchNorm ops). Exact for this always-frozen backbone.
    """

    layers: Sequence[int] = RESNET152_LAYERS
    dtype: Dtype = jnp.bfloat16
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                    use_bias=self.fold_bn, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        if not self.fold_bn:
            x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool2d(x, window=3, stride=2, padding=1)
        for stage, (blocks, planes) in enumerate(
                zip(self.layers, (64, 128, 256, 512))):
            for block in range(blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = Bottleneck(planes=planes, stride=stride,
                               downsample=(block == 0), dtype=self.dtype,
                               fold_bn=self.fold_bn,
                               name=f"layer{stage + 1}_{block}")(x)
        return x


def fold_batchnorm(variables: dict) -> dict:
    """Fold frozen-BN affines into conv weights: ``{"params", "batch_stats"}``
    (unfolded layout) -> ``{"params"}`` for a ``fold_bn=True`` backbone.

    Exact math: with running stats, ``BN(conv(x)) = conv(x)·s + t`` where
    ``s = γ/√(σ²+ε)`` and ``t = β − μ·s`` per output channel, so
    ``kernel' = kernel·s`` (HWIO, s on O) and ``bias' = t`` compute the same
    function. Folding is done in float32; the only numerical difference vs
    the unfolded path is bf16 rounding placement (scale applied to weights
    before the conv instead of to activations after it).

    Works on any subtree that pairs ``conv<k>``/``bn<k>`` and
    ``ds_conv``/``ds_bn`` the way :class:`Bottleneck`/:class:`ResNetBackbone`
    do (reference BN placement: base_caption_models.py:23 via torchvision).
    """
    import numpy as np

    def fold_pair(conv: dict, bn: dict, stats: dict) -> dict:
        gamma = np.asarray(bn["scale"], np.float32)
        beta = np.asarray(bn["bias"], np.float32)
        mean = np.asarray(stats["mean"], np.float32)
        var = np.asarray(stats["var"], np.float32)
        s = gamma / np.sqrt(var + 1e-5)
        kernel = np.asarray(conv["kernel"], np.float32) * s
        return {"kernel": jnp.asarray(kernel),
                "bias": jnp.asarray(beta - mean * s)}

    def walk(params: dict, stats: dict) -> dict:
        out = {}
        for key, val in params.items():
            if key.startswith("bn") or key == "ds_bn":
                continue  # consumed by its paired conv below
            bn_key = ("ds_bn" if key == "ds_conv"
                      else "bn" + key[4:] if key.startswith("conv") else None)
            if bn_key is not None and bn_key in params:
                out[key] = fold_pair(val, params[bn_key], stats[bn_key])
            elif isinstance(val, dict):
                out[key] = walk(val, stats.get(key, {}))
            else:
                out[key] = val
        return out

    return {"params": walk(variables["params"],
                           variables.get("batch_stats", {}))}


class AttentionGridEncoder(nn.Module):
    """Frozen ResNet-152 -> 14x14 annotation grid [B, 196, 2048].

    Re-design of CNNEncoder_Atten (reference: base_caption_models.py:13-45):
    torchvision's CHW permute+flatten becomes a NHWC reshape; the replaced
    ``AdaptiveAvgPool2d(14)`` (reference :26) is the exact-math pooling
    matmul in ops/pooling.py (on 224^2 input, 7x7 -> 14x14 duplication).
    """

    enc_img_size: int = 14
    dtype: Dtype = jnp.bfloat16
    layers: Sequence[int] = RESNET152_LAYERS
    fold_bn: bool = False

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        x = ResNetBackbone(layers=self.layers, dtype=self.dtype,
                           fold_bn=self.fold_bn, name="backbone")(images)
        x = adaptive_avg_pool2d(x, self.enc_img_size)
        b = x.shape[0]
        return x.reshape(b, self.enc_img_size * self.enc_img_size, x.shape[-1])


class NICEncoder(nn.Module):
    """Frozen ResNet-152 GAP + trainable Linear(2048 -> dim_embedding).

    Re-design of NIC_CNNEncoder (reference: nic.py:23-57). The linear layer
    is the only trainable part (reference: nic.py:243-245); the train engine
    partitions it out by its param path (``linear``).
    """

    dim_embedding: int = 300
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        x = ResNetBackbone(dtype=self.dtype, name="backbone")(images)
        x = global_avg_pool(x)
        from depth_image_captioning_pub_tpu.models.initializers import (
            torch_bias, torch_linear_kernel)
        x = nn.Dense(self.dim_embedding, dtype=self.dtype,
                     param_dtype=jnp.float32,
                     kernel_init=torch_linear_kernel,
                     bias_init=torch_bias(x.shape[-1]), name="linear")(x)
        return x
