"""DPT-hybrid monocular depth estimator (ViT-B + ResNetV2-50 backbone).

From-scratch flax/NHWC re-design of the reference's vendored MiDaS DPT stack
(reference: Depth_caption_model/modules/midas/{dpt_depth,vit,blocks}.py and
the DPT_Depthestimator wrapper at DPT_model.py:16-66, backbone
'vitb_rn50_384'). Architectural contract reproduced exactly so the Omnidata
checkpoint bridges 1:1:

* ResNetV2 stem (weight-standardized 7x7/2 conv + GroupNorm(32) + ReLU +
  SAME max-pool 3x3/2) and 3 post-activation bottleneck stages with layout
  (3, 4, 9) — taps after stages 0 (256ch, /4) and 1 (512ch, /8)
  (vit.py:363-368);
* 1x1 patch projection to 768, class token, position embeddings (bilinearly
  resized for non-384 inputs, vit.py:102-116), 12 pre-LN transformer blocks
  — taps after blocks 8 and 11 (vit.py:370-371);
* 'project' readout folding the class token into each tap (vit.py:36-47),
  reassembly convs (act_postprocess3/4, vit.py:431-462), scratch 3x3 convs
  [256,512,768,768]->256 (blocks.py:49-75), four RefineNet-style fusion
  blocks with align_corners bilinear x2 upsampling (blocks.py:230-341), and
  the monocular head conv->upx2->conv->relu->1x1->relu (dpt_depth.py:91-99).

The reference reaches tap activations through registered forward hooks on a
timm model and monkey-patched methods (vit.py:158-165, :291-294); here the
backbone simply *returns* its four tap tensors — hooks are an artifact of
retrofitting, not architecture.

The whole network is inference-only in this framework (frozen depth source,
reference: DPT_model.py:63-66), so no BN/dropout modes exist; everything
runs in the caller's dtype (bf16 on TPU, f32 for parity checks).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

# Token-axis pad granularity for the ViT stack (see DPTDepthModel).
# Swept on v5e (batch 64, 577 tokens): 584 (x8) -> 292.5 caps/s,
# 608 (x64) -> 288.1, 640 (x128) -> 286-290, unpadded 577 -> 222.9 —
# the win comes from 8-row sublane alignment; larger multiples only add
# padded compute. Module-level so experiments can override before tracing.
TOKEN_PAD_MULTIPLE = 8

# Opt-in tanh-approximate GELU for the ViT MLPs (jax.nn.gelu approximate=
# True). The exact erf GELU costs ~7 ms of the depth-soft call (STATUS.md
# r2 ablation); tanh-GELU differs from the reference's torch.nn.GELU
# (exact erf) by ~1e-3 relative, so it is NOT the parity default — flip for
# throughput-over-parity deployments. A/B numbers live in STATUS.md.
GELU_APPROXIMATE = False

# Opt-in low-resolution monocular head (--dpt-head lowres): run head_conv2/
# conv3 BEFORE the head's x2 upsample (conv-then-resize instead of the
# reference's resize-then-conv, dpt_depth.py:91-99), so the 3x3 convs see
# 1/4 the pixels and the align-corners x2 interp moves from 128 channels
# to the final single channel (~128x less resize bandwidth). NOT exact —
# 3x3 convs don't commute with resize (the r3 head ablation's arithmetic:
# position-varying align-corners weights rule out an exact fusion), so
# like GELU_APPROXIMATE this is a documented throughput-over-parity knob,
# never the default. Output shape is unchanged. A/B numbers: PERF.md.
HEAD_LOW_RES = False

# Optional sequence parallelism: a jax.sharding.NamedSharding for the
# [B, N, C] token activations (e.g. NamedSharding(mesh, P("data", "model",
# None))). When set, every ViTBlock boundary constrains its output to it,
# so GSPMD partitions the LN/MLP segments over the token axis and inserts
# the all-gather the attention needs — the canonical sp split for a ViT.
# None (default) leaves placement to propagation from the inputs. The
# global math is unchanged either way (tests/test_tensor_parallel.py).
TOKEN_SHARDING = None

# Perf-ablation knob for in-pipeline component timing ONLY (never set in
# production paths): "head_tail" truncates the head after the x2 upsample,
# "head_all" skips the whole monocular head. Outputs are garbage; the knob
# exists so A/B deltas of the real pipeline isolate each segment's cost
# (STATUS.md ablation tables). Must be set before model construction.
ABLATE = ""


# ---------------------------------------------------------------------------
# Exact align_corners=True bilinear resize as separable matmuls.
# torch F.interpolate(..., mode="bilinear", align_corners=True) maps output
# index i to input coordinate i*(in-1)/(out-1); a [out, in] interpolation
# matrix per axis turns the resize into two MXU matmuls.
#
# Measured alternative (v5e, DPT batch 64): a constant-index gather + lerp
# per axis — nominally FLOP-free — is 35% SLOWER end to end (448 vs 333 ms)
# because TPU gathers serialize on the VPU while the "wasteful" dense
# matmul saturates the MXU. Keep the matmul form.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1 or in_size == 1:
        m[:, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        pos = i * scale
        lo = int(np.floor(pos))
        hi = min(lo + 1, in_size - 1)
        frac = pos - lo
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


# For the exact-2x case (every upsample in the fusion decoder and the head)
# the interp matrix has closed two-tap structure, so the matmul can be
# replaced by shifts + broadcasts + an interleave — O(1) FLOPs per output
# element instead of O(n), no gathers (the measured-slow alternative above),
# and every op is XLA-fusible elementwise/layout work. Derivation: with
# scale = (n-1)/(2n-1), output row 2m lands at m - m/(2n-1) (blend of input
# rows m-1, m with weight m/(2n-1) on m-1) and row 2m+1 at m + (n-1-m)/(2n-1)
# (blend of m, m+1 with weight (n-1-m)/(2n-1) on m+1). Out-of-range taps get
# weight exactly 0 (edge-padded operands); weights are read bit-identically
# out of _interp_matrix, so the two forms agree to FMA rounding (pinned at
# a few f32 ulps, tests/test_dpt.py) and produce IDENTICAL greedy tokens on
# the bf16 TPU pipeline (measured 100.0000% agreement).
#
# MEASURED NEGATIVE (v5e, depth-soft in-pipeline A/B, batch 64, 3
# interleaved reps, tools/ab_two_tap_resize.py): two-tap 245 caps/s vs
# matmul 300 caps/s = 0.82x — 18% SLOWER end to end. The stack+reshape
# row/column interleave is expensive sublane/lane shuffling on TPU, while
# the "wasteful" dense interp matmuls ride the MXU, which has idle cycles
# here anyway. Same lesson as the gather+lerp negative above: on TPU,
# avoiding FLOPs the MXU would have absorbed buys nothing and pays layout
# cost. Kept as a tested opt-in; the matmul form stays the default.
UPSAMPLE2X_TWO_TAP = False


@functools.lru_cache(maxsize=None)
def _two_tap_weights(n: int):
    """Per-row tap weights for the x2 upsample, read straight out of
    ``_interp_matrix(n, 2n)`` so the two forms use BIT-IDENTICAL f32
    weights. Returns (w_even_prev, w_even_self, w_odd_self, w_odd_next):
    even output 2m = w_even_prev[m]*X[m-1] + w_even_self[m]*X[m];
    odd output 2m+1 = w_odd_self[m]*X[m] + w_odd_next[m]*X[m+1]
    (out-of-range taps carry weight exactly 0)."""
    mat = _interp_matrix(n, 2 * n)
    idx = np.arange(n)
    w_even_prev = mat[2 * idx, np.maximum(idx - 1, 0)].copy()
    w_even_prev[0] = 0.0                       # X[-1] tap doesn't exist
    w_even_self = mat[2 * idx, idx].copy()
    w_odd_self = mat[2 * idx + 1, idx].copy()
    w_odd_next = mat[2 * idx + 1, np.minimum(idx + 1, n - 1)].copy()
    w_odd_next[n - 1] = 0.0                    # X[n] tap doesn't exist
    # sanity: the 4 extracted taps account for every nonzero matrix entry
    assert abs(w_even_prev.sum() + w_even_self.sum() + w_odd_self.sum()
               + w_odd_next.sum() - 2 * n) < 1e-4
    return w_even_prev, w_even_self, w_odd_self, w_odd_next


def _upsample2x_axis(x: jax.Array, axis: int) -> jax.Array:
    """Size n -> 2n along ``axis``, bilinear align_corners=True, two-tap."""
    n = x.shape[axis]
    wep, wes, wos, won = _two_tap_weights(n)
    shape = [1] * x.ndim
    shape[axis] = n

    def w(v):
        return jnp.asarray(v.reshape(shape), dtype=x.dtype)

    def tk(sl):
        ix = [slice(None)] * x.ndim
        ix[axis] = sl
        return x[tuple(ix)]

    xm1 = jnp.concatenate([tk(slice(0, 1)), tk(slice(0, n - 1))], axis=axis)
    xp1 = jnp.concatenate([tk(slice(1, n)), tk(slice(n - 1, n))], axis=axis)
    even = w(wep) * xm1 + w(wes) * x
    odd = w(wos) * x + w(won) * xp1
    out = jnp.stack([even, odd], axis=axis + 1)
    return out.reshape(x.shape[:axis] + (2 * n,) + x.shape[axis + 1:])


def resize_align_corners(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """[B, H, W, C] -> [B, h, w, C], bilinear, align_corners=True."""
    if (UPSAMPLE2X_TWO_TAP and out_hw == (2 * x.shape[1], 2 * x.shape[2])):
        return _upsample2x_axis(_upsample2x_axis(x, 1), 2)
    mh = jnp.asarray(_interp_matrix(x.shape[1], out_hw[0]), dtype=x.dtype)
    mw = jnp.asarray(_interp_matrix(x.shape[2], out_hw[1]), dtype=x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x, preferred_element_type=x.dtype)
    return jnp.einsum("pw,bowc->bopc", mw, x, preferred_element_type=x.dtype)


# ---------------------------------------------------------------------------
# ResNetV2 pieces (timm non-preact variant used by the hybrid ViT)
# ---------------------------------------------------------------------------

class StdConv(nn.Module):
    """Weight-standardized conv (timm StdConv2dSame): kernel normalized to
    zero mean / unit variance over (kh, kw, in) per output channel."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, x.shape[-1], self.features), jnp.float32)
        mean = w.mean(axis=(0, 1, 2), keepdims=True)
        var = w.var(axis=(0, 1, 2), keepdims=True)
        w = (w - mean) / jnp.sqrt(var + 1e-6)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=self.strides, padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32).astype(self.dtype)
        return y


class GroupNormAct(nn.Module):
    """GroupNorm(32) with optional fused ReLU (timm GroupNormAct)."""

    act: bool = True
    groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=x.dtype, param_dtype=jnp.float32,
                         name="gn")(x)
        return nn.relu(y) if self.act else y


class ResNetV2Bottleneck(nn.Module):
    """Post-activation bottleneck: (conv1x1+GN+relu)x -> 3x3(stride) ->
    1x1(4x, GN no act) + residual, relu after the add."""

    mid: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_ch = self.mid * 4
        shortcut = x
        if self.downsample:
            shortcut = StdConv(out_ch, (1, 1), (self.stride, self.stride),
                               dtype=self.dtype, name="ds_conv")(x)
            shortcut = GroupNormAct(act=False, name="ds_norm")(shortcut)
        y = StdConv(self.mid, (1, 1), dtype=self.dtype, name="conv1")(x)
        y = GroupNormAct(name="norm1")(y)
        y = StdConv(self.mid, (3, 3), (self.stride, self.stride),
                    dtype=self.dtype, name="conv2")(y)
        y = GroupNormAct(name="norm2")(y)
        y = StdConv(out_ch, (1, 1), dtype=self.dtype, name="conv3")(y)
        y = GroupNormAct(act=False, name="norm3")(y)
        return nn.relu(y + shortcut)


class HybridResNetStages(nn.Module):
    """Stem + 3 stages; returns (stage0 /4, stage1 /8, stage2 /16)."""

    layers: Sequence[int] = (3, 4, 9)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        x = StdConv(64, (7, 7), (2, 2), dtype=self.dtype, name="stem_conv")(x)
        x = GroupNormAct(name="stem_norm")(x)
        # SAME max-pool 3x3/2 (timm MaxPool2dSame)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME")
        taps = []
        for si, blocks in enumerate(self.layers):
            mid = 64 * (2 ** si)
            for bi in range(blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = ResNetV2Bottleneck(mid=mid, stride=stride,
                                       downsample=(bi == 0),
                                       dtype=self.dtype,
                                       name=f"stage{si}_{bi}")(x)
            taps.append(x)
        return taps  # [/4 256ch, /8 512ch, /16 1024ch]


# ---------------------------------------------------------------------------
# ViT pieces
# ---------------------------------------------------------------------------

class ViTBlock(nn.Module):
    """Pre-LN transformer block (timm ViT).

    ``n_valid``: when the token axis is zero-padded for MXU-friendly tiling
    (see DPTDepthModel), keys/queries at index >= n_valid are masked out of
    the softmax with -inf, which keeps the attention over REAL tokens
    mathematically identical to the unpadded computation (pad keys get
    exactly zero weight; pad-row outputs are garbage and sliced off by the
    caller). Softmax runs in the block dtype: f32 paths are bit-stable for
    parity tests, while the bf16 inference path avoids materializing the
    [B, heads, N, N] score tensor in f32 (measured ~3.6x on the padded
    batch-64 577-token DPT shape on v5e).
    """

    dim: int = 768
    heads: int = 12
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32
    # Opt-in pallas fused attention (ops/pallas/vit_attention). Measured on
    # v5e in the full depth-soft pipeline: statistical TIE with the XLA
    # path (290.3 vs 286-288 caps/s) — XLA already fuses the padded +
    # bf16-softmax attention well. Kept as an opt-in with tests, recorded
    # like the other near-tie kernels (STATUS.md). Numerics differ by
    # construction: the kernel softmaxes in f32 (closer to the f32
    # reference) while this XLA path softmaxes in the block dtype; caption
    # token agreement between the two is an empirical observation on the
    # shipped model, not a guarantee.
    fused_attention: bool = False

    def _use_fused(self) -> bool:
        return self.fused_attention and jax.default_backend() != "cpu"

    @nn.compact
    def __call__(self, x: jax.Array,
                 n_valid: Optional[int] = None) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm1")(x)
        B, N, D = h.shape
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(h)
        qkv = qkv.reshape(B, N, 3, self.heads, D // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        dh = D // self.heads
        scale = dh ** -0.5
        if self._use_fused():
            from depth_image_captioning_pub_tpu.ops.pallas.vit_attention \
                import fused_attention
            zshape = (B * self.heads, N, dh)
            out = fused_attention(
                q.transpose(0, 2, 1, 3).reshape(zshape),
                k.transpose(0, 2, 1, 3).reshape(zshape),
                v.transpose(0, 2, 1, 3).reshape(zshape),
                scale=scale, n_valid=n_valid if n_valid is not None else N)
            out = out.reshape(B, self.heads, N, dh).transpose(0, 2, 1, 3)
        else:
            attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                              preferred_element_type=jnp.float32)
            if n_valid is not None and n_valid < N:
                attn = jnp.where(jnp.arange(N) >= n_valid, -jnp.inf, attn)
            attn = jax.nn.softmax(attn.astype(self.dtype), axis=-1)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                             preferred_element_type=self.dtype)
        out = out.reshape(B, N, D)
        out = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="proj")(out)
        x = x + out
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm2")(x)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=GELU_APPROXIMATE)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(h)
        return x + h


class ProjectReadout(nn.Module):
    """Fold the class token into every patch token: cat + Linear + GELU
    (vit.py:36-47)."""

    dim: int = 768

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        cls = tokens[:, :1]
        patches = tokens[:, 1:]
        readout = jnp.broadcast_to(cls, patches.shape)
        x = jnp.concatenate([patches, readout], axis=-1)
        x = nn.Dense(self.dim, dtype=x.dtype, param_dtype=jnp.float32,
                     name="project")(x)
        return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# Fusion decoder
# ---------------------------------------------------------------------------

class ResidualConvUnit(nn.Module):
    """relu->conv3x3->relu->conv3x3 + skip (blocks.py:230-287, bn=False)."""

    features: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(y)
        return y + x


# FeatureFusionBlock applies its 1x1 out_conv BEFORE the x2 align-corners
# upsample. The reference computes resize-then-conv (blocks.py:329-341), but
# a 1x1 conv is a pointwise affine map and every align-corners interpolation
# row sums to 1, so conv and resize commute EXACTLY in real arithmetic
# (conv(resize(x))[p] = W·Σw_i x_i + b = Σw_i (W·x_i + b) = resize(conv(x))[p];
# pinned by tests/test_dpt.py::test_fusion_out_conv_commutes_with_resize).
# Running the conv first does the same channel mixing on 4x fewer pixels —
# this attacks the measured ~50 ms bandwidth-bound refinenet stage across
# all four fusion blocks (VERDICT r2 item 1). Set False to restore the
# reference op order (same math, slower) for A/B runs.
OUT_CONV_BEFORE_RESIZE = True


class FeatureFusionBlock(nn.Module):
    """RefineNet-style fusion: add refined skip, refine, upsample x2
    (align_corners), 1x1 out conv (blocks.py:289-341; out_conv hoisted
    before the resize — exact commute, see OUT_CONV_BEFORE_RESIZE)."""

    features: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array | None = None) -> jax.Array:
        if skip is not None:
            x = x + ResidualConvUnit(self.features, dtype=self.dtype,
                                     name="res1")(skip)
        x = ResidualConvUnit(self.features, dtype=self.dtype, name="res2")(x)
        out_conv = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                           param_dtype=jnp.float32, name="out_conv")
        if OUT_CONV_BEFORE_RESIZE:
            x = out_conv(x)
            return resize_align_corners(x, (x.shape[1] * 2, x.shape[2] * 2))
        x = resize_align_corners(x, (x.shape[1] * 2, x.shape[2] * 2))
        return out_conv(x)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

class DPTDepthModel(nn.Module):
    """images [B, H, W, 3] (DPT-normalized) -> depth [B, H, W]."""

    features: int = 256
    vit_dim: int = 768
    vit_heads: int = 12
    vit_blocks: int = 12
    hooks: Tuple[int, int] = (8, 11)
    resnet_layers: Sequence[int] = (3, 4, 9)
    patch: int = 16
    pretrain_grid: int = 24          # 384/16: pos-embed grid of the ckpt
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, _ = x.shape
        gh, gw = H // self.patch, W // self.patch
        x = x.astype(self.dtype)

        # --- hybrid backbone ------------------------------------------------
        tap1, tap2, feat16 = HybridResNetStages(
            layers=self.resnet_layers, dtype=self.dtype, name="resnet")(x)
        tokens = nn.Conv(self.vit_dim, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="patch_proj")(feat16)
        tokens = tokens.reshape(B, gh * gw, self.vit_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.vit_dim), jnp.float32)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + self.pretrain_grid ** 2, self.vit_dim),
                         jnp.float32)
        pos = _resize_pos_embed(pos, self.pretrain_grid, (gh, gw))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, self.vit_dim)),
             tokens], axis=1)
        tokens = tokens + pos.astype(self.dtype)
        # Zero-pad the token axis to TOKEN_PAD_MULTIPLE (8-row sublane
        # alignment): 577 ragged tokens at 384^2 tile badly; 584 aligned
        # rows + masked softmax run the 12-block stack ~1.3x faster end to
        # end (sweep in the TOKEN_PAD_MULTIPLE comment). Exactness for real
        # tokens is kept by ViTBlock's n_valid masking; pad rows are
        # sliced off at the taps.
        n_tok = tokens.shape[1]
        n_pad = (-n_tok) % TOKEN_PAD_MULTIPLE
        if n_pad:
            tokens = jnp.pad(tokens, ((0, 0), (0, n_pad), (0, 0)))
        n_valid = n_tok if n_pad else None
        tap3 = tap4 = None
        if TOKEN_SHARDING is not None:
            tokens = jax.lax.with_sharding_constraint(tokens, TOKEN_SHARDING)
        for i in range(self.vit_blocks):
            tokens = ViTBlock(dim=self.vit_dim, heads=self.vit_heads,
                              dtype=self.dtype, name=f"block{i}")(
                                  tokens, n_valid=n_valid)
            if TOKEN_SHARDING is not None:
                tokens = jax.lax.with_sharding_constraint(tokens,
                                                          TOKEN_SHARDING)
            if i == self.hooks[0]:
                tap3 = tokens[:, :n_tok]
            if i == self.hooks[1]:
                tap4 = tokens[:, :n_tok]
        # (final model.norm exists in the ckpt but feeds nothing on the
        # depth path — taps are pre-norm; vit.py:61-99 ignores `glob`.)

        # --- reassembly ------------------------------------------------------
        def tokens_to_map(t, name):
            t = ProjectReadout(self.vit_dim, name=f"{name}_readout")(t)
            return t.reshape(B, gh, gw, self.vit_dim)

        l1 = tap1                                     # [B, H/4,  W/4,  256]
        l2 = tap2                                     # [B, H/8,  W/8,  512]
        l3 = tokens_to_map(tap3, "pp3")
        l3 = nn.Conv(self.vit_dim, (1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32, name="pp3_conv")(l3)
        l4 = tokens_to_map(tap4, "pp4")
        l4 = nn.Conv(self.vit_dim, (1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32, name="pp4_conv")(l4)
        l4 = nn.Conv(self.vit_dim, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="pp4_down")(l4)             # [B, H/32, W/32, 768]

        rn = []
        for i, l in enumerate((l1, l2, l3, l4), start=1):
            rn.append(nn.Conv(self.features, (3, 3), padding=1,
                              use_bias=False, dtype=self.dtype,
                              param_dtype=jnp.float32,
                              name=f"layer{i}_rn")(l))

        path4 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                   name="refinenet4")(rn[3])
        path3 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                   name="refinenet3")(path4, rn[2])
        path2 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                   name="refinenet2")(path3, rn[1])
        path1 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                   name="refinenet1")(path2, rn[0])

        # --- monocular head (dpt_depth.py:91-99) ----------------------------
        if ABLATE == "head_all":       # perf-ablation stand-in, see ABLATE
            return path1[..., 0]
        y = nn.Conv(self.features // 2, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="head_conv1")(path1)
        if not HEAD_LOW_RES:
            y = resize_align_corners(y, (y.shape[1] * 2, y.shape[2] * 2))
        if ABLATE == "head_tail":      # perf-ablation stand-in, see ABLATE
            return y[..., 0]
        y = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="head_conv2")(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="head_conv3")(y)
        y = nn.relu(y)                                 # non_negative=True
        if HEAD_LOW_RES:
            # deferred x2: same output shape, interp on 1 channel instead
            # of 128 (HEAD_LOW_RES knob comment above; NOT exact)
            y = resize_align_corners(y, (y.shape[1] * 2, y.shape[2] * 2))
        return y[..., 0]


def _resize_pos_embed(pos: jax.Array, grid_old: int,
                      grid_new: Tuple[int, int]) -> jax.Array:
    """Bilinear pos-embed grid resize, class token kept (vit.py:102-116)."""
    if (grid_old, grid_old) == tuple(grid_new):
        return pos
    tok, grid = pos[:, :1], pos[:, 1:]
    grid = grid.reshape(1, grid_old, grid_old, -1)
    # torch F.interpolate(mode="bilinear") default align_corners=False ==
    # jax.image.resize "bilinear" with antialias=False (vit.py:111 passes no
    # align_corners; torch never antialiases here, jax defaults to True —
    # matters when the grid SHRINKS, e.g. 24 -> 14 for 224-sized DPT).
    grid = jax.image.resize(grid,
                            (1, grid_new[0], grid_new[1], grid.shape[-1]),
                            method="bilinear", antialias=False)
    grid = grid.reshape(1, grid_new[0] * grid_new[1], -1)
    return jnp.concatenate([tok, grid], axis=1)


class DPTDepthEstimator:
    """Convenience wrapper: init/restore params + jitted standardized-depth fn
    (re-design of DPT_Depthestimator, DPT_model.py:16-66)."""

    def __init__(self, dtype=jnp.float32, image_size: int = 384):
        self.model = DPTDepthModel(dtype=dtype)
        self.image_size = image_size

    def init(self, rng: jax.Array, tiny: bool = False):
        size = 64 if tiny else self.image_size
        dummy = jnp.zeros((1, size, size, 3), jnp.float32)
        # jitted: eager flax init dispatches per-param ops, which is
        # minutes-slow on remote-compile TPU backends (see Captioner.init)
        return jax.jit(self.model.init)(rng, dummy)

    def load_weights(self, path: str):
        """Omnidata .ckpt via the torch bridge (DPT_model.py:32-41)."""
        from depth_image_captioning_pub_tpu.utils.torch_bridge import (
            dpt_to_flax, load_state_dict)
        return dpt_to_flax(load_state_dict(path))

    def depth_fn(self):
        """Returns the pure fn(variables, images) -> standardized
        [B,224,224,1] depth maps (the full reference pipeline: resize 384 +
        normalize + DPT + standardize + resize 224; util.py:14-17,
        depth_train.py:184-194).

        Variables are an explicit ARGUMENT, never a closure: closing over
        the ~123M DPT params would bake them into the jitted program as
        literals (a >100MB MLIR payload — the remote compiler rejects it
        with HTTP 413, and it would recompile on every weight change)."""
        from depth_image_captioning_pub_tpu.ops.image_ops import (
            dpt_normalize, resize_bilinear, standardize_depth_map,
            to_unit_float)

        def fn(variables, images_01):
            images_01 = to_unit_float(images_01)
            x = resize_bilinear(images_01, (self.image_size, self.image_size))
            x = dpt_normalize(x)
            depth = self.model.apply(variables, x)[..., None]
            depth = standardize_depth_map(depth)
            return resize_bilinear(depth, (224, 224))
        return fn
