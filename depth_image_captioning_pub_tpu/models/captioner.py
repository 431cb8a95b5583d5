"""Model assembly: build encoder/decoder/depth modules per config kind.

The five reference configurations (SURVEY.md §2.2) — nic, base-soft,
base-hard, depth-soft, depth-hard — plus the reference's planned-but-broken
MLP-depth variants (``MD_*`` decoders exist at depth_models.py:309-1009 but
``depth_main.py`` imports nonexistent train fns, SURVEY.md §4.1) are all
spanned by one spec: (attention kind, fusion, depth encoder kind).

This module owns flax plumbing (init, variable partitioning into
trainable/frozen/batch_stats) and exposes the plain apply callables the
engine step factories consume.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from depth_image_captioning_pub_tpu.config import ConfigTrain
from depth_image_captioning_pub_tpu.models.decoder import AttentionDecoder
from depth_image_captioning_pub_tpu.models.depth_encoders import (
    DepthCNNEncoder, DepthMLPEncoder, img_to_patch)
from depth_image_captioning_pub_tpu.models.initializers import (
    torch_bias, torch_linear_kernel)
from depth_image_captioning_pub_tpu.models.nic import NICDecoder
from depth_image_captioning_pub_tpu.models.resnet import (
    AttentionGridEncoder, ResNetBackbone)
from depth_image_captioning_pub_tpu.ops.pooling import global_avg_pool

KINDS = ("nic", "base-soft", "base-hard", "depth-soft", "depth-hard",
         "mdepth-soft", "mdepth-hard")


@dataclasses.dataclass(frozen=True)
class CaptionerSpec:
    kind: str
    attention: Optional[str]        # None (nic) | "soft" | "hard"
    fusion: str                     # "none" | "add" | "concat"
    depth_encoder: Optional[str]    # None | "cnn" | "mlp"

    @staticmethod
    def from_kind(kind: str) -> "CaptionerSpec":
        table = {
            "nic": (None, "none", None),
            "base-soft": ("soft", "none", None),
            "base-hard": ("hard", "none", None),
            "depth-soft": ("soft", "add", "cnn"),
            "depth-hard": ("hard", "add", "cnn"),
            "mdepth-soft": ("soft", "concat", "mlp"),
            "mdepth-hard": ("hard", "concat", "mlp"),
        }
        att, fusion, dep = table[kind]
        return CaptionerSpec(kind, att, fusion, dep)

    @property
    def uses_depth(self) -> bool:
        return self.depth_encoder is not None

    @property
    def is_nic(self) -> bool:
        return self.attention is None


class _NICProjection(nn.Module):
    """The trainable Linear(2048 -> dim_embedding) of the NIC encoder,
    split out so the frozen backbone and trainable head partition cleanly
    (reference trains exactly encoder.linear: nic.py:243-245)."""

    dim_embedding: int

    @nn.compact
    def __call__(self, pooled: jax.Array) -> jax.Array:
        return nn.Dense(self.dim_embedding, dtype=pooled.dtype,
                        param_dtype=jnp.float32,
                        kernel_init=torch_linear_kernel,
                        bias_init=torch_bias(pooled.shape[-1]),
                        name="linear")(pooled)


@dataclasses.dataclass
class Captioner:
    """Bundled modules + apply fns for one model configuration."""

    spec: CaptionerSpec
    cfg: ConfigTrain
    vocab_size: int
    encoder_dtype: Any = jnp.bfloat16
    decoder_dtype: Any = jnp.float32
    # ResNet-152 by default (reference: base_caption_models.py:23); tests
    # shrink this to keep CPU runtime sane.
    resnet_layers: Any = None

    def __post_init__(self):
        cfg, spec = self.cfg, self.spec
        from depth_image_captioning_pub_tpu.models.resnet import RESNET152_LAYERS
        layers = tuple(self.resnet_layers or RESNET152_LAYERS)
        if spec.is_nic:
            self.backbone = ResNetBackbone(layers=layers,
                                           dtype=self.encoder_dtype)
            self.projection = _NICProjection(cfg.nic_dim_embedding)
            self.decoder = NICDecoder(
                vocab_size=self.vocab_size,
                dim_embedding=cfg.nic_dim_embedding,
                dim_hidden=cfg.dim_hidden, num_layers=cfg.num_layers,
                dropout=cfg.nic_dropout, dtype=self.decoder_dtype)
        else:
            self.encoder = AttentionGridEncoder(
                enc_img_size=cfg.enc_img_size, dtype=self.encoder_dtype,
                layers=layers)
            self.decoder = AttentionDecoder(
                vocab_size=self.vocab_size,
                dim_attention=cfg.dim_attention,
                dim_embedding=cfg.dim_embedding,
                dim_encoder=cfg.dim_encoder,
                dim_decoder=cfg.dim_hidden,
                attention_kind=spec.attention or "soft",
                fusion=spec.fusion, dim_depth=cfg.dim_out,
                dropout=cfg.dropout, dtype=self.decoder_dtype)
        self.depth_module = None
        if spec.depth_encoder == "cnn":
            self.depth_module = DepthCNNEncoder(
                enc_img_size=cfg.enc_img_size, dtype=self.encoder_dtype,
                bn_axis_name=None)
        elif spec.depth_encoder == "mlp":
            self.depth_module = DepthMLPEncoder(
                dim_l1=cfg.dim_l1, dim_l2=cfg.dim_l2, dim_out=cfg.dim_out,
                dtype=self.decoder_dtype)

    # ---- init -------------------------------------------------------------
    def init(self, rng: jax.Array, image_hw=(224, 224)
             ) -> Tuple[Dict, Dict, Dict]:
        """Returns (trainable_params, frozen, batch_stats).

        Jitted as one program: unjitted flax init dispatches each parameter
        op eagerly, which on a remote-compile TPU backend costs minutes for
        ResNet-152 (measured 108s even for a tiny backbone) vs ~2s jitted.
        Memoized per (key, image_hw): eval loads 3 checkpoint sets and only
        needs the init as a shape template — one full-ResNet init, not 3.
        """
        # Hash the FULL key data: hashing only one word would let two
        # different seeds collide and silently return the wrong cached init.
        import numpy as _np
        key_words = (tuple(_np.asarray(jax.random.key_data(rng)).ravel()
                           .tolist())
                     if hasattr(jax.random, "key_data")
                     else tuple(_np.asarray(rng).ravel().tolist()))
        cache_key = (key_words, tuple(image_hw))
        if not hasattr(self, "_init_cache"):
            self._init_cache = {}
        if cache_key not in self._init_cache:
            self._init_cache[cache_key] = jax.jit(
                self._init, static_argnums=(1,))(rng, tuple(image_hw))
        return self._init_cache[cache_key]

    def _init(self, rng: jax.Array, image_hw) -> Tuple[Dict, Dict, Dict]:
        cfg, spec = self.cfg, self.spec
        k_enc, k_dec, k_dep, k_proj = jax.random.split(rng, 4)
        dummy_img = jnp.zeros((1, *image_hw, 3), jnp.float32)
        dummy_caps = jnp.zeros((1, cfg.max_caption_len), jnp.int32)
        trainable: Dict[str, Any] = {}
        frozen: Dict[str, Any] = {}
        batch_stats: Dict[str, Any] = {}
        if spec.is_nic:
            enc_vars = self.backbone.init(k_enc, dummy_img)
            frozen["encoder"] = enc_vars
            pooled = jnp.zeros((1, cfg.dim_encoder), jnp.float32)
            trainable["enc_linear"] = self.projection.init(k_proj, pooled)["params"]
            feat = jnp.zeros((1, cfg.nic_dim_embedding), jnp.float32)
            trainable["decoder"] = self.decoder.init(
                k_dec, feat, dummy_caps, train=False)["params"]
        else:
            enc_vars = self.encoder.init(k_enc, dummy_img)
            frozen["encoder"] = enc_vars
            k = cfg.enc_img_size ** 2
            feat = jnp.zeros((1, k, cfg.dim_encoder), jnp.float32)
            dep_feat = None
            if spec.uses_depth:
                dummy_depth = jnp.zeros((1, *image_hw, 1), jnp.float32)
                if spec.depth_encoder == "cnn":
                    dep_vars = self.depth_module.init(k_dep, dummy_depth,
                                                      train=False)
                    trainable["depth_encoder"] = dep_vars["params"]
                    batch_stats = dep_vars.get("batch_stats", {})
                    dep_feat = jnp.zeros((1, k, cfg.dim_encoder), jnp.float32)
                else:
                    patches = img_to_patch(dummy_depth)
                    dep_vars = self.depth_module.init(k_dep, patches)
                    trainable["depth_encoder"] = dep_vars["params"]
                    dep_feat = jnp.zeros((1, k, cfg.dim_out), jnp.float32)
            trainable["decoder"] = self.decoder.init(
                k_dec, feat, dummy_caps, dep_feat, train=False,
                rng=jax.random.PRNGKey(0))["params"]
        return trainable, frozen, batch_stats

    # ---- apply callables for the engine ------------------------------------
    def encoder_apply(self, features_input: bool = False) -> Callable:
        """``features_input=True`` returns the variant the train-time
        feature cache feeds (engine/feature_cache.py): the frozen prefix is
        precomputed per image, so the step receives cached features instead
        of pixels — identity for attention kinds, projection-only for NIC
        (whose trainable linear must stay inside the differentiated step;
        the reference trains exactly encoder.linear, nic.py:243-245)."""
        if self.spec.is_nic:
            if features_input:
                def apply(frozen_enc, linear_params, pooled):
                    return self.projection.apply({"params": linear_params},
                                                 pooled)
                return apply

            def apply(frozen_enc, linear_params, images):
                fm = self.backbone.apply(frozen_enc, images)
                pooled = global_avg_pool(fm)
                return self.projection.apply({"params": linear_params}, pooled)
            return apply

        if features_input:
            return lambda frozen_enc, feats: feats

        def apply(frozen_enc, images):
            return self.encoder.apply(frozen_enc, images)
        return apply

    def cache_encode_fn(self) -> Callable:
        """(frozen_enc, uint8_images) -> frozen features, for building the
        train-time feature cache: exactly the frozen prefix of the train
        step (on-device normalize + encoder; NIC: backbone + global pool,
        pre-projection), so cached training replays the identical values."""
        from depth_image_captioning_pub_tpu.ops.image_ops import (
            imagenet_normalize, to_unit_float)
        if self.spec.is_nic:
            def fn(frozen_enc, images):
                images = imagenet_normalize(to_unit_float(images))
                return global_avg_pool(self.backbone.apply(frozen_enc, images))
            return fn

        def fn(frozen_enc, images):
            images = imagenet_normalize(to_unit_float(images))
            return self.encoder.apply(frozen_enc, images)
        return fn

    def decoder_apply(self) -> Callable:
        if self.spec.is_nic:
            def apply(dec_params, features, captions, *, train, rng):
                return self.decoder.apply({"params": dec_params}, features,
                                          captions, train=train, rng=rng)
            return apply

        def apply(dec_params, features, captions, depth_features=None, *,
                  train, temp=1.0, rng=None, hard_eval_sampling=False):
            return self.decoder.apply(
                {"params": dec_params}, features, captions, depth_features,
                train=train, temp=temp,
                hard_eval_sampling=hard_eval_sampling, rng=rng)
        return apply

    def depth_encoder_apply(self) -> Optional[Callable]:
        if not self.spec.uses_depth:
            return None
        if self.spec.depth_encoder == "cnn":
            def apply(dep_params, batch_stats, depth_maps, *, train):
                variables = {"params": dep_params,
                             "batch_stats": batch_stats}
                if train:
                    out, mut = self.depth_module.apply(
                        variables, depth_maps, train=True,
                        mutable=["batch_stats"])
                    return out, mut["batch_stats"]
                out = self.depth_module.apply(variables, depth_maps,
                                              train=False)
                return out, batch_stats
            return apply

        def apply(dep_params, batch_stats, depth_maps, *, train):
            patches = img_to_patch(depth_maps)
            out = self.depth_module.apply({"params": dep_params}, patches)
            return out, batch_stats
        return apply

    def sample_apply(self) -> Callable:
        """Greedy decode callable for the eval engine / benchmarks."""
        if self.spec.is_nic:
            def apply(dec_params, features, *, max_length=30,
                      use_pallas=False, pallas_mesh=None):
                return self.decoder.apply(
                    {"params": dec_params}, features, max_length=max_length,
                    use_pallas=use_pallas, pallas_mesh=pallas_mesh,
                    method=NICDecoder.greedy_sample)
            return apply

        def apply(dec_params, features, start_id, depth_features=None, *,
                  max_length=30, rng=None, end_id=None, use_pallas=False,
                  pallas_mesh=None):
            return self.decoder.apply(
                {"params": dec_params}, features, start_id, depth_features,
                max_length=max_length, rng=rng, end_id=end_id,
                use_pallas=use_pallas, pallas_mesh=pallas_mesh,
                method=AttentionDecoder.greedy_sample)
        return apply


def build_captioner(kind: str, vocab_size: int, cfg: Optional[ConfigTrain] = None,
                    encoder_dtype=jnp.bfloat16,
                    decoder_dtype=jnp.float32,
                    resnet_layers=None) -> Captioner:
    cfg = cfg or ConfigTrain()
    return Captioner(CaptionerSpec.from_kind(kind), cfg, vocab_size,
                     encoder_dtype, decoder_dtype, resnet_layers)
