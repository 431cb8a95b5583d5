"""Shared CLI plumbing for the four entry points.

Keeps the reference's positional-argv grammar (README.md:52-99) while fixing
its dispatch bugs (SURVEY.md §4.1: base_main.py:32 comparison-instead-of-
assignment, depth_main.py's nonexistent imports / wrong arities) and
replacing hardcoded home paths with flags.
"""

from __future__ import annotations

import os
import random
from typing import Dict, Optional, Tuple

import numpy as np

from depth_image_captioning_pub_tpu.config import ConfigEval

EXP_TIME = 3  # every config trains/evaluates 3x (reference: base_main.py:17)


def cpu_feature_cache_dir() -> str:
    """XLA:CPU persists AOT machine code keyed to the COMPILE host's CPU
    features; loading another machine's mix risks SIGILL (the loader
    complains loudly first). Key the CPU cache dir by a digest of this
    host's cpuinfo flags so a cache never outlives its machine."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    tag = hashlib.blake2b(flags.encode(), digest_size=4).hexdigest()
    return f"/tmp/dcap_jax_cache_cpu_{tag}"


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache for all CLIs (cold full-model compiles
    cost minutes on remote-compile TPU backends; ~40s warm, measured).
    TPU executables are target-keyed, so the long-lived repo dir is safe
    there; the CPU platform gets a host-feature-keyed dir instead."""
    try:
        import jax
        if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
            cache_dir = cpu_feature_cache_dir()
        else:
            cache_dir = os.environ.get(
                "DCAP_COMPILE_CACHE",
                os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


_enable_compile_cache()


def resnet_layers_from_env():
    """Test/dev hook: $DCAP_RESNET_LAYERS="1,1,1,1" shrinks the backbone;
    unset -> full ResNet-152."""
    raw = os.environ.get("DCAP_RESNET_LAYERS")
    if not raw:
        return None
    return tuple(int(x) for x in raw.split(","))


def seed_everything(seed: int = 123) -> None:
    """Equivalent of the reference's torch_seed (base_main.py:8-13): host
    RNGs seeded here; device randomness flows through explicit jax PRNG keys
    derived from cfg.seed, which is the JAX determinism model (the
    reference's `torch.use_deterministic_algorithms = True` was a no-op —
    it assigned over the function)."""
    random.seed(seed)
    np.random.seed(seed)


def make_depth_fn(cfg, dtype=None):
    """Build the DPT provider chain; returns (pure_fn, variables) where
    pure_fn(variables, images) -> standardized depth maps. Variables stay a
    runtime argument (closing 123M params into the jit graph overflows the
    remote compiler — see models/dpt.DPTDepthEstimator.depth_fn).

    The reference hardcodes /home/shirota/... (DPT_model.py:23); here the
    path comes from cfg.dpt_weights / $DPT_WEIGHTS, falling back to random
    initialization with a loud warning (useful for smoke runs; useless
    depth quality)."""
    import jax
    import jax.numpy as jnp
    from depth_image_captioning_pub_tpu.models import dpt as dpt_mod
    from depth_image_captioning_pub_tpu.models.dpt import (
        DPTDepthEstimator, DPTDepthModel)

    gelu = getattr(cfg, "dpt_gelu", "erf")
    if gelu not in ("erf", "tanh"):
        raise ValueError(f"dpt_gelu must be 'erf' or 'tanh', got {gelu!r}")
    # Module-level knob read at trace time; set before any caption fn that
    # embeds this DPT is traced. Process-wide by design (one deployment runs
    # one flavor); the parity default is exact erf.
    dpt_mod.GELU_APPROXIMATE = gelu == "tanh"
    head = getattr(cfg, "dpt_head", "full")
    if head not in ("full", "lowres"):
        raise ValueError(f"dpt_head must be 'full' or 'lowres', got {head!r}")
    # --dpt-head lowres: monocular-head convs before the x2 upsample —
    # throughput-over-parity knob like --gelu tanh (dpt.HEAD_LOW_RES).
    dpt_mod.HEAD_LOW_RES = head == "lowres"
    est = DPTDepthEstimator(dtype=dtype or jnp.bfloat16,
                            image_size=getattr(cfg, "dpt_image_size", 384))
    if os.environ.get("DCAP_TINY_DPT"):  # test/dev hook: shrink DPT
        est.model = DPTDepthModel(vit_blocks=3, hooks=(1, 2),
                                  resnet_layers=(1, 1, 1), vit_dim=64,
                                  vit_heads=4, features=32,
                                  dtype=dtype or jnp.bfloat16)
        est.image_size = 64
    weights = cfg.dpt_weights or os.environ.get("DPT_WEIGHTS")
    if weights and os.path.exists(weights):
        variables = est.load_weights(weights)
    else:
        print("WARNING: no DPT weights found (set --dpt-weights or "
              "$DPT_WEIGHTS); using random init — depth maps will be noise")
        variables = est.init(jax.random.PRNGKey(0))
    return est.depth_fn(), variables


def load_resnet_variables(cfg) -> Optional[dict]:
    """Bridge pretrained ResNet-152 weights if provided (torchvision
    IMAGENET1K_V2 .pth or an already-converted msgpack)."""
    path = cfg.resnet_weights or os.environ.get("RESNET152_WEIGHTS")
    if not path or not os.path.exists(path):
        print("WARNING: no ResNet-152 weights (set --resnet-weights or "
              "$RESNET152_WEIGHTS); encoder uses random init")
        return None
    if path.endswith(".msgpack"):
        from flax import serialization
        from depth_image_captioning_pub_tpu.models.resnet import AttentionGridEncoder
        import jax
        import jax.numpy as jnp
        template = AttentionGridEncoder(dtype=jnp.bfloat16).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
        with open(path, "rb") as f:
            return serialization.from_bytes(template, f.read())
    from depth_image_captioning_pub_tpu.utils.torch_bridge import (
        load_state_dict, encoder_to_flax)
    return encoder_to_flax(load_state_dict(path))


def load_eval_components(save_directory: str, files, captioner,
                         image_hw=(224, 224)):
    """Load one checkpoint set (encoder[, decoder[, depth encoder]]) saved by
    our train loop (msgpack twins of the reference basenames,
    config.py:121-179) or genuine reference .pth files via the bridge."""
    import jax
    from depth_image_captioning_pub_tpu.utils import torch_bridge as tb
    from depth_image_captioning_pub_tpu.utils.checkpoint import load_component

    t_params, t_frozen, t_stats = captioner.init(jax.random.PRNGKey(0),
                                                 image_hw=image_hw)

    def load(path, template, bridge_fn):
        if os.path.exists(path + ".msgpack"):
            return load_component(path, template)
        if os.path.exists(path):
            return bridge_fn(tb.load_state_dict(path))
        raise FileNotFoundError(path + "(.msgpack)")

    enc_path = os.path.join(save_directory, files[0])
    dec_path = os.path.join(save_directory, files[1])
    if captioner.spec.is_nic:
        frozen_enc = load(enc_path, t_frozen["encoder"],
                          lambda sd: tb.resnet_to_flax(sd))
        # reference NIC encoder .pth bundles backbone+linear; our saves split
        lin_path = os.path.join(save_directory,
                                files[0].replace("encoder", "enc_linear"))
        if os.path.exists(lin_path + ".msgpack"):
            enc_linear = load_component(lin_path, t_params["enc_linear"])
        elif os.path.exists(enc_path) and enc_path.endswith(".pth"):
            enc_linear = tb.nic_encoder_linear_to_flax(
                tb.load_state_dict(enc_path))
        else:
            enc_linear = t_params["enc_linear"]
        decoder = load(dec_path, t_params["decoder"], tb.nic_decoder_to_flax)
        params = {"decoder": decoder, "enc_linear": enc_linear}
        return frozen_enc, params, t_stats
    frozen_enc = load(enc_path, t_frozen["encoder"], tb.encoder_to_flax)
    decoder = load(dec_path, t_params["decoder"],
                   tb.attention_decoder_to_flax)
    params = {"decoder": decoder}
    stats = t_stats
    if captioner.spec.uses_depth:
        dep_path = os.path.join(save_directory, files[2])
        if captioner.spec.depth_encoder == "cnn":
            bundle_t = {"params": t_params["depth_encoder"],
                        "batch_stats": t_stats}
            bundle = load(dep_path, bundle_t, tb.depth_cnn_to_flax)
            params["depth_encoder"] = bundle["params"]
            stats = bundle["batch_stats"]
        else:
            # train saves every D_encoder as a {params, batch_stats}
            # bundle (engine/train.py:376-379); the MLP's stats are just
            # empty. A bare reference .pth holds only the MLP weights.
            bundle_t = {"params": t_params["depth_encoder"],
                        "batch_stats": t_stats}
            bundle = load(dep_path, bundle_t,
                          lambda sd: {"params": tb.depth_mlp_to_flax(sd),
                                      "batch_stats": t_stats})
            params["depth_encoder"] = bundle["params"]
            stats = bundle["batch_stats"]
    return frozen_enc, params, stats


def eval_data_selection(cfg: ConfigEval, use_data: str
                        ) -> Tuple[str, str, str, Optional[str], bool]:
    """(word_to_id_path, id_to_word_path, anno_file, index_file, use_ori)
    per the reference's useData switch (base_evaluation.py:25-91)."""
    if use_data == "coco":
        return (cfg.word_to_id_file, cfg.id_to_word_file, cfg.val_anno_file,
                cfg.index_dir, False)
    if use_data == "rem_coco":
        return (cfg.ori_word_to_id_file, cfg.ori_id_to_word_file,
                cfg.remCOCO_ori_val_anno_file,
                cfg.remCOCO_500_ori_index_dir, True)
    if use_data == "rem_original":
        return (cfg.ori_word_to_id_file, cfg.ori_id_to_word_file,
                cfg.rem_ori_val_anno_file, None, True)
    raise ValueError("input coco or rem_coco or rem_original")


def eval_tables(cfg: ConfigEval, atten: str, use_ori: bool, depth: bool,
                encoder: str = "cnn") -> Tuple[str, Dict[int, list]]:
    """(save_directory, checkpoint-filename table) — config.py:120-179.

    ``encoder="mlp"`` selects the mdepth_* tables (additive — the
    reference's MLP path has no working eval; ours trains, so it evals):
    same CNN_depth_* save dirs, mdepth_* checkpoint basenames."""
    if depth:
        m = encoder == "mlp"
        if atten == "soft":
            return ((cfg.save_directory_Cdep_soft_ori,
                     cfg.mdepth_soft_ori_parameter_files if m else
                     cfg.depth_soft_ori_parameter_files) if use_ori else
                    (cfg.save_directory_Cdep_soft,
                     cfg.mdepth_soft_parameter_files if m else
                     cfg.depth_soft_parameter_files))
        return ((cfg.save_directory_Cdep_hard_ori,
                 cfg.mdepth_hard_ori_parameter_files if m else
                 cfg.depth_hard_ori_parameter_files) if use_ori else
                (cfg.save_directory_Cdep_hard,
                 cfg.mdepth_hard_parameter_files if m else
                 cfg.depth_hard_parameter_files))
    if atten == "soft":
        return ((cfg.save_directory_soft_ori,
                 cfg.base_soft_ori_parameter_files) if use_ori else
                (cfg.save_directory_soft, cfg.base_soft_parameter_files))
    return ((cfg.save_directory_hard_ori,
             cfg.base_hard_ori_parameter_files) if use_ori else
            (cfg.save_directory_hard, cfg.base_hard_parameter_files))
