"""Train-time frozen-feature cache (engine/feature_cache.py).

Pinned here: cached-vs-online loss-trajectory agreement for base-soft and
NIC (FP tolerance — GSPMD compiles the standalone encode and the fused
step differently, reordering low bf16 bits) plus bit-determinism of the
cached path itself, the bitwise single-device step boundary, digest-keyed
staleness (different frozen params rebuild), provider gather semantics
under batch padding, and CLI flag threading."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Compile-heavy single-device tests (pipeline caches / DPT twins /
# interpret-mode kernels): their own suite chunk on slow rigs --
# `pytest -m heavy` (README Testing section).
pytestmark = pytest.mark.heavy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from depth_image_captioning_pub_tpu.config import ConfigTrain
from depth_image_captioning_pub_tpu.engine import feature_cache as fc
from depth_image_captioning_pub_tpu.engine.train import train

TINY = (1, 1, 1, 1)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from depth_image_captioning_pub_tpu.data.coco import CocoCaptions
    from depth_image_captioning_pub_tpu.data.synthetic import (
        make_synthetic_coco)
    from depth_image_captioning_pub_tpu.data.vocab import (
        build_vocab, captions_from_coco_json)
    out = tmp_path_factory.mktemp("cocofeat")
    timg, tann = make_synthetic_coco(str(out / "t"), num_images=6,
                                     image_hw=(64, 64), seed=31)
    vimg, vann = make_synthetic_coco(str(out / "v"), num_images=4,
                                     image_hw=(64, 64), seed=32)
    caps = captions_from_coco_json(tann) + captions_from_coco_json(vann)
    w2i, _ = build_vocab(caps, [], min_count=1)
    train_ds = CocoCaptions(timg, tann, image_size=(64, 64))
    val_ds = CocoCaptions(vimg, vann, image_size=(64, 64))
    return train_ds, val_ds, w2i


def _cfg(tmp_path, name):
    cfg = ConfigTrain()
    cfg.batch_size = 4
    cfg.max_caption_len = 8
    cfg.save_directory_soft = str(tmp_path / name / "base_soft")
    cfg.save_directory_nic = str(tmp_path / name / "NIC")
    return cfg


def _csv_losses(save_dir, prefix, suffix, sep="_"):
    rows = []
    with open(f"{save_dir}/{prefix}_train_loss{sep}{suffix}.csv") as f:
        for line in f:
            rows.append(float(line.strip().split(",")[1]))
    with open(f"{save_dir}/{prefix}_val_loss{sep}{suffix}.csv") as f:
        for line in f:
            rows.append(float(line.strip().split(",")[1]))
    return rows


@pytest.mark.parametrize("kind,prefix", [
    ("base-soft", "base_soft"),
    ("nic", "nic"),
])
def test_cached_matches_online_losses(env, tmp_path, kind, prefix):
    """Two epochs trained from cached features walk the online run's loss
    trajectory to FP tolerance, and the cached path is bit-DETERMINISTIC
    (two cached runs produce identical CSVs).

    Why tolerance and not bitwise vs online: under a GSPMD mesh the
    standalone cache-build program and the fused train step compile
    differently, reordering low bfloat16 bits of the frozen features
    (measured ~2e-6 relative on the loss; the single-device step-level
    boundary IS bitwise — pinned below). A wrong cache (stale features,
    index mix-up) moves losses by orders of magnitude more than 1e-4."""
    train_ds, val_ds, w2i = env
    kw = dict(use_data="coco", datasets=(train_ds, val_ds), word_to_id=w2i,
              num_epochs=2, resnet_layers=TINY, quiet=True)
    suffix = "coco0" if kind != "nic" else "0"
    sep = "_" if kind != "nic" else ""
    sdir = "base_soft" if kind == "base-soft" else "NIC"

    cfg_a = _cfg(tmp_path, "online")
    train(kind, ext=0, cfg=cfg_a, **kw)
    online = _csv_losses(str(tmp_path / "online" / sdir), prefix, suffix, sep)

    cfg_b = _cfg(tmp_path, "cached")
    train(kind, ext=0, cfg=cfg_b, feature_cache=True, **kw)
    cached = _csv_losses(str(tmp_path / "cached" / sdir), prefix, suffix, sep)

    np.testing.assert_allclose(online, cached, rtol=1e-4)

    cfg_c = _cfg(tmp_path, "cached2")
    train(kind, ext=0, cfg=cfg_c, feature_cache=True, **kw)
    cached2 = _csv_losses(str(tmp_path / "cached2" / sdir), prefix, suffix,
                          sep)
    assert cached == cached2  # cached trajectory is bit-deterministic


def test_step_boundary_bitwise_single_device(env):
    """On one device the feature boundary IS bitwise: the online fused
    train step and the features-input step fed a standalone encode produce
    the identical loss, in both encoder dtypes."""
    from depth_image_captioning_pub_tpu.engine.steps import (
        TrainState, make_attention_train_step, make_optimizer)
    from depth_image_captioning_pub_tpu.models.captioner import (
        build_captioner)
    train_ds, val_ds, w2i = env
    rng = np.random.default_rng(0)
    imgs = (rng.random((4, 64, 64, 3)) * 255).astype(np.uint8)
    base = {"captions": rng.integers(0, 18, (4, 8)).astype(np.int32),
            "lengths": np.array([8, 6, 7, 5], np.int32),
            "pad_mask": np.ones((4,), bool)}
    dev = jax.devices()[0]
    for dt in (jnp.float32, jnp.bfloat16):
        cfg = ConfigTrain()
        cfg.max_caption_len = 8
        cap = build_captioner("base-soft", 18, cfg, encoder_dtype=dt,
                              resnet_layers=TINY)
        params, frozen, stats = cap.init(jax.random.PRNGKey(0),
                                         image_hw=(64, 64))
        opt = make_optimizer(1e-3)
        state = TrainState(params, opt.init(params), frozen, stats,
                           jnp.int32(0))
        state = jax.device_put(state, dev)
        key = jax.random.PRNGKey(1)
        on = make_attention_train_step(cap.encoder_apply(),
                                       cap.decoder_apply(), opt,
                                       alpha_reg=0.7, donate=False)
        b1 = jax.device_put(dict(base, images=imgs), dev)
        _, m_on = on(state, b1, key, jnp.float32(1.0))
        feats = jax.jit(cap.cache_encode_fn())(
            jax.device_put(frozen["encoder"], dev),
            jax.device_put(imgs, dev))
        fi = make_attention_train_step(
            cap.encoder_apply(features_input=True), cap.decoder_apply(),
            opt, alpha_reg=0.7, donate=False, features_input=True)
        b2 = jax.device_put(dict(base, features=feats), dev)
        _, m_fi = fi(state, b2, key, jnp.float32(1.0))
        assert float(m_on["loss"]) == float(m_fi["loss"])


def test_cache_files_written_and_reused(env, tmp_path, capsys):
    """Second run with identical frozen params reuses the cache files
    (no rebuild message); the sidecar digest keys them."""
    train_ds, val_ds, w2i = env
    cfg = _cfg(tmp_path, "reuse")
    kw = dict(use_data="coco", datasets=(train_ds, val_ds), word_to_id=w2i,
              num_epochs=1, resnet_layers=TINY, quiet=False,
              feature_cache=True)
    train("base-soft", ext=0, cfg=cfg, **kw)
    out1 = capsys.readouterr().out
    assert "feature cache: building train" in out1
    assert "feature cache: building val" in out1
    train("base-soft", ext=0, cfg=cfg, **kw)
    assert "feature cache: building" not in capsys.readouterr().out
    # a different seed (ext) means different frozen params -> rebuild
    train("base-soft", ext=1, cfg=cfg, **kw)
    assert "feature cache: building train" in capsys.readouterr().out


def test_digest_tracks_frozen_params():
    a = {"w": np.ones((3, 3), np.float32)}
    b = {"w": np.full((3, 3), 2.0, np.float32)}
    d1 = fc.frozen_digest(a, jnp.bfloat16, (4, 8))
    assert d1 == fc.frozen_digest(a, jnp.bfloat16, (4, 8))
    assert d1 != fc.frozen_digest(b, jnp.bfloat16, (4, 8))
    assert d1 != fc.frozen_digest(a, jnp.float32, (4, 8))
    assert d1 != fc.frozen_digest(a, jnp.bfloat16, (8, 8))


def test_provider_gathers_by_index(tmp_path):
    """Raw bf16 round-trip + index gather (incl. repeated pad indices)."""
    import ml_dtypes

    class _DS:
        def __init__(self, feats):
            self.feats = feats

        def __len__(self):
            return len(self.feats)

        def load_image(self, i):
            return np.full((2, 2, 3), i, np.uint8)

    rng = np.random.default_rng(3)
    feats = rng.random((5, 4, 8), np.float32).astype(ml_dtypes.bfloat16)
    ds = _DS(feats)
    # encode_fn maps image i -> feats[i] (first pixel value is the index);
    # jit-traceable since build() jits it
    feats_j = jnp.asarray(feats)
    encode = lambda frozen, imgs: jnp.take(  # noqa: E731
        feats_j, imgs[:, 0, 0, 0].astype(jnp.int32), axis=0)
    provider = fc.build_or_open(str(tmp_path), "train", ds, encode,
                                {"w": np.zeros(1)}, (4, 8),
                                ml_dtypes.bfloat16, batch_size=2, quiet=True)
    got = provider(np.array([4, 0, 0, 2]))
    want = feats[[4, 0, 0, 2]]
    assert got.dtype == want.dtype
    assert np.array_equal(got.view(np.uint16), want.view(np.uint16))


def test_cli_threads_feature_cache_flag():
    import base_main
    rest, flags, cfg = base_main._parse_flags(
        ["soft", "coco", "--feature-cache"])
    assert rest == ["soft", "coco"] and flags["feature_cache"] is True

    import depth_main
    rest, flags, cfg = depth_main._parse_flags(
        ["soft", "cnn", "coco", "--feature-cache"])
    assert rest == ["soft", "cnn", "coco"] and flags["feature_cache"] is True
