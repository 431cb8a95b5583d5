"""Disk-persistent eval cache (engine/eval_cache_store.py): later
INVOCATIONS replay the frozen-stage outputs bit-exactly.

Pinned here: score equality fresh-fill vs disk-replay (base-soft and
depth-soft, incl. --num-sets 1 which the in-process cache alone cannot
help), bfloat16 bit-exact round-trip, and the invalidation rules (frozen
params, --gelu knob, image mtime, batching)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from depth_image_captioning_pub_tpu.config import ConfigEval
from depth_image_captioning_pub_tpu.data.coco import CocoCaptions
from depth_image_captioning_pub_tpu.data.vocab import (
    build_vocab, captions_from_coco_json)
from depth_image_captioning_pub_tpu.engine import eval_cache_store as store
from depth_image_captioning_pub_tpu.engine.evaluate import evaluate
from depth_image_captioning_pub_tpu.models.captioner import build_captioner

TINY = (1, 1, 1, 1)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from depth_image_captioning_pub_tpu.data.synthetic import (
        make_synthetic_coco)
    out = tmp_path_factory.mktemp("cocodiskcache")
    img_dir, ann_file = make_synthetic_coco(str(out), num_images=6,
                                            image_hw=(64, 64), seed=21)
    caps = captions_from_coco_json(ann_file)
    w2i, i2w = build_vocab(caps, [], min_count=1)
    ds = CocoCaptions(img_dir, ann_file, image_size=(64, 64))
    cfg = ConfigEval()
    cfg.batch_size = 4
    cfg.max_length = 8
    return ds, w2i, i2w, cfg


def _build(kind, env, seed=0):
    ds, w2i, i2w, cfg = env
    cap = build_captioner(kind, len(w2i), cfg, encoder_dtype=jnp.float32,
                          resnet_layers=TINY)
    params, frozen, stats = cap.init(jax.random.PRNGKey(seed),
                                     image_hw=(64, 64))
    return cap, params, frozen, stats


def _run(kind, env, loader, cache_dir=None, num_sets=1, quiet=True,
         **kw):
    ds, w2i, i2w, cfg = env
    cap = build_captioner(kind, len(w2i), cfg, encoder_dtype=jnp.float32,
                          resnet_layers=TINY)
    return evaluate(kind, "coco", cap, checkpoint_loader=loader,
                    dataset=ds, word_to_id=w2i, id_to_word=i2w, cfg=cfg,
                    num_sets=num_sets, depth_eval_cache=True,
                    eval_cache_dir=cache_dir, quiet=quiet, **kw)


def test_disk_replay_scores_equal(env, tmp_path, capsys):
    """Fill on invocation 1, replay on invocation 2 (num_sets=1 — the case
    the in-process cache can't help): identical scores, and the replay
    announces it skipped the frozen stages."""
    cap, params, frozen, stats = _build("base-soft", env)
    loader = lambda i: (frozen["encoder"], params, stats)  # noqa: E731
    cdir = str(tmp_path / "cache")

    plain = _run("base-soft", env, loader)                     # no disk
    filled = _run("base-soft", env, loader, cache_dir=cdir, quiet=False)
    assert "eval cache: saved" in capsys.readouterr().out
    replay = _run("base-soft", env, loader, cache_dir=cdir, quiet=False)
    assert "eval cache: loaded" in capsys.readouterr().out
    assert filled == plain == replay


def test_disk_replay_depth_model(env, tmp_path, monkeypatch):
    """depth-soft: features AND DPT maps round-trip; replay scores equal."""
    from depth_image_captioning_pub_tpu import cli
    monkeypatch.setenv("DCAP_TINY_DPT", "1")
    ds, w2i, i2w, cfg = env
    cap = build_captioner("depth-soft", len(w2i), cfg,
                          encoder_dtype=jnp.float32, resnet_layers=TINY)
    params, frozen, stats = cap.init(jax.random.PRNGKey(0),
                                     image_hw=(64, 64))
    depth_fn, dpt_vars = cli.make_depth_fn(cfg, dtype=jnp.float32)
    loader = lambda i: (frozen["encoder"], params, stats)  # noqa: E731
    cdir = str(tmp_path / "cache")
    kw = dict(depth_fn=depth_fn, dpt_variables=dpt_vars)
    filled = _run("depth-soft", env, loader, cache_dir=cdir, **kw)
    replay = _run("depth-soft", env, loader, cache_dir=cdir, **kw)
    plain = _run("depth-soft", env, loader, **kw)
    assert filled == plain == replay


def test_bf16_bits_roundtrip(tmp_path):
    """bfloat16 arrays round-trip bit-exactly (raw bytes + dtype tag)."""
    feats = jnp.asarray(np.random.default_rng(0).random((2, 4, 8)),
                        jnp.bfloat16)
    cache = {"entries": [({"feats": feats, "depth_maps": None}, 2)],
             "refs": [["a cat"], ["a dog"]]}
    store.save(str(tmp_path), "d" * 32, "m" * 32, cache, quiet=True)
    loaded = store.load(str(tmp_path), "d" * 32, "m" * 32, quiet=True)
    assert loaded is not None
    (aux, n_valid), = loaded["entries"]
    assert n_valid == 2 and aux["depth_maps"] is None
    got = np.asarray(aux["feats"])
    assert got.dtype == np.asarray(feats).dtype
    assert np.array_equal(got.view(np.uint16),
                          np.asarray(feats).view(np.uint16))
    assert loaded["refs"] == cache["refs"]


def test_key_mismatch_misses(tmp_path):
    cache = {"entries": [({"pooled": jnp.zeros((2, 3))}, 2)],
             "refs": [["x"], ["y"]]}
    store.save(str(tmp_path), "d" * 32, "m" * 32, cache, quiet=True)
    assert store.load(str(tmp_path), "d" * 32, "X" * 32, quiet=True) is None
    assert store.load(str(tmp_path), "X" * 32, "m" * 32, quiet=True) is None


def test_model_key_tracks_params_and_gelu(env):
    """Different frozen params -> different key; the --gelu knob (which
    changes the frozen DPT maps) also invalidates."""
    from depth_image_captioning_pub_tpu.models import dpt as dpt_mod
    ds, w2i, i2w, cfg = env
    _, _, frozen1, _ = _build("base-soft", env, seed=0)
    _, _, frozen2, _ = _build("base-soft", env, seed=7)
    k1 = store.model_key(frozen1["encoder"], None, jnp.float32, cfg,
                         "base-soft")
    k2 = store.model_key(frozen2["encoder"], None, jnp.float32, cfg,
                         "base-soft")
    assert k1 != k2
    try:
        dpt_mod.GELU_APPROXIMATE = True
        k3 = store.model_key(frozen1["encoder"], None, jnp.float32, cfg,
                             "base-soft")
    finally:
        dpt_mod.GELU_APPROXIMATE = False
    assert k3 != k1


def test_data_key_tracks_mtime_and_batching(env):
    ds, w2i, i2w, cfg = env
    k1 = store.data_key(ds, 4, 4)
    assert k1 == store.data_key(ds, 4, 4)          # stable
    assert store.data_key(ds, 4, 8) != k1          # pad shape matters
    path = ds.image_path(0)
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    assert store.data_key(ds, 4, 4) != k1          # staleness check


def test_cli_threads_eval_cache_dir(monkeypatch):
    """--eval-cache-dir reaches score_mode (flag-threading coverage)."""
    import base_evaluation

    seen = {}

    def fake_score_mode(atten, use_data, cfg, **kw):
        seen.update(kw)
        return 0

    monkeypatch.setattr(base_evaluation, "score_mode", fake_score_mode)
    rc = base_evaluation.main(["soft", "score", "coco",
                               "--eval-cache-dir", "/tmp/ec"])
    assert rc == 0 and seen["eval_cache_dir"] == "/tmp/ec"


def test_single_set_without_store_skips_fill(env, monkeypatch):
    """num_sets=1 + --eval-cache-dir but an unfingerprintable dataset (no
    disk store): nothing will ever replay the cache, so evaluate() must not
    fill it (regression: it used to hold every frozen-stage output on
    device for a pass that never reused them)."""
    import depth_image_captioning_pub_tpu.engine.evaluate as ev

    monkeypatch.setattr(store, "data_key", lambda *a, **k: None)
    seen = {}
    real = ev.generate_captions

    def spy(*args, **kw):
        seen["set_cache_mode"] = kw.get("set_cache_mode")
        seen["depth_cache_mode"] = kw.get("depth_cache_mode")
        return real(*args, **kw)

    monkeypatch.setattr(ev, "generate_captions", spy)
    cap, params, frozen, stats = _build("base-soft", env)
    loader = lambda i: (frozen["encoder"], params, stats)  # noqa: E731
    scores = _run("base-soft", env, loader, cache_dir="/nonexistent-cache")
    assert seen == {"set_cache_mode": None, "depth_cache_mode": None}
    assert all(len(v) == 1 for v in scores.values())
