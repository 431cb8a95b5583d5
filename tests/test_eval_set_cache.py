"""Generalized eval set cache: sets 2+ replay every frozen stage.

Extends the depth-map cache (tests/test_depth_eval_cache.py) to the frozen
attention encoder / NIC backbone and the reference lists: checkpoint set 1
captures per-batch frozen-stage outputs, sets 2+ run without a dataset
pass. Pinned here: exact score equality cache-on vs cache-off for
base-soft (greedy + beam) and NIC, the encoder-mismatch guard (falls back
rather than reusing invalid features), and the memory-bound fallback.
"""

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

from depth_image_captioning_pub_tpu.config import ConfigEval
from depth_image_captioning_pub_tpu.data.coco import CocoCaptions
from depth_image_captioning_pub_tpu.data.vocab import (
    build_vocab, captions_from_coco_json)
from depth_image_captioning_pub_tpu.engine.evaluate import evaluate
from depth_image_captioning_pub_tpu.models.captioner import build_captioner

TINY = (1, 1, 1, 1)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from depth_image_captioning_pub_tpu.data.synthetic import (
        make_synthetic_coco)
    out = tmp_path_factory.mktemp("cocosetcache")
    img_dir, ann_file = make_synthetic_coco(str(out), num_images=6,
                                            image_hw=(64, 64), seed=13)
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


def _run(kind, env, loader, cache, beam_size=1, use_pallas=False):
    ds, w2i, i2w, cfg = env
    cap = build_captioner(kind, len(w2i), cfg, encoder_dtype=jnp.float32,
                          resnet_layers=TINY)
    return evaluate(kind, "coco", cap, checkpoint_loader=loader,
                    dataset=ds, word_to_id=w2i, id_to_word=i2w, cfg=cfg,
                    num_sets=2, beam_size=beam_size, use_pallas=use_pallas,
                    depth_eval_cache=cache, quiet=True)


@pytest.mark.parametrize("kind", ["base-soft", "nic"])
@pytest.mark.parametrize("beam_size", [1, 2])
def test_cached_scores_equal_uncached(env, kind, beam_size):
    cap, params, frozen, stats = _build(kind, env)
    loader = lambda i: (frozen["encoder"], params, stats)  # noqa: E731
    cached = _run(kind, env, loader, True, beam_size)
    plain = _run(kind, env, loader, False, beam_size)
    assert cached == plain  # exact, every metric, both sets


def test_per_set_params_still_differ(env):
    """The cache must replay only FROZEN stages: two sets with different
    trainable decoder params must still score differently (set 2's decoder
    runs for real against the cached features)."""
    cap, params1, frozen, stats = _build("base-soft", env, seed=0)
    _, params2, _, _ = _build("base-soft", env, seed=7)

    def loader(i):
        return (frozen["encoder"], params1 if i == 1 else params2, stats)

    cached = _run("base-soft", env, loader, True)
    plain = _run("base-soft", env, loader, False)
    assert cached == plain
    # sanity: the two decoders genuinely produce different set scores
    assert any(cached[k][0] != cached[k][1] for k in cached)


def test_encoder_mismatch_falls_back(env, capsys):
    """Different frozen-encoder params on set 2: features from set 1 are
    invalid, so the guard must skip the cache — scores still equal the
    uncached run exactly."""
    cap, params, frozen1, stats = _build("base-soft", env, seed=0)
    _, _, frozen2, _ = _build("base-soft", env, seed=7)

    def loader(i):
        return ((frozen1 if i == 1 else frozen2)["encoder"], params, stats)

    ds, w2i, i2w, cfg = env
    cached = evaluate("base-soft", "coco", cap, checkpoint_loader=loader,
                      dataset=ds, word_to_id=w2i, id_to_word=i2w, cfg=cfg,
                      num_sets=2, depth_eval_cache=True, quiet=False)
    out = capsys.readouterr().out
    assert "encoder params differ" in out
    plain = _run("base-soft", env, loader, False)
    assert cached == plain


def test_memory_bound_falls_back(env, monkeypatch, capsys):
    """A zero cache budget degrades to no feature caching, with a note;
    results stay exact."""
    monkeypatch.setenv("DCAP_EVAL_CACHE_GB", "0")
    cap, params, frozen, stats = _build("base-soft", env)
    loader = lambda i: (frozen["encoder"], params, stats)  # noqa: E731
    ds, w2i, i2w, cfg = env
    cached = evaluate("base-soft", "coco", cap, checkpoint_loader=loader,
                      dataset=ds, word_to_id=w2i, id_to_word=i2w, cfg=cfg,
                      num_sets=2, depth_eval_cache=True, quiet=False)
    assert "eval set cache would need" in capsys.readouterr().out
    plain = _run("base-soft", env, loader, False)
    assert cached == plain


def test_depth_mismatch_keeps_depth_cache(env, capsys):
    """Depth model + per-set encoder mismatch: the frozen-feature cache is
    skipped but the shared-DPT depth maps still replay from set 1's
    entries; scores equal the uncached run exactly."""
    from depth_image_captioning_pub_tpu import cli
    os.environ["DCAP_TINY_DPT"] = "1"
    try:
        ds, w2i, i2w, cfg = env
        cap = build_captioner("depth-soft", len(w2i), cfg,
                              encoder_dtype=jnp.float32, resnet_layers=TINY)
        params, frozen1, stats = cap.init(jax.random.PRNGKey(0),
                                          image_hw=(64, 64))
        _, frozen2, _ = cap.init(jax.random.PRNGKey(7), image_hw=(64, 64))
        depth_fn, dpt_vars = cli.make_depth_fn(cfg, dtype=jnp.float32)

        def loader(i):
            return ((frozen1 if i == 1 else frozen2)["encoder"], params,
                    stats)

        def run(cache):
            return evaluate("depth-soft", "coco", cap,
                            checkpoint_loader=loader, dataset=ds,
                            word_to_id=w2i, id_to_word=i2w, cfg=cfg,
                            depth_fn=depth_fn, dpt_variables=dpt_vars,
                            num_sets=2, depth_eval_cache=cache, quiet=False)

        cached = run(True)
        assert "encoder params differ" in capsys.readouterr().out
        plain = run(False)
        assert cached == plain
    finally:
        os.environ.pop("DCAP_TINY_DPT", None)


def test_cli_no_eval_cache_flag(monkeypatch):
    import base_evaluation
    seen = {}
    monkeypatch.setattr(base_evaluation, "score_mode",
                        lambda *a, **kw: seen.update(kw) or 0)
    assert base_evaluation.main(["soft", "score", "coco",
                                 "--no-eval-cache"]) == 0
    assert seen["depth_eval_cache"] is False
    assert base_evaluation.main(["soft", "score", "coco"]) == 0
    assert seen["depth_eval_cache"] is True


@pytest.mark.parametrize("kind", ["base-soft", "nic"])
def test_cached_sets_replay_under_pallas(env, kind):
    """Eval set cache x --pallas-decode (the r4-measured 1.7x cached-set
    composition): sets 2+ replay frozen features into the whole-sequence
    KERNEL program — scores equal the cache-off pallas run exactly (CPU
    interpret mode is bit-equal to the XLA scan)."""
    cap, params, frozen, stats = _build(kind, env)
    loader = lambda i: (frozen["encoder"], params, stats)  # noqa: E731
    cached = _run(kind, env, loader, True, use_pallas=True)
    plain = _run(kind, env, loader, False, use_pallas=True)
    assert cached == plain
