"""Exact depth-map cache across eval checkpoint sets.

The frozen DPT's depth maps depend only on the images, yet the reference
recomputes them for every checkpoint set (reference depth_evaluation.py:
154-158). evaluate() now captures set 1's maps as device arrays and feeds
them to a DPT-free compiled program for sets 2+. These tests pin that the
cache is EXACT: identical captions and scores with the cache on and off,
for greedy and beam decode, on the 8-virtual-device CPU mesh evaluate()
auto-shards over.
"""

import os
import sys

import jax
import jax.numpy as jnp
import pytest

# Compile-heavy single-device tests (pipeline caches / DPT twins /
# interpret-mode kernels): their own suite chunk on slow rigs --
# `pytest -m heavy` (README Testing section).
pytestmark = pytest.mark.heavy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from depth_image_captioning_pub_tpu.config import ConfigEval
from depth_image_captioning_pub_tpu.data.coco import CocoCaptions
from depth_image_captioning_pub_tpu.data.tokenizer import SPECIAL
from depth_image_captioning_pub_tpu.data.vocab import (
    build_vocab, captions_from_coco_json)
from depth_image_captioning_pub_tpu.engine.evaluate import (
    evaluate, generate_captions, make_caption_fn)
from depth_image_captioning_pub_tpu.models.captioner import build_captioner

TINY = (1, 1, 1, 1)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from depth_image_captioning_pub_tpu import cli
    from depth_image_captioning_pub_tpu.data.synthetic import (
        make_synthetic_coco)
    os.environ["DCAP_TINY_DPT"] = "1"
    try:
        out = tmp_path_factory.mktemp("cocodcache")
        img_dir, ann_file = make_synthetic_coco(str(out), num_images=6,
                                                image_hw=(64, 64), seed=11)
        caps = captions_from_coco_json(ann_file)
        w2i, i2w = build_vocab(caps, [], min_count=1)
        ds = CocoCaptions(img_dir, ann_file, image_size=(64, 64))

        cfg = ConfigEval()
        cfg.batch_size = 4  # 6 images -> 2 batches, the second padded
        cfg.max_length = 8
        cap = build_captioner("depth-soft", len(w2i), cfg,
                              encoder_dtype=jnp.float32, resnet_layers=TINY)
        params, frozen, stats = cap.init(jax.random.PRNGKey(0),
                                         image_hw=(64, 64))
        depth_fn, dpt_vars = cli.make_depth_fn(cfg, dtype=jnp.float32)
        yield ds, w2i, i2w, cfg, cap, params, frozen, stats, depth_fn, dpt_vars
    finally:
        os.environ.pop("DCAP_TINY_DPT", None)


def _run(env, beam_size, depth_eval_cache):
    ds, w2i, i2w, cfg, cap, params, frozen, stats, depth_fn, dpt_vars = env
    return evaluate(
        "depth-soft", "coco", cap,
        checkpoint_loader=lambda i: (frozen["encoder"], params, stats),
        dataset=ds, word_to_id=w2i, id_to_word=i2w, cfg=cfg,
        depth_fn=depth_fn, dpt_variables=dpt_vars, num_sets=2,
        beam_size=beam_size, depth_eval_cache=depth_eval_cache, quiet=True)


@pytest.mark.parametrize("beam_size", [1, 2])
def test_cached_scores_equal_uncached(env, beam_size):
    cached = _run(env, beam_size, True)
    plain = _run(env, beam_size, False)
    assert cached == plain  # exact equality, every metric, both sets


def test_fill_then_use_tokens_identical(env):
    """generate_captions level: the 'use' pass must reproduce the 'fill'
    pass's captions exactly, and the cache holds one entry per batch."""
    ds, w2i, i2w, cfg, cap, params, frozen, stats, depth_fn, dpt_vars = env
    fn = make_caption_fn(cap, w2i[SPECIAL.start], max_length=cfg.max_length,
                         depth_fn=depth_fn)
    full = dict(frozen, dpt=dpt_vars)
    cache = []
    filled, _ = generate_captions(fn, {"encoder": full["encoder"],
                                       "dpt": dpt_vars},
                                  params, stats, ds, w2i, i2w,
                                  batch_size=cfg.batch_size,
                                  max_length=cfg.max_length,
                                  depth_cache=cache,
                                  depth_cache_mode="fill")
    assert len(cache) == 2  # 6 images / batch 4
    used, _ = generate_captions(fn, {"encoder": full["encoder"]},
                                params, stats, ds, w2i, i2w,
                                batch_size=cfg.batch_size,
                                max_length=cfg.max_length,
                                depth_cache=cache,
                                depth_cache_mode="use")
    plain, _ = generate_captions(fn, full, params, stats, ds, w2i, i2w,
                                 batch_size=cfg.batch_size,
                                 max_length=cfg.max_length)
    assert used == filled == plain


def test_cli_flag_parses(env, tmp_path, monkeypatch):
    """--no-depth-eval-cache threads through depth_evaluation.main's parser
    (full CLI e2e for the cached default already rides tests/test_cli.py)."""
    import depth_evaluation
    seen = {}

    def fake_score(*a, **kw):
        seen.update(kw)
        return 0

    monkeypatch.setattr(depth_evaluation.base_cli, "score_mode", fake_score)
    monkeypatch.setattr(depth_evaluation, "make_depth_fn",
                        lambda cfg: (None, None))
    assert depth_evaluation.main(["soft", "score", "coco",
                                  "--no-depth-eval-cache"]) == 0
    assert seen["depth_eval_cache"] is False
    assert depth_evaluation.main(["soft", "score", "coco"]) == 0
    assert seen["depth_eval_cache"] is True
