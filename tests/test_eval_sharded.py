"""Data-parallel eval: sharded generate_captions == single-device captions.

The eval engine now mirrors the train engine (engine/train.py builds its
mesh unconditionally): evaluate() shards the batch dim over every visible
device with replicated params. Per-image computation is independent, so the
sharded program must produce identical captions; this pins it on the
8-virtual-device CPU mesh, including the pad-to-device-divisible path
(batch 4 -> pad 8) and a batch size that does not divide the device count.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


# 8-virtual-device collective tests: their XLA rendezvous SIGABRTs when
# starved >~40 s on a contended 1-core host (STATUS.md) — run this chunk
# solo: `pytest -m multidevice`; everything else: `pytest -m 'not
# multidevice'` (README Testing section).
pytestmark = pytest.mark.multidevice
from depth_image_captioning_pub_tpu.config import ConfigEval
from depth_image_captioning_pub_tpu.data.coco import CocoCaptions
from depth_image_captioning_pub_tpu.data.tokenizer import SPECIAL
from depth_image_captioning_pub_tpu.data.vocab import (
    build_vocab, captions_from_coco_json)
from depth_image_captioning_pub_tpu.engine.evaluate import (
    evaluate, generate_captions, make_caption_fn)
from depth_image_captioning_pub_tpu.models.captioner import build_captioner
from depth_image_captioning_pub_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicate)

TINY = (1, 1, 1, 1)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from depth_image_captioning_pub_tpu.data.synthetic import make_synthetic_coco
    out = tmp_path_factory.mktemp("cocoshard")
    img_dir, ann_file = make_synthetic_coco(str(out), num_images=6,
                                            image_hw=(64, 64), seed=3)
    caps = captions_from_coco_json(ann_file)
    w2i, i2w = build_vocab(caps, [], min_count=1)
    ds = CocoCaptions(img_dir, ann_file, image_size=(64, 64))

    cfg = ConfigEval()
    cfg.batch_size = 4
    cfg.max_length = 8  # evaluate() builds its caption fn from cfg; keep it
    # in lockstep with the fixture's fn so score comparisons line up
    cap = build_captioner("base-soft", len(w2i), cfg,
                          encoder_dtype=jnp.float32, resnet_layers=TINY)
    params, frozen, stats = cap.init(jax.random.PRNGKey(0),
                                     image_hw=(64, 64))
    fn = make_caption_fn(cap, w2i[SPECIAL.start], max_length=8)
    return ds, w2i, i2w, cfg, cap, fn, params, frozen, stats


@pytest.mark.parametrize("batch_size", [4, 3])  # 3 does not divide 8
def test_sharded_generate_matches_single(env, batch_size):
    ds, w2i, i2w, _, _, fn, params, frozen, stats = env
    single, refs_s = generate_captions(fn, frozen, params, stats, ds,
                                       w2i, i2w, batch_size=batch_size)

    mesh = make_mesh()
    sharded, refs_m = generate_captions(
        fn, replicate(mesh, frozen), replicate(mesh, params),
        replicate(mesh, stats), ds, w2i, i2w, batch_size=batch_size,
        sharding=batch_sharding(mesh))
    assert sharded == single
    assert refs_m == refs_s


def test_evaluate_auto_shards(env, tmp_path):
    """evaluate() turns sharding on by itself when >1 device is visible and
    still produces the same scores as an explicit single-device run."""
    ds, w2i, i2w, cfg, cap, fn, params, frozen, stats = env
    assert jax.device_count() > 1  # conftest forces the 8-device mesh

    auto = evaluate("base-soft", "coco", cap,
                    checkpoint_loader=lambda i: (frozen["encoder"], params,
                                                 stats),
                    dataset=ds, word_to_id=w2i, id_to_word=i2w, cfg=cfg,
                    num_sets=1, quiet=True)

    hypos, refs = generate_captions(fn, frozen, params, stats, ds, w2i, i2w,
                                    batch_size=cfg.batch_size,
                                    rng=jax.random.PRNGKey(1),
                                    max_length=cfg.max_length)
    from depth_image_captioning_pub_tpu.metrics import load_textfiles, score
    ref, hypo = load_textfiles(refs, hypos)
    expect = score(ref, hypo)
    for k, v in expect.items():
        assert auto[k][0] == pytest.approx(v, abs=1e-12)
