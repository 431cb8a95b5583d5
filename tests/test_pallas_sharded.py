"""Multi-chip Pallas decode: the whole-sequence kernels under shard_map.

pallas_call does not partition under GSPMD, so the mesh-wide eval path
threads ``pallas_mesh`` down to the kernels, which then run one launch per
device on its batch shard (ops/pallas/decode_seq.shard_over_batch — no
collectives; per-image decode is independent). On the 8-virtual-device CPU
mesh the kernels run in interpret mode, so sharded must be BIT-identical
to single-device. Exercises both padding layers: the global batch padded
to a device-divisible size and each shard padded to the 8-row Mosaic
granule (batch 10 -> global 16, per-shard 2 -> kernel 8).
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
from depth_image_captioning_pub_tpu.models.decoder import AttentionDecoder
from depth_image_captioning_pub_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicate)

B = 10  # not divisible by 8 devices, per-shard not a multiple of 8


@pytest.fixture(scope="module")
def decoder():
    dec = AttentionDecoder(vocab_size=40, dim_attention=8, dim_embedding=8,
                           dim_encoder=16, dim_decoder=12,
                           dtype=jnp.float32)
    feats = jnp.asarray(np.random.default_rng(7).standard_normal(
        (B, 49, 16)).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), feats,
                      jnp.zeros((B, 5), jnp.int32), train=False,
                      rng=jax.random.PRNGKey(1))["params"]
    return dec, params, feats


def test_sharded_greedy_kernel_matches_single(decoder):
    dec, params, feats = decoder
    mesh = make_mesh()
    assert mesh.size > 1
    ref, _ = dec.apply({"params": params}, feats, 2, max_length=9,
                       use_pallas=True, method=dec.greedy_sample)
    got, _ = dec.apply({"params": params}, feats, 2, max_length=9,
                       use_pallas=True, pallas_mesh=mesh,
                       method=dec.greedy_sample)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_sharded_beam_kernel_matches_single(decoder):
    dec, params, feats = decoder
    mesh = make_mesh()
    ref_t, ref_s = dec.apply({"params": params}, feats, 2, 3, None,
                             beam_size=3, max_length=9, use_pallas=True,
                             method=dec.beam_sample)
    got_t, got_s = dec.apply({"params": params}, feats, 2, 3, None,
                             beam_size=3, max_length=9, use_pallas=True,
                             pallas_mesh=mesh, method=dec.beam_sample)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(ref_t))
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(ref_s))


def test_evaluate_auto_shards_with_pallas(tmp_path):
    """evaluate(use_pallas=True) on a multi-device host builds the
    pallas_mesh itself and scores identically to the XLA path (interpret
    mode is bit-equal to the XLA scan, so the whole auto-sharded pallas
    route must reproduce the plain evaluate() scores exactly)."""
    from depth_image_captioning_pub_tpu.config import ConfigEval
    from depth_image_captioning_pub_tpu.data.coco import CocoCaptions
    from depth_image_captioning_pub_tpu.data.synthetic import (
        make_synthetic_coco)
    from depth_image_captioning_pub_tpu.data.vocab import (
        build_vocab, captions_from_coco_json)
    from depth_image_captioning_pub_tpu.engine.evaluate import evaluate
    from depth_image_captioning_pub_tpu.models.captioner import (
        build_captioner)

    img_dir, ann_file = make_synthetic_coco(str(tmp_path), num_images=6,
                                            image_hw=(64, 64), seed=3)
    w2i, i2w = build_vocab(captions_from_coco_json(ann_file), [],
                           min_count=1)
    ds = CocoCaptions(img_dir, ann_file, image_size=(64, 64))
    cfg = ConfigEval()
    cfg.batch_size = 4
    cfg.max_length = 8
    cap = build_captioner("base-soft", len(w2i), cfg,
                          encoder_dtype=jnp.float32,
                          resnet_layers=(1, 1, 1, 1))
    params, frozen, stats = cap.init(jax.random.PRNGKey(0),
                                     image_hw=(64, 64))
    loader = lambda i: (frozen["encoder"], params, stats)  # noqa: E731
    kw = dict(checkpoint_loader=loader, dataset=ds, word_to_id=w2i,
              id_to_word=i2w, cfg=cfg, num_sets=1, quiet=True)
    assert jax.device_count() > 1
    xla = evaluate("base-soft", "coco", cap, **kw)
    pal = evaluate("base-soft", "coco", cap, use_pallas=True, **kw)
    assert pal == xla
