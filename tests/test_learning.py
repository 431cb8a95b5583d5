"""Learning-dynamics tests: the train step actually learns (overfit a tiny
fixed batch), and the cached depth provider feeds training correctly."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

# Heavy CLI / engine end-to-end tests (subprocess compiles): the third
# suite chunk on slow rigs — `pytest -m e2e` (README Testing section).
pytestmark = pytest.mark.e2e

from depth_image_captioning_pub_tpu.config import ConfigTrain
from depth_image_captioning_pub_tpu.engine.steps import (
    TrainState, make_attention_train_step, make_nic_train_step,
    make_optimizer)
from depth_image_captioning_pub_tpu.models.captioner import build_captioner

TINY = (1, 1, 1, 1)


def _fixed_batch(rng, vocab, cap_len=8, bsz=4, hw=(64, 64), depth=False):
    batch = {
        "images": jnp.asarray(rng.random((bsz, *hw, 3), dtype=np.float32)),
        "captions": jnp.asarray(
            rng.integers(0, vocab, (bsz, cap_len)).astype(np.int32)),
        "lengths": jnp.full((bsz,), cap_len, jnp.int32),
        "pad_mask": jnp.ones((bsz,), bool),
    }
    if depth:
        batch["depth"] = jnp.asarray(
            rng.random((bsz, 224, 224, 1), dtype=np.float32))
    return batch


@pytest.mark.parametrize("kind", ["base-soft", "depth-soft"])
def test_overfits_fixed_batch(kind, rng):
    """50 steps on one fixed batch must cut CE massively — catches wrong
    targets, masking bugs, dead gradients, optimizer miswiring."""
    cfg = ConfigTrain()
    cfg.max_caption_len = 8
    vocab = 24
    cap = build_captioner(kind, vocab, cfg, encoder_dtype=jnp.float32,
                          resnet_layers=TINY)
    params, frozen, stats = cap.init(jax.random.PRNGKey(0), image_hw=(64, 64))
    opt = make_optimizer(1e-2)
    step = make_attention_train_step(
        cap.encoder_apply(), cap.decoder_apply(), opt, alpha_reg=0.0,
        depth_encoder_apply=cap.depth_encoder_apply(), donate=False)
    state = TrainState(params, opt.init(params), frozen, stats, jnp.int32(0))
    batch = _fixed_batch(rng, vocab, depth=cap.spec.uses_depth)
    first = None
    for i in range(50):
        state, metrics = step(state, batch, jax.random.PRNGKey(0),
                              jnp.float32(1.0))
        if first is None:
            first = float(metrics["ce"])
    last = float(metrics["ce"])
    assert last < first * 0.3, (first, last)


def test_nic_overfits_fixed_batch(rng):
    cfg = ConfigTrain()
    cfg.max_caption_len = 8
    vocab = 24
    cap = build_captioner("nic", vocab, cfg, encoder_dtype=jnp.float32,
                          resnet_layers=TINY)
    params, frozen, stats = cap.init(jax.random.PRNGKey(0), image_hw=(64, 64))
    opt = make_optimizer(1e-2)
    step = make_nic_train_step(cap.encoder_apply(), cap.decoder_apply(),
                               opt, donate=False)
    state = TrainState(params, opt.init(params), frozen, stats, jnp.int32(0))
    batch = _fixed_batch(rng, vocab)
    first = None
    for i in range(50):
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        if first is None:
            first = float(metrics["ce"])
    last = float(metrics["ce"])
    assert last < first * 0.3, (first, last)


def test_depth_cache_build_and_provider(tmp_path, synthetic_coco):
    """Cache a tiny dataset's depth maps, then train one epoch from the
    cache (the index-keyed provider path depth_main uses by default)."""
    from depth_image_captioning_pub_tpu.data.coco import CocoCaptions
    from depth_image_captioning_pub_tpu.data.vocab import (
        build_vocab, captions_from_coco_json)
    from depth_image_captioning_pub_tpu.engine.depth_cache import (
        DepthMapCache, cached_depth_provider, online_depth_provider)
    from depth_image_captioning_pub_tpu.engine.train import train
    from depth_image_captioning_pub_tpu.models.dpt import (
        DPTDepthEstimator, DPTDepthModel)

    img_dir, ann_file = synthetic_coco
    w2i, _ = build_vocab(captions_from_coco_json(ann_file), [], min_count=1)
    ds = CocoCaptions(img_dir, ann_file, image_size=(64, 64))

    est = DPTDepthEstimator(dtype=jnp.float32)
    est.model = DPTDepthModel(vit_blocks=2, hooks=(0, 1),
                              resnet_layers=(1, 1, 1), vit_dim=64,
                              vit_heads=4, features=32, dtype=jnp.float32)
    est.image_size = 64
    variables = est.init(jax.random.PRNGKey(0), tiny=True)
    depth_fn = est.depth_fn()

    cache = DepthMapCache(str(tmp_path / "depth.npy"), len(ds))
    assert not cache.exists()
    cache.build(ds, depth_fn, variables, batch_size=4, quiet=True)
    assert cache.exists()
    mm = cache.open()
    assert mm.shape == (len(ds), 224, 224, 1)
    assert np.isfinite(np.asarray(mm[0], dtype=np.float32)).all()

    cfg = ConfigTrain()
    cfg.batch_size = 4
    cfg.max_caption_len = 10
    cfg.save_directory_Cdep_soft = str(tmp_path / "exp/CNN_depth_soft")
    summary = train("depth-soft", 0, cfg=cfg, datasets=(ds, ds),
                    word_to_id=w2i, num_epochs=1, quiet=True,
                    resnet_layers=TINY,
                    depth_provider=cached_depth_provider(cache),
                    val_depth_provider=online_depth_provider(depth_fn,
                                                             variables))
    assert np.isfinite(summary["best_val_loss"])
