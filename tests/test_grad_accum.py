"""Gradient accumulation (engine/steps.py accum_steps): k microbatches
accumulated inside one jitted step must equal the one-shot batch gradient
EXACTLY — each microbatch loss is normalized by full-batch denominators,
so ragged lengths and tail padding (which the framework itself creates
via pad_batch_to_devices) change nothing. BN stats advance sequentially.
New capability — the reference trains at a fixed batch 30 with no
accumulation (reference: base_train.py:144-167).
"""

import numpy as np
import optax
import pytest
import jax
import jax.numpy as jnp

from depth_image_captioning_pub_tpu.config import ConfigTrain
from depth_image_captioning_pub_tpu.engine.steps import (
    TrainState, make_attention_train_step, make_nic_train_step)
from depth_image_captioning_pub_tpu.models.captioner import build_captioner


def _setup(kind, rng, vocab=24, batch=8, cap_len=8):
    cfg = ConfigTrain()
    cfg.max_caption_len = cap_len
    cfg.dropout = 0.0          # rng-free decoder: accum vs one-shot is
    cfg.nic_dropout = 0.0      # then mathematically exact, not stochastic
    cap = build_captioner(kind, vocab, cfg, encoder_dtype=jnp.float32,
                          resnet_layers=(1, 1, 1, 1))
    params, frozen, stats = cap.init(jax.random.PRNGKey(0),
                                     image_hw=(64, 64))
    batch_np = {
        "images": rng.random((batch, 64, 64, 3), dtype=np.float32),
        "captions": rng.integers(0, vocab, (batch, cap_len)).astype(np.int32),
        "lengths": np.full((batch,), cap_len, np.int32),
        "pad_mask": np.ones((batch,), bool),
    }
    if cap.spec.uses_depth:
        batch_np["depth"] = rng.random((batch, 224, 224, 1),
                                       dtype=np.float32)
    dev_batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
    return cap, cfg, params, frozen, stats, dev_batch


def test_accum_equals_one_shot_base_soft(rng):
    # SGD(1.0) so updated params ARE params - grads: compares the gradients
    # themselves without AdamW's rsqrt amplifying ulp noise.
    cap, cfg, params, frozen, stats, batch = _setup("base-soft", rng)
    opt = optax.sgd(1.0)

    def run(accum):
        step = make_attention_train_step(
            cap.encoder_apply(), cap.decoder_apply(), opt, alpha_reg=0.7,
            donate=False, accum_steps=accum)
        state = TrainState(params, opt.init(params), frozen, stats,
                           jnp.int32(0))
        return step(state, batch, jax.random.PRNGKey(7), jnp.float32(1.0))

    s1, m1 = run(1)
    s4, m4 = run(4)
    assert float(m1["loss"]) == pytest.approx(float(m4["loss"]), rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_accum_exact_with_ragged_lengths_and_pad_rows(rng):
    """The hard case: ragged lengths AND trailing all-pad rows (pad_mask
    False) — a naive mean-of-microbatch-losses would dilute the gradient
    when pad rows fill whole microbatches; the global-denominator form is
    exact regardless of how rows land in microbatches."""
    cap, cfg, params, frozen, stats, batch = _setup("base-soft", rng)
    batch = dict(batch,
                 lengths=jnp.asarray([8, 5, 7, 6, 8, 8, 8, 8], jnp.int32),
                 pad_mask=jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0], bool))
    opt = optax.sgd(1.0)

    def run(accum):
        step = make_attention_train_step(
            cap.encoder_apply(), cap.decoder_apply(), opt, alpha_reg=0.7,
            donate=False, accum_steps=accum)
        state = TrainState(params, opt.init(params), frozen, stats,
                           jnp.int32(0))
        return step(state, batch, jax.random.PRNGKey(7), jnp.float32(1.0))

    s1, m1 = run(1)
    s4, m4 = run(4)
    assert float(m1["loss"]) == pytest.approx(float(m4["loss"]), rel=1e-6)
    assert float(m1["ce"]) == pytest.approx(float(m4["ce"]), rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_accum_depth_soft_updates_bn_stats_sequentially(rng):
    cap, cfg, params, frozen, stats, batch = _setup("depth-soft", rng)
    opt = optax.sgd(1.0)
    step = make_attention_train_step(
        cap.encoder_apply(), cap.decoder_apply(), opt, alpha_reg=0.7,
        depth_encoder_apply=cap.depth_encoder_apply(), donate=False,
        accum_steps=2)
    state = TrainState(params, opt.init(params), frozen, stats, jnp.int32(0))
    s2, m2 = step(state, batch, jax.random.PRNGKey(7), jnp.float32(1.0))
    assert np.isfinite(float(m2["loss"]))
    before = jax.tree_util.tree_leaves(stats)
    after = jax.tree_util.tree_leaves(s2.batch_stats)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after)), "BN stats did not advance"


def test_accum_equals_one_shot_nic(rng):
    cap, cfg, params, frozen, stats, batch = _setup("nic", rng)
    opt = optax.sgd(1.0)

    def run(accum):
        step = make_nic_train_step(cap.encoder_apply(), cap.decoder_apply(),
                                   opt, donate=False, accum_steps=accum)
        state = TrainState(params, opt.init(params), frozen, stats,
                           jnp.int32(0))
        return step(state, batch, jax.random.PRNGKey(7))

    s1, m1 = run(1)
    s2, m2 = run(2)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_non_divisible_batch_raises(rng):
    cap, cfg, params, frozen, stats, batch = _setup("base-soft", rng,
                                                    batch=6)
    opt = optax.sgd(1.0)
    step = make_attention_train_step(
        cap.encoder_apply(), cap.decoder_apply(), opt, donate=False,
        accum_steps=4)
    state = TrainState(params, opt.init(params), frozen, stats, jnp.int32(0))
    with pytest.raises(ValueError, match="not divisible"):
        step(state, batch, jax.random.PRNGKey(0), jnp.float32(1.0))


def test_train_engine_threads_grad_accum(tmp_path):
    """train() with cfg.grad_accum=2 pads batches per microbatch split and
    completes an epoch (engine-level threading)."""
    import os
    from depth_image_captioning_pub_tpu.data.coco import CocoCaptions
    from depth_image_captioning_pub_tpu.data.synthetic import (
        make_synthetic_coco)
    from depth_image_captioning_pub_tpu.data.vocab import (
        build_vocab, captions_from_coco_json)
    from depth_image_captioning_pub_tpu.engine.train import train

    img_dir, ann_file = make_synthetic_coco(str(tmp_path), num_images=6,
                                            image_hw=(64, 64), seed=3)
    w2i, _ = build_vocab(captions_from_coco_json(ann_file), [], min_count=1)
    ds = CocoCaptions(img_dir, ann_file, image_size=(64, 64))
    cfg = ConfigTrain()
    cfg.batch_size = 4
    cfg.max_caption_len = 14
    cfg.grad_accum = 2
    cfg.save_directory_soft = os.path.join(str(tmp_path),
                                           "exp_result/base_soft")
    cfg.moving_avg = 10
    summary = train("base-soft", ext=0, use_data="coco", cfg=cfg,
                    datasets=(ds, ds), word_to_id=w2i, num_epochs=1,
                    quiet=True, resnet_layers=(1, 1, 1, 1))
    assert np.isfinite(summary["best_val_loss"])


def test_cli_parses_grad_accum():
    import base_main
    import depth_main
    rest, flags, cfg = base_main._parse_flags(
        ["soft", "coco", "--grad-accum", "3"])
    assert rest == ["soft", "coco"] and cfg.grad_accum == 3
    rest, flags, cfg = depth_main._parse_flags(
        ["soft", "cnn", "coco", "--grad-accum", "2"])
    assert rest == ["soft", "cnn", "coco"] and cfg.grad_accum == 2
