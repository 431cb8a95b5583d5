"""End-to-end smoke: init -> one train step -> val step -> greedy decode,
for every model configuration (SURVEY.md §2.2), on tiny shapes.

Covers what the reference never tested: loss finiteness, parameter updates,
frozen-backbone invariance, and decode shape/dtype contracts.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from depth_image_captioning_pub_tpu.config import ConfigTrain
from depth_image_captioning_pub_tpu.engine.steps import (
    TrainState, make_attention_eval_step, make_attention_train_step,
    make_nic_eval_step, make_nic_train_step, make_optimizer)
from depth_image_captioning_pub_tpu.models.captioner import build_captioner

VOCAB = 20
IMG_HW = (64, 64)
CAP_LEN = 10
BATCH = 2


def _cfg():
    cfg = ConfigTrain()
    cfg.max_caption_len = CAP_LEN
    return cfg


def _batch(uses_depth: bool, rng):
    batch = {
        "images": jnp.asarray(rng.random((BATCH, *IMG_HW, 3), dtype=np.float32)),
        "captions": jnp.asarray(
            rng.integers(0, VOCAB, (BATCH, CAP_LEN)).astype(np.int32)),
        "lengths": jnp.asarray(np.array([CAP_LEN, CAP_LEN - 3], np.int32)),
        "pad_mask": jnp.ones((BATCH,), bool),
    }
    if uses_depth:
        batch["depth"] = jnp.asarray(
            rng.random((BATCH, 224, 224, 1), dtype=np.float32))
    return batch


TINY_RESNET = (1, 1, 1, 1)


@pytest.mark.parametrize("kind", ["base-soft", "base-hard", "depth-soft",
                                  "mdepth-soft"])
def test_attention_train_and_decode(kind, rng):
    cap = build_captioner(kind, VOCAB, _cfg(), encoder_dtype=jnp.float32,
                          resnet_layers=TINY_RESNET)
    params, frozen, stats = cap.init(jax.random.PRNGKey(0), image_hw=IMG_HW)
    opt = make_optimizer(1e-3)
    step = make_attention_train_step(
        cap.encoder_apply(), cap.decoder_apply(), opt,
        alpha_reg=0.7 if "soft" in kind else 0.0,
        depth_encoder_apply=cap.depth_encoder_apply(), donate=False)
    state = TrainState(params, opt.init(params), frozen, stats,
                       jnp.int32(0))
    batch = _batch(cap.spec.uses_depth, rng)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1),
                              jnp.float32(1.0))
    assert np.isfinite(float(metrics["loss"]))
    # decoder params moved, frozen encoder untouched
    d0 = jax.tree_util.tree_leaves(state.params["decoder"])[0]
    d1 = jax.tree_util.tree_leaves(new_state.params["decoder"])[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    f0 = jax.tree_util.tree_leaves(state.frozen)[0]
    f1 = jax.tree_util.tree_leaves(new_state.frozen)[0]
    assert np.array_equal(np.asarray(f0), np.asarray(f1))

    # val step
    eval_step = make_attention_eval_step(
        cap.encoder_apply(), cap.decoder_apply(),
        alpha_reg=0.7 if "soft" in kind else 0.0,
        depth_encoder_apply=cap.depth_encoder_apply(),
        hard_eval_sampling=("hard" in kind))
    vm = eval_step(new_state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(vm["loss"]))

    # greedy decode
    images = batch["images"]
    feats = cap.encoder_apply()(frozen["encoder"], images)
    dep = None
    if cap.spec.uses_depth:
        dep, _ = cap.depth_encoder_apply()(
            new_state.params["depth_encoder"], new_state.batch_stats,
            batch["depth"], train=False)
    tokens, alphas = cap.sample_apply()(
        new_state.params["decoder"], feats, 0, dep, max_length=7,
        rng=jax.random.PRNGKey(3))
    assert tokens.shape == (BATCH, 7) and tokens.dtype == jnp.int32
    assert alphas.shape == (BATCH, 7, 196)
    assert np.all(np.asarray(tokens) >= 0) and np.all(np.asarray(tokens) < VOCAB)


def test_nic_train_and_decode(rng):
    cap = build_captioner("nic", VOCAB, _cfg(), encoder_dtype=jnp.float32,
                          resnet_layers=TINY_RESNET)
    params, frozen, stats = cap.init(jax.random.PRNGKey(0), image_hw=IMG_HW)
    opt = make_optimizer(1e-3)
    step = make_nic_train_step(cap.encoder_apply(), cap.decoder_apply(), opt,
                               donate=False)
    state = TrainState(params, opt.init(params), frozen, stats, jnp.int32(0))
    batch = _batch(False, rng)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # both the decoder and the encoder projection train (nic.py:243-245)
    for key in ("decoder", "enc_linear"):
        a = jax.tree_util.tree_leaves(state.params[key])[0]
        b = jax.tree_util.tree_leaves(new_state.params[key])[0]
        assert not np.allclose(np.asarray(a), np.asarray(b)), key

    vm = make_nic_eval_step(cap.encoder_apply(), cap.decoder_apply())(
        new_state, batch)
    assert np.isfinite(float(vm["loss"]))

    feats = cap.encoder_apply()(frozen["encoder"],
                                new_state.params["enc_linear"],
                                batch["images"])
    tokens = cap.sample_apply()(new_state.params["decoder"], feats,
                                max_length=7)
    assert tokens.shape == (BATCH, 7)


def test_masked_loss_matches_packed_semantics(rng):
    """Masked CE == torch packed CE with ignore_index (base_train.py:156-160)."""
    torch = pytest.importorskip("torch")
    from depth_image_captioning_pub_tpu.engine.losses import (
        masked_cross_entropy, token_mask)
    B, T, V = 3, 6, 11
    null_id = V - 1
    logits = rng.standard_normal((B, T - 1, V)).astype(np.float32)
    lengths = np.array([6, 4, 2], np.int64)
    caps = rng.integers(0, V - 1, (B, T)).astype(np.int64)
    for i, L in enumerate(lengths):
        caps[i, L:] = null_id
    # torch packed form
    from torch.nn.utils.rnn import pack_padded_sequence
    tl = torch.from_numpy(logits)
    tt = torch.from_numpy(caps[:, 1:])
    dec_lengths = [int(l) - 1 for l in lengths]
    pl_ = pack_padded_sequence(tl, dec_lengths, batch_first=True)
    pt = pack_padded_sequence(tt, dec_lengths, batch_first=True)
    expected = torch.nn.functional.cross_entropy(
        pl_.data, pt.data, ignore_index=null_id).item()
    mask = token_mask(jnp.asarray(lengths.astype(np.int32)), T - 1)
    got = float(masked_cross_entropy(jnp.asarray(logits),
                                     jnp.asarray(caps[:, 1:]), mask))
    assert abs(got - expected) < 1e-5
