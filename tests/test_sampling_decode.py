"""Stochastic decoding (ops/decode.filtered_logits +
AttentionDecoder.stochastic_sample): filter correctness, greedy limits,
determinism per key. New capability — the reference decodes greedy-only
(reference: base_caption_models.py:206-250)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from depth_image_captioning_pub_tpu.config import ConfigTrain
from depth_image_captioning_pub_tpu.models.captioner import build_captioner
from depth_image_captioning_pub_tpu.ops.decode import filtered_logits


def test_filtered_logits_top_k():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    out = np.asarray(filtered_logits(logits, top_k=2))
    assert np.isfinite(out[0, [1, 4]]).all()          # top-2: 5.0, 4.0
    assert np.isneginf(out[0, [0, 2, 3]]).all()


def test_filtered_logits_top_p():
    # probs ~ [0.643, 0.237, 0.087, 0.032] for logits [3,2,1,0]
    logits = jnp.asarray([[3.0, 2.0, 1.0, 0.0]])
    out = np.asarray(filtered_logits(logits, top_p=0.7))
    # exclusive-prefix < 0.7 keeps ranks with cum_excl 0 and 0.643
    assert np.isfinite(out[0, [0, 1]]).all()
    assert np.isneginf(out[0, [2, 3]]).all()
    out_all = np.asarray(filtered_logits(logits, top_p=1.0))
    assert np.isfinite(out_all).all()


def test_filtered_logits_temperature_and_sampling_mask():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 2, (4, 32)), jnp.float32)
    filt = filtered_logits(logits, temperature=0.8, top_k=3)
    keys = jax.random.split(jax.random.PRNGKey(1), 64)
    draws = np.stack([np.asarray(jax.random.categorical(k, filt))
                      for k in keys])
    allowed = np.asarray(jnp.isfinite(filt))
    for b in range(4):
        assert allowed[b].sum() == 3
        assert set(np.unique(draws[:, b])) <= set(np.where(allowed[b])[0])


@pytest.fixture(scope="module")
def tiny_decoder_setup():
    cfg = ConfigTrain()
    cfg.max_caption_len = 10
    cap = build_captioner("base-soft", 24, cfg, encoder_dtype=jnp.float32,
                          resnet_layers=(1, 1, 1, 1))
    params, frozen, stats = cap.init(jax.random.PRNGKey(0),
                                     image_hw=(64, 64))
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.random((4, 64, 64, 3), dtype=np.float32))
    from depth_image_captioning_pub_tpu.ops.image_ops import (
        imagenet_normalize, to_unit_float)
    feats = cap.encoder_apply()(frozen["encoder"],
                                imagenet_normalize(to_unit_float(imgs)))
    return cap, params, feats


def _decoder_bound(cap, params):
    import flax.linen as nn  # noqa: F401
    dec = cap.decoder

    def call(method, *args, **kw):
        return dec.apply({"params": params["decoder"]}, *args, **kw,
                         method=getattr(dec, method))
    return call


def test_temperature_zero_equals_greedy(tiny_decoder_setup):
    cap, params, feats = tiny_decoder_setup
    call = _decoder_bound(cap, params)
    greedy, _ = call("greedy_sample", feats, 0, max_length=8)
    sampled, _ = call("stochastic_sample", feats, 0, jax.random.PRNGKey(3),
                      max_length=8, temperature=1e-7)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(sampled))
    topk1, _ = call("stochastic_sample", feats, 0, jax.random.PRNGKey(4),
                    max_length=8, top_k=1)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(topk1))


def test_sampling_deterministic_per_key(tiny_decoder_setup):
    cap, params, feats = tiny_decoder_setup
    call = _decoder_bound(cap, params)
    a1, _ = call("stochastic_sample", feats, 0, jax.random.PRNGKey(5),
                 max_length=8, temperature=1.5)
    a2, _ = call("stochastic_sample", feats, 0, jax.random.PRNGKey(5),
                 max_length=8, temperature=1.5)
    b, _ = call("stochastic_sample", feats, 0, jax.random.PRNGKey(6),
                max_length=8, temperature=1.5)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.array_equal(np.asarray(a1), np.asarray(b)), \
        "different keys produced identical samples (suspicious)"


def test_nic_stochastic_sample():
    """NICDecoder.stochastic_sample: top_k=1 == greedy; deterministic per
    key; fresh keys draw differently at high temperature."""
    from depth_image_captioning_pub_tpu.models.nic import NICDecoder

    dec = NICDecoder(vocab_size=24, dim_embedding=16, dim_hidden=12)
    feats = jnp.asarray(np.random.default_rng(0).normal(0, 1, (4, 16)),
                        jnp.float32)
    params = dec.init(jax.random.PRNGKey(0), feats,
                      jnp.zeros((4, 5), jnp.int32))["params"]

    def call(method, *args, **kw):
        return dec.apply({"params": params}, *args, **kw,
                         method=getattr(NICDecoder, method))

    greedy = np.asarray(call("greedy_sample", feats, max_length=8))
    topk1 = np.asarray(call("stochastic_sample", feats,
                            jax.random.PRNGKey(3), max_length=8, top_k=1))
    np.testing.assert_array_equal(greedy, topk1)

    a1 = np.asarray(call("stochastic_sample", feats, jax.random.PRNGKey(5),
                         max_length=8, temperature=2.0))
    a2 = np.asarray(call("stochastic_sample", feats, jax.random.PRNGKey(5),
                         max_length=8, temperature=2.0))
    b = np.asarray(call("stochastic_sample", feats, jax.random.PRNGKey(6),
                        max_length=8, temperature=2.0))
    np.testing.assert_array_equal(a1, a2)
    assert not np.array_equal(a1, b)


def test_nic_sampling_through_caption_fn():
    """make_caption_fn(sampling=...) supports NIC: top_k=1 tokens equal
    the greedy caption fn's tokens end to end."""
    from depth_image_captioning_pub_tpu.engine.evaluate import make_caption_fn

    cfg = ConfigTrain()
    cap = build_captioner("nic", 24, cfg, encoder_dtype=jnp.float32,
                          resnet_layers=(1, 1, 1, 1))
    params, frozen, stats = cap.init(jax.random.PRNGKey(0),
                                     image_hw=(64, 64))
    imgs = jnp.asarray(np.random.default_rng(2).random((3, 64, 64, 3),
                                                       dtype=np.float32))
    key = jax.random.PRNGKey(7)
    greedy_fn = make_caption_fn(cap, start_id=20, max_length=8)
    samp_fn = make_caption_fn(cap, start_id=20, max_length=8,
                              sampling={"top_k": 1})
    np.testing.assert_array_equal(
        np.asarray(greedy_fn(frozen, params, stats, imgs, key)),
        np.asarray(samp_fn(frozen, params, stats, imgs, key)))
