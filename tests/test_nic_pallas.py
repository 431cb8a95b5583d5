"""Whole-sequence NIC Pallas kernel == the NICDecoder XLA greedy scan
(float32, interpreter mode on CPU — same contract as test_pallas_decode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from depth_image_captioning_pub_tpu.models.nic import NICDecoder
from depth_image_captioning_pub_tpu.ops.lstm import (
    LSTMCellParams, StackedLSTMParams)
from depth_image_captioning_pub_tpu.ops.pallas.nic_seq import (
    fused_nic_greedy_decode, pack_nic_weights)

B, E, H, V, T = 16, 24, 16, 40, 9


@pytest.fixture(scope="module")
def nic():
    dec = NICDecoder(vocab_size=V, dim_embedding=E, dim_hidden=H,
                     dtype=jnp.float32)
    feats = jnp.asarray(np.random.default_rng(3).standard_normal(
        (B, E)).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), feats,
                      jnp.zeros((B, 5), jnp.int32))["params"]
    return dec, params, feats


def _packed(params):
    layers = []
    li = 0
    while f"lstm{li}_w_ih" in params:
        layers.append(LSTMCellParams(params[f"lstm{li}_w_ih"],
                                     params[f"lstm{li}_w_hh"],
                                     params[f"lstm{li}_b_ih"],
                                     params[f"lstm{li}_b_hh"]))
        li += 1
    lstm = StackedLSTMParams(tuple(layers))
    return pack_nic_weights(lstm, params["out_w"], params["out_b"],
                            params["embed"])


def test_kernel_matches_xla_scan(nic):
    dec, params, feats = nic
    ref = dec.apply({"params": params}, feats, max_length=T,
                    method=dec.greedy_sample)
    got = fused_nic_greedy_decode(feats, _packed(params), max_length=T,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.multidevice
def test_sharded_kernel_matches_single(nic):
    """mesh= routes through decode_seq.shard_over_batch: bit-identical on
    the 8-device CPU mesh, incl. a batch that needs both pad layers
    (10 -> global 16 -> per-shard 2 -> kernel granule 8)."""
    from depth_image_captioning_pub_tpu.parallel.mesh import make_mesh
    dec, params, feats = nic
    feats = feats[:10]
    w = _packed(params)
    ref = fused_nic_greedy_decode(
        jnp.concatenate([feats, feats[:6]], 0), w, max_length=T,
        interpret=True)[:10]
    mesh = make_mesh()
    assert mesh.size > 1
    got = fused_nic_greedy_decode(feats, w, max_length=T, interpret=True,
                                  mesh=mesh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_use_pallas_through_decoder_api(nic):
    """NICDecoder.greedy_sample(use_pallas=True) == the XLA scan, incl.
    the pad-to-8 wrapper (batch 10)."""
    dec, params, feats = nic
    feats = feats[:10]
    ref = dec.apply({"params": params}, feats, max_length=T,
                    method=dec.greedy_sample)
    got = dec.apply({"params": params}, feats, max_length=T,
                    use_pallas=True, method=dec.greedy_sample)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_use_pallas_through_caption_fn(tmp_path):
    """make_caption_fn(use_pallas=True) routes the NIC kind through the
    kernel and reproduces the XLA captions end-to-end (tiny backbone)."""
    from depth_image_captioning_pub_tpu.config import ConfigEval
    from depth_image_captioning_pub_tpu.engine.evaluate import (
        make_caption_fn)
    from depth_image_captioning_pub_tpu.models.captioner import (
        build_captioner)

    cfg = ConfigEval()
    cfg.max_length = 8
    cap = build_captioner("nic", 40, cfg, encoder_dtype=jnp.float32,
                          resnet_layers=(1, 1, 1, 1))
    params, frozen, stats = cap.init(jax.random.PRNGKey(0),
                                     image_hw=(64, 64))
    imgs = jnp.asarray(np.random.default_rng(5).random(
        (6, 64, 64, 3)).astype(np.float32))
    key = jax.random.PRNGKey(1)
    fn_x = make_caption_fn(cap, start_id=0, max_length=8)
    fn_p = make_caption_fn(cap, start_id=0, max_length=8, use_pallas=True)
    ref = fn_x(frozen, params, stats, imgs, key)
    got = fn_p(frozen, params, stats, imgs, key)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
