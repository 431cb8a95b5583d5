"""Fused Pallas decode core == the pure-JAX ops path (float32, interpreter
mode on CPU; the same kernel compiles on TPU — exercised by bench/decoder)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from depth_image_captioning_pub_tpu.ops.attention import (
    AttentionParams, project_features, soft_attention)
from depth_image_captioning_pub_tpu.ops.lstm import LSTMCellParams, lstm_cell
from depth_image_captioning_pub_tpu.ops.pallas.decode_step import (
    DecodeStepWeights, _pick_block, fused_decode_core, pack_weights)

B, K, D, A, H, E = 16, 196, 64, 32, 32, 24


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)

    def arr(*shape, scale=0.3):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)

    att = AttentionParams(arr(D, A), arr(A), arr(H, A), arr(A), arr(A),
                          jnp.float32(0.1))
    lstm = LSTMCellParams(arr(E + D, 4 * H), arr(H, 4 * H), arr(4 * H),
                          arr(4 * H))
    f_beta_w, f_beta_b = arr(H, D), arr(D)
    w = pack_weights(att.w_dec, att.b_dec, att.w_full, att.b_full,
                     f_beta_w, f_beta_b, lstm.w_ih, lstm.w_hh, lstm.b_ih,
                     lstm.b_hh, dim_embedding=E)
    feats = arr(B, K, D, scale=1.0)
    emb = arr(B, E, scale=1.0)
    h, c = arr(B, H, scale=1.0), arr(B, H, scale=1.0)
    return att, lstm, f_beta_w, f_beta_b, w, feats, emb, h, c


def test_fused_core_matches_ops_path(setup):
    att, lstm, f_beta_w, f_beta_b, w, feats, emb, h, c = setup
    proj = project_features(att, feats)
    got_h, got_c, got_alpha = fused_decode_core(feats, proj, emb, h, c, w,
                                                interpret=True)
    # reference: ops path
    ctx, alpha = soft_attention(att, feats, proj, h)
    gate = jax.nn.sigmoid(h @ f_beta_w + f_beta_b)
    x = jnp.concatenate([emb, gate * ctx], axis=-1)
    exp_h, exp_c = lstm_cell(lstm, x, h, c)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(exp_h),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(exp_c),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_alpha), np.asarray(alpha),
                               atol=1e-5)


def test_whole_sequence_kernel_matches_xla_scan():
    """fused_greedy_decode (interpret) == AttentionDecoder XLA greedy scan,
    through the public use_pallas API (CPU forces interpreter mode)."""
    import jax
    from depth_image_captioning_pub_tpu.models.decoder import AttentionDecoder
    dec = AttentionDecoder(vocab_size=40, dim_attention=8, dim_embedding=8,
                           dim_encoder=16, dim_decoder=12, dtype=jnp.float32)
    feats = jnp.asarray(np.random.default_rng(7).standard_normal(
        (10, 49, 16)).astype(np.float32))   # 10: exercises pad-to-8 logic
    params = dec.init(jax.random.PRNGKey(0), feats,
                      jnp.zeros((10, 5), jnp.int32), train=False,
                      rng=jax.random.PRNGKey(1))["params"]
    ref, _ = dec.apply({"params": params}, feats, 2, max_length=9,
                       method=dec.greedy_sample)
    got, alphas = dec.apply({"params": params}, feats, 2, max_length=9,
                            use_pallas=True, method=dec.greedy_sample)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert np.all(np.asarray(alphas) == 0.0)  # documented: no alphas


def test_pick_block_respects_budget_and_divisibility():
    from depth_image_captioning_pub_tpu.ops.pallas.decode_step import (
        _VMEM_BUDGET)
    # full-size f32 shapes: chosen block divides the batch, fits the budget,
    # and respects Mosaic's minimum of 8
    blk = _pick_block(104, 196, 2048, 128, 128, 128, 4,
                      weight_bytes=6_000_000)
    assert blk >= 8 and 104 % blk == 0
    per_batch = blk * (196 * 2048 + 196 * 128 + 128 + 4 * 128 + 196) * 4
    assert 2 * per_batch + 6_000_000 <= _VMEM_BUDGET
    # tiny shapes allow larger blocks that still divide the batch
    assert _pick_block(16, 49, 64, 32, 24, 32, 4, 10000) == 16


def test_whole_sequence_kernel_early_exit_matches_xla():
    """end_id >= 0 turns on the in-kernel while_loop early exit; output
    must equal the XLA early-exit scan both when captions end early (vocab
    head biased so every row emits <end> within a few steps) and when they
    never end."""
    import jax
    from depth_image_captioning_pub_tpu.models.decoder import AttentionDecoder
    end_id = 3
    dec = AttentionDecoder(vocab_size=40, dim_attention=8, dim_embedding=8,
                           dim_encoder=16, dim_decoder=12, dtype=jnp.float32)
    feats = jnp.asarray(np.random.default_rng(11).standard_normal(
        (8, 49, 16)).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), feats,
                      jnp.zeros((8, 5), jnp.int32), train=False,
                      rng=jax.random.PRNGKey(1))["params"]

    for bias in (6.0, -6.0):   # early-everywhere vs (almost) never
        p = jax.tree_util.tree_map(lambda x: x, params)
        p = dict(p)
        out_b = np.asarray(p["out_b"]).copy()
        out_b[end_id] += bias
        p["out_b"] = jnp.asarray(out_b)
        ref, _ = dec.apply({"params": p}, feats, 2, max_length=9,
                           end_id=end_id, method=dec.greedy_sample)
        got, _ = dec.apply({"params": p}, feats, 2, max_length=9,
                           end_id=end_id, use_pallas=True,
                           method=dec.greedy_sample)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        if bias > 0:
            assert np.all(np.asarray(got) == end_id)
