"""Whole-sequence beam-search Pallas kernel vs the XLA lax.scan search.

In CPU interpret mode the kernel must be BIT-identical to
ops/decode.beam_search through AttentionDecoder.beam_sample (same search
semantics, same tie rules, same length-penalty selection); on TPU only
FP-accumulation order differs (opt-in, like the greedy kernel).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

# Compile-heavy single-device tests (pipeline caches / DPT twins /
# interpret-mode kernels): their own suite chunk on slow rigs --
# `pytest -m heavy` (README Testing section).
pytestmark = pytest.mark.heavy

from depth_image_captioning_pub_tpu.models.decoder import AttentionDecoder

VOCAB, K, D = 37, 12, 16


@pytest.fixture(scope="module")
def decoder():
    dec = AttentionDecoder(vocab_size=VOCAB, dim_attention=8,
                           dim_embedding=8, dim_encoder=D, dim_decoder=8)
    feats = jnp.zeros((1, K, D))
    caps = jnp.zeros((1, 5), jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), feats, caps)["params"]
    return dec, params


@pytest.mark.parametrize("topk", ["iter", "stream"])
@pytest.mark.parametrize("beam", [2, 5])
@pytest.mark.parametrize("length_penalty", [0.0, 0.7])
def test_kernel_matches_xla_beam_search(decoder, beam, length_penalty,
                                        topk, rng, monkeypatch):
    import depth_image_captioning_pub_tpu.ops.pallas.beam_seq as bs
    monkeypatch.setattr(bs, "TOPK_DEFAULT", topk)
    dec, params = decoder
    feats = jnp.asarray(rng.standard_normal((8, K, D)).astype(np.float32))

    def run(use_pallas):
        return dec.apply({"params": params}, feats, 1, 2,
                         beam_size=beam, max_length=9,
                         length_penalty=length_penalty,
                         use_pallas=use_pallas,
                         method=AttentionDecoder.beam_sample)

    tok_xla, score_xla = run(False)
    tok_ker, score_ker = run(True)
    np.testing.assert_array_equal(np.asarray(tok_xla), np.asarray(tok_ker))
    np.testing.assert_allclose(np.asarray(score_xla), np.asarray(score_ker),
                               atol=1e-5)


def test_block_override_bitwise_equal_across_strategies(decoder, rng,
                                                        monkeypatch):
    """At the SAME forced block size, iter and stream are bit-identical;
    in interpret mode, block size itself doesn't change FP order either,
    so all four (strategy x block) combinations must agree exactly. (On
    chip, different blocks change matmul tiling — the A/B tool compares
    bitwise only at equal blk; tools/ab_beam_topk.py.)"""
    import depth_image_captioning_pub_tpu.ops.pallas.beam_seq as bs
    dec, params = decoder
    feats = jnp.asarray(rng.standard_normal((16, K, D)).astype(np.float32))

    outs = {}
    for topk in ("iter", "stream"):
        for blk in (16, 8):
            monkeypatch.setattr(bs, "TOPK_DEFAULT", topk)
            monkeypatch.setattr(bs, "BLOCK_OVERRIDE", blk)
            outs[(topk, blk)] = np.asarray(dec.apply(
                {"params": params}, feats, 1, 2, beam_size=3, max_length=8,
                use_pallas=True, method=AttentionDecoder.beam_sample)[0])
    ref = outs[("iter", 16)]
    for key, val in outs.items():
        np.testing.assert_array_equal(ref, val, err_msg=str(key))


def test_kernel_pads_non_multiple_batch(decoder, rng):
    """B not divisible by 8: the wrapper pads and slices back."""
    dec, params = decoder
    feats = jnp.asarray(rng.standard_normal((5, K, D)).astype(np.float32))
    tok_xla, _ = dec.apply({"params": params}, feats, 1, 2, beam_size=3,
                           max_length=7, method=AttentionDecoder.beam_sample)
    tok_ker, _ = dec.apply({"params": params}, feats, 1, 2, beam_size=3,
                           max_length=7, use_pallas=True,
                           method=AttentionDecoder.beam_sample)
    np.testing.assert_array_equal(np.asarray(tok_xla), np.asarray(tok_ker))


def test_kernel_early_exit_emits_end_padding(decoder, rng):
    """Force every beam to finish immediately by making <end> the argmax
    from a biased vocab head: remaining columns must all be <end> and the
    XLA path must agree."""
    dec, params = decoder
    biased = jax.tree_util.tree_map(lambda x: x, params)
    biased = dict(biased)
    biased["out_b"] = params["out_b"].at[2].set(50.0)  # end_id=2 dominates
    feats = jnp.asarray(rng.standard_normal((8, K, D)).astype(np.float32))
    tok_xla, _ = dec.apply({"params": biased}, feats, 1, 2, beam_size=4,
                           max_length=6, method=AttentionDecoder.beam_sample)
    tok_ker, _ = dec.apply({"params": biased}, feats, 1, 2, beam_size=4,
                           max_length=6, use_pallas=True,
                           method=AttentionDecoder.beam_sample)
    np.testing.assert_array_equal(np.asarray(tok_xla), np.asarray(tok_ker))
    assert np.all(np.asarray(tok_ker) == 2)


def test_depth_fusion_beam_kernel():
    """Fused (add) depth features flow through the kernel path too."""
    rng = np.random.default_rng(5)
    dec = AttentionDecoder(vocab_size=VOCAB, dim_attention=8,
                           dim_embedding=8, dim_encoder=D, dim_decoder=8,
                           fusion="add")
    feats = jnp.asarray(rng.standard_normal((8, K, D)).astype(np.float32))
    dep = jnp.asarray(rng.standard_normal((8, K, D)).astype(np.float32))
    caps = jnp.zeros((1, 5), jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), feats[:1], caps,
                      dep[:1])["params"]
    tok_xla, _ = dec.apply({"params": params}, feats, 1, 2, dep,
                           beam_size=3, max_length=8,
                           method=AttentionDecoder.beam_sample)
    tok_ker, _ = dec.apply({"params": params}, feats, 1, 2, dep,
                           beam_size=3, max_length=8, use_pallas=True,
                           method=AttentionDecoder.beam_sample)
    np.testing.assert_array_equal(np.asarray(tok_xla), np.asarray(tok_ker))


def test_stream_topk_all_ties_matches_xla(rng):
    """Adversarial tie case for the streaming top-k: a zeroed vocab head
    makes EVERY token's logit identical, so the flat top-k is decided
    purely by lax.top_k's lowest-flat-index tie rule — the exact surface
    where a streaming insert-order bug would show."""
    dec = AttentionDecoder(vocab_size=VOCAB, dim_attention=8,
                           dim_embedding=8, dim_encoder=D, dim_decoder=8)
    feats0 = jnp.zeros((1, K, D))
    caps = jnp.zeros((1, 5), jnp.int32)
    params = dict(dec.init(jax.random.PRNGKey(0), feats0, caps)["params"])
    params["out_w"] = jnp.zeros_like(params["out_w"])
    params["out_b"] = jnp.zeros_like(params["out_b"])
    feats = jnp.asarray(rng.standard_normal((8, K, D)).astype(np.float32))
    tok_xla, _ = dec.apply({"params": params}, feats, 1, 2, beam_size=4,
                           max_length=6, method=AttentionDecoder.beam_sample)
    import depth_image_captioning_pub_tpu.ops.pallas.beam_seq as bs
    assert "out_w" in params  # the zeroing actually hit the vocab head
    old = bs.TOPK_DEFAULT
    try:
        bs.TOPK_DEFAULT = "stream"
        tok_st, _ = dec.apply({"params": params}, feats, 1, 2, beam_size=4,
                              max_length=6, use_pallas=True,
                              method=AttentionDecoder.beam_sample)
    finally:
        bs.TOPK_DEFAULT = old
    np.testing.assert_array_equal(np.asarray(tok_xla), np.asarray(tok_st))


def test_stream_topk_multi_chunk(decoder, rng, monkeypatch):
    """Force the streamed sheet across multiple chunks (chunk=128 against
    vocab 37 padded to 128 would be one chunk; shrink the chunk cap so the
    fori actually iterates) and check bit-equality with the iter kernel."""
    import depth_image_captioning_pub_tpu.ops.pallas.beam_seq as bs
    monkeypatch.setattr(bs, "_STREAM_CHUNK", 128)
    # vocab 300 -> ceil128 = 384 -> chunk 128, 3 chunks, 84 pad lanes
    dec = AttentionDecoder(vocab_size=300, dim_attention=8,
                           dim_embedding=8, dim_encoder=D, dim_decoder=8)
    feats0 = jnp.zeros((1, K, D))
    caps = jnp.zeros((1, 5), jnp.int32)
    params = dec.init(jax.random.PRNGKey(1), feats0, caps)["params"]
    feats = jnp.asarray(rng.standard_normal((8, K, D)).astype(np.float32))
    outs = {}
    for topk in ("iter", "stream"):
        monkeypatch.setattr(bs, "TOPK_DEFAULT", topk)
        outs[topk] = dec.apply({"params": params}, feats, 1, 2,
                               beam_size=5, max_length=8, use_pallas=True,
                               method=AttentionDecoder.beam_sample)
    np.testing.assert_array_equal(np.asarray(outs["iter"][0]),
                                  np.asarray(outs["stream"][0]))
    np.testing.assert_array_equal(np.asarray(outs["iter"][1]),
                                  np.asarray(outs["stream"][1]))
