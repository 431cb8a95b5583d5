"""Beam search tests: beam_size=1 equals greedy, wider beams never score
worse, finished beams stay finished (new capability — the reference decodes
greedily only, base_caption_models.py:206-250)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from depth_image_captioning_pub_tpu.models.decoder import AttentionDecoder
from depth_image_captioning_pub_tpu.models.nic import NICDecoder

VOCAB, K, D_ENC = 30, 49, 16


@pytest.fixture(scope="module")
def soft_decoder():
    dec = AttentionDecoder(vocab_size=VOCAB, dim_attention=8,
                           dim_embedding=8, dim_encoder=D_ENC,
                           dim_decoder=12, attention_kind="soft",
                           dtype=jnp.float32)
    feats = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, K, D_ENC)).astype(np.float32))
    caps = jnp.zeros((4, 6), jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), feats, caps, train=False,
                      rng=jax.random.PRNGKey(1))["params"]
    return dec, params, feats


def _seq_logprob(dec, params, feats, tokens, start_id):
    """Total log-prob of a decoded sequence under teacher forcing."""
    caps = jnp.concatenate(
        [jnp.full((tokens.shape[0], 1), start_id, jnp.int32), tokens], axis=1)
    logits, _ = dec.apply({"params": params}, feats, caps, train=False,
                          rng=jax.random.PRNGKey(0))
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    tok_lp = jnp.take_along_axis(lp, tokens[..., None], axis=-1)[..., 0]
    return np.asarray(tok_lp)


def test_beam1_equals_greedy(soft_decoder):
    dec, params, feats = soft_decoder
    greedy, _ = dec.apply({"params": params}, feats, 1, max_length=10,
                          method=dec.greedy_sample)
    beam, _ = dec.apply({"params": params}, feats, 1, VOCAB - 1,
                        beam_size=1, max_length=10,
                        method=dec.beam_sample)
    g = np.asarray(greedy)
    b = np.asarray(beam)
    # identical until greedy emits <end>; beam pads with <end> afterwards
    end = VOCAB - 1
    for i in range(g.shape[0]):
        done = False
        for t in range(g.shape[1]):
            if done:
                assert b[i, t] == end
            else:
                assert b[i, t] == g[i, t]
            if g[i, t] == end:
                done = True


def test_wider_beam_never_scores_worse(soft_decoder):
    dec, params, feats = soft_decoder
    _, s1 = dec.apply({"params": params}, feats, 1, VOCAB - 1,
                      beam_size=1, max_length=10, method=dec.beam_sample)
    _, s5 = dec.apply({"params": params}, feats, 1, VOCAB - 1,
                      beam_size=5, max_length=10, method=dec.beam_sample)
    assert np.all(np.asarray(s5) >= np.asarray(s1) - 1e-4)


def test_beam_score_matches_teacher_forcing(soft_decoder):
    """The reported beam score == sum of per-step token log-probs."""
    dec, params, feats = soft_decoder
    tokens, scores = dec.apply({"params": params}, feats, 1, VOCAB - 1,
                               beam_size=3, max_length=8,
                               method=dec.beam_sample)
    tok_lp = _seq_logprob(dec, params, feats, tokens, start_id=1)
    end = VOCAB - 1
    t_np = np.asarray(tokens)
    for i in range(t_np.shape[0]):
        # sum only up to and including the first <end> (later steps cost 0)
        total = 0.0
        for t in range(t_np.shape[1]):
            total += tok_lp[i, t]
            if t_np[i, t] == end:
                break
        assert abs(total - float(np.asarray(scores)[i])) < 1e-3


def test_depth_fusion_beam1_equals_greedy():
    """Beam search through the depth-fusion (add) decoder path."""
    dec = AttentionDecoder(vocab_size=VOCAB, dim_attention=8,
                           dim_embedding=8, dim_encoder=D_ENC,
                           dim_decoder=12, attention_kind="soft",
                           fusion="add", dtype=jnp.float32)
    rng_np = np.random.default_rng(4)
    feats = jnp.asarray(rng_np.standard_normal((3, K, D_ENC)).astype(np.float32))
    dep = jnp.asarray(rng_np.standard_normal((3, K, D_ENC)).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), feats,
                      jnp.zeros((3, 6), jnp.int32), dep, train=False,
                      rng=jax.random.PRNGKey(1))["params"]
    greedy, _ = dec.apply({"params": params}, feats, 1, dep, max_length=8,
                          method=dec.greedy_sample)
    beam, _ = dec.apply({"params": params}, feats, 1, VOCAB - 1, dep,
                        beam_size=1, max_length=8, method=dec.beam_sample)
    g, b = np.asarray(greedy), np.asarray(beam)
    end = VOCAB - 1
    for i in range(g.shape[0]):
        done = False
        for t in range(g.shape[1]):
            if done:
                assert b[i, t] == end
            else:
                assert b[i, t] == g[i, t]
            if g[i, t] == end:
                done = True


def test_nic_beam1_equals_greedy():
    dec = NICDecoder(vocab_size=VOCAB, dim_embedding=10, dim_hidden=8,
                     num_layers=2, dtype=jnp.float32)
    feats = jnp.asarray(np.random.default_rng(1).standard_normal(
        (3, 10)).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), feats,
                      jnp.zeros((3, 5), jnp.int32), train=False)["params"]
    greedy = dec.apply({"params": params}, feats, max_length=8,
                       method=dec.greedy_sample)
    beam, _ = dec.apply({"params": params}, feats, VOCAB - 1, beam_size=1,
                        max_length=8, method=dec.beam_sample)
    g, b = np.asarray(greedy), np.asarray(beam)
    end = VOCAB - 1
    for i in range(g.shape[0]):
        done = False
        for t in range(g.shape[1]):
            if done:
                assert b[i, t] == end
            else:
                assert b[i, t] == g[i, t]
            if g[i, t] == end:
                done = True


@pytest.mark.parametrize("beam,lp", [(1, 0.0), (3, 0.0), (5, 0.7)])
def test_early_exit_equals_fixed_scan(soft_decoder, beam, lp):
    """early_exit beam search == the fixed scan, tokens AND scores.

    Exactness argument in ops/decode.beam_search: once every beam has
    finished, top_k of the forced-<end> continuations reproduces the
    already-descending scores with an identity parent mapping. Covered in
    both regimes: sequences that never finish within max_length (random
    weights, small vocab) and sequences that all finish at step 1 (<end>
    bias large enough to dominate every logit).
    """
    dec, params, feats = soft_decoder
    end = VOCAB - 1
    biased = dict(params)
    biased["out_b"] = params["out_b"] + 100.0 * jax.nn.one_hot(
        end, VOCAB, dtype=params["out_b"].dtype)

    for p in (params, biased):
        t_scan, s_scan = dec.apply({"params": p}, feats, 1, end,
                                   beam_size=beam, max_length=10,
                                   length_penalty=lp,
                                   method=dec.beam_sample)
        t_ee, s_ee = dec.apply({"params": p}, feats, 1, end,
                               beam_size=beam, max_length=10,
                               length_penalty=lp, early_exit=True,
                               method=dec.beam_sample)
        np.testing.assert_array_equal(np.asarray(t_scan), np.asarray(t_ee))
        np.testing.assert_array_equal(np.asarray(s_scan), np.asarray(s_ee))


def test_early_exit_nic():
    dec = NICDecoder(vocab_size=VOCAB, dim_embedding=10, dim_hidden=8,
                     num_layers=2, dtype=jnp.float32)
    feats = jnp.asarray(np.random.default_rng(1).standard_normal(
        (3, 10)).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), feats,
                      jnp.zeros((3, 5), jnp.int32), train=False)["params"]
    end = VOCAB - 1
    t_scan, s_scan = dec.apply({"params": params}, feats, end,
                               beam_size=3, max_length=10,
                               method=dec.beam_sample)
    t_ee, s_ee = dec.apply({"params": params}, feats, end,
                           beam_size=3, max_length=10, early_exit=True,
                           method=dec.beam_sample)
    np.testing.assert_array_equal(np.asarray(t_scan), np.asarray(t_ee))
    np.testing.assert_array_equal(np.asarray(s_scan), np.asarray(s_ee))
