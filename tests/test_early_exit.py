"""Early-exit greedy decode: identical tokens to the fixed scan up to the
first <end>, <end>-padding after, and same downstream captions."""

import numpy as np
import jax
import jax.numpy as jnp

from depth_image_captioning_pub_tpu.models.decoder import AttentionDecoder

VOCAB, K, D_ENC = 25, 49, 16
END = VOCAB - 1


def _decoder_and_inputs():
    dec = AttentionDecoder(vocab_size=VOCAB, dim_attention=8, dim_embedding=8,
                           dim_encoder=D_ENC, dim_decoder=12,
                           attention_kind="soft", dtype=jnp.float32)
    feats = jnp.asarray(np.random.default_rng(5).standard_normal(
        (6, K, D_ENC)).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), feats,
                      jnp.zeros((6, 5), jnp.int32), train=False,
                      rng=jax.random.PRNGKey(1))["params"]
    return dec, params, feats


def test_early_exit_matches_fixed_scan():
    dec, params, feats = _decoder_and_inputs()
    fixed, fixed_a = dec.apply({"params": params}, feats, 1, max_length=12,
                               method=dec.greedy_sample)
    early, early_a = dec.apply({"params": params}, feats, 1, max_length=12,
                               end_id=END, method=dec.greedy_sample)
    f, e = np.asarray(fixed), np.asarray(early)
    fa, ea = np.asarray(fixed_a), np.asarray(early_a)
    for i in range(f.shape[0]):
        finished = False
        for t in range(f.shape[1]):
            if finished:
                assert e[i, t] == END
                assert np.all(ea[i, t] == 0.0)
            else:
                assert e[i, t] == f[i, t], (i, t)
                np.testing.assert_allclose(ea[i, t], fa[i, t], atol=1e-6)
            if f[i, t] == END:
                finished = True


def test_early_exit_detokenizes_identically():
    from depth_image_captioning_pub_tpu.data.tokenizer import ids_to_caption
    dec, params, feats = _decoder_and_inputs()
    id_to_word = {i: f"w{i}" for i in range(VOCAB)}
    id_to_word[END] = "<end>"
    fixed, _ = dec.apply({"params": params}, feats, 1, max_length=12,
                         method=dec.greedy_sample)
    early, _ = dec.apply({"params": params}, feats, 1, max_length=12,
                         end_id=END, method=dec.greedy_sample)
    for a, b in zip(np.asarray(fixed), np.asarray(early)):
        assert ids_to_caption(a, id_to_word) == ids_to_caption(b, id_to_word)
