"""bf16-resident feature tensor (models/decoder.FEATURES_RESIDENT):
on CPU the resident path must be BIT-exact vs the materialized f32 copy
for every converted path (teacher-forced fwd, greedy, beam), and the
module must fall back to the materialized copy when the storage dtype is
not narrower (f32 features) or fusion promotes to f32 (depth variants).
Chip-side numbers and the TPU ulp-level caveat: tools/ab_feat_resident.py
and the module-flag docstring."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import depth_image_captioning_pub_tpu.models.decoder as dm
from depth_image_captioning_pub_tpu.models.decoder import AttentionDecoder


@pytest.fixture
def flag_restore():
    old = dm.FEATURES_RESIDENT
    yield
    dm.FEATURES_RESIDENT = old


def _mk(attention_kind="soft", fusion="none"):
    dec = AttentionDecoder(vocab_size=24, dim_attention=8, dim_embedding=8,
                           dim_encoder=16, dim_decoder=8,
                           attention_kind=attention_kind, fusion=fusion,
                           dim_depth=4, dropout=0.0, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((3, 9, 16)), jnp.bfloat16)
    caps = jnp.asarray(rng.integers(0, 24, (3, 6)), jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), feats.astype(jnp.float32), caps,
                      rng=jax.random.PRNGKey(1))
    return dec, params, feats, caps


@pytest.mark.parametrize("kind", ["soft", "hard"])
def test_resident_bit_exact_on_cpu(flag_restore, kind):
    dec, params, feats, caps = _mk(kind)
    outs = {}
    for flag in (False, True):
        dm.FEATURES_RESIDENT = flag
        logits, alphas = dec.apply(params, feats, caps, train=True,
                                   rng=jax.random.PRNGKey(7), temp=1.0)
        toks, _ = dec.apply(params, feats, start_id=1,
                            method=dec.greedy_sample, max_length=5,
                            rng=jax.random.PRNGKey(3))
        early, _ = dec.apply(params, feats, start_id=1,
                             method=dec.greedy_sample, max_length=5,
                             end_id=2, rng=jax.random.PRNGKey(3))
        stoch, _ = dec.apply(params, feats, 1, jax.random.PRNGKey(5),
                             method=dec.stochastic_sample, max_length=5,
                             temperature=0.8, top_k=4)
        beam, _ = dec.apply(params, feats, start_id=1, end_id=2,
                            method=dec.beam_sample, beam_size=3,
                            max_length=5, rng=jax.random.PRNGKey(3))
        outs[flag] = (np.asarray(logits), np.asarray(alphas),
                      np.asarray(toks), np.asarray(early),
                      np.asarray(stoch), np.asarray(beam))
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(a, b)


def test_resident_keeps_bf16_storage_dtype(flag_restore):
    dec, params, feats, _ = _mk()
    dm.FEATURES_RESIDENT = True
    bound = dec.bind(params)
    assert bound._fused_features(feats, None).dtype == jnp.bfloat16
    dm.FEATURES_RESIDENT = False
    assert bound._fused_features(feats, None).dtype == jnp.float32
    # f32 storage: nothing to keep narrow
    dm.FEATURES_RESIDENT = True
    assert bound._fused_features(feats.astype(jnp.float32),
                                 None).dtype == jnp.float32


def test_depth_fusion_residency_by_dtype(flag_restore):
    """Fusion residency follows dtype promotion: bf16 depth features (the
    production CNN depth encoder runs bf16) keep add-fusion bf16-resident;
    f32 depth features (the MLP variant) promote the fused tensor to f32
    and residency is inert."""
    dm.FEATURES_RESIDENT = True
    dec, params, feats, _ = _mk(fusion="add")
    rng = np.random.default_rng(1)
    bound = dec.bind(params)
    depth32 = jnp.asarray(rng.standard_normal((3, 9, 16)), jnp.float32)
    assert bound._fused_features(feats, depth32).dtype == jnp.float32
    depth16 = depth32.astype(jnp.bfloat16)
    assert bound._fused_features(feats, depth16).dtype == jnp.bfloat16
