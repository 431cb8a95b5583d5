"""Fused ViT attention kernel (ops/pallas/vit_attention) correctness.

Interpreter-mode equivalence vs the unfused einsum math (the path parity
tests pin against torch), including padded-key masking. TPU timing lives
in STATUS.md; on CPU the model keeps the unfused path by default.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from depth_image_captioning_pub_tpu.ops.pallas.vit_attention import (
    fused_attention)


def _reference(q, k, v, scale, n_valid):
    s = jnp.einsum("znd,zmd->znm", q, k,
                   preferred_element_type=jnp.float32) * scale
    if n_valid < s.shape[-1]:
        s = jnp.where(jnp.arange(s.shape[-1]) >= n_valid, -jnp.inf, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("znm,zmd->znd", p.astype(v.dtype), v,
                      preferred_element_type=v.dtype)


@pytest.mark.parametrize("n_valid", [40, 33])
def test_fused_attention_matches_reference(rng, n_valid):
    z, n, d = 6, 40, 16
    q = jnp.asarray(rng.standard_normal((z, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((z, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((z, n, d)).astype(np.float32))
    scale = d ** -0.5
    expected = _reference(q, k, v, scale, n_valid)
    got = fused_attention(q, k, v, scale=scale, n_valid=n_valid,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5)
    if n_valid < n:
        # masked keys must have exactly zero influence: perturbing them
        # does not change the output
        k2 = k.at[:, n_valid:].set(123.0)
        v2 = v.at[:, n_valid:].set(-55.0)
        got2 = fused_attention(q, k2, v2, scale=scale, n_valid=n_valid,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(expected),
                                   atol=1e-5)


def test_vit_block_defaults_to_unfused_on_cpu(rng):
    from depth_image_captioning_pub_tpu.models.dpt import ViTBlock
    assert not ViTBlock(dim=32, heads=4)._use_fused()
    # even when opted in, the kernel never runs on the CPU backend
    assert not ViTBlock(dim=32, heads=4, fused_attention=True)._use_fused()
    blk = ViTBlock(dim=32, heads=4)
    x = jnp.asarray(rng.standard_normal((2, 10, 32)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(variables, x)
    assert out.shape == x.shape
