"""BatchNorm folding for the frozen ResNet backbone (models/resnet.py).

The reference's backbone is permanently frozen (@torch.no_grad(),
base_caption_models.py:36), so each BN-with-running-stats is a fixed
per-channel affine that composes exactly into the preceding conv
(fold_batchnorm). These tests pin that the folded module + folded params
compute the same function, in f32 (tight) and in the param-tree layout
(every BN gone, every conv biased).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from depth_image_captioning_pub_tpu.models.resnet import (
    AttentionGridEncoder, ResNetBackbone, fold_batchnorm)

TINY = (1, 1, 1, 1)


def _randomize_stats(variables, seed=0):
    """Init gives mean=0/var=1 + scale=1/bias=0 — folding would be trivially
    the identity. Randomize every BN leaf so the fold has real work to do."""
    rng = np.random.default_rng(seed)
    ranges = {"mean": (-1.0, 1.0), "var": (0.2, 2.0),
              "scale": (0.5, 1.5), "bias": (-0.5, 0.5)}

    def mutate(tree, in_bn=False):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = mutate(v, in_bn or k.startswith("bn") or k == "ds_bn")
            elif in_bn and k in ranges:
                lo, hi = ranges[k]
                out[k] = jnp.asarray(
                    rng.uniform(lo, hi, np.shape(v)).astype(np.float32))
            else:
                out[k] = v
        return out

    return mutate(variables)


@pytest.mark.parametrize("module_cls", [ResNetBackbone, AttentionGridEncoder])
def test_folded_forward_matches_unfolded_f32(module_cls):
    kwargs = dict(layers=TINY, dtype=jnp.float32)
    plain = module_cls(**kwargs)
    folded = module_cls(**kwargs, fold_bn=True)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)).astype(np.float32))
    variables = _randomize_stats(plain.init(jax.random.PRNGKey(0), x))
    out_plain = plain.apply(variables, x)
    out_folded = folded.apply(fold_batchnorm(variables), x)
    np.testing.assert_allclose(np.asarray(out_folded), np.asarray(out_plain),
                               rtol=2e-5, atol=2e-5)


def test_folded_tree_layout():
    plain = ResNetBackbone(layers=TINY, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = plain.init(jax.random.PRNGKey(0), x)
    folded = fold_batchnorm(variables)

    assert "batch_stats" not in folded
    leaves = jax.tree_util.tree_flatten_with_path(folded["params"])[0]
    names = ["/".join(str(getattr(p, "key", p)) for p in path)
             for path, _ in leaves]
    assert not any("bn" in n for n in names)
    convs = {n.rsplit("/", 1)[0] for n in names if "conv" in n}
    for c in convs:
        assert f"{c}/kernel" in names and f"{c}/bias" in names

    # the folded module initializes the SAME tree layout (shape template)
    folded_mod = ResNetBackbone(layers=TINY, dtype=jnp.float32, fold_bn=True)
    tmpl = folded_mod.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(tmpl["params"])
            == jax.tree_util.tree_structure(folded["params"]))


def test_folded_is_identity_at_init_stats():
    """At init (mean 0, var 1, scale 1, bias 0) folding must be a no-op up
    to the 1e-5 epsilon factor."""
    plain = ResNetBackbone(layers=TINY, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 32, 32, 3)).astype(np.float32))
    variables = plain.init(jax.random.PRNGKey(0), x)
    folded = fold_batchnorm(variables)
    out_plain = plain.apply(variables, x)
    out_folded = ResNetBackbone(layers=TINY, dtype=jnp.float32,
                                fold_bn=True).apply(folded, x)
    np.testing.assert_allclose(np.asarray(out_folded), np.asarray(out_plain),
                               rtol=1e-5, atol=1e-5)
