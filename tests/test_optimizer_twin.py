"""make_optimizer (optax.adamw, torch defaults) vs torch.optim.AdamW: the
reference trains with torch AdamW at its defaults besides lr
(base_train.py:115). Several update steps on identical params and
gradients must produce identical parameters — pinning betas, eps, bias
correction, and the decoupled weight-decay placement at the update-rule
level (the gradient twins in test_token_parity pin everything upstream)."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("weight_decay", [0.0, 0.01, 0.1])
def test_adamw_matches_torch(weight_decay):
    from depth_image_captioning_pub_tpu.engine.steps import make_optimizer

    rng = np.random.default_rng(0)
    p0 = {"w": rng.standard_normal((7, 5)).astype(np.float32),
          "b": rng.standard_normal((5,)).astype(np.float32)}
    grads_seq = [{"w": rng.standard_normal((7, 5)).astype(np.float32),
                  "b": rng.standard_normal((5,)).astype(np.float32)}
                 for _ in range(5)]
    lr = 1e-3

    tw = torch.nn.Parameter(torch.from_numpy(p0["w"].copy()))
    tb = torch.nn.Parameter(torch.from_numpy(p0["b"].copy()))
    topt = torch.optim.AdamW([tw, tb], lr=lr, weight_decay=weight_decay)
    for g in grads_seq:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g["w"].copy())
        tb.grad = torch.from_numpy(g["b"].copy())
        topt.step()

    opt = make_optimizer(lr, weight_decay=weight_decay)
    params = jax.tree_util.tree_map(jnp.asarray, p0)
    state = opt.init(params)
    for g in grads_seq:
        updates, state = opt.update(
            jax.tree_util.tree_map(jnp.asarray, g), state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["b"]),
                               tb.detach().numpy(), rtol=1e-6, atol=1e-7)


def test_default_weight_decay_is_torch_default():
    """make_optimizer(lr) must ship torch.optim.AdamW's default weight
    decay (0.01) — the reference never overrides it (base_train.py:115)."""
    import inspect
    from depth_image_captioning_pub_tpu.engine.steps import make_optimizer
    ours = inspect.signature(make_optimizer).parameters["weight_decay"].default
    theirs = inspect.signature(
        torch.optim.AdamW.__init__).parameters["weight_decay"].default
    assert ours == theirs == 0.01
