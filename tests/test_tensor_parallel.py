"""Tensor parallelism (parallel/tp.py) over the 2-D (data, model) mesh.

The global math is untouched by GSPMD partition specs, so every test
asserts TP-sharded results against the single-device/replicated baseline
(exact token equality for decode; FP-reduction-order tolerance for
training, mirroring tests/test_multichip.py's dp tolerances).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

# 8-virtual-device collective tests: their XLA rendezvous SIGABRTs when
# starved >~40 s on a contended 1-core host (STATUS.md) — run this chunk
# solo: `pytest -m multidevice`; everything else: `pytest -m 'not
# multidevice'` (README Testing section).
pytestmark = pytest.mark.multidevice

from depth_image_captioning_pub_tpu.parallel.tp import (
    make_mesh_2d, shard_batch_2d, shard_tree, tp_specs)


def test_mesh_2d_shape():
    mesh = make_mesh_2d(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh_2d(8, 2)


def test_spec_rules():
    """Path-suffix rules: ViT qkv/fc1 column, proj/fc2 row, decoder vocab
    projection and LSTM gate kernels column, everything else replicated."""
    tree = {
        "block0": {
            "qkv": {"kernel": np.zeros((8, 24)), "bias": np.zeros((24,))},
            "proj": {"kernel": np.zeros((8, 8)), "bias": np.zeros((8,))},
            "fc1": {"kernel": np.zeros((8, 32)), "bias": np.zeros((32,))},
            "fc2": {"kernel": np.zeros((32, 8)), "bias": np.zeros((8,))},
            "norm1": {"scale": np.zeros((8,)), "bias": np.zeros((8,))},
        },
        "decoder": {
            "out_w": np.zeros((16, 64)), "out_b": np.zeros((64,)),
            "lstm_w_ih": np.zeros((24, 64)), "lstm_b_ih": np.zeros((64,)),
            "embed": np.zeros((64, 8)),
            "att_w_full": np.zeros((16, 1)),
        },
    }
    specs = tp_specs(tree)
    assert specs["block0"]["qkv"]["kernel"] == P(None, "model")
    assert specs["block0"]["qkv"]["bias"] == P("model")
    assert specs["block0"]["proj"]["kernel"] == P("model", None)
    assert specs["block0"]["proj"]["bias"] == P()
    assert specs["block0"]["fc1"]["kernel"] == P(None, "model")
    assert specs["block0"]["fc2"]["kernel"] == P("model", None)
    assert specs["block0"]["norm1"]["scale"] == P()
    assert specs["decoder"]["out_w"] == P(None, "model")
    assert specs["decoder"]["out_b"] == P("model")
    assert specs["decoder"]["lstm_w_ih"] == P(None, "model")
    assert specs["decoder"]["lstm_b_ih"] == P("model")
    assert specs["decoder"]["embed"] == P(None, "model")
    assert specs["decoder"]["att_w_full"] == P()


def _base_soft(rng, vocab=24, cap_len=8, hw=(64, 64), batch=16):
    from depth_image_captioning_pub_tpu.config import ConfigTrain
    from depth_image_captioning_pub_tpu.models.captioner import (
        build_captioner)

    cfg = ConfigTrain()
    cfg.max_caption_len = cap_len
    cap = build_captioner("base-soft", vocab, cfg,
                          encoder_dtype=jnp.float32,
                          resnet_layers=(1, 1, 1, 1))
    params, frozen, stats = cap.init(jax.random.PRNGKey(0), image_hw=hw)
    batch_np = {
        "images": rng.random((batch, *hw, 3), dtype=np.float32),
        "captions": rng.integers(0, vocab, (batch, cap_len)).astype(np.int32),
        "lengths": np.full((batch,), cap_len, np.int32),
        "pad_mask": np.ones((batch,), bool),
    }
    return cap, cfg, params, frozen, stats, batch_np


def test_tp_train_step_matches_single_device(rng):
    """dp=4 x tp=2: same batch, same params — TP-sharded kernels change
    only the reduction order, so loss and updates match single-device."""
    from depth_image_captioning_pub_tpu.engine.steps import (
        TrainState, make_attention_train_step, make_optimizer)

    cap, cfg, params, frozen, stats, batch_np = _base_soft(rng)
    opt = make_optimizer(1e-3)
    step = make_attention_train_step(cap.encoder_apply(),
                                     cap.decoder_apply(), opt,
                                     alpha_reg=0.7, donate=False)
    state = TrainState(params, opt.init(params), frozen, stats, jnp.int32(0))

    single = jax.tree_util.tree_map(jnp.asarray, batch_np)
    s1, m1 = step(state, single, jax.random.PRNGKey(7), jnp.float32(1.0))

    mesh = make_mesh_2d(4, 2)
    tp_state = shard_tree(mesh, state)
    sharded = shard_batch_2d(mesh, batch_np)
    s2, m2 = step(tp_state, sharded, jax.random.PRNGKey(7), jnp.float32(1.0))

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    p1 = jax.tree_util.tree_leaves(s1.params["decoder"])[0]
    p2 = jax.tree_util.tree_leaves(s2.params["decoder"])[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=5e-4)
    # the updated params keep their TP shardings (no silent gather-back)
    out_w = s2.params["decoder"]["out_w"]
    assert out_w.sharding.spec == P(None, "model")


def test_tp_greedy_decode_token_equality(rng):
    """TP-sharded vocab projection/LSTM/embed must emit the same greedy
    tokens as the replicated model (argmax is invariant to the psum's
    deterministic reduction order at these magnitudes)."""
    from depth_image_captioning_pub_tpu.config import ConfigEval
    from depth_image_captioning_pub_tpu.engine.evaluate import (
        make_caption_fn)
    from depth_image_captioning_pub_tpu.models.captioner import (
        build_captioner)

    cfg = ConfigEval()
    cap = build_captioner("base-soft", 24, cfg, encoder_dtype=jnp.float32,
                          resnet_layers=(1, 1, 1, 1))
    params, frozen, stats = cap.init(jax.random.PRNGKey(0),
                                     image_hw=(64, 64))
    fn = make_caption_fn(cap, start_id=1, max_length=6)
    imgs = rng.random((16, 64, 64, 3), dtype=np.float32)
    toks_single = fn(frozen, params, stats, jnp.asarray(imgs),
                     jax.random.PRNGKey(0))

    mesh = make_mesh_2d(4, 2)
    dev_imgs = shard_batch_2d(mesh, {"images": imgs})["images"]
    fr, pr, st = (shard_tree(mesh, frozen), shard_tree(mesh, params),
                  shard_tree(mesh, stats))
    toks_tp = fn(fr, pr, st, dev_imgs, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(toks_single),
                                  np.asarray(toks_tp))


def test_tp_dpt_forward_matches_replicated(rng):
    """Tiny DPT-hybrid with Megatron-sharded ViT blocks (qkv/fc1 column,
    proj/fc2 row) matches the replicated forward."""
    from depth_image_captioning_pub_tpu.models.dpt import (
        DPTDepthEstimator, DPTDepthModel)

    est = DPTDepthEstimator(dtype=jnp.float32)
    est.model = DPTDepthModel(vit_blocks=2, hooks=(0, 1),
                              resnet_layers=(1, 1, 1), vit_dim=64,
                              vit_heads=4, features=32, dtype=jnp.float32)
    est.image_size = 64
    variables = est.init(jax.random.PRNGKey(2), tiny=True)
    fn = jax.jit(est.depth_fn())
    imgs = rng.random((8, 64, 64, 3), dtype=np.float32)
    depth_single = fn(variables, jnp.asarray(imgs))

    mesh = make_mesh_2d(4, 2)
    tp_vars = shard_tree(mesh, variables)
    dev_imgs = shard_batch_2d(mesh, {"images": imgs})["images"]
    depth_tp = fn(tp_vars, dev_imgs)
    np.testing.assert_allclose(np.asarray(depth_single),
                               np.asarray(depth_tp), atol=1e-4)


def test_sp_token_sharding_matches_replicated(rng):
    """Sequence parallelism: constraining the ViT token axis to the model
    mesh axis (dpt.TOKEN_SHARDING) — GSPMD partitions LN/MLP token-wise and
    all-gathers for attention — must not change the depth output."""
    from jax.sharding import NamedSharding
    from depth_image_captioning_pub_tpu.models import dpt
    from depth_image_captioning_pub_tpu.models.dpt import (
        DPTDepthEstimator, DPTDepthModel)

    est = DPTDepthEstimator(dtype=jnp.float32)
    est.model = DPTDepthModel(vit_blocks=2, hooks=(0, 1),
                              resnet_layers=(1, 1, 1), vit_dim=64,
                              vit_heads=4, features=32, dtype=jnp.float32)
    est.image_size = 64
    variables = est.init(jax.random.PRNGKey(2), tiny=True)
    imgs = rng.random((8, 64, 64, 3), dtype=np.float32)
    depth_single = jax.jit(est.depth_fn())(variables, jnp.asarray(imgs))

    mesh = make_mesh_2d(4, 2)
    dpt.TOKEN_SHARDING = NamedSharding(mesh, P("data", "model", None))
    try:
        sp_fn = jax.jit(est.depth_fn())
        tp_vars = shard_tree(mesh, variables)
        dev_imgs = shard_batch_2d(mesh, {"images": imgs})["images"]
        depth_sp = sp_fn(tp_vars, dev_imgs)
    finally:
        dpt.TOKEN_SHARDING = None
    np.testing.assert_allclose(np.asarray(depth_single),
                               np.asarray(depth_sp), atol=1e-4)


def test_tp_weights_actually_partitioned(rng):
    """Falsifiability (VERDICT r3 weak #2): value-equality tests above
    would also pass if GSPMD silently replicated everything. Assert the
    per-device ADDRESSABLE shard shapes — each device holds 1/tp of the
    split dimension of every Megatron-sharded kernel, which is the memory
    claim tensor parallelism makes."""
    from depth_image_captioning_pub_tpu.engine.steps import (
        TrainState, make_attention_train_step, make_optimizer)
    from depth_image_captioning_pub_tpu.parallel.mesh import (
        assert_partitioned, local_shard_shape)

    cap, cfg, params, frozen, stats, batch_np = _base_soft(rng)
    opt = make_optimizer(1e-3)
    mesh = make_mesh_2d(4, 2)
    state = shard_tree(mesh, TrainState(params, opt.init(params), frozen,
                                        stats, jnp.int32(0)))
    dec = state.params["decoder"]
    # vocab projection [d_dec, vocab] -> per-device [d_dec, vocab/2]
    assert_partitioned(dec["out_w"], 1, 2, "out_w")
    assert local_shard_shape(dec["out_w"]) == (dec["out_w"].shape[0],
                                               dec["out_w"].shape[1] // 2)
    assert_partitioned(dec["out_b"], 0, 2, "out_b")
    assert_partitioned(dec["lstm_w_ih"], 1, 2, "lstm_w_ih")
    assert_partitioned(dec["lstm_w_hh"], 1, 2, "lstm_w_hh")
    assert_partitioned(dec["embed"], 1, 2, "embed")
    # the optimizer moments mirror the param paths -> same shards
    mus = [leaf for path, leaf in
           jax.tree_util.tree_leaves_with_path(state.opt_state)
           if "out_w" in jax.tree_util.keystr(path)]
    assert mus, "no optimizer moment found for out_w"
    for mu in mus:
        assert_partitioned(mu, 1, 2, "opt moment of out_w")
    # replicated leaves really are replicated (full-shape shards)
    att = dec["att_w_full"]
    assert local_shard_shape(att) == tuple(att.shape)
    # a mis-claimed partition must raise
    with pytest.raises(AssertionError):
        assert_partitioned(att, 0, 2, "att_w_full")


def test_sp_token_axis_actually_partitioned(rng):
    """The sp claim made falsifiable: run the REAL DPT block loop under
    TOKEN_SHARDING and capture every ViTBlock output through jit — each
    must be physically partitioned 2-way on the token axis (per-device
    shard extent = N/2), not replicated."""
    from jax.sharding import NamedSharding
    from depth_image_captioning_pub_tpu.models import dpt
    from depth_image_captioning_pub_tpu.models.dpt import (
        DPTDepthEstimator, DPTDepthModel, ViTBlock)
    from depth_image_captioning_pub_tpu.parallel.mesh import (
        assert_partitioned)

    est = DPTDepthEstimator(dtype=jnp.float32)
    est.model = DPTDepthModel(vit_blocks=2, hooks=(0, 1),
                              resnet_layers=(1, 1, 1), vit_dim=64,
                              vit_heads=4, features=32, dtype=jnp.float32)
    est.image_size = 64
    variables = est.init(jax.random.PRNGKey(2), tiny=True)
    imgs = rng.random((8, 64, 64, 3), dtype=np.float32)

    mesh = make_mesh_2d(4, 2)
    dpt.TOKEN_SHARDING = NamedSharding(mesh, P("data", "model", None))
    try:
        def probe(v, x):
            _, inter = est.model.apply(
                v, x,
                capture_intermediates=lambda m, _: isinstance(m, ViTBlock))
            return inter["intermediates"]

        tp_vars = shard_tree(mesh, variables)
        dev_imgs = shard_batch_2d(mesh, {"images": imgs})["images"]
        inter = jax.jit(probe)(tp_vars, dev_imgs)
    finally:
        dpt.TOKEN_SHARDING = None
    outs = [inter[f"block{i}"]["__call__"][0] for i in range(2)]
    for i, out in enumerate(outs):
        assert out.ndim == 3
        assert_partitioned(out, 0, 4, f"block{i} batch axis")
        assert_partitioned(out, 1, 2, f"block{i} token axis")
