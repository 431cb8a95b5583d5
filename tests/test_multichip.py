"""Multi-device (8 virtual CPU devices) sharding tests.

Validates the framework's data-parallel story (SURVEY.md §2.3: the reference
is single-device; dp over a 1-D mesh is this framework's own capability):
sharded train steps produce the same math as single-device, decode shards
over the batch axis, and the driver's dryrun entry point works.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

# 8-virtual-device collective tests: their XLA rendezvous SIGABRTs when
# starved >~40 s on a contended 1-core host (STATUS.md) — run this chunk
# solo: `pytest -m multidevice`; everything else: `pytest -m 'not
# multidevice'` (README Testing section).
pytestmark = pytest.mark.multidevice

from depth_image_captioning_pub_tpu.parallel.mesh import (
    batch_sharding, make_mesh, pad_batch_to_devices, replicate, shard_batch)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_pad_batch_to_devices():
    assert pad_batch_to_devices(30, 8) == 32
    assert pad_batch_to_devices(32, 8) == 32
    assert pad_batch_to_devices(1, 8) == 8


def test_shard_batch_places_on_mesh():
    mesh = make_mesh()
    batch = {"images": np.zeros((16, 8, 8, 3), np.float32),
             "lengths": np.ones((16,), np.int32)}
    dev = shard_batch(mesh, batch)
    assert dev["images"].sharding == batch_sharding(mesh)
    assert dev["images"].shape == (16, 8, 8, 3)


def test_sharded_train_step_matches_single_device(rng):
    """Same batch, same params: loss identical whether the batch lives on 1
    device or is sharded across 8 (XLA inserts the gradient all-reduce)."""
    from depth_image_captioning_pub_tpu.config import ConfigTrain
    from depth_image_captioning_pub_tpu.engine.steps import (
        TrainState, make_attention_train_step, make_optimizer)
    from depth_image_captioning_pub_tpu.models.captioner import build_captioner

    cfg = ConfigTrain()
    cfg.max_caption_len = 8
    cap = build_captioner("base-soft", 24, cfg, encoder_dtype=jnp.float32,
                          resnet_layers=(1, 1, 1, 1))
    params, frozen, stats = cap.init(jax.random.PRNGKey(0),
                                     image_hw=(64, 64))
    opt = make_optimizer(1e-3)
    step = make_attention_train_step(cap.encoder_apply(),
                                     cap.decoder_apply(), opt,
                                     alpha_reg=0.7, donate=False)
    batch_np = {
        "images": rng.random((16, 64, 64, 3), dtype=np.float32),
        "captions": rng.integers(0, 24, (16, 8)).astype(np.int32),
        "lengths": np.full((16,), 8, np.int32),
        "pad_mask": np.ones((16,), bool),
    }
    state = TrainState(params, opt.init(params), frozen, stats, jnp.int32(0))

    # single device
    single = jax.tree_util.tree_map(jnp.asarray, batch_np)
    s1, m1 = step(state, single, jax.random.PRNGKey(7), jnp.float32(1.0))

    # sharded over the 8-device mesh
    mesh = make_mesh()
    sharded_state = replicate(mesh, state)
    sharded = shard_batch(mesh, batch_np)
    s2, m2 = step(sharded_state, sharded, jax.random.PRNGKey(7),
                  jnp.float32(1.0))

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    # gradient all-reduce order differs across shardings; AdamW's
    # rsqrt normalization amplifies ulp-level differences on near-zero
    # grads, so compare with a loose-but-meaningful tolerance
    p1 = jax.tree_util.tree_leaves(s1.params["decoder"])[0]
    p2 = jax.tree_util.tree_leaves(s2.params["decoder"])[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=5e-4)


def test_sharded_greedy_decode(rng):
    """Batch-sharded caption generation over the mesh."""
    from depth_image_captioning_pub_tpu.config import ConfigEval
    from depth_image_captioning_pub_tpu.engine.evaluate import make_caption_fn
    from depth_image_captioning_pub_tpu.models.captioner import build_captioner

    cfg = ConfigEval()
    cap = build_captioner("base-soft", 24, cfg, encoder_dtype=jnp.float32,
                          resnet_layers=(1, 1, 1, 1))
    params, frozen, stats = cap.init(jax.random.PRNGKey(0),
                                     image_hw=(64, 64))
    fn = make_caption_fn(cap, start_id=1, max_length=6)
    mesh = make_mesh()
    imgs = rng.random((16, 64, 64, 3), dtype=np.float32)
    dev_imgs = shard_batch(mesh, {"images": imgs})["images"]
    rep = replicate(mesh, (frozen, params, stats))
    toks_sharded = fn(rep[0], rep[1], rep[2], dev_imgs, jax.random.PRNGKey(0))
    toks_single = fn(frozen, params, stats, jnp.asarray(imgs),
                     jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(toks_sharded),
                                  np.asarray(toks_single))


def test_assert_partitioned_rejects_indivisible_claim():
    """ADVICE r4: a dim not divisible by ``ways`` must fail with a message
    naming the divisibility problem (GSPMD pads shard extents to ceil, so
    a floor-division expectation would mislead), distinct from the
    'not partitioned' failure."""
    from depth_image_captioning_pub_tpu.parallel.mesh import (
        assert_partitioned)

    mesh = make_mesh()
    x = shard_batch(mesh, {"x": np.zeros((16, 4), np.float32)})["x"]
    assert_partitioned(x, 0, 8, "x")                  # the true claim
    with pytest.raises(AssertionError, match="not divisible"):
        assert_partitioned(x, 0, 3, "x")
    with pytest.raises(AssertionError, match="not .*partitioned"):
        assert_partitioned(x, 1, 2, "x")              # replicated dim


@pytest.mark.parametrize("n", [8, 16])
def test_graft_dryrun_multichip(n):
    """The driver contract at n=8 (in-process: the suite's virtual mesh
    already has 8 devices) AND the 8dp x 2tp mesh at n=16 (re-execed in a
    16-virtual-device subprocess) — pinning the round-4 session claim as a
    regression test (VERDICT r4 weak #5)."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(n)
