"""Shared tiny training run for the multi-host equality test.

Both the single-process ground truth (8 local virtual devices) and each
two-process child (4 virtual devices per "host") build the SAME tiny
base-soft captioner, the SAME deterministic batches, and run the SAME
jitted train step (engine/steps.make_attention_train_step) over an
8-device data mesh — only the feeding differs: the parent shards full
host batches (parallel.mesh.shard_batch), each child supplies its local
half and assembles the global batch (parallel.multihost.global_batch).
Equal losses/params prove the engine's train step is multi-host-correct,
not just multi-device-correct (SURVEY.md §2.3: the reference has no
multi-node story at all).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

VOCAB = 24
GLOBAL_BATCH = 16
STEPS = 3
HW = (64, 64)
CAP_LEN = 8


def mh_replicate(mesh, tree):
    """Replicate a pytree on every mesh device, single- or multi-process.

    Multi-process replication goes through
    ``jax.make_array_from_process_local_data`` (every process supplies the
    same full value; only addressable shards are populated locally)."""
    from depth_image_captioning_pub_tpu.parallel.mesh import (
        replicated_sharding)
    sh = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), tree)


def build():
    from depth_image_captioning_pub_tpu.config import ConfigTrain
    from depth_image_captioning_pub_tpu.engine.steps import (
        TrainState, make_attention_train_step, make_optimizer)
    from depth_image_captioning_pub_tpu.models.captioner import (
        build_captioner)
    cfg = ConfigTrain()
    cfg.max_caption_len = CAP_LEN
    cap = build_captioner("base-soft", VOCAB, cfg,
                          encoder_dtype=jnp.float32,
                          resnet_layers=(1, 1, 1, 1))
    params, frozen, stats = cap.init(jax.random.PRNGKey(0), image_hw=HW)
    opt = make_optimizer(1e-3)
    step = make_attention_train_step(cap.encoder_apply(),
                                     cap.decoder_apply(), opt,
                                     alpha_reg=0.7, donate=False)
    state = TrainState(params, opt.init(params), frozen, stats,
                       jnp.int32(0))
    return step, state


def global_batches():
    rng = np.random.default_rng(42)
    for _ in range(STEPS):
        yield {
            "images": rng.random((GLOBAL_BATCH, *HW, 3),
                                 dtype=np.float32),
            "captions": rng.integers(
                0, VOCAB, (GLOBAL_BATCH, CAP_LEN)).astype(np.int32),
            "lengths": np.full((GLOBAL_BATCH,), CAP_LEN, np.int32),
            "pad_mask": np.ones((GLOBAL_BATCH,), bool),
        }


def run(mesh, feed):
    """Run STEPS train steps; ``feed(batch_np)`` places a global batch on
    the mesh. Returns (per-step losses, |decoder-leaf| digest)."""
    step, state = build()
    state = mh_replicate(mesh, state)
    losses = []
    for i, b in enumerate(global_batches()):
        dev = feed(b)
        state, m = step(state, dev, jax.random.PRNGKey(100 + i),
                        jnp.float32(1.0))
        losses.append(float(m["loss"]))
    leaf = jax.tree_util.tree_leaves(state.params["decoder"])[0]
    return losses, float(jnp.sum(jnp.abs(leaf)))
