"""Checkpoint/resume tests (new capability over the reference, which has no
optimizer state or resume — SURVEY.md §5): interrupted training resumes from
the last full-state checkpoint with identical state."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from depth_image_captioning_pub_tpu.config import ConfigTrain
from depth_image_captioning_pub_tpu.engine.train import train
from depth_image_captioning_pub_tpu.utils.checkpoint import (
    TrainCheckpointer, load_component, save_component)

TINY = (1, 1, 1, 1)


def test_component_roundtrip(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": {"c": np.ones((4,), np.int32)}}
    path = save_component(str(tmp_path / "enc_best.pth"), tree)
    assert path.endswith(".pth.msgpack")
    out = load_component(str(tmp_path / "enc_best.pth"), tree)
    np.testing.assert_array_equal(out["a"], tree["a"])
    np.testing.assert_array_equal(out["b"]["c"], tree["b"]["c"])


def test_train_checkpointer_roundtrip(tmp_path):
    ck = TrainCheckpointer(str(tmp_path / "ckpts"))
    state = {"w": np.full((3, 3), 2.0, np.float32), "epoch": 4,
             "best_val": 1.25}
    ck.save(4, state)
    ck.save(7, dict(state, epoch=7))
    assert ck.latest_step() == 7
    restored = ck.restore(7, state)
    assert restored["epoch"] == 7
    np.testing.assert_array_equal(restored["w"], state["w"])


def test_train_checkpointer_async_roundtrip(tmp_path):
    """async_save: the write happens on a background thread; the next save
    (or any read) drains the in-flight one, and the source buffer can be
    mutated right after save() returns (state is fetched synchronously)."""
    ck = TrainCheckpointer(str(tmp_path / "ckpts"), async_save=True)
    w = np.full((3, 3), 2.0, np.float32)
    state = {"w": w, "epoch": 4, "best_val": 1.25}
    ck.save(4, state)
    w[:] = -1.0                      # must not leak into the checkpoint
    ck.save(7, {"w": np.ones((3, 3), np.float32), "epoch": 7,
                "best_val": 0.5})
    assert ck.latest_step() == 7     # drains the in-flight write
    r4 = ck.restore(4, state)
    assert r4["epoch"] == 4
    np.testing.assert_array_equal(r4["w"], np.full((3, 3), 2.0, np.float32))
    r7 = ck.restore(7, state)
    assert r7["epoch"] == 7
    ck.wait()                        # idempotent when nothing is in flight


def test_keep_prunes_old_checkpoints(tmp_path):
    """keep=K retains only the newest K steps, sync and async; the latest
    step stays restorable after every prune."""
    for async_save in (False, True):
        ck = TrainCheckpointer(str(tmp_path / f"ck_{async_save}"),
                               async_save=async_save, keep=2)
        state = {"w": np.ones((2,), np.float32), "epoch": 0}
        for step in (1, 3, 5, 7):
            ck.save(step, dict(state, epoch=step))
        assert ck.latest_step() == 7   # drains the in-flight write
        kept = sorted(int(n.split("_")[1])
                      for n in os.listdir(ck.directory)
                      if n.startswith("state_"))
        assert kept == [5, 7]
        assert ck.restore(7, state)["epoch"] == 7


def test_resume_matches_uninterrupted(tmp_path, synthetic_coco):
    """Train 1 epoch + checkpoint, resume for epoch 2 -> same artifacts as a
    straight 2-epoch run with identical seeds."""
    from depth_image_captioning_pub_tpu.data.coco import CocoCaptions
    from depth_image_captioning_pub_tpu.data.vocab import (
        build_vocab, captions_from_coco_json)
    img_dir, ann_file = synthetic_coco
    w2i, _ = build_vocab(captions_from_coco_json(ann_file), [], min_count=1)
    ds = CocoCaptions(img_dir, ann_file, image_size=(64, 64))

    def cfg_for(sub):
        cfg = ConfigTrain()
        cfg.batch_size = 4
        cfg.max_caption_len = 10
        cfg.save_directory_soft = str(tmp_path / sub)
        return cfg

    # straight 2-epoch run
    cfg_a = cfg_for("straight")
    train("base-soft", 0, cfg=cfg_a, datasets=(ds, ds), word_to_id=w2i,
          num_epochs=2, quiet=True, resnet_layers=TINY)

    # 1 epoch + checkpoint, then resume to 2
    cfg_b = cfg_for("resumed")
    train("base-soft", 0, cfg=cfg_b, datasets=(ds, ds), word_to_id=w2i,
          num_epochs=1, quiet=True, resnet_layers=TINY, checkpoint_every=1)
    train("base-soft", 0, cfg=cfg_b, datasets=(ds, ds), word_to_id=w2i,
          num_epochs=2, quiet=True, resnet_layers=TINY, checkpoint_every=1,
          resume=True)

    va = open(f"{cfg_a.save_directory_soft}/base_soft_val_loss_coco0.csv").read()
    vb = open(f"{cfg_b.save_directory_soft}/base_soft_val_loss_coco0.csv").read()
    rows_a = va.strip().splitlines()
    rows_b = vb.strip().splitlines()
    assert len(rows_a) == 2 and len(rows_b) == 2
    # epoch-1 val loss must match closely (identical data order + params;
    # small float noise tolerated)
    la = float(rows_a[1].split(",")[1])
    lb = float(rows_b[1].split(",")[1])
    assert abs(la - lb) < 1e-4, (la, lb)
