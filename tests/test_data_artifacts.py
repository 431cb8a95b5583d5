"""Frozen data artifacts ship with the repo (VERDICT r1 items 1-2).

The reference loads fixed eval-subset index arrays at
base_evaluation.py:86-91 / nic.py:388-390 / depth_evaluation.py:88-95 and
globs sample pictures from ``sample_pic/<name>/`` at
base_evaluation.py:272-273. Both must exist in-repo for the ``score`` /
``sample`` parity paths to run as shipped.
"""

import glob
import os

import numpy as np
import pytest

from depth_image_captioning_pub_tpu.data.coco import load_index_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("fname,expected_len", [
    ("np_val_index.npy", 4000),        # COCO-val subset
    ("np_index_for_ori_val.npy", 2000),  # original-dataset subset
    ("remCOCO_500_ori.npy", 500),        # 500-image remCOCO subset
])
def test_index_files_shipped(fname, expected_len):
    path = os.path.join(REPO, "data_index", fname)
    assert os.path.exists(path), f"missing frozen index file {path}"
    idx = load_index_file(path)
    assert len(idx) == expected_len
    arr = np.asarray(idx)
    assert arr.dtype.kind == "i" and arr.min() >= 0
    # Indices must be unique: each selects a distinct val image.
    assert len(set(idx)) == expected_len


def test_config_eval_index_paths_resolve(monkeypatch):
    monkeypatch.chdir(REPO)
    from depth_image_captioning_pub_tpu.config import ConfigEval
    cfg = ConfigEval()
    assert len(load_index_file(cfg.index_dir)) == 4000
    assert len(load_index_file(cfg.Ori2000_index_dir)) == 2000
    assert len(load_index_file(cfg.remCOCO_500_ori_index_dir)) == 500


def test_shipped_sample_images_flow_through_sample_mode(tmp_path):
    """The shipped sample_pic JPEGs must decode and run through the real
    sample-mode path (resize, caption, overlay PNGs, caption.txt) —
    exercised with a stub captioner so no checkpoint is needed."""
    from depth_image_captioning_pub_tpu.engine.visualize import (
        sample_directory)

    k = 196
    id_to_word = {0: "<start>", 1: "a", 2: "dog", 3: "<end>"}

    def caption_one(arr):
        assert arr.shape == (224, 224, 3)
        assert arr.dtype == np.float32 and 0.0 <= arr.min() <= arr.max() <= 1.0
        tokens = np.array([0, 1, 2, 3], np.int32)
        alphas = np.full((4, k), 1.0 / k, np.float32)
        return tokens, alphas

    src = os.path.join(REPO, "sample_pic", "dog")
    captions = sample_directory(src, str(tmp_path), caption_one, id_to_word)
    assert captions and all(c == "a dog" for c in captions.values())
    assert os.path.exists(os.path.join(str(tmp_path), "caption.txt"))
    overlays = glob.glob(os.path.join(str(tmp_path), "*", "*.png"))
    assert overlays, "no overlay PNGs written"


def test_sample_dirs_exist_with_images(monkeypatch):
    monkeypatch.chdir(REPO)
    from depth_image_captioning_pub_tpu.config import ConfigEval
    cfg = ConfigEval()
    assert len(cfg.sample_dirs) == 11
    for name, d in cfg.sample_dirs.items():
        assert os.path.isdir(d), f"sample_pic dir missing: {name} -> {d}"
        imgs = glob.glob(os.path.join(d, "*.jpg")) + \
            glob.glob(os.path.join(d, "*.png")) + \
            glob.glob(os.path.join(d, "*.jpeg"))
        assert imgs, f"no images in sample dir {d}"
