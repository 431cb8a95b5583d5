"""Precomputed depth-map cache.

The reference computes DPT depth per batch during epoch 0 and caches the
result on CPU in a dict keyed by the *joined caption string*
(reference: depth_train.py:184-202) — colliding for duplicate caption sets
and breaking on the final partial batch (SURVEY.md §4.1). The TPU-native
replacement materializes standardized 224x224 depth maps for the whole
dataset once, keyed by dataset index, into a float16 memmap:

* 4000 images x 224^2 x f16 = ~380 MB on disk, trivially mmap-able;
* the expensive DPT-hybrid forward runs exactly once per image at full
  batch, instead of once per epoch-0 batch with Python dict bookkeeping;
* training epochs then stream depth maps from the mmap with zero DPT cost.
"""

from __future__ import annotations

import json
import os
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp


class DepthMapCache:
    """float16 [N, 224, 224, 1] memmap + metadata sidecar."""

    def __init__(self, path: str, num_images: int, hw=(224, 224)):
        self.path = path
        self.meta_path = path + ".json"
        self.num_images = num_images
        self.hw = hw
        self.shape = (num_images, hw[0], hw[1], 1)

    def exists(self) -> bool:
        if not (os.path.exists(self.path) and os.path.exists(self.meta_path)):
            return False
        with open(self.meta_path) as f:
            meta = json.load(f)
        return tuple(meta["shape"]) == self.shape and meta.get("complete")

    def build(self, dataset, depth_fn: Callable, dpt_variables,
              batch_size: int = 32, quiet: bool = False) -> None:
        """Run ``depth_fn(variables, images)`` over the dataset."""
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        mm = np.lib.format.open_memmap(self.path, mode="w+",
                                       dtype=np.float16, shape=self.shape)
        fn = jax.jit(depth_fn)
        n = len(dataset)
        for start in range(0, n, batch_size):
            idx = list(range(start, min(start + batch_size, n)))
            imgs = np.stack([dataset.load_image(i) for i in idx])
            if len(idx) < batch_size:  # static shape for jit
                pad = batch_size - len(idx)
                imgs = np.concatenate([imgs, imgs[:1].repeat(pad, 0)])
            maps = np.asarray(fn(dpt_variables, jnp.asarray(imgs)))[: len(idx)]
            mm[idx[0]: idx[-1] + 1] = maps.astype(np.float16)
            if not quiet and (start // batch_size) % 10 == 0:
                print(f"depth cache: {start + len(idx)}/{n}")
        mm.flush()
        with open(self.meta_path, "w") as f:
            json.dump({"shape": list(self.shape), "complete": True}, f)

    def open(self) -> np.ndarray:
        return np.load(self.path, mmap_mode="r")


def cached_depth_provider(cache: DepthMapCache) -> Callable:
    """Provider reading from a built cache by the batch's dataset indices.

    Signature (images_01, indices) -> depth maps, matching the train loop's
    depth_provider contract (engine/train.py to_device)."""
    mm = cache.open()

    def provider(images_01, indices):
        return np.asarray(mm[np.asarray(indices)], dtype=np.float32)

    return provider


def online_depth_provider(depth_fn: Callable, dpt_variables) -> Callable:
    """Compute depth maps on-device per batch (used when no cache exists,
    and always for eval — the reference's eval also recomputes per batch,
    depth_evaluation.py:154-158). ``depth_fn(variables, images)`` is pure;
    variables stay a runtime argument (jit-constant DPT params overflow the
    remote compiler)."""
    fn = jax.jit(depth_fn)

    def provider(images_01: np.ndarray, indices=None) -> np.ndarray:
        return np.asarray(fn(dpt_variables, jnp.asarray(images_01)))

    return provider
