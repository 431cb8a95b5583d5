"""Train-time cache of frozen-encoder features.

The reference re-runs its frozen ResNet-152 on every image of every epoch
for all 150 epochs x 3 runs (the encoder is never trained:
base_caption_models.py:36-45 wraps the forward in @torch.no_grad, and the
optimizer sees decoder params only, base_train.py:115) — the only frozen
stage it ever caches is the depth map (epoch-0 dict, depth_train.py:184-202).
This module generalizes that idea to the RGB encoder, the same way
engine/evaluate.py's set cache already does for evaluation: materialize the
frozen features once per image into a disk memmap, then train every epoch
(including the first) from cached features, skipping the whole conv stack.

What is cached per dataset index:
* attention kinds: the [196, 2048] annotation grid (AttentionGridEncoder
  output, encoder dtype — bfloat16 by default);
* NIC: the [2048] pooled backbone output (the trainable projection layer
  stays in the step; reference trains exactly encoder.linear, nic.py:243-245).

Fidelity: features are stored in the encoder's own output dtype as raw
bytes (bfloat16 via ml_dtypes — never a lossy cast), so every epoch (and
every rerun/resume) replays bit-identical values. Against the online
(encoder-in-step) path the trajectory agrees to FP tolerance, not bitwise:
under a GSPMD mesh the standalone encode program and the fused train step
compile differently and reorder low bfloat16 bits (measured ~2e-6 relative
on the loss; the single-device step boundary IS bitwise) — both pinned in
tests/test_feature_cache.py. A blake2b digest of the frozen
encoder params + dtype + grid shape keys the sidecar, so a different
checkpoint/seed/backbone rebuilds instead of replaying stale features.

Cost model (why this is opt-in): COCO-train (82k images) needs ~66 GB of
bf16 grid features on disk, vs ~11.6 GFLOP/image of ResNet-152 compute
saved per epoch — a clear win for the reference's 150-epoch runs when the
disk exists, pointless for one-epoch smoke runs. NIC's pooled cache is
tiny (~0.3 GB) and almost always worth it.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable, Optional, Tuple

import numpy as np


def _dtype_from_name(name: str) -> np.dtype:
    if name == "bfloat16":
        import ml_dtypes
        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


def frozen_digest(frozen_enc, encoder_dtype, feat_shape: Tuple[int, ...]
                  ) -> str:
    """Digest of everything that determines the cached values."""
    import jax
    h = hashlib.blake2b(digest_size=16)
    h.update(f"{np.dtype(encoder_dtype).name}|{tuple(feat_shape)}".encode())
    leaves, treedef = jax.tree_util.tree_flatten(frozen_enc)
    h.update(repr(treedef).encode())
    for leaf in leaves:
        arr = np.asarray(leaf)
        h.update(str(arr.shape).encode())
        h.update(str(arr.dtype).encode())
        h.update(arr.tobytes())
    return h.hexdigest()


class FeatureCache:
    """Raw-bytes memmap of per-image frozen features + JSON sidecar.

    Raw memmap (not .npy) because bfloat16's dtype descr does not
    round-trip through the npy header; the sidecar carries shape/dtype
    plus the frozen-params digest and a completeness flag (an interrupted
    build is an automatic miss).
    """

    def __init__(self, path: str, num_images: int,
                 feat_shape: Tuple[int, ...], dtype, digest: str):
        self.path = path
        self.meta_path = path + ".json"
        self.shape = (num_images, *feat_shape)
        self.dtype = np.dtype(dtype)
        self.digest = digest

    def exists(self) -> bool:
        if not (os.path.exists(self.path) and os.path.exists(self.meta_path)):
            return False
        try:
            with open(self.meta_path) as f:
                meta = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        return (tuple(meta.get("shape", ())) == self.shape
                and meta.get("dtype") == self.dtype.name
                and meta.get("digest") == self.digest
                and bool(meta.get("complete")))

    def build(self, dataset, encode_fn: Callable, frozen_enc,
              batch_size: int = 64, quiet: bool = False) -> None:
        """Run ``encode_fn(frozen_enc, uint8_images) -> features`` (jitted
        once here) over the dataset; one frozen forward per image, total."""
        import jax
        import jax.numpy as jnp
        from depth_image_captioning_pub_tpu.data.pipeline import _load_chunk
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        mm = np.memmap(self.path, mode="w+", dtype=self.dtype,
                       shape=self.shape)
        fn = jax.jit(encode_fn)
        n = self.shape[0]
        for start in range(0, n, batch_size):
            idx = list(range(start, min(start + batch_size, n)))
            # decode through the SAME loader path as train_batches
            # (native libjpeg when available): the PIL fallback's pixels
            # differ in low bits, which would break the exactness contract
            imgs = np.stack(_load_chunk(dataset, idx))
            if len(idx) < batch_size:  # static shape for jit
                pad = batch_size - len(idx)
                imgs = np.concatenate([imgs, imgs[:1].repeat(pad, 0)])
            feats = np.asarray(fn(frozen_enc, jnp.asarray(imgs)))[: len(idx)]
            mm[idx[0]: idx[-1] + 1] = feats.astype(self.dtype)
            if not quiet and (start // batch_size) % 10 == 0:
                print(f"feature cache: {start + len(idx)}/{n}")
        mm.flush()
        with open(self.meta_path, "w") as f:
            json.dump({"shape": list(self.shape), "dtype": self.dtype.name,
                       "digest": self.digest, "complete": True}, f)

    def open(self) -> np.memmap:
        return np.memmap(self.path, mode="r", dtype=self.dtype,
                         shape=self.shape)


def cached_feature_provider(cache: FeatureCache) -> Callable:
    """(indices) -> features for the batch, gathered from the memmap.

    Matches the train loop's feature_provider contract
    (engine/train.py to_device): padded rows repeat real indices
    (data/pipeline.py make_train_batch), so the gather needs no special
    casing — pad rows fetch a real image's features and the loss mask
    drops them.
    """
    mm = cache.open()

    def provider(indices) -> np.ndarray:
        return np.asarray(mm[np.asarray(indices)])

    return provider


def build_or_open(cache_dir: str, split: str, dataset, encode_fn: Callable,
                  frozen_enc, feat_shape: Tuple[int, ...], dtype,
                  batch_size: int = 64, quiet: bool = False) -> Callable:
    """Resolve one split's cache (digest-named file under ``cache_dir``),
    build it if missing/stale, and return its provider."""
    digest = frozen_digest(frozen_enc, dtype, feat_shape)
    path = os.path.join(cache_dir, f"feat_{split}_{digest[:16]}.bin")
    cache = FeatureCache(path, len(dataset), feat_shape, dtype, digest)
    if not cache.exists():
        if not quiet:
            print(f"feature cache: building {split} "
                  f"({len(dataset)} images -> {path})")
        cache.build(dataset, encode_fn, frozen_enc, batch_size=batch_size,
                    quiet=quiet)
    return cached_feature_provider(cache)
