"""Disk persistence for the eval set cache (engine/evaluate.py).

The reference recomputes every frozen stage — JPEG decode, ResNet-152
features, DPT depth maps — for every checkpoint set of every evaluation
run (reference: depth_evaluation.py:154-158, base_evaluation.py:134-141).
The in-process set cache already collapses checkpoint sets 2-3 onto set
1's captured outputs; this module persists those outputs so SUBSEQUENT
INVOCATIONS skip the frozen compute too: when iterating on a decoder,
every ``base_evaluation.py score`` run after the first replays cached
encoder features (and DPT maps) instead of re-decoding and re-encoding
the whole subset.

Exactness: array bits round-trip exactly — raw little-endian bytes plus a
dtype tag (bfloat16 included via ml_dtypes), never a lossy cast. A cache
entry is keyed by two digests that must both match:

- ``data_key``: every image's path/size/mtime + its reference captions +
  the batch/pad shape and image size — a make-style staleness check over
  the dataset and batching;
- ``model_key``: digest of the frozen parameter trees (encoder + DPT) and
  the knobs that change frozen outputs (encoder dtype, dpt_image_size,
  the --gelu flavor, grid size, model kind).

Any mismatch is a miss and the cache silently refills. Writes go to a
temp dir then ``os.replace`` (atomic), so an interrupted fill never
leaves a readable half-cache.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

FORMAT_VERSION = 1


def _dtype_from_name(name: str):
    if name == "bfloat16":
        import ml_dtypes
        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


def _hash_tree(h, tree) -> None:
    """Feed a pytree's structure, shapes, dtypes, and raw bytes into h."""
    import jax
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    h.update(repr(treedef).encode())
    for leaf in leaves:
        arr = np.asarray(leaf)
        h.update(str(arr.shape).encode())
        h.update(str(arr.dtype).encode())
        h.update(arr.tobytes())


def model_key(frozen_enc, dpt_variables, encoder_dtype, cfg,
              kind: str) -> str:
    """Digest of everything on the frozen side that shapes cached values."""
    from depth_image_captioning_pub_tpu.models import dpt as dpt_mod
    h = hashlib.blake2b(digest_size=16)
    h.update(f"v{FORMAT_VERSION}|{kind}|{np.dtype(encoder_dtype).name}|"
             f"{int(getattr(cfg, 'enc_img_size', 14))}|"
             f"{int(getattr(cfg, 'dpt_image_size', 384))}|"
             f"gelu_tanh={bool(dpt_mod.GELU_APPROXIMATE)}".encode())
    _hash_tree(h, frozen_enc)
    if dpt_variables is not None:
        _hash_tree(h, dpt_variables)
    return h.hexdigest()


def data_key(dataset, batch_size: int, pad_to: int) -> Optional[str]:
    """Digest of the dataset + batching, or None if the dataset can't be
    fingerprinted (no image paths — then the disk cache stays off)."""
    base = getattr(dataset, "dataset", dataset)
    if not hasattr(base, "image_path"):
        return None
    indices = getattr(dataset, "indices", range(len(dataset)))
    h = hashlib.blake2b(digest_size=16)
    h.update(f"v{FORMAT_VERSION}|b{batch_size}|p{pad_to}|"
             f"hw{getattr(base, 'image_size', None)}".encode())
    for i in indices:
        path = base.image_path(i)
        try:
            st = os.stat(path)
        except OSError:
            return None
        h.update(path.encode())
        h.update(f"|{st.st_size}|{st.st_mtime_ns}|".encode())
        for c in base.captions(i):
            h.update(c.encode())
        h.update(b";")
    return h.hexdigest()


def _entry_dir(root: str, dkey: str, mkey: str) -> str:
    return os.path.join(root, f"{dkey[:16]}-{mkey[:16]}")


def save(root: str, dkey: str, mkey: str, set_cache: Dict[str, Any],
         quiet: bool = False) -> None:
    """Persist a filled set cache atomically under ``root``."""
    final = _entry_dir(root, dkey, mkey)
    os.makedirs(root, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".fill-", dir=root)
    try:
        manifest: Dict[str, Any] = {
            "version": FORMAT_VERSION, "data_key": dkey, "model_key": mkey,
            "entries": [], "refs": [list(r) for r in set_cache["refs"]],
        }
        for ei, (aux, n_valid) in enumerate(set_cache["entries"]):
            arrays: Dict[str, Any] = {}
            for name, val in aux.items():
                if val is None:
                    arrays[name] = None
                    continue
                arr = np.asarray(val)
                fname = f"e{ei}_{name}.bin"
                with open(os.path.join(tmp, fname), "wb") as f:
                    f.write(arr.tobytes())
                arrays[name] = {"file": fname, "shape": list(arr.shape),
                                "dtype": arr.dtype.name}
            manifest["entries"].append({"n_valid": int(n_valid),
                                        "arrays": arrays})
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        if os.path.isdir(final):  # a concurrent fill won the race; keep it
            import shutil
            shutil.rmtree(tmp)
            return
        os.replace(tmp, final)
        if not quiet:
            print(f"eval cache: saved {len(manifest['entries'])} batches "
                  f"to {final}")
    except BaseException:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def load(root: str, dkey: str, mkey: str, sharding=None,
         quiet: bool = False) -> Optional[Dict[str, Any]]:
    """Load a persisted set cache; None on any miss/mismatch/corruption.

    Arrays land on device immediately (``jax.device_put``, batch-sharded
    when ``sharding`` is given, matching a fill pass's placement) so the
    replay sets pay the host->device transfer once per invocation.
    """
    import jax
    d = _entry_dir(root, dkey, mkey)
    mpath = os.path.join(d, "manifest.json")
    try:
        with open(mpath) as f:
            manifest = json.load(f)
        if (manifest.get("version") != FORMAT_VERSION
                or manifest.get("data_key") != dkey
                or manifest.get("model_key") != mkey):
            return None
        entries: List[Tuple[Dict[str, Any], int]] = []
        for ent in manifest["entries"]:
            aux: Dict[str, Any] = {}
            for name, spec in ent["arrays"].items():
                if spec is None:
                    aux[name] = None
                    continue
                with open(os.path.join(d, spec["file"]), "rb") as f:
                    raw = f.read()
                arr = np.frombuffer(
                    raw, dtype=_dtype_from_name(spec["dtype"])
                ).reshape(spec["shape"])
                aux[name] = (jax.device_put(arr, sharding)
                             if sharding is not None else jax.device_put(arr))
            entries.append((aux, int(ent["n_valid"])))
        if not quiet:
            print(f"eval cache: loaded {len(entries)} batches from {d} "
                  f"(frozen stages skipped)")
        return {"entries": entries,
                "refs": [list(r) for r in manifest["refs"]]}
    except (OSError, ValueError, KeyError, json.JSONDecodeError):
        return None
