"""Tensor parallelism over a 2-D (data, model) mesh.

The reference is strictly single-device (SURVEY.md §2.3; reference
config.py:68), and this framework's default scaling story is the 1-D data
mesh in parallel/mesh.py — the models here are small enough that dp is the
right tool. Tensor parallelism is nevertheless a first-class *option*: at
serving scale a 123M-param DPT plus large eval batches can exceed one
chip's HBM, and the idiomatic TPU answer is not manual NCCL-style sharding
but GSPMD — annotate parameter placements over a named mesh axis and let
XLA partition every matmul and insert the collectives (psum over ICI) for
row-parallel contractions.

Design (Megatron-style, expressed purely as PartitionSpecs — zero model
code changes, the global math is untouched so results match the unsharded
model to FP reduction order):

* ViT blocks (models/dpt.py): ``qkv``/``fc1`` kernels column-parallel
  ``P(None, "model")`` (their biases shard the output dim), ``proj``/
  ``fc2`` kernels row-parallel ``P("model", None)`` with replicated
  biases added after the XLA-inserted psum.
* Attention decoder (models/decoder.py): the vocab projection ``out_w``
  [d_dec, vocab] is column-parallel (the largest trainable matmul), the
  LSTM input/hidden kernels shard their 4*d_dec gate dim, ``embed``
  shards the embedding feature dim.
* Everything else (convs, norms, small attention vectors) replicates —
  sharding 3x3 convs at these channel counts only adds latency.

Rules match on trailing parameter-path components, so the same spec
function applies unchanged to ``TrainState`` (optax mu/nu mirror the param
paths), to the frozen encoder tree, and to DPT variables.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from depth_image_captioning_pub_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"

# (trailing path components) -> spec. Checked most-specific-first; a rule
# only fires when the leaf's ndim matches the spec length.
_COLUMN_KERNELS = ("qkv", "fc1")      # kernel [in, out] -> split out
_ROW_KERNELS = ("proj", "fc2")        # kernel [in, out] -> split in
_COLUMN_FLAT = ("out_w", "lstm_w_ih", "lstm_w_hh", "embed")
_COLUMN_BIAS = ("out_b", "lstm_b_ih", "lstm_b_hh")


def make_mesh_2d(n_data: int, n_model: int,
                 devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """(data, model) mesh; model axis innermost so TP collectives ride the
    fastest ICI links (scaling-book layout rule)."""
    devices = list(devices) if devices is not None else jax.devices()
    if len(devices) < n_data * n_model:
        raise ValueError(
            f"need {n_data * n_model} devices, have {len(devices)}")
    grid = np.array(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _path_names(path) -> tuple:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
    return tuple(names)


def spec_for(path, leaf) -> P:
    """PartitionSpec for one parameter leaf by its tree path."""
    names = _path_names(path)
    last = names[-1] if names else ""
    parent = names[-2] if len(names) > 1 else ""
    ndim = getattr(leaf, "ndim", 0)
    if ndim == 2:
        if last == "kernel" and parent in _COLUMN_KERNELS:
            return P(None, MODEL_AXIS)
        if last == "kernel" and parent in _ROW_KERNELS:
            return P(MODEL_AXIS, None)
        if last in _COLUMN_FLAT:
            return P(None, MODEL_AXIS)
    if ndim == 1:
        if last == "bias" and parent in _COLUMN_KERNELS:
            return P(MODEL_AXIS)
        if last in _COLUMN_BIAS:
            return P(MODEL_AXIS)
    return P()


def tp_specs(tree):
    """Pytree of PartitionSpecs mirroring ``tree`` (params, TrainState,
    frozen weights, or DPT variables — rules are path-suffix based)."""
    return jax.tree_util.tree_map_with_path(spec_for, tree)


def shard_tree(mesh: Mesh, tree):
    """Place a pytree on the mesh under its TP specs (replicated default)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            x, NamedSharding(mesh, spec_for(path, x))), tree)


def shard_batch_2d(mesh: Mesh, batch):
    """Shard a host batch over the data axis of a 2-D mesh (replicated over
    model)."""
    data_sh = NamedSharding(mesh, P(DATA_AXIS))

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, data_sh)

    return jax.tree_util.tree_map(put, batch)
