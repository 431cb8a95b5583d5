"""Checkpointing.

Two layers, both improvements over the reference's bare
``torch.save(state_dict)`` on new-best-val (reference: base_train.py:223-234;
SURVEY.md §5 notes it keeps no optimizer state and cannot resume):

* ``save_component`` / ``load_component`` — single-file msgpack pytrees with
  the reference's *filename contract* (config.py:121-179 tables), so the
  eval CLIs find per-run encoder/decoder files where they expect them. Files
  written with a ``.pth`` basename get a ``.msgpack`` suffix appended; the
  loader falls back to the torch bridge for genuine torch files.
* ``TrainCheckpointer`` — orbax-backed full train state (params, optimizer,
  batch stats, epoch, best val loss) enabling crash-safe resume, which the
  reference lacks entirely.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_component(path: str, tree: Any) -> str:
    """Serialize a pytree to <path>.msgpack (appending to any .pth name)."""
    if not path.endswith(".msgpack"):
        path = path + ".msgpack"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(_to_numpy(tree)))
    return path


def load_component(path: str, template: Any) -> Any:
    """Load a component saved by save_component, or a torch .pth via the
    bridge if the msgpack twin does not exist."""
    mp = path if path.endswith(".msgpack") else path + ".msgpack"
    if os.path.exists(mp):
        with open(mp, "rb") as f:
            return serialization.from_bytes(template, f.read())
    if os.path.exists(path) and path.endswith((".pth", ".ckpt", ".pt")):
        raise ValueError(
            f"{path} is a torch checkpoint; convert it with utils.torch_bridge")
    raise FileNotFoundError(mp)


class TrainCheckpointer:
    """Full-train-state checkpoints with resume (orbax PyTreeCheckpointer)."""

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"state_{step}")

    def save(self, step: int, state: Any, force: bool = True) -> None:
        self._ckptr.save(self._path(step), _to_numpy(state), force=force)

    def latest_step(self) -> Optional[int]:
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("state_"):
                try:
                    steps.append(int(name.split("_", 1)[1]))
                except ValueError:
                    pass
        return max(steps) if steps else None

    def restore(self, step: int, template: Any) -> Any:
        restored = self._ckptr.restore(self._path(step), item=_to_numpy(template))
        return restored
