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
    """Full-train-state checkpoints with resume (orbax PyTreeCheckpointer).

    ``async_save=True`` overlaps the disk write with training: ``save``
    fetches the state to host synchronously (the device buffers may be
    donated to the next step) and hands the orbax write to a single
    background thread — the train loop only ever blocks on a still-running
    PREVIOUS write. ``wait()`` drains the in-flight write; ``latest_step``/
    ``restore`` drain implicitly so a reader never sees a half-written
    checkpoint from this process. (orbax ships an AsyncCheckpointer with
    the same contract; this 15-line thread keeps the sync/async paths on
    one code path and the drain points explicit — revisit if multi-host
    checkpointing ever needs orbax's coordination.)
    """

    def __init__(self, directory: str, async_save: bool = False,
                 keep: int = 0):
        import orbax.checkpoint as ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep = keep  # retain only the newest `keep` steps (0 = all)
        self._ckptr = ocp.PyTreeCheckpointer()
        self._executor = None
        self._pending = None
        if async_save:
            from concurrent.futures import ThreadPoolExecutor
            self._executor = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-save")

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"state_{step}")

    def _steps(self) -> list:
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("state_"):
                try:
                    steps.append(int(name.split("_", 1)[1]))
                except ValueError:
                    pass
        return steps

    def _prune(self) -> None:
        """Delete all but the newest ``keep`` checkpoints. Runs after a
        completed write (on the writer thread when async), so a reader
        that drains via wait() never sees the latest step disappear."""
        if not self.keep:
            return
        import shutil
        for step in sorted(self._steps())[:-self.keep]:
            shutil.rmtree(self._path(step), ignore_errors=True)

    def _write(self, step: int, host_state: Any, force: bool) -> None:
        self._ckptr.save(self._path(step), host_state, force=force)
        self._prune()

    def save(self, step: int, state: Any, force: bool = True) -> None:
        if self._executor is None:
            self._write(step, _to_numpy(state), force)
            return
        # np.asarray aliases arrays already on host, so snapshot with a real
        # copy — the caller may mutate (or the device may donate) its
        # buffers the moment save() returns.
        host = jax.tree_util.tree_map(
            lambda x: np.array(x, copy=True), state)
        self.wait()                       # at most one write in flight
        self._pending = self._executor.submit(self._write, step, host, force)

    def wait(self) -> None:
        """Block until the in-flight async write (if any) completes;
        re-raises its exception."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()

    def latest_step(self) -> Optional[int]:
        self.wait()
        steps = self._steps()
        return max(steps) if steps else None

    def restore(self, step: int, template: Any) -> Any:
        self.wait()
        restored = self._ckptr.restore(self._path(step), item=_to_numpy(template))
        return restored
