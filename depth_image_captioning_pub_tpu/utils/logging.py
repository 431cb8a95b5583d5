"""Training observability.

Keeps the reference's artifacts — per-epoch ``<model>_train_loss_<data><i>.csv``
/ ``..._val_loss...csv`` appended one ``epoch, loss`` row at a time
(reference: base_train.py:122-125, :178-179, :219-220) and the tqdm-style
moving-average progress line (reference: base_train.py:135, :174-175,
moving_avg=100 at config.py:71) — and adds structured JSONL metrics plus an
optional ``jax.profiler`` trace window, which the reference had no
equivalent of (SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import deque
from typing import Dict, Optional


class CsvLossLog:
    """Append-only 'epoch, loss' CSV, identical format to the reference."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def append(self, epoch: int, loss: float) -> None:
        with open(self.path, "a") as f:
            print(f"{epoch}, {loss}", file=f)


class JsonlLog:
    """Structured metrics, one JSON object per line."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def append(self, record: Dict) -> None:
        record = dict(record, time=time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


class ProgressMeter:
    """Moving-average loss line (stands in for the tqdm postfix)."""

    def __init__(self, window: int = 100, desc: str = "", quiet: bool = False,
                 print_every: int = 50):
        self.losses: deque = deque(maxlen=window)
        self.desc = desc
        self.quiet = quiet
        self.print_every = print_every
        self.count = 0
        self._t0 = time.time()

    def update(self, loss: float) -> None:
        self.losses.append(loss)
        self.count += 1
        if not self.quiet and self.count % self.print_every == 0:
            avg = sum(self.losses) / len(self.losses)
            rate = self.count / (time.time() - self._t0)
            print(f"\r{self.desc} step {self.count} "
                  f"loss(ma{self.losses.maxlen})={avg:.4f} "
                  f"{rate:.2f} it/s", end="", file=sys.stderr)

    def update_lazy(self, loss_fn) -> None:
        """Like update, but only materializes the loss when printing —
        lets the train loop keep losses on-device (no per-step host sync;
        the reference paid a ``.item()`` sync every step,
        base_train.py:170)."""
        self.count += 1
        if not self.quiet and self.count % self.print_every == 0:
            loss = float(loss_fn())
            self.losses.append(loss)
            rate = self.count / (time.time() - self._t0)
            print(f"\r{self.desc} step {self.count} loss={loss:.4f} "
                  f"{rate:.2f} it/s", end="", file=sys.stderr)

    def close(self) -> None:
        if not self.quiet:
            print(file=sys.stderr)

    @property
    def moving_avg(self) -> float:
        return sum(self.losses) / len(self.losses) if self.losses else 0.0


class ProfilerTrace:
    """Optional jax.profiler trace window around N hot steps."""

    def __init__(self, log_dir: Optional[str] = None):
        self.log_dir = log_dir
        self._active = False

    def maybe_start(self) -> None:
        if self.log_dir and not self._active:
            import jax
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def maybe_stop(self) -> None:
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False
