"""Multi-host (DCN) bootstrap.

The reference is strictly single-process/single-device (SURVEY.md §2.3);
this framework's data-parallel mesh extends across hosts with no further
code changes — `jax.devices()` returns the global device set after
`jax.distributed.initialize`, `parallel.mesh.make_mesh` builds the global
1-D mesh over it, and per-host input feeding follows the standard JAX SPMD
recipe (each host supplies its local shard of the global batch).

Tested for real in ``tests/test_multihost.py``: two separate processes
(4 virtual CPU devices each) join through ``initialize``, build the
8-device global mesh, compute a global sum over per-host shards, and —
the part that matters — run the ENGINE's jitted train step
(engine/steps.make_attention_train_step) with per-host batch halves fed
through ``global_batch``, matching a single-process 8-device run's loss
trajectory and final params. The full train loop (engine/train.py) is
multi-host aware: artifacts are written by process 0 only.
This is the analogue of the reference's *absent* multi-node NCCL story.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host JAX runtime (no-op args -> env autodetection).

    Call before any other JAX API on every host; afterwards the regular
    train path (make_mesh over jax.devices(), shard_batch) is multi-host.
    """
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def host_shard_indices(n_examples: int,
                       process_index: Optional[int] = None,
                       process_count: Optional[int] = None
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """(indices, real_mask) for THIS host's slice of a global dataset.

    Host ``i`` of ``P`` feeds rows ``[i*m, (i+1)*m)`` of the global order
    with ``m = ceil(n/P)``; the tail wraps so every host supplies the same
    static count. ``real_mask`` flags non-wrapped rows — thread it into the
    batch's ``pad_mask`` so wrapped duplicates are excluded from losses and
    metrics exactly like the single-host pipeline's fill padding.
    """
    if process_index is None or process_count is None:
        import jax
        process_index = (jax.process_index() if process_index is None
                         else process_index)
        process_count = (jax.process_count() if process_count is None
                         else process_count)
    m = -(-n_examples // process_count)
    raw = np.arange(process_index * m, (process_index + 1) * m)
    return raw % n_examples, raw < n_examples


def global_batch(mesh, local_batch, axis_name: str = "data"):
    """Assemble the global batch from each host's local shard: every leaf's
    leading dim becomes ``local * process_count``, sharded over the mesh's
    data axis (``jax.make_array_from_process_local_data`` — the standard
    SPMD feeding recipe)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        x = np.asarray(x)
        gshape = (x.shape[0] * jax.process_count(), *x.shape[1:])
        return jax.make_array_from_process_local_data(sharding, x, gshape)

    return jax.tree_util.tree_map(put, local_batch)
