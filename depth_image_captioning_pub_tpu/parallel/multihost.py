"""Multi-host (DCN) bootstrap.

The reference is strictly single-process/single-device (SURVEY.md §2.3);
this framework's data-parallel mesh extends across hosts with no further
code changes — `jax.devices()` returns the global device set after
`jax.distributed.initialize`, `parallel.mesh.make_mesh` builds the global
1-D mesh over it, and per-host input feeding follows the standard JAX SPMD
recipe (each host supplies its local shard of the global batch).

Tested for real in ``tests/test_multihost.py``: two separate processes
(4 virtual CPU devices each) join through ``initialize``, build the
8-device global mesh, and compute a global sum over per-host shards —
the analogue of the reference's *absent* multi-node NCCL story.
"""

from __future__ import annotations

from typing import Optional


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
