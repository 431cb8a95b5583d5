"""Real multi-process (multi-host analogue) test of parallel/multihost.py.

Spawns TWO separate processes, each a 4-virtual-device CPU "host", joins
them with ``multihost.initialize`` (jax.distributed under the hood), and
runs a global-sum over an 8-device mesh where each host contributes
distinct local data — proving the documented recipe (global mesh over
jax.devices() + per-host shard feeding) actually works, not just reads
well. SURVEY.md §2.3: the reference has no multi-node story at all.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


# 8-virtual-device collective tests: their XLA rendezvous SIGABRTs when
# starved >~40 s on a contended 1-core host (STATUS.md) — run this chunk
# solo: `pytest -m multidevice`; everything else: `pytest -m 'not
# multidevice'` (README Testing section).
pytestmark = pytest.mark.multidevice
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys
sys.path.insert(0, "@REPO@")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from depth_image_captioning_pub_tpu.parallel import multihost
from depth_image_captioning_pub_tpu.parallel.mesh import make_mesh

pid = int(sys.argv[1])
multihost.initialize(coordinator_address=sys.argv[2],
                     num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert jax.local_device_count() == 4

mesh = make_mesh(jax.devices())
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sharding = NamedSharding(mesh, P("data"))
# host 0 contributes ones, host 1 contributes twos: global sum = 4+8 = 12
local = np.full((4, 1), float(pid + 1), np.float32)
garr = jax.make_array_from_process_local_data(sharding, local, (8, 1))

@jax.jit
def total(x):
    return jnp.sum(x)

t = float(total(garr))
assert t == 12.0, t

# per-host dataset sharding -> global batch assembly: 14 examples over 2
# hosts wrap to m=7... use 16 to split over 4 local devices; then a ragged
# n=14 exercises the wrap mask.
idx, real = multihost.host_shard_indices(16)
assert idx.shape == (8,) and real.all()
local_rows = idx.astype(np.float32)[:, None]
g = multihost.global_batch(mesh, {"x": local_rows})["x"]

@jax.jit
def in_order(x):
    return jnp.all(x[:, 0] == jnp.arange(16, dtype=jnp.float32))

assert bool(in_order(g)), "global batch rows out of order"

idx13, real13 = multihost.host_shard_indices(13)
assert idx13.shape == (7,)
if pid == 1:
    assert list(idx13[-2:]) == [12, 0] and list(real13[-2:]) == [True, False]
else:
    assert real13.all()

print(f"proc {pid}: global sum {t} over {len(jax.devices())} devices OK; "
      f"host-shard feeding OK", flush=True)
"""


def test_two_process_global_mesh():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the axon plugin out

    code = _CHILD.replace("@REPO@", REPO)
    procs = [subprocess.Popen([sys.executable, "-c", code, str(i), coord],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "global sum 12.0 over 8 devices OK" in out
        assert "host-shard feeding OK" in out


_TRAIN_CHILD = r"""
import sys
sys.path.insert(0, "@REPO@")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from depth_image_captioning_pub_tpu.parallel import multihost
from depth_image_captioning_pub_tpu.parallel.mesh import make_mesh

pid = int(sys.argv[1])
multihost.initialize(coordinator_address=sys.argv[2],
                     num_processes=2, process_id=pid)
assert len(jax.devices()) == 8 and jax.local_device_count() == 4
mesh = make_mesh(jax.devices())

from tests.mh_train_common import GLOBAL_BATCH, run
half = GLOBAL_BATCH // 2  # host i feeds rows [i*half, (i+1)*half)


def feed(b):
    local = {k: np.asarray(v)[pid * half:(pid + 1) * half]
             for k, v in b.items()}
    return multihost.global_batch(mesh, local)


losses, digest = run(mesh, feed)
print("MHTRAIN losses=" + ",".join(f"{l:.8f}" for l in losses)
      + f" digest={digest:.6f}", flush=True)
"""


def _parse_mhtrain(out: str):
    line = next(l for l in out.splitlines() if l.startswith("MHTRAIN"))
    parts = dict(p.split("=") for p in line.split()[1:])
    return ([float(x) for x in parts["losses"].split(",")],
            float(parts["digest"]))


def test_two_process_training_equality():
    """The ENGINE's jitted train step, not just a toy sum, is multi-host
    correct: two processes (4 devices each) feeding per-host batch halves
    through multihost.global_batch walk the same loss trajectory and reach
    the same params as a single-process 8-device sharded run."""
    from tests.mh_train_common import run
    from depth_image_captioning_pub_tpu.parallel.mesh import (
        make_mesh, shard_batch)

    # ground truth: single-process, same 8-way batch sharding
    mesh = make_mesh()
    want_losses, want_digest = run(mesh, lambda b: shard_batch(mesh, b))
    assert all(np.isfinite(want_losses))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("PALLAS_AXON_POOL_IPS", None)

    code = _TRAIN_CHILD.replace("@REPO@", REPO)
    procs = [subprocess.Popen([sys.executable, "-c", code, str(i), coord],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        got_losses, got_digest = _parse_mhtrain(out)
        np.testing.assert_allclose(got_losses, want_losses, atol=1e-5)
        np.testing.assert_allclose(got_digest, want_digest, rtol=1e-4)
