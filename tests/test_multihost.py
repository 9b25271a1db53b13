"""Multi-host (multi-process) plumbing: 2 CPU processes x 4 virtual
devices run the halo chunk over one global mesh and must agree with each
other and with the single-process 8-device trajectory.

This is the CPU analog of a 2-host TPU deployment (docs/MULTIHOST.md
shape 3): the mesh spans processes, consecutive mass blocks stay on one
"host", and the halo ppermute edges between the two middle blocks are the
only cross-process physics traffic.
"""

import os
import re
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_halo_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, f"localhost:{port}", "2", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out
    sums = {}
    for out in outs:
        m = re.search(r"CHECKSUM (\d) (-?\d+\.\d+)", out)
        assert m, out
        sums[int(m.group(1))] = float(m.group(2))
    assert set(sums) == {0, 1}
    assert sums[0] == sums[1], "hosts disagree on the trajectory"

    # single-process 8-device reference (this pytest process already runs
    # with an 8-virtual-device CPU mesh via conftest)
    from titan_tpu import Simulation, SimConfig, Vec
    from titan_tpu.parallel import make_mesh
    from titan_tpu.parallel.halo import build_halo_chunk, place
    sim = Simulation(SimConfig(velocity_clamp=False))
    sim.createLattice(Vec(0, 0, 3), Vec(8, 1, 1), 32, 4, 4)
    sim.setAllSpringConstantValues(500.0)
    sim.createPlane(Vec(0, 0, 1), 0, 0.2, 0.3)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(1e-4)
    sim._T = 0.0
    sim._marshal()
    mesh = make_mesh(("shard",))
    sharded = place(sim._state, mesh)
    out = build_halo_chunk(sim._shape, mesh)(sharded)(sharded,
                                                      jnp.int32(100))
    n = sim._store.n_masses
    ref = float(np.asarray(out.masses.pos, np.float64)[:, :n].sum())
    assert sums[0] == pytest.approx(ref, abs=1e-4)


def test_single_process_helpers_are_noops():
    """host_gather and the replication guard degrade gracefully on one
    process (the default everywhere else in the suite)."""
    from titan_tpu.parallel import multihost
    x = jnp.arange(8.0)
    np.testing.assert_array_equal(multihost.host_gather(x), np.arange(8.0))
    multihost.assert_replicated_control_plane(1.23)   # no-op, no raise
    mesh = multihost.make_global_mesh(("shard",))
    assert mesh.devices.size == len(jax.devices())
    with pytest.raises(ValueError):
        multihost.make_global_mesh(("a", "b"), shape=(3, 5))
