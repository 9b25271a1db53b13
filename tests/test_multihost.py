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


def test_two_process_adjoint_matches_single_process(monkeypatch):
    """Gradients across HOSTS: 2 processes x 4 devices differentiate a
    rollout through the distributed adjoint over one global mesh (the
    scene's real rows span the process boundary, so the backward's
    ppermuted cotangent halos cross what would be DCN on hardware);
    both processes must agree exactly, and match a single-process
    8-device run of the same program."""
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, f"localhost:{port}", "2", str(i),
         "grad"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out
    sums = {}
    for out in outs:
        m = re.search(r"GRADSUM (\d) (-?\d+\.\d+)", out)
        assert m, out
        sums[int(m.group(1))] = float(m.group(2))
    assert set(sums) == {0, 1}
    assert sums[0] == sums[1], "hosts disagree on the gradient"

    # single-process 8-device reference: same scene, same interpret +
    # tile config as multihost_worker.run_grad
    import dataclasses

    from conftest import force_tiled_interpret
    from titan_tpu import Simulation, SimConfig, Vec
    from titan_tpu.ops import adjoint_tiled, pallas_tiled
    from titan_tpu.parallel import halo_adjoint, halo_tiled, make_mesh
    force_tiled_interpret(monkeypatch)
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr(
        "titan_tpu.ops.adjoint_tiled.pl.pallas_call", interp)
    tl = lambda h, shape=None: max(h, 2048)
    monkeypatch.setattr(pallas_tiled, "_tile_size", tl)
    monkeypatch.setattr(halo_tiled, "_tile_size", tl)

    sim = Simulation(SimConfig(velocity_clamp=False,
                               host_store_dtype="float32"))
    sim.createLattice(Vec(0, 0, 3), Vec(8, 1, 1), 107, 10, 10)
    sim.setAllSpringConstantValues(500.0)
    sim.createPlane(Vec(0, 0, 1), 0, 0.2, 0.3)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(1e-4)
    st = sim._store
    st.damping[: st.n_springs] = 10.0
    sim._T = 0.0
    sim._marshal()
    shape, state = sim._shape, sim._state
    mesh = make_mesh(("shard",))
    n = sim._store.n_masses
    npad = state.masses.pos.shape[1]
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.normal(0, 1, (3, npad)),
                    jnp.float32).at[:, n:].set(0.0)

    def loss(pos0):
        s = dataclasses.replace(
            state, masses=dataclasses.replace(state.masses, pos=pos0))
        out = halo_adjoint.halo_adjoint_rollout(shape, s, mesh, 2,
                                                segment=2)
        return jnp.sum(out.masses.pos * w)

    g = jax.grad(loss)(state.masses.pos)
    ref = float(np.abs(np.asarray(g, np.float64)[:, :n]).sum())
    assert sums[0] == pytest.approx(ref, rel=1e-5)


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


def test_two_process_tiled_matches_single_process(monkeypatch):
    """The beyond-VMEM tier across REAL processes (round 4): the
    per-shard tiled Pallas kernel with BOTH glue paths (binned magnets +
    long-span remainder springs) runs over a 2-process global mesh; the
    processes must agree exactly and match the single-process 8-device
    shard_map run of the same program."""
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, f"localhost:{port}", "2", str(i),
         "tiled"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out
    sums = {}
    for out in outs:
        m = re.search(r"TILEDSUM (\d) (-?\d+\.\d+)", out)
        assert m, out
        sums[int(m.group(1))] = float(m.group(2))
    assert set(sums) == {0, 1}
    assert sums[0] == sums[1], "hosts disagree on the tiled trajectory"

    # single-process 8-device reference: same scene build + interpret
    # patches as multihost_worker.run_tiled
    import multihost_worker as mw
    from titan_tpu.parallel.halo import place
    from titan_tpu.parallel.halo_tiled import build_halo_tiled_chunk
    from titan_tpu.parallel import make_mesh
    mw._interpret_tiled_patches()
    try:
        sim = mw.build_tiled_scene()
        mesh = make_mesh(("shard",))
        sharded = place(sim._state, mesh)
        out = build_halo_tiled_chunk(sim._shape, mesh)(sharded,
                                                       jnp.int32(30))
        n = sim._store.n_masses
        ref = float(np.asarray(out.masses.pos, np.float64)[:, :n].sum())
    finally:
        # _interpret_tiled_patches mutates module attrs; restore
        import importlib
        import titan_tpu.ops.pallas_tiled as pt
        import titan_tpu.parallel.halo_tiled as ht
        importlib.reload(pt)
        importlib.reload(ht)
    assert sums[0] == pytest.approx(ref, abs=1e-6)
