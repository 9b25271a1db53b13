"""Checkpoint save/resume round trips (capability absent from the
reference; SURVEY.md section 5.4)."""

import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.runtime import checkpoint


def _scene():
    sim = Simulation(SimConfig(velocity_clamp=False))
    sim.createLattice(Vec(0, 0, 5), Vec(2, 2, 2), 4, 4, 4)
    sim.createPlane(Vec(0, 0, 1), 0, 0.2, 0.3)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(0.0001)
    return sim


def test_roundtrip_prestart(tmp_path):
    sim = _scene()
    p = str(tmp_path / "ck.npz")
    checkpoint.save(sim, p)
    sim2 = checkpoint.load(p)
    assert len(sim2.masses) == len(sim.masses)
    assert len(sim2.springs) == len(sim.springs)
    assert len(sim2.containers) == 1
    np.testing.assert_allclose(
        sim2._store.pos[:64], sim._store.pos[:64])
    sim2.start()
    sim2.pause(0.1)
    sim2.stop()


def test_resume_matches_uninterrupted(tmp_path):
    # running to t=1.0 directly == running to 0.5, checkpointing, resuming
    ref = _scene()
    ref.start()
    ref.pause(1.0)
    ref.getAll()
    ref_pos = ref._store.pos[: ref._store.n_masses].copy()
    ref.stop()

    sim = _scene()
    sim.start()
    sim.pause(0.5)
    p = str(tmp_path / "ck.npz")
    checkpoint.save(sim, p)
    sim.stop()

    sim2 = checkpoint.load(p)
    assert sim2.time() == pytest.approx(0.5)
    sim2.resume()
    sim2.pause(1.0)
    sim2.getAll()
    pos2 = sim2._store.pos[: sim2._store.n_masses]
    sim2.stop()
    np.testing.assert_allclose(pos2, ref_pos, atol=1e-5)


def test_distributed_roundtrip(tmp_path):
    """Checkpointing is mesh-agnostic: a simulation block-sharded over the
    8-device mesh saves through the same host-store snapshot, and the
    loaded copy can itself be re-distributed and continue -- matching an
    uninterrupted single-device run.  (The save path is identical because
    getAll() device_gets the sharded pytree; this pins that it stays
    true.)"""
    from titan_tpu.parallel.mesh import make_mesh

    ref = _scene()
    ref.start()
    ref.pause(1.0)
    ref.getAll()
    ref_pos = ref._store.pos[: ref._store.n_masses].copy()
    ref.stop()

    sim = _scene()
    sim.distribute(make_mesh(("shard",)))
    sim.start()
    sim.pause(0.5)
    p = str(tmp_path / "ck_dist.npz")
    checkpoint.save(sim, p)
    sim.stop()

    sim2 = checkpoint.load(p)
    sim2.distribute(make_mesh(("shard",)))
    assert sim2.time() == pytest.approx(0.5)
    sim2.resume()
    sim2.pause(1.0)
    sim2.getAll()
    pos2 = sim2._store.pos[: sim2._store.n_masses]
    assert len(sim2._state.masses.pos.sharding.device_set) == 8
    sim2.stop()
    np.testing.assert_allclose(pos2, ref_pos, atol=1e-5)


def test_save_while_running_raises(tmp_path):
    sim = _scene()
    sim.setBreakpoint(10.0)
    sim.start()
    with pytest.raises(RuntimeError):
        checkpoint.save(sim, str(tmp_path / "ck.npz"))
    sim.pause(0.01)
    sim.stop()
