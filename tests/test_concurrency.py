"""Multi-instance and concurrency guarantees the reference cannot give
(its static members force one Simulation per process, sim.h:150-154, and
its cross-thread state is racy by its own admission, sim.cu:190,196,819)."""

import threading

import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec


def test_two_simulations_in_one_process():
    sims = []
    for z0 in (1.0, 2.0):
        sim = Simulation(SimConfig(velocity_clamp=False))
        sim.createMass(Vec(0, 0, z0))
        sim.setTimeStep(0.0001)
        sim.setGlobalAcceleration(Vec(0, 0, -1.0))
        sim.start()
        sims.append(sim)
    # interleave stepping
    for sim in sims:
        sim.pause(0.5)
    for sim in sims:
        sim.resume()
        sim.pause(1.0)
    for z0, sim in zip((1.0, 2.0), sims):
        sim.getAll()
        assert sim.masses[0].pos[2] == pytest.approx(z0 - 0.5, abs=1e-3)
        sim.stop()


def test_concurrent_getall_while_stepping():
    """getAll from another thread during stepping sees consistent snapshots
    (the reference reads device memory mid-kernel)."""
    sim = Simulation(SimConfig(velocity_clamp=False))
    sim.createLattice(Vec(0, 0, 5), Vec(1, 1, 1), 4, 4, 4)
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, -1.0))
    sim.start()
    errors = []

    def reader():
        try:
            for _ in range(50):
                sim.getAll()
                pos = sim._store.pos[: sim._store.n_masses]
                if not np.all(np.isfinite(pos)):
                    errors.append("non-finite snapshot")
        except Exception as e:  # pragma: no cover
            errors.append(repr(e))

    th = threading.Thread(target=reader)
    th.start()
    for i in range(10):
        sim.pause(0.05 * (i + 1))
        sim.resume()
    th.join()
    sim.pause(1.0)
    sim.stop()
    assert not errors
