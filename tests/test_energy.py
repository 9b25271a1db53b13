"""Port of test/physics/energy_unittest.cpp:15-40: a 20^3 lattice (8000
masses, 93,556 springs), k=1000, bouncing on a plane conserves EMA total
energy to 1% over 5 s.

velocity_clamp=False as in test_simple.py (impact speed ~7.7 m/s; the
reference's shipped kernel clamps at 1 m/s and cannot pass its own test).
Run at float64 on CPU like the reference's double precision; the f32 TPU
configuration is exercised by the parity/benchmark suites.
"""

import jax
import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.testutil import energy


def test_lattice_energy_conservation():
    jax.config.update("jax_enable_x64", True)
    try:
        tol = 0.01
        sim = Simulation(SimConfig(velocity_clamp=False, dtype="float64"))
        sim.createLattice(Vec(0, 0, 5), Vec(4, 4, 4), 20, 20, 20)
        assert len(sim.masses) == 8000
        assert len(sim.springs) == 93556

        sim.setAllSpringConstantValues(1000)
        sim.setTimeStep(0.0001)
        sim.setGlobalAcceleration(Vec(0, 0, -9.8))
        sim.defaultRestLengths()

        sim.createPlane(Vec(0, 0, 1), 0)
        sim.start()

        total_energy = energy(sim)
        avg_energy = total_energy
        alpha = 0.7
        while sim.time() < 5:
            sim.wait(0.1)
            avg_energy = (1 - alpha) * energy(sim) + alpha * avg_energy
            assert avg_energy == pytest.approx(
                total_energy, abs=total_energy * tol)
            sim.resume()

        sim.stop()
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_f32_long_horizon_drift():
    """Round-4 precision characterization (docs/PERFORMANCE.md 'Long-
    horizon f32 energy drift'): 1e5 steps of the reference energy scene
    in PRODUCTION f32; the EMA total-energy drift must stay within 1%
    and within 5e-3 of the measured f64 curve at every checkpoint.

    ~3 min on the one-core CPU box; excluded from -m smoke."""
    # measured f64 oracle curve (scripts/f32_drift.py, 2026-08-20)
    f64_drift = {1.0: -0.0076573, 2.0: -0.000217, 5.0: -0.0012427,
                 10.0: -0.0006988}
    sim = Simulation(SimConfig(velocity_clamp=False))   # f32 default
    sim.createLattice(Vec(0, 0, 5), Vec(4, 4, 4), 20, 20, 20)
    sim.setAllSpringConstantValues(1000)
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.defaultRestLengths()
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.start()
    e0 = energy(sim)
    avg = e0
    checkpoints = sorted(f64_drift)
    nxt = iter(checkpoints)
    target = next(nxt)
    while sim.time() < checkpoints[-1] - 1e-9:
        sim.wait(0.1)
        avg = 0.3 * energy(sim) + 0.7 * avg
        if sim.time() >= target - 1e-9:
            drift = (avg - e0) / e0
            assert abs(drift) < 0.01, (target, drift)
            assert drift == pytest.approx(f64_drift[target], abs=5e-3), \
                (target, drift)
            target = next(nxt, float("inf"))
        sim.resume()
    sim.stop()
