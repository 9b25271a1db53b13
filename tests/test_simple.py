"""Port of test/physics/simple_unittest.cpp:16-38: one mass under gravity
bouncing on a contact plane conserves EMA total energy to 1% over 5 s.

NOTE: run with velocity_clamp=False.  The reference's Euler integrator clamps
speed to 1 m/s (sim.cu:1358-1361), which destroys energy during any fall
faster than 1 m/s -- this test cannot pass against the reference's shipped
kernel either (it predates the clamp); see SimConfig.velocity_clamp.
"""

import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.testutil import energy


def test_simple_energy_conservation():
    tol = 0.01
    sim = Simulation(SimConfig(velocity_clamp=False))
    m = sim.createMass(Vec(1, 0, 1))
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.start()

    total_energy = energy(sim)
    avg_energy = total_energy
    alpha = 0.9

    checked = 0
    while sim.time() < 5:
        sim.wait(0.1)
        e = energy(sim)
        # The reference's energy() ignores the contact-penalty spring
        # (testutil/utils.h:11-30), so a sample taken during the ~7 ms
        # bounce reads artificially low; the reference test only avoids
        # this because its wall-clock sampling rarely lands mid-contact.
        # Our wait() samples exact deterministic times, so skip samples
        # where the mass is penetrating the plane.
        if m.pos[2] >= 0:
            avg_energy = (1 - alpha) * e + alpha * avg_energy
            assert avg_energy == pytest.approx(
                total_energy, abs=total_energy * tol)
            checked += 1
        sim.resume()
    assert checked >= 40
    sim.stop()
