"""Port of test/physics/external_unittest.cpp: constant external force and
constant gravity both produce the analytic trajectory z = z0 + 0.5 a t^2.

velocity_clamp=False for the same reason as test_simple.py (|v| reaches
~49 m/s over 5 s of free fall).  The external-force variant also relies on
setExternalForce being persistent -- the documented semantics
(mass.h:109) -- which SimConfig.persistent_extern_force=True provides (the
reference kernel actually zeroes it each step, sim.cu:1365; see SURVEY.md
section 7 'semantics quirks')."""

import pytest

from titan_tpu import Simulation, SimConfig, Vec


def _run(external: bool):
    tol = 1e-5
    z_tol = 0.1
    sim = Simulation(SimConfig(velocity_clamp=False))
    m1 = sim.createMass(Vec(1, 0, 1))
    sim.setTimeStep(0.0001)
    if external:
        m1.setExternalForce(m1.m * Vec(0, 0, -9.8))
        sim.setGlobalAcceleration(Vec(0, 0, 0.0))
        t_end = 5.0
    else:
        m1.setExternalForce(m1.m * Vec(0, 0, 0))
        sim.setGlobalAcceleration(Vec(0, 0, -9.8))
        t_end = 1.0

    sim.start()
    checked = 0
    while sim.time() < t_end:
        sim.wait(0.1)
        sim.getAll()
        t = sim.time()
        assert m1.pos[0] == pytest.approx(1, abs=tol)
        assert m1.pos[1] == pytest.approx(0, abs=tol)
        assert m1.pos[2] == pytest.approx(1 + 0.5 * -9.8 * t * t, abs=z_tol)
        checked += 1
        sim.resume()
    assert checked >= 5
    sim.stop()


def test_external_force():
    _run(external=True)


def test_external_acceleration():
    _run(external=False)


def test_strict_mode_zeroes_extern_force_each_step():
    """The reference kernel zeroes extern_force after EVERY step
    (sim.cu:1364-1365) even though the docs call setExternalForce
    persistent; SimConfig.persistent_extern_force=False replicates that
    quirk exactly: the force acts for one physics step, then the mass
    coasts."""
    sim = Simulation(SimConfig(velocity_clamp=False,
                               persistent_extern_force=False))
    m1 = sim.createMass(Vec(0, 0, 1))
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    m1.setExternalForce(Vec(0, 0, 1000.0))
    sim.start()
    sim.pause(0.01)                       # 100 steps
    sim.getAll()
    # one step of (F/m) dt = (1000 / 0.1) * 1e-4 = 1 m/s, then coasting
    assert m1.vel[2] == pytest.approx(1.0, rel=1e-5)
    sim.resume()
    sim.pause(0.02)
    sim.getAll()
    assert m1.vel[2] == pytest.approx(1.0, rel=1e-5)   # still coasting
    sim.stop()
