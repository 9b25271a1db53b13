"""Trajectory parity: the TPU implementation vs an independent naive numpy
transcription of the reference CUDA kernels (tests/reference_impl.py).

This is the stand-in for the BASELINE 'trajectory parity vs CUDA' fixture
(no CUDA GPU in this environment): both implementations independently encode
the semantics of sim.cu:1157-1367 + object.cu:46-144, so agreement pins the
physics.  Run in float64 to isolate semantics from precision."""

import jax
import numpy as np
import pytest

from titan_tpu import (ACTIVE_CONTRACT_THEN_EXPAND, ACTUATED_EXPAND,
                       Simulation, SimConfig, Vec)
import reference_impl as ref


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _run_both(sim, t_end, dt=1e-4):
    scene = ref.from_simulation(sim)
    steps = int(round(t_end / dt))
    t = 0.0
    for _ in range(steps):
        ref.step(scene, dt, t)
        t += dt
    sim.setTimeStep(dt)
    sim.start()
    sim.pause(t_end)
    sim.getAll()
    n = sim._store.n_masses
    got_pos = sim._store.pos[:n].copy()
    got_vel = sim._store.vel[:n].copy()
    sim.stop()
    return (got_pos, got_vel), (scene.pos, scene.vel)


def test_parity_lattice_bounce_with_clamp():
    """Default reference semantics incl. the velocity clamp."""
    sim = Simulation(SimConfig(dtype="float64"))  # clamp ON (default)
    sim.createLattice(Vec(0, 0, 2), Vec(1, 1, 1), 3, 3, 3)
    sim.setAllSpringConstantValues(500.0)
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    (gp, gv), (wp, wv) = _run_both(sim, 1.0)
    np.testing.assert_allclose(gp, wp, atol=1e-9)
    np.testing.assert_allclose(gv, wv, atol=1e-9)


def test_parity_friction_plane():
    sim = Simulation(SimConfig(dtype="float64", velocity_clamp=False))
    c = sim.createCube(Vec(0.2, 0, 0.4), 1.0)
    c.rotate(Vec(1, 1, 0), 0.3)
    sim.setAllSpringConstantValues(2000.0)
    sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    sim.setGlobalAcceleration(Vec(0.5, 0, -9.8))  # lateral push + gravity
    (gp, gv), (wp, wv) = _run_both(sim, 0.5)
    np.testing.assert_allclose(gp, wp, atol=1e-9)
    np.testing.assert_allclose(gv, wv, atol=1e-9)


def test_parity_damping_drag_ball():
    sim = Simulation(SimConfig(dtype="float64", velocity_clamp=False))
    m0 = sim.createMass(Vec(0.3, 0, 0.2))
    m1 = sim.createMass(Vec(1.2, 0, 0.3))
    s = sim.createSpring(m0, m1)
    s._k = 50.0
    s._rest = 0.5
    s._damping = 1.5
    m0.setDrag(0.3)
    m1.fix()
    sim.createBall(Vec(0, 0, 0), 0.5)
    sim.setGlobalAcceleration(Vec(0, 0, -2.0))
    (gp, gv), (wp, wv) = _run_both(sim, 0.5)
    np.testing.assert_allclose(gp, wp, atol=1e-9)
    np.testing.assert_allclose(gv, wv, atol=1e-9)


def test_parity_breathing_and_actuated():
    sim = Simulation(SimConfig(dtype="float64", velocity_clamp=False))
    m0 = sim.createMass(Vec(0, 0, 0))
    m1 = sim.createMass(Vec(1, 0, 0))
    m2 = sim.createMass(Vec(2.5, 0, 0))
    s1 = sim.createSpring(m0, m1)
    s1._k = 30.0
    s1.changeType(ACTIVE_CONTRACT_THEN_EXPAND, 12.0)
    s2 = sim.createSpring(m1, m2)
    s2._k = 20.0
    s2._type = ACTUATED_EXPAND
    s2._l_max = 2.0
    s2._rate = 0.4
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    (gp, gv), (wp, wv) = _run_both(sim, 0.6)
    np.testing.assert_allclose(gp, wp, atol=1e-9)
    np.testing.assert_allclose(gv, wv, atol=1e-9)


def test_parity_external_force_and_irregular_springs():
    """Scene with springs that can't all bucket into stencil families."""
    rng = np.random.default_rng(7)
    sim = Simulation(SimConfig(dtype="float64", velocity_clamp=False))
    ms = [sim.createMass(Vec(*rng.uniform(-1, 1, 3))) for _ in range(12)]
    for _ in range(20):
        a, b = rng.choice(12, 2, replace=False)
        s = sim.createSpring(ms[int(a)], ms[int(b)])
        s._k = float(rng.uniform(5, 50))
    ms[0].setExternalForce(Vec(0.1, -0.2, 0.05))
    sim.setGlobalAcceleration(Vec(0, 0, -1.0))
    (gp, gv), (wp, wv) = _run_both(sim, 0.3)
    np.testing.assert_allclose(gp, wp, atol=1e-9)
    np.testing.assert_allclose(gv, wv, atol=1e-9)


@pytest.mark.parametrize("integrator", ["verlet", "rk2"])
def test_parity_other_integrators(integrator):
    from titan_tpu import Integrator
    sim = Simulation(SimConfig(dtype="float64", velocity_clamp=False,
                               integrator=Integrator(integrator)))
    sim.createLattice(Vec(0, 0, 2), Vec(1, 1, 1), 3, 3, 3)
    sim.setAllSpringConstantValues(500.0)
    sim.createPlane(Vec(0, 0, 1), 0, 0.3, 0.5)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    (gp, gv), (wp, wv) = _run_both(sim, 0.5)
    np.testing.assert_allclose(gp, wp, atol=1e-9)
    np.testing.assert_allclose(gv, wv, atol=1e-9)
