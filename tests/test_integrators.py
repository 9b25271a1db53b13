"""Integrator semantics: Euler velocity clamp, Verlet, RK2
(reference sim.cu:1282-1363 and the RK2 double pass sim.cu:1778-1799)."""

import numpy as np
import pytest

from titan_tpu import Integrator, Simulation, SimConfig, Vec


def _fall(config, t_end=1.0, a=-9.8):
    sim = Simulation(config)
    m = sim.createMass(Vec(0, 0, 0))
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, a))
    sim.start()
    sim.pause(t_end)
    sim.getAll()
    out = (np.array(list(m.pos)), np.array(list(m.vel)))
    sim.stop()
    return out


def test_euler_velocity_clamp():
    """The reference clamps post-update speed to 1 m/s (sim.cu:1358-1361)."""
    pos, vel = _fall(SimConfig(velocity_clamp=True))
    assert np.linalg.norm(vel) == pytest.approx(1.0, rel=1e-5)
    # fell ~0.102s to reach 1 m/s, then ~0.9s at 1 m/s
    assert pos[2] == pytest.approx(-(0.051 + 0.898), abs=0.01)


def test_euler_no_clamp_analytic():
    pos, vel = _fall(SimConfig(velocity_clamp=False))
    assert vel[2] == pytest.approx(-9.8, rel=1e-3)
    assert pos[2] == pytest.approx(-4.9, rel=1e-2)


@pytest.mark.parametrize("integrator", [Integrator.VERLET, Integrator.RK2])
def test_other_integrators_analytic(integrator):
    pos, vel = _fall(SimConfig(velocity_clamp=False, integrator=integrator))
    assert vel[2] == pytest.approx(-9.8, rel=1e-3)
    assert pos[2] == pytest.approx(-4.9, rel=1e-2)


@pytest.mark.parametrize("integrator",
                         [Integrator.EULER, Integrator.VERLET, Integrator.RK2])
def test_harmonic_oscillator_accuracy(integrator):
    """Spring-mass oscillator vs the analytic solution; RK2/Verlet should be
    at least as accurate as Euler at the same dt."""
    sim = Simulation(SimConfig(velocity_clamp=False, integrator=integrator))
    m1 = sim.createMass(Vec(0, 0, 0))
    m1.fix()
    m2 = sim.createMass(Vec(1.5, 0, 0))
    s = sim.createSpring(m1, m2)
    s._rest = 1.0
    s._k = 10.0
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(0.5)
    sim.getAll()
    # m2: x(t) = 1 + 0.5 cos(w t), w = sqrt(k/m) = sqrt(10/0.1) = 10
    t = sim.time()
    expect = 1 + 0.5 * np.cos(10.0 * t)
    assert m2.pos[0] == pytest.approx(expect, abs=5e-3)
    sim.stop()


def test_fixed_mass_immobile():
    sim = Simulation(SimConfig(velocity_clamp=False))
    m1 = sim.createMass(Vec(0, 0, 5))
    m1.fix()
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(0.5)
    sim.getAll()
    assert np.array(list(m1.pos)).tolist() == [0, 0, 5]
    assert np.array(list(m1.vel)).tolist() == [0, 0, 0]
    # fixed masses don't advance local time (early return, sim.cu:1292-1294)
    assert m1.T == 0.0
    sim.stop()


def test_drag():
    """Drag force -C |v|^2 v_hat (sim.cu:1329-1332) reaches terminal velocity
    where C v^2 = m g -> v = sqrt(m g / C)."""
    sim = Simulation(SimConfig(velocity_clamp=False))
    m1 = sim.createMass(Vec(0, 0, 0))
    m1.setDrag(0.5)
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.start()
    sim.pause(3.0)
    sim.getAll()
    v_term = np.sqrt(0.1 * 9.8 / 0.5)
    assert m1.vel[2] == pytest.approx(-v_term, rel=1e-3)
    sim.stop()
