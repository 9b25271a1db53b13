"""Local (per-mass) constraints and global balls through the full sim path
(reference CONSTRAINTS build: mass.cu:104-161, object.cu:111-144)."""

import numpy as np
import pytest

from titan_tpu import (BALL, CONSTRAINT_PLANE, CONTACT_PLANE, DIRECTION,
                       Simulation, SimConfig, Vec)


def test_direction_constraint():
    """DIRECTION restricts motion to a tangent line (object.cu:136-144)."""
    sim = Simulation(SimConfig(velocity_clamp=False))
    m = sim.createMass(Vec(0, 0, 0))
    m.addConstraint(DIRECTION, Vec(1, 0, 1), 0.0)
    m.setExternalForce(Vec(0, 0, -0.98))  # force along -z
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(0.5)
    sim.getAll()
    p = np.array(list(m.pos))
    # motion confined to the (1,0,1) direction
    assert p[1] == pytest.approx(0.0, abs=1e-6)
    assert p[0] == pytest.approx(p[2], rel=1e-4)
    assert p[2] < -0.1  # projected force component pushes along -tangent
    sim.stop()


def test_constraint_plane():
    """CONSTRAINT_PLANE projects out normal force and velocity
    (object.cu:118-127)."""
    sim = Simulation(SimConfig(velocity_clamp=False))
    m = sim.createMass(Vec(0, 0, 1))
    m.addConstraint(CONSTRAINT_PLANE, Vec(0, 0, 1), 0.0)
    m.setExternalForce(Vec(0.098, 0, -0.98))
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(0.5)
    sim.getAll()
    p = np.array(list(m.pos))
    assert p[2] == pytest.approx(1.0, abs=1e-5)   # stays in the plane
    # lateral force acts freely: x = 0.5 * (0.098/0.1) * t^2
    assert p[0] == pytest.approx(0.5 * 0.98 * 0.25, rel=1e-2)
    sim.stop()


def test_local_contact_plane():
    """Per-mass CONTACT_PLANE bounces only the constrained mass."""
    sim = Simulation(SimConfig(velocity_clamp=False))
    m1 = sim.createMass(Vec(0, 0, 0.5))
    m2 = sim.createMass(Vec(5, 0, 0.5))
    m1.addConstraint(CONTACT_PLANE, Vec(0, 0, 1), 0.0)
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.start()
    sim.pause(1.0)
    sim.getAll()
    assert m1.pos[2] > -0.1   # bounced on its private plane
    assert m2.pos[2] < -3.0   # fell freely
    sim.stop()


def test_local_ball():
    sim = Simulation(SimConfig(velocity_clamp=False))
    m1 = sim.createMass(Vec(0.4, 0, 0))
    m1.addConstraint(BALL, Vec(0, 0, 0), 1.0)
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(0.2)
    sim.getAll()
    # inside the ball: radial penalty pushes the mass outward along +x
    assert m1.pos[0] > 1.0
    assert abs(m1.pos[1]) < 1e-6 and abs(m1.pos[2]) < 1e-6
    sim.stop()


def test_global_ball():
    sim = Simulation(SimConfig(velocity_clamp=False))
    m1 = sim.createMass(Vec(0.4, 0, 0))
    sim.createBall(Vec(0, 0, 0), 1.0)
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(0.2)
    sim.getAll()
    assert m1.pos[0] > 1.0
    sim.stop()


def test_clear_constraints():
    sim = Simulation(SimConfig(velocity_clamp=False))
    m = sim.createMass(Vec(0, 0, 1))
    m.addConstraint(DIRECTION, Vec(1, 0, 0), 0.0)
    m.clearConstraints()
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.start()
    sim.pause(0.3)
    sim.getAll()
    assert m.pos[2] < 0.9  # falls: constraint was removed
    sim.stop()


def test_container_add_constraint():
    sim = Simulation(SimConfig(velocity_clamp=False))
    c = sim.createCube(Vec(0, 0, 2), 1.0)
    c.addConstraint(CONTACT_PLANE, Vec(0, 0, 1), 0.0)
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.start()
    sim.pause(1.5)
    sim.getAll()
    z = sim._store.pos[: sim._store.n_masses, 2]
    assert z.min() > -0.1  # every corner respected its local plane
    sim.stop()
