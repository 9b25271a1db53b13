"""Differentiable simulation (capability the CUDA reference lacks):
gradients through springs, contact, and integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu import diff


def _projectile():
    sim = Simulation(SimConfig(velocity_clamp=False))
    sim.createMass(Vec(0, 0, 1))
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(0.001)
    return diff.scene(sim)


def test_gradient_matches_analytic():
    """d(final x)/d(initial vx) == t for ballistic flight."""
    shape, state0 = _projectile()
    steps = 500  # t = 0.5 s

    def final_x(vx):
        st = dataclasses.replace(
            state0, masses=dataclasses.replace(
                state0.masses, vel=state0.masses.vel.at[0, 0].set(vx)))
        return diff.rollout(shape, st, steps).masses.pos[0, 0]

    g = jax.grad(final_x)(2.0)
    assert float(g) == pytest.approx(0.5, rel=1e-4)


def test_optimize_initial_velocity_to_target():
    """Gradient descent through the rollout solves a shooting problem."""
    shape, state0 = _projectile()
    steps, target = 400, 1.7  # t = 0.4 s

    @jax.jit
    def loss(vx):
        st = dataclasses.replace(
            state0, masses=dataclasses.replace(
                state0.masses, vel=state0.masses.vel.at[0, 0].set(vx)))
        return (diff.rollout(shape, st, steps).masses.pos[0, 0] - target) ** 2

    vx = jnp.float32(0.0)
    gfn = jax.jit(jax.grad(loss))
    for _ in range(25):
        vx = vx - 2.0 * gfn(vx)
    assert float(loss(vx)) < 1e-6
    assert float(vx) == pytest.approx(target / 0.4, rel=1e-3)


def test_gradient_through_contact_and_spring():
    """System identification: recover a spring constant from an observed
    endpoint position by gradient descent, bouncing on a contact plane."""
    def make(k_val):
        sim = Simulation(SimConfig(velocity_clamp=False))
        m1 = sim.createMass(Vec(0, 0, 1.0))
        m2 = sim.createMass(Vec(0.8, 0, 1.0))
        s = sim.createSpring(m1, m2)
        s._rest = 0.5
        s._k = float(k_val)
        sim.createPlane(Vec(0, 0, 1), 0)
        sim.setGlobalAcceleration(Vec(0, 0, -9.8))
        sim.setTimeStep(0.001)
        return diff.scene(sim)

    shape, state0 = make(25.0)
    steps = 300

    def traj(k):
        """Positions every 50 steps -- trajectory matching is well-posed
        where final-position matching aliases across stiffness values."""
        st = dataclasses.replace(
            state0, stencil=dataclasses.replace(
                state0.stencil,
                k=jnp.where(state0.stencil.mask, k, state0.stencil.k)),
            springs=dataclasses.replace(
                state0.springs,
                k=jnp.where(state0.springs.valid, k, state0.springs.k)))
        _, tr = diff.trajectory(shape, st, steps, every=50)
        return tr[:, :, :2]

    observed = traj(25.0)

    @jax.jit
    def loss(k):
        return jnp.sum((traj(k) - observed) ** 2)

    gfn = jax.jit(jax.grad(loss))
    k = jnp.float32(15.0)
    for _ in range(80):
        g = gfn(k)
        k = k - 3e2 * g
    assert float(k) == pytest.approx(25.0, abs=0.5)


def test_checkpointed_rollout_matches():
    shape, state0 = _projectile()
    a = diff.rollout(shape, state0, 400)
    b = diff.rollout(shape, state0, 400, checkpoint_every=100)
    np.testing.assert_allclose(np.asarray(a.masses.pos),
                               np.asarray(b.masses.pos), atol=1e-7)


def test_trajectory_shape():
    shape, state0 = _projectile()
    final, traj = diff.trajectory(shape, state0, 100, every=10)
    assert traj.shape[0] == 10
    assert traj.shape[1] == 3


def test_fast_trajectory_matches_trajectory():
    """fast_trajectory: same samples as trajectory (bitwise on CPU, where
    the fused chunk IS the XLA path) and matching gradients through a
    trajectory-dependent loss."""
    import dataclasses as dc
    shape, state0 = _projectile()
    f_ref, t_ref = diff.trajectory(shape, state0, 100, every=10)
    f, t = diff.fast_trajectory(shape, state0, 100, every=10)
    assert t.shape == t_ref.shape
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), atol=1e-7)
    np.testing.assert_allclose(np.asarray(f.masses.pos),
                               np.asarray(f_ref.masses.pos), atol=1e-7)

    def path_len(vx, fn):
        st = dc.replace(
            state0, masses=dc.replace(
                state0.masses, vel=state0.masses.vel.at[0, 0].set(vx)))
        _, tr = fn(shape, st, 100, every=10)
        return jnp.sum(tr[:, 0, 0])          # sum of sampled x positions

    g_ref = jax.grad(path_len)(2.0, diff.trajectory)
    g = jax.grad(path_len)(2.0, diff.fast_trajectory)
    assert float(g) == pytest.approx(float(g_ref), rel=1e-5)


def test_fast_rollout_values_and_grads_match():
    """fast_rollout: fused-chunk primal + XLA-recompute backward must
    reproduce rollout's values and gradients (on CPU the chunk IS the XLA
    path, so this pins the custom_vjp wiring; the kernel-primal case is
    covered by the TPU scripts)."""
    import dataclasses as dc
    shape, state0 = _projectile()

    def final_x(vx, fn, **kw):
        st = dc.replace(
            state0, masses=dc.replace(
                state0.masses, vel=state0.masses.vel.at[0, 0].set(vx)))
        return fn(shape, st, 400, **kw).masses.pos[0, 0]

    v_ref = final_x(2.0, diff.rollout)
    g_ref = jax.grad(final_x)(2.0, diff.rollout)
    for kw in (dict(), dict(segment=100)):
        v = final_x(2.0, diff.fast_rollout, **kw)
        g = jax.grad(final_x)(2.0, diff.fast_rollout, **kw)
        assert float(v) == pytest.approx(float(v_ref), abs=1e-6)
        assert float(g) == pytest.approx(float(g_ref), rel=1e-5)


def test_fast_rollout_spring_scene():
    """Gradients through springs+contact on a lattice scene survive the
    segmented custom_vjp (checkpoint recompute path)."""
    import dataclasses as dc
    sim = Simulation(SimConfig(velocity_clamp=False))
    sim.createLattice(Vec(0, 0, 1), Vec(0.5, 0.5, 0.5), 3, 3, 3)
    sim.setAllSpringConstantValues(300.0)
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(1e-4)
    shape, state0 = diff.scene(sim)

    def loss(k_scale, fn, **kw):
        st = dc.replace(
            state0, stencil=dc.replace(state0.stencil,
                                       k=state0.stencil.k * k_scale))
        out = fn(shape, st, 200, **kw)
        return jnp.sum(out.masses.pos[2] ** 2)

    g_ref = jax.grad(loss)(1.0, diff.rollout)
    g = jax.grad(loss)(1.0, diff.fast_rollout, segment=50)
    assert float(g) == pytest.approx(float(g_ref), rel=1e-4)
    assert abs(float(g)) > 0
