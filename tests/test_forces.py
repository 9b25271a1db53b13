"""Kernel-level unit tests for the force ops -- coverage the reference lacks
(its only tests are whole-sim physics invariants; SURVEY.md section 4).

Values are checked against hand-computed expectations of the reference
formulas (computeSpringForces sim.cu:1157-1200; constraint applyForce
methods object.cu:46-144)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from titan_tpu import (ACTIVE_CONTRACT_THEN_EXPAND, ACTIVE_EXPAND_THEN_CONTRACT,
                       ACTUATED_CONTRACT, ACTUATED_EXPAND, ScatterMode)
from titan_tpu.ops import forces as F
from titan_tpu.state import MassState, SpringState, Topology
from titan_tpu import builders


def _masses(pos, vel=None, fixed=None, valid=None, **kw):
    pos = np.asarray(pos, dtype=np.float64).T  # -> [3, N]
    n = pos.shape[1]
    vel = np.zeros((3, n)) if vel is None else np.asarray(vel, dtype=np.float64).T
    z = np.zeros(n)
    return MassState(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel),
        acc=jnp.zeros((3, n)), extern_force=jnp.zeros((3, n)),
        m=jnp.asarray(kw.get("m", np.full(n, 0.1))), T=jnp.asarray(z),
        fixed=jnp.asarray(np.zeros(n, bool) if fixed is None else fixed),
        valid=jnp.asarray(np.ones(n, bool) if valid is None else valid),
        drag=jnp.asarray(kw.get("drag", z)),
        mag_rad=jnp.asarray(kw.get("mag_rad", z)),
        mag_stiffness=jnp.asarray(kw.get("mag_stiffness", z)),
        mag_maxf=jnp.asarray(kw.get("mag_maxf", z)),
        mag_scale=jnp.asarray(kw.get("mag_scale", z)),
    )


def _springs(left, right, k=10000.0, rest=1.0, **kw):
    s = len(left)
    ones = np.ones(s)
    zeros = np.zeros(s)
    return SpringState(
        left=jnp.asarray(np.asarray(left, np.int32)),
        right=jnp.asarray(np.asarray(right, np.int32)),
        valid=jnp.asarray(kw.get("valid", np.ones(s, bool))),
        k=jnp.asarray(k * ones), rest=jnp.asarray(rest * ones),
        damping=jnp.asarray(kw.get("damping", zeros)),
        type=jnp.asarray(kw.get("type", np.zeros(s, np.int8))),
        omega=jnp.asarray(kw.get("omega", zeros)),
        l_max=jnp.asarray(kw.get("l_max", zeros)),
        l_min=jnp.asarray(kw.get("l_min", zeros)),
        rate=jnp.asarray(kw.get("rate", zeros)),
    )


def test_hooke_force_value():
    # stretched spring: length 2, rest 1, k 100 -> |f| = 100, attracting
    m = _masses([[0, 0, 0], [2, 0, 0]])
    s = _springs([0], [1], k=100.0, rest=1.0)
    f, rest = F.spring_forces(m, s, jnp.float32(0), jnp.float32(1e-4), False)
    # f is applied +f to right, -f to left; d = right - left = (+2, 0, 0)
    # f = k (rest - len) d_hat = 100 * (1 - 2) * (1,0,0) = (-100, 0, 0)
    np.testing.assert_allclose(np.asarray(f)[:, 0], [-100, 0, 0], atol=1e-9)
    np.testing.assert_allclose(float(rest[0]), 1.0)


def test_axial_damping():
    # separating endpoints: v_l - v_r = (-1, 0, 0), d_hat = (1, 0, 0)
    # damping force on right = dot(v_l - v_r, d_hat) * c * d_hat = -c * x_hat
    m = _masses([[0, 0, 0], [1, 0, 0]], vel=[[0, 0, 0], [1, 0, 0]])
    s = _springs([0], [1], k=0.0, rest=1.0, damping=np.array([5.0]))
    f, _ = F.spring_forces(m, s, jnp.float32(0), jnp.float32(1e-4), False)
    np.testing.assert_allclose(np.asarray(f)[:, 0], [-5, 0, 0], atol=1e-9)


def test_breathing_scale():
    # ACTIVE_CONTRACT_THEN_EXPAND: scale = 1 - 0.2 sin(omega t)
    m = _masses([[0, 0, 0], [1, 0, 0]])
    t = 0.7
    omega = 3.0
    s = _springs([0], [1], k=100.0, rest=1.0,
                 type=np.array([ACTIVE_CONTRACT_THEN_EXPAND], np.int8),
                 omega=np.array([omega]))
    f, rest = F.spring_forces(m, s, jnp.float32(t), jnp.float32(1e-4), True)
    scale = 1 - 0.2 * np.sin(omega * t)
    expect = 100.0 * (scale - 1.0)
    np.testing.assert_allclose(np.asarray(f)[0, 0], expect, rtol=1e-6)
    # expand-then-contract flips the sign of the modulation
    s2 = _springs([0], [1], k=100.0, rest=1.0,
                  type=np.array([ACTIVE_EXPAND_THEN_CONTRACT], np.int8),
                  omega=np.array([omega]))
    f2, _ = F.spring_forces(m, s2, jnp.float32(t), jnp.float32(1e-4), True)
    np.testing.assert_allclose(np.asarray(f2)[0, 0],
                               100.0 * (1 + 0.2 * np.sin(omega * t) - 1),
                               rtol=1e-6)


def test_actuated_rest_mutation():
    m = _masses([[0, 0, 0], [1, 0, 0]])
    dt = 1e-2
    s = _springs([0], [1], k=0.0, rest=1.0,
                 type=np.array([ACTUATED_EXPAND], np.int8),
                 l_max=np.array([1.5]), rate=np.array([0.3]))
    _, rest = F.spring_forces(m, s, jnp.float32(0), jnp.float32(dt), True)
    np.testing.assert_allclose(float(rest[0]), 1.0 + 0.3 * dt)
    # at/above l_max: no further growth (reference checks rest < l_max first)
    s_at = dataclasses.replace(s, rest=jnp.asarray(np.array([1.5])))
    _, rest2 = F.spring_forces(m, s_at, jnp.float32(0), jnp.float32(dt), True)
    np.testing.assert_allclose(float(rest2[0]), 1.5)
    # contraction
    s3 = _springs([0], [1], k=0.0, rest=1.0,
                  type=np.array([ACTUATED_CONTRACT], np.int8),
                  l_min=np.array([0.5]), rate=np.array([0.3]))
    _, rest3 = F.spring_forces(m, s3, jnp.float32(0), jnp.float32(dt), True)
    np.testing.assert_allclose(float(rest3[0]), 1.0 - 0.3 * dt)


def test_invalid_endpoint_no_force():
    m = _masses([[0, 0, 0], [2, 0, 0]], valid=np.array([True, False]))
    s = _springs([0], [1], k=100.0, rest=1.0)
    f, _ = F.spring_forces(m, s, jnp.float32(0), jnp.float32(1e-4), False)
    np.testing.assert_allclose(np.asarray(f), 0.0)


@pytest.mark.parametrize("mode", [ScatterMode.GATHER, ScatterMode.SEGMENT])
def test_scatter_modes_agree(mode):
    rng = np.random.default_rng(1)
    n, sN = 16, 40
    left = rng.integers(0, n, sN).astype(np.int32)
    right = rng.integers(0, n, sN).astype(np.int32)
    f = rng.normal(size=(3, sN))
    fixed = np.zeros(n, bool)
    fixed[3] = True
    inc_idx, inc_sign = builders.build_incidence(left, right, n, sN)
    perm, ids = builders.build_segment_sort(left, right)
    topo = Topology(inc_idx=jnp.asarray(inc_idx),
                    inc_sign=jnp.asarray(inc_sign),
                    seg_perm=jnp.asarray(perm), seg_ids=jnp.asarray(ids))
    got = np.asarray(F.scatter_spring_forces(
        jnp.asarray(f), topo, jnp.asarray(fixed), n, mode))
    want = np.zeros((3, n))
    for i in range(sN):
        want[:, right[i]] += f[:, i]
        want[:, left[i]] -= f[:, i]
    want[:, fixed] = 0.0
    np.testing.assert_allclose(got, want, atol=1e-5)  # f32 device arrays


def test_contact_plane_penalty_and_kinetic_friction():
    # mass inside plane z<0 with lateral velocity -> kinetic friction
    pos = jnp.asarray(np.array([[0.0, 0.0, -0.01]]).T)
    vel = jnp.asarray(np.array([[2.0, 0.0, 0.0]]).T)
    f0 = jnp.asarray(np.array([[0.0, 0.0, -0.98]]).T)  # gravity on m=0.1
    n = jnp.asarray(np.array([0.0, 0.0, 1.0]))
    out = np.asarray(F.apply_contact_plane(
        f0, pos, vel, n, jnp.float32(0.0), jnp.float32(0.5),  # fk = 0.5
        jnp.float32(0.0), 20000.0))
    # friction: |f_n| = 0.98, v_perp = x_hat*2 -> f -= x_hat * 0.5*0.98
    np.testing.assert_allclose(out[0, 0], -0.49, rtol=1e-6)
    # penalty: -disp*NORMAL = 0.01*20000 = 200 upward, plus f_z = -0.98
    np.testing.assert_allclose(out[2, 0], 200 - 0.98, rtol=1e-6)


def test_contact_plane_static_friction():
    # at rest inside the plane with small lateral force -> fully cancelled
    pos = jnp.asarray(np.array([[0.0, 0.0, -0.001]]).T)
    vel = jnp.zeros((3, 1))
    f0 = jnp.asarray(np.array([[0.1, 0.0, -1.0]]).T)
    n = jnp.asarray(np.array([0.0, 0.0, 1.0]))
    out = np.asarray(F.apply_contact_plane(
        f0, pos, vel, n, jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(0.5), 20000.0))  # fs = 0.5: 0.5*1.0 > 0.1 -> sticks
    np.testing.assert_allclose(out[0, 0], 0.0, atol=1e-9)
    # too-large lateral force is NOT cancelled (slides; reference leaves it)
    f1 = jnp.asarray(np.array([[0.9, 0.0, -1.0]]).T)
    out2 = np.asarray(F.apply_contact_plane(
        f1, pos, vel, n, jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(0.5), 20000.0))
    np.testing.assert_allclose(out2[0, 0], 0.9, atol=1e-9)


def test_contact_plane_outside_no_force():
    pos = jnp.asarray(np.array([[0.0, 0.0, 0.5]]).T)
    vel = jnp.asarray(np.array([[1.0, 0.0, 0.0]]).T)
    f0 = jnp.asarray(np.array([[0.0, 0.0, -0.98]]).T)
    n = jnp.asarray(np.array([0.0, 0.0, 1.0]))
    out = np.asarray(F.apply_contact_plane(
        f0, pos, vel, n, jnp.float32(0.0), jnp.float32(0.5),
        jnp.float32(0.5), 20000.0))
    np.testing.assert_allclose(out, np.asarray(f0))


def test_ball_constraint():
    pos = jnp.asarray(np.array([[0.5, 0.0, 0.0], [3.0, 0.0, 0.0]]).T)
    f0 = jnp.zeros((3, 2))
    out = np.asarray(F.apply_ball(
        f0, pos, jnp.asarray(np.zeros(3)), jnp.float32(1.0), 20000.0))
    # inside: push radially out with magnitude NORMAL * (pos-c)/dist... the
    # reference force is NORMAL * (pos - c) / dist -> magnitude NORMAL*|pos-c|/dist
    np.testing.assert_allclose(out[:, 0], [20000 * 0.5 / 0.5, 0, 0], rtol=1e-9)
    np.testing.assert_allclose(out[:, 1], 0.0)


def test_magnet_pair():
    # two magnetic masses 0.1 m apart, radii 0.015 -> no shell overlap;
    # attraction on i: -scale_j*maxf_i/d^2 toward j
    m = _masses([[0, 0, 0], [0.1, 0, 0]],
                mag_rad=np.array([0.015, 0.015]),
                mag_stiffness=np.array([5000.0, 5000.0]),
                mag_maxf=np.array([2.0, 2.0]),
                mag_scale=np.array([1.0, 1.0]))
    f = np.asarray(F.magnet_forces(m, 0.14))
    expect = 2.0 / 0.01  # maxf / d^2 = 200
    np.testing.assert_allclose(f[0, 0], +expect, rtol=1e-6)   # pulled toward +x
    np.testing.assert_allclose(f[0, 1], -expect, rtol=1e-6)
    # outside the 0.14 cutoff: nothing
    m2 = _masses([[0, 0, 0], [0.2, 0, 0]],
                 mag_rad=np.array([0.015, 0.015]),
                 mag_maxf=np.array([2.0, 2.0]),
                 mag_scale=np.array([1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(F.magnet_forces(m2, 0.14)), 0.0)


def test_magnet_shell_overlap():
    # overlapping shells: repulsive |inter|*stiffness_i on top of attraction
    d = 0.02
    m = _masses([[0, 0, 0], [d, 0, 0]],
                mag_rad=np.array([0.015, 0.015]),
                mag_stiffness=np.array([5000.0, 5000.0]),
                mag_maxf=np.array([0.0, 0.0]),
                mag_scale=np.array([1.0, 1.0]))
    f = np.asarray(F.magnet_forces(m, 0.14))
    inter = d - 0.03
    np.testing.assert_allclose(f[0, 0], -abs(inter) * 5000.0, rtol=1e-6)


@pytest.mark.parametrize("d", [1, 43, 127, 128, 129, 1807, -1, -43, -128, -1807])
def test_roll_helpers(d):
    """_roll_gather reads flat index n+d; _roll_scatter is its inverse."""
    N = 1024
    x = np.arange(3 * N, dtype=np.float32).reshape(3, N)
    got_g = np.asarray(F._roll_gather(jnp.asarray(x), d))
    np.testing.assert_array_equal(got_g, np.roll(x, -d, axis=1))
    got_s = np.asarray(F._roll_scatter(jnp.asarray(x), d))
    np.testing.assert_array_equal(got_s, np.roll(x, d, axis=1))
    np.testing.assert_array_equal(
        np.asarray(F._roll_scatter(F._roll_gather(jnp.asarray(x), d), d)), x)


def test_stencil_matches_gather_path():
    """Whole-sim cross-check: stencil on vs off gives the same trajectory."""
    from titan_tpu import Simulation, SimConfig, Vec

    res = []
    for use_stencil in (True, False):
        sim = Simulation(SimConfig(velocity_clamp=False,
                                   use_stencil=use_stencil))
        sim.createLattice(Vec(0, 0, 5), Vec(2, 2, 2), 4, 4, 4)
        sim.createPlane(Vec(0, 0, 1), 0)
        sim.setGlobalAcceleration(Vec(0, 0, -9.8))
        sim.setTimeStep(0.0001)
        for s in sim.springs:
            s._damping = 0.1
        sim.start()
        sim.pause(0.5)
        sim.getAll()
        res.append(sim._store.pos[: sim._store.n_masses].copy())
        sim.stop()
    np.testing.assert_allclose(res[0], res[1], atol=2e-4)


def test_magnet_chunked_matches_direct():
    rng = np.random.default_rng(5)
    n = 50
    m = _masses(rng.uniform(-0.1, 0.1, (n, 3)),
                mag_rad=np.full(n, 0.01),
                mag_stiffness=np.full(n, 5000.0),
                mag_maxf=rng.uniform(0, 2, n),
                mag_scale=rng.uniform(0.5, 1.5, n))
    direct = np.asarray(F.magnet_forces(m, 0.14, chunk=n))
    chunked = np.asarray(F.magnet_forces(m, 0.14, chunk=16))
    # f32: chunked scan sums sources in a different order
    np.testing.assert_allclose(chunked, direct, rtol=2e-4, atol=1e-4)
