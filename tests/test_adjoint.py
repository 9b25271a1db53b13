"""The fused adjoint kernel (ops/adjoint.py).

Two layers of pinning:
1. The hand-derived transpose (backward_step) against jax.vjp of the
   identically-shaped forward (forward_step) under jnp rolls -- exact
   math-level check, every force form and constraint variant.
2. adjoint_rollout's gradients against jax.grad through diff.rollout
   (the independent XLA step path) on real scenes, kernels in interpret
   mode -- wiring + kernel-level check.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.ops import adjoint
from titan_tpu.ops.adjoint import (adjoint_reject_reason, adjoint_rollout,
                                   adjoint_supported, backward_step,
                                   forward_step, jnp_rolls)

ROWS = 4
N = ROWS * 128
DELTAS = (1, 127, 128, 200)


def _mk_lc(rng, caps, sh):
    """Random stacked local-constraint slot array [L, R, 128] in the
    kernel's reference order (pallas_step.stage_local_constraints):
    contact planes (act, n3, off, fk, fs), balls (act, c3, rad),
    constraint planes (act, n3, fric), directions (act, t3, fric).
    ~70% of masses active per slot so both select branches bite."""
    def unit3():
        v = rng.normal(0, 1.0, (3,) + sh)
        return v / np.sqrt((v * v).sum(0, keepdims=True))

    def act():
        return (rng.uniform(0, 1, (1,) + sh) < 0.7).astype(np.float32)

    parts = []
    for _ in range(caps[0]):             # contact planes
        parts += [act(), unit3(), rng.uniform(-1.0, 1.0, (1,) + sh),
                  rng.uniform(0.0, 0.6, (1,) + sh),
                  rng.uniform(0.0, 0.8, (1,) + sh)]
    for _ in range(caps[1]):             # balls (pos is ~N(0,1): radius
        parts += [act(), rng.normal(0, 1.0, (3,) + sh),   # spans hit/miss)
                  rng.uniform(0.5, 2.0, (1,) + sh)]
    for _ in range(caps[2]):             # constraint planes
        parts += [act(), unit3(), rng.uniform(0.0, 0.7, (1,) + sh)]
    for _ in range(caps[3]):             # directions
        parts += [act(), unit3(), rng.uniform(0.0, 0.7, (1,) + sh)]
    return jnp.asarray(np.concatenate(parts, axis=0), jnp.float32)


def _mk_remainder(rng, S, damping, breathing, actuated):
    """Random remainder-spring inputs in the kernel's staged form
    (pallas_step.stage_remainder): factorized endpoint selectors
    rowsel [2S, R] / lanesel [2S, 128] + remp [5, S, 1] rows
    [k, rest, damping, bsign, bomega] (+ independent aratedt_e /
    sstop_e when actuated).  ~10% of springs carry k == 0 (padding-
    like), and spring 0 is DEGENERATE (left == right -> zero length)
    so the guarded-norm branches bite."""
    lr = rng.randint(0, N, 2 * S).astype(np.int32)
    lr[S] = lr[0]                      # spring 0: left == right
    rowsel = (lr[:, None] // 128
              == np.arange(ROWS)[None, :]).astype(np.float32)
    lanesel = (lr[:, None] % 128
               == np.arange(128)[None, :]).astype(np.float32)
    z = np.zeros((S, 1))
    remp = np.stack([
        rng.uniform(50.0, 200.0, (S, 1))
        * (rng.uniform(0, 1, (S, 1)) < 0.9),
        rng.uniform(0.5, 1.5, (S, 1)),
        rng.uniform(0.0, 0.6, (S, 1)) if damping else z,
        rng.choice([-0.2, 0.0, 0.2], (S, 1)) if breathing else z,
        rng.uniform(1.0, 9.0, (S, 1)) if breathing else z,
    ])
    out = {
        "has_remainder": True, "n_rem": S,
        "rowsel": jnp.asarray(rowsel, jnp.float32),
        "lanesel": jnp.asarray(lanesel, jnp.float32),
        "remp": jnp.asarray(remp, jnp.float32),
        "aratedt_e": (jnp.asarray(
            rng.uniform(-5e-3, 5e-3, (S, 1))
            * (rng.uniform(0, 1, (S, 1)) < 0.5), jnp.float32)
            if actuated else None),
        "sstop_e": (jnp.asarray(rng.randint(0, 9, (S, 1)), jnp.float32)
                    if actuated else None),
    }
    return out


def _mk_magnets(rng, sh):
    """Random validity-folded magnet param planes [5, R, 128] in the
    kernel's staged order (rad, stiffness, maxf, scale, valid); ~30% of
    rads/maxfs zero so shell-only / attract-only cases both bite."""
    valid = (rng.uniform(0, 1, (1,) + sh) < 0.9).astype(np.float32)
    magp = np.stack([
        rng.uniform(0.1, 0.6, sh) * (rng.uniform(0, 1, sh) < 0.7),
        rng.uniform(0.0, 50.0, sh),
        rng.uniform(0.0, 2.0, sh) * (rng.uniform(0, 1, sh) < 0.7),
        rng.uniform(0.0, 1.5, sh),
    ]) * valid
    return jnp.asarray(np.concatenate([magp, valid], axis=0), jnp.float32)


def _mkP(rng, fmath, damping, clamp, drag, planes, fric, ball,
         fixed, breathing=False, verlet=False, rk2=False, actuated=False,
         lcp=0, lball=0, lpl=0, ldir=0, remainder=False, magnets=False):
    # fmath: "legacy" = sqrt+div (the CPU gate), "legacy_rsqrt" = rsqrt
    # norms with the legacy force form (TITAN_FMATH=legacy on TPU),
    # "shared" = rsqrt + shared-c form (the TPU default)
    fmath_shared = fmath == "shared"
    F = len(DELTAS)
    sh = (ROWS, 128)
    P = {
        "deltas": DELTAS,
        "verlet": verlet,
        "rk2": rk2,
        "has_breathing": breathing,
        "bsign": (jnp.asarray(
            rng.choice([-0.2, 0.0, 0.2], (F,) + sh), jnp.float32)
            if breathing else None),
        "bomega": (jnp.asarray(rng.uniform(1.0, 9.0, (F,) + sh),
                               jnp.float32) if breathing else None),
        "k": jnp.asarray(rng.uniform(50.0, 200.0, (F,) + sh), jnp.float32),
        "rest": jnp.asarray(rng.uniform(0.5, 1.5, (F,) + sh), jnp.float32),
        "damping": (jnp.asarray(rng.uniform(0.0, 0.6, (F,) + sh),
                                jnp.float32) if damping else None),
        "minv": jnp.asarray(rng.uniform(0.5, 2.0, (1,) + sh), jnp.float32),
        "fixed": (jnp.asarray(rng.uniform(0, 1, (1,) + sh) < 0.1,
                              jnp.float32) if fixed
                  else jnp.zeros((1,) + sh, jnp.float32)),
        "cf": jnp.asarray(rng.normal(0, 1, (3,) + sh), jnp.float32),
        "drag": (jnp.asarray(rng.uniform(0.0, 0.5, (1,) + sh), jnp.float32)
                 if drag else None),
        "planes": [(jnp.float32(0.1), jnp.float32(0.2), jnp.float32(0.97),
                    jnp.float32(-0.5), jnp.float32(0.4 if fric else 0.0),
                    jnp.float32(0.6 if fric else 0.0))] * planes,
        "plane_friction": (fric,) * planes,
        "balls": ([(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
                    jnp.float32(2.0))] if ball else []),
        "dt": jnp.float32(1e-3),
        "clamp": clamp,
        "has_damping": damping,
        "has_drag": drag,
        "normal_coeff": 100.0,
        "rsqrt_norms": fmath in ("shared", "legacy_rsqrt"),
        "fmath_shared": fmath_shared,
        "has_actuated": actuated,
        # closed-form ACTUATED inputs: per-call signed rest advance
        # (zero on ~half the springs, like a mixed scene) and the
        # integer-valued f32 stop count
        "aratedt": (jnp.asarray(
            rng.uniform(-5e-3, 5e-3, (F,) + sh)
            * (rng.uniform(0, 1, (F,) + sh) < 0.5), jnp.float32)
            if actuated else None),
        "sstop": (jnp.asarray(rng.randint(0, 9, (F,) + sh), jnp.float32)
                  if actuated else None),
        "caps": (lcp, lball, lpl, ldir),
        "lc": (_mk_lc(rng, (lcp, lball, lpl, ldir), sh)
               if (lcp or lball or lpl or ldir) else None),
        "has_remainder": False, "n_rem": 0, "rowsel": None,
        "lanesel": None, "remp": None,
        "has_magnets": magnets, "magnet_cutoff": 1.5,
        "mag": _mk_magnets(rng, sh) if magnets else None,
    }
    if remainder:
        P.update(_mk_remainder(rng, 24, damping, breathing, actuated))
    return P


VARIANTS = {
    "plain": dict(),
    "damping": dict(damping=True),
    "clamp": dict(clamp=True),
    "drag": dict(drag=True),
    "plane": dict(planes=1),
    "plane_friction": dict(planes=1, fric=True),
    "two_planes_fric": dict(planes=2, fric=True),
    "ball": dict(ball=True),
    "fixed": dict(fixed=True),
    "breathing": dict(breathing=True),
    "verlet": dict(verlet=True),
    "verlet_damping": dict(verlet=True, damping=True),
    "rk2": dict(rk2=True),
    "rk2_damping": dict(rk2=True, damping=True),
    "rk2_everything": dict(rk2=True, damping=True, drag=True, planes=2,
                           fric=True, ball=True, fixed=True,
                           breathing=True),
    "everything": dict(damping=True, clamp=True, drag=True, planes=2,
                       fric=True, ball=True, fixed=True),
    "everything_breathing": dict(damping=True, clamp=True, drag=True,
                                 planes=2, fric=True, ball=True,
                                 fixed=True, breathing=True),
    "everything_verlet": dict(damping=True, drag=True, planes=2,
                              fric=True, ball=True, fixed=True,
                              breathing=True, verlet=True),
    "actuated": dict(actuated=True),
    "actuated_breathing": dict(actuated=True, breathing=True,
                               damping=True),
    "verlet_actuated": dict(verlet=True, actuated=True, damping=True),
    "rk2_actuated": dict(rk2=True, actuated=True, damping=True),
    "everything_actuated": dict(damping=True, clamp=True, drag=True,
                                planes=2, fric=True, ball=True,
                                fixed=True, breathing=True,
                                actuated=True),
    "lcontact": dict(lcp=2),
    "lball": dict(lball=2),
    "lplane": dict(lpl=2),
    "ldir": dict(ldir=2),
    "local_mix": dict(lcp=1, lball=1, lpl=1, ldir=1, damping=True),
    "local_drag": dict(lpl=1, ldir=1, drag=True),
    "local_verlet": dict(lcp=1, lpl=1, ldir=1, verlet=True,
                         damping=True),
    "local_rk2": dict(lcp=1, lball=1, lpl=1, ldir=1, rk2=True,
                      damping=True),
    "everything_local": dict(damping=True, clamp=True, drag=True,
                             planes=1, fric=True, ball=True, fixed=True,
                             breathing=True, actuated=True, lcp=1,
                             lball=1, lpl=1, ldir=1),
    "remainder": dict(remainder=True),
    "remainder_damping": dict(remainder=True, damping=True),
    "remainder_breathing": dict(remainder=True, breathing=True),
    "remainder_actuated": dict(remainder=True, actuated=True,
                               damping=True),
    "verlet_remainder": dict(verlet=True, remainder=True, damping=True),
    "rk2_remainder": dict(rk2=True, remainder=True, damping=True),
    "everything_remainder": dict(remainder=True, damping=True, clamp=True,
                                 drag=True, planes=1, fric=True, ball=True,
                                 fixed=True, breathing=True, actuated=True,
                                 lcp=1, lpl=1),
    "magnets": dict(magnets=True),
    "magnets_damping": dict(magnets=True, damping=True),
    "magnets_fixed": dict(magnets=True, fixed=True),
    "verlet_magnets": dict(verlet=True, magnets=True, damping=True),
    "rk2_magnets": dict(rk2=True, magnets=True, damping=True),
    "everything_magnets": dict(magnets=True, remainder=True, damping=True,
                               clamp=True, drag=True, planes=1, fric=True,
                               ball=True, fixed=True, breathing=True,
                               lcp=1, ldir=1),
}


@pytest.mark.parametrize("fmath", ["legacy", "legacy_rsqrt", "shared"])
@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_backward_step_matches_jax_vjp(variant, fmath):
    """backward_step == jax.vjp(forward_step) for state AND params."""
    rng = np.random.RandomState(7)
    kw = dict(damping=False, clamp=False, drag=False, planes=0, fric=False,
              ball=False, fixed=False, breathing=False, verlet=False,
              rk2=False, actuated=False, lcp=0, lball=0, lpl=0, ldir=0,
              remainder=False, magnets=False)
    kw.update(VARIANTS[variant])
    P = _mkP(rng, fmath, **kw)
    rg, rs = jnp_rolls(ROWS)
    t_now = jnp.float32(0.37)
    s_idx = jnp.float32(3.0)

    pos = jnp.asarray(rng.normal(0, 1, (3, ROWS, 128)), jnp.float32)
    vel = jnp.asarray(rng.normal(0, 0.8, (3, ROWS, 128)), jnp.float32)
    acc = jnp.asarray(rng.normal(0, 1, (3, ROWS, 128)), jnp.float32)
    gp2 = jnp.asarray(rng.normal(0, 1, (3, ROWS, 128)), jnp.float32)
    gv2 = jnp.asarray(rng.normal(0, 1, (3, ROWS, 128)), jnp.float32)
    ga2 = jnp.asarray(rng.normal(0, 1, (3, ROWS, 128)), jnp.float32)

    diffable = ["k", "rest", "cf", "minv"]
    if kw["damping"]:
        diffable.append("damping")
    if kw["drag"]:
        diffable.append("drag")
    if kw["breathing"]:
        diffable.append("bomega")
    if kw["actuated"]:
        diffable.append("aratedt")
    if kw["remainder"]:
        # remp rows 0/1/2/4 (k/rest/damping/bomega) are produced by the
        # transpose; row 3 (bsign) is type-derived, not differentiable
        # (like the stencil bsign)
        diffable.append("remp")
        if kw["actuated"]:
            diffable.append("aratedt_e")
    if kw["magnets"]:
        # mag rows 0-3 (rad/stiffness/maxf/scale); row 4 (validity) is
        # not differentiable
        diffable.append("mag")

    def fwd(pos, vel, acc, params):
        Q = dict(P)
        Q.update(params)
        return forward_step(pos, vel, acc, Q, rg, rs, t_now, s_idx=s_idx)

    params = {k: P[k] for k in diffable}
    out, vjp = jax.vjp(fwd, pos, vel, acc, params)
    gpos_j, gvel_j, gacc_j, gpar_j = vjp((gp2, gv2, ga2))

    gpos, gvel, gacc_prev, bars = backward_step(pos, vel, gp2, gv2, ga2,
                                                P, rg, rs, t_now,
                                                s_idx=s_idx)
    tol = dict(rtol=2e-4, atol=2e-4)
    # RK2 chained through vel-mutating local constraints: backward_step
    # RECOMPUTES primal intermediates that jax.vjp stashed, so f32
    # rounding can flip friction-select booleans (kinetic/static/moving)
    # on a handful of boundary elements, toggling between two valid
    # subgradients.  Verified against an f64 vjp: on those elements the
    # hand transpose is CLOSER to the f64 truth than jax's own f32 vjp
    # (13/19 closer, both within ~3e-2 of truth).  Allow <=2% stragglers
    # inside a loose bound; everything else stays at the strict tol.
    frac = (0.02 if (kw["rk2"] and (kw["lpl"] or kw["ldir"])) else 0.0)

    def close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        if frac == 0.0:
            np.testing.assert_allclose(a, b, **tol)
            return
        bad = ~np.isclose(a, b, **tol)
        assert bad.mean() <= frac, (
            f"{bad.mean():.2%} of elements outside strict tol")
        np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-2)

    close(gpos, gpos_j)
    close(gvel, gvel_j)
    close(gacc_prev, gacc_j)
    close(jnp.stack(bars["k"]), gpar_j["k"])
    close(jnp.stack(bars["rest"]), gpar_j["rest"])
    close(bars["cf"], gpar_j["cf"])
    close(bars["minv"], gpar_j["minv"])
    if kw["damping"]:
        close(jnp.stack(bars["damping"]), gpar_j["damping"])
    if kw["drag"]:
        close(bars["drag"], gpar_j["drag"])
    if kw["breathing"]:
        close(jnp.stack(bars["omega"]), gpar_j["bomega"])
    if kw["actuated"]:
        close(jnp.stack(bars["aratedt"]), gpar_j["aratedt"])
    if kw["remainder"]:
        close(bars["k_e"], gpar_j["remp"][0])
        close(bars["rest_e"], gpar_j["remp"][1])
        if kw["damping"]:
            close(bars["damp_e"], gpar_j["remp"][2])
        if kw["breathing"]:
            close(bars["omega_e"], gpar_j["remp"][4])
        if kw["actuated"]:
            close(bars["aratedt_e"], gpar_j["aratedt_e"])
    if kw["magnets"]:
        close(bars["mag_rad"], gpar_j["mag"][0])
        close(bars["mag_stiffness"], gpar_j["mag"][1])
        close(bars["mag_maxf"], gpar_j["mag"][2])
        close(bars["mag_scale"], gpar_j["mag"][3])

    # the TITAN_ADJ_STASH=off recompute path is BITWISE equal to the
    # stashed one (same ops, same order -- only where they're computed)
    gpos2_, gvel2_, _, bars2 = backward_step(
        pos, vel, gp2, gv2, ga2, {**P, "famstash": False}, rg, rs, t_now,
        s_idx=s_idx)
    np.testing.assert_array_equal(np.asarray(gpos), np.asarray(gpos2_))
    np.testing.assert_array_equal(np.asarray(gvel), np.asarray(gvel2_))
    np.testing.assert_array_equal(np.asarray(jnp.stack(bars["k"])),
                                  np.asarray(jnp.stack(bars2["k"])))


# ---------------------------------------------------------------------------
# Integration: adjoint_rollout vs jax.grad through the XLA path
# ---------------------------------------------------------------------------

def _scene(clamp=False, friction=False, ball=False, fixed_face=False,
           damping=0.0, drag=0.0, deleted=False, extern=False,
           breathing=False, actuated=False, local=False, integrator=None,
           cross=False, cross_breathing=False, cross_actuated=False):
    cfg = dict(velocity_clamp=clamp)
    if integrator:
        from titan_tpu import Integrator
        cfg["integrator"] = Integrator(integrator)
    sim = Simulation(SimConfig(**cfg))
    if fixed_face:
        sim.createBeam(Vec(0, 0, 2), Vec(1, 1, 1), 4, 4, 4)
    else:
        sim.createLattice(Vec(0, 0, 2), Vec(1, 1, 1), 4, 4, 4)
    if cross:
        # irregular cross links (the reference's multi-agent mechanism,
        # multiagent_unittest.cpp:29-35): long-span springs that bucket
        # as remainder, incl. one pair sharing an endpoint
        for a, b in [(0, 37), (5, 50), (12, 63), (12, 41), (17, 60)]:
            sim.createSpring(sim.getMassByIndex(a), sim.getMassByIndex(b))
    sim.setAllSpringConstantValues(800.0)
    st = sim._store
    # pre-stress: a free-falling lattice at natural rest has ZERO spring
    # deformation, so k/rest/damping gradients are f32-noise-scale
    # (~1e-9) and normalized comparisons fail on noise; 3% rest extension
    # gives them real magnitude from step 0
    st.rest[: st.n_springs] *= 1.03
    if cross_breathing:
        from titan_tpu import ACTIVE_EXPAND_THEN_CONTRACT
        st.s_type[st.n_springs - 4: st.n_springs - 2] = \
            ACTIVE_EXPAND_THEN_CONTRACT
        st.omega[st.n_springs - 4: st.n_springs - 2] = 6.0
    if cross_actuated:
        from titan_tpu import ACTUATED_CONTRACT, ACTUATED_EXPAND
        i0 = st.n_springs - 4
        st.s_type[i0: i0 + 2] = ACTUATED_EXPAND
        st.l_max[i0: i0 + 2] = st.rest[i0: i0 + 2] * 1.001
        st.rate[i0: i0 + 2] = 0.6
        st.s_type[i0 + 2: i0 + 3] = ACTUATED_CONTRACT
        st.l_min[i0 + 2: i0 + 3] = st.rest[i0 + 2: i0 + 3] * 0.5
        st.rate[i0 + 2: i0 + 3] = 0.8
    if damping:
        st.damping[: st.n_springs] = damping
    if drag:
        st.drag[: st.n_masses] = drag
    if deleted:
        st.valid[3] = False
        st.valid[17] = False
    if extern:
        st.extern_force[2, :8] = 0.5
    if breathing:
        from titan_tpu import ACTIVE_CONTRACT_THEN_EXPAND
        half = st.n_springs // 2
        st.s_type[:half] = ACTIVE_CONTRACT_THEN_EXPAND
        st.omega[:half] = 7.0
    if actuated:
        from titan_tpu import ACTUATED_CONTRACT, ACTUATED_EXPAND
        q = st.n_springs // 4
        # expanders with a reachable bound (the closed-form stop count
        # bites mid-horizon) and contractors that never reach theirs
        st.s_type[:q] = ACTUATED_EXPAND
        st.l_max[:q] = st.rest[:q] * 1.001
        st.rate[:q] = 0.6
        st.s_type[q: 2 * q] = ACTUATED_CONTRACT
        st.l_min[q: 2 * q] = st.rest[q: 2 * q] * 0.5
        st.rate[q: 2 * q] = 0.8
    if local:
        from titan_tpu import (BALL, CONSTRAINT_PLANE, CONTACT_PLANE,
                               DIRECTION)
        # lattice masses live in [-0.5, 0.5]^2 x [1.5, 2.5] around the
        # (0, 0, 2) center: the contact plane at offset 2.0 is active for
        # the bottom half from step 0, the ball envelops a corner, and
        # constraint planes / directions act whenever the mass moves
        for i in range(6):
            sim.getMassByIndex(i).addConstraint(
                CONTACT_PLANE, Vec(0.1, 0.2, 1.0), 2.0)
        for i in range(6, 10):
            sim.getMassByIndex(i).addConstraint(BALL, Vec(0.2, 0.2, 1.7),
                                                0.9)
        for i in range(10, 14):
            sim.getMassByIndex(i).addConstraint(
                CONSTRAINT_PLANE, Vec(0.2, 0.1, 1.0), 0.3)
        for i in range(14, 18):
            sim.getMassByIndex(i).addConstraint(DIRECTION,
                                                Vec(1.0, 0.2, 0.5), 0.2)
        # friction-bearing contact planes arrive via the per-env plane
        # sweep record form (parallel/flat.set_env_plane's 4-tuple)
        for i in (18, 19):
            rec = sim._store.local_record(i)
            nv = np.array([0.05, 0.1, 1.0])
            rec.contact_planes.append((nv / np.linalg.norm(nv), 2.0,
                                       0.3, 0.5))
    if friction:
        sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    else:
        sim.createPlane(Vec(0, 0, 1), 0)
    if ball:
        sim.createBall(Vec(0.2, 0.2, 1.2), 0.8)
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim._T = 0.0
    sim._marshal()
    return sim


SCENES = {
    "friction_damping": dict(friction=True, damping=0.3),
    "clamp": dict(clamp=True, damping=0.2, friction=True),
    "drag_ball": dict(drag=0.3, ball=True),
    "beam_fixed": dict(fixed_face=True, damping=0.4, friction=True),
    "deleted_extern": dict(deleted=True, extern=True, friction=True),
    "breathing": dict(breathing=True, friction=True, damping=0.3),
    "verlet": dict(integrator="verlet", friction=True, damping=0.3),
    "verlet_breathing": dict(integrator="verlet", breathing=True,
                             friction=True),
    "rk2": dict(integrator="rk2", friction=True, damping=0.3),
    "rk2_breathing": dict(integrator="rk2", breathing=True, friction=True),
    "actuated": dict(actuated=True, friction=True, damping=0.3),
    "actuated_breathing": dict(actuated=True, breathing=True,
                               friction=True),
    "verlet_actuated": dict(integrator="verlet", actuated=True,
                            friction=True, damping=0.2),
    "rk2_actuated": dict(integrator="rk2", actuated=True, friction=True),
    "local_mix": dict(local=True, friction=True, damping=0.3),
    "local_drag": dict(local=True, drag=0.3),
    "local_verlet": dict(local=True, integrator="verlet", damping=0.2),
    "local_rk2": dict(local=True, integrator="rk2", damping=0.2,
                      friction=True),
}


def _interp(monkeypatch):
    import jax.experimental.pallas as pl
    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig_call(*args, **kwargs)

    monkeypatch.setattr("titan_tpu.ops.adjoint.pl.pallas_call", interp_call)
    monkeypatch.setattr("titan_tpu.ops.pallas_step.pl.pallas_call",
                        interp_call)


@pytest.mark.parametrize("scene_name", sorted(SCENES))
def test_adjoint_rollout_grads_match_xla(scene_name, monkeypatch):
    _main_grads_match_xla(_scene(**SCENES[scene_name]), monkeypatch)


@pytest.mark.parametrize("seed", range(4))
def test_adjoint_grads_random_combo(seed, monkeypatch):
    """Seeded random FEATURE COMBINATIONS through the same
    gradient-vs-XLA harness: the named SCENES cover each feature and a
    few pairs; this covers interactions (e.g. breathing + local
    constraints + remainder cross links + Verlet in one scene), the
    gradient-tier analog of test_pallas_step's random-combo fuzz."""
    rng = np.random.RandomState(7000 + seed)
    integ = [None, "verlet", "rk2"][rng.randint(3)]
    kw = dict(
        clamp=bool(rng.randint(2)),
        friction=bool(rng.randint(2)),
        ball=bool(rng.randint(2)),
        fixed_face=bool(rng.randint(2)),
        extern=bool(rng.randint(2)),
        damping=float(rng.choice([0.0, 0.3])),
        integrator=integ,
        breathing=bool(rng.randint(2)),
        actuated=bool(rng.randint(2)),
        drag=float(rng.choice([0.0, 0.25])),
        deleted=bool(rng.randint(2)),
        local=bool(rng.randint(2)),
        cross=bool(rng.randint(2)),
    )
    _main_grads_match_xla(_scene(**kw), monkeypatch)


def _main_grads_match_xla(sim, monkeypatch):
    from titan_tpu import diff
    from titan_tpu.state import xla_only_shape

    shape, state = sim._shape, sim._state
    assert adjoint_supported(shape), adjoint_reject_reason(shape)
    _interp(monkeypatch)

    n = sim._store.n_masses
    rng = np.random.RandomState(3)
    wpos = jnp.asarray(rng.normal(0, 1, (3, state.masses.pos.shape[1])),
                       jnp.float32).at[:, n:].set(0.0)
    wvel = jnp.asarray(rng.normal(0, 1, (3, state.masses.pos.shape[1])),
                       jnp.float32).at[:, n:].set(0.0)

    def run(rollout_fn, pos0, vel0, k, rest, m, extern, g, omega, rate):
        st = dataclasses.replace(
            state,
            masses=dataclasses.replace(state.masses, pos=pos0, vel=vel0,
                                       m=m, extern_force=extern),
            stencil=dataclasses.replace(state.stencil, k=k, rest=rest,
                                        omega=omega, rate=rate),
            g=g)
        out = rollout_fn(st)
        loss = (jnp.sum(out.masses.pos * wpos)
                + jnp.sum(out.masses.vel * wvel))
        if shape.has_actuated:
            # the mutated-rest OUTPUT carries its own rate/rest cotangent
            # chain -- weight it so that path is exercised too
            loss = loss + jnp.sum(out.stencil.rest * wrest)
        return loss

    args = (state.masses.pos, state.masses.vel, state.stencil.k,
            state.stencil.rest, state.masses.m, state.masses.extern_force,
            state.g, state.stencil.omega, state.stencil.rate)
    wrest = jnp.asarray(
        rng.normal(0, 1, state.stencil.rest.shape),
        jnp.float32) * state.stencil.mask
    nargs = 9

    g_adj = jax.grad(
        lambda *a: run(lambda s: adjoint_rollout(shape, s, 20, segment=10),
                       *a), argnums=tuple(range(nargs)))(*args)
    g_xla = jax.grad(
        lambda *a: run(lambda s: diff.rollout(xla_only_shape(shape), s, 20),
                       *a), argnums=tuple(range(nargs)))(*args)

    names = ["pos", "vel", "k", "rest", "m", "extern", "g", "omega",
             "rate"]
    mask_n = state.masses.valid
    for name, a, x in zip(names, g_adj, g_xla):
        a, x = np.asarray(a), np.asarray(x)
        if name in ("pos", "vel", "extern"):
            a, x = a[:, :n], x[:, :n]
        elif name in ("m",):
            a, x = a[:n], x[:n]
        elif name in ("k", "rest", "omega", "rate"):
            msk = np.asarray(state.stencil.mask)
            a, x = a * msk, x * msk
        scale = max(np.abs(x).max(), 1e-8)
        np.testing.assert_allclose(a / scale, x / scale, atol=5e-4,
                                   err_msg=f"grad[{name}] mismatch")
    assert mask_n is not None


REM_SCENES = {
    "cross": dict(cross=True, friction=True, damping=0.3),
    "cross_breathing": dict(cross=True, cross_breathing=True,
                            friction=True),
    "cross_actuated": dict(cross=True, cross_actuated=True, damping=0.2),
    "cross_verlet": dict(cross=True, integrator="verlet", damping=0.2),
    "cross_rk2": dict(cross=True, integrator="rk2", friction=True,
                      damping=0.3),
    "cross_deleted": dict(cross=True, deleted=True, friction=True),
}


@pytest.mark.parametrize("scene_name", sorted(REM_SCENES))
def test_adjoint_rollout_remainder_grads_match_xla(scene_name, monkeypatch):
    """Remainder (irregular) springs in the adjoint envelope: per-spring
    k/rest/omega/rate gradients onto state.springs, plus pos/vel flow
    through the factorized gather/scatter, all against jax.grad of the
    independent XLA step path.  Mass 17 (an endpoint of the 5th cross
    link) is deleted in the cross_deleted scene, so the rem_ok masking
    is exercised too."""
    from titan_tpu import diff
    from titan_tpu.state import xla_only_shape

    sim = _scene(**REM_SCENES[scene_name])
    shape, state = sim._shape, sim._state
    assert shape.has_remainder
    assert adjoint_supported(shape), adjoint_reject_reason(shape)
    _interp(monkeypatch)

    n = sim._store.n_masses
    rng = np.random.RandomState(5)
    wpos = jnp.asarray(rng.normal(0, 1, (3, state.masses.pos.shape[1])),
                       jnp.float32).at[:, n:].set(0.0)
    wvel = jnp.asarray(rng.normal(0, 1, (3, state.masses.pos.shape[1])),
                       jnp.float32).at[:, n:].set(0.0)
    wrest_e = jnp.asarray(rng.normal(0, 1, state.springs.rest.shape),
                          jnp.float32)

    def run(rollout_fn, pos0, vel0, sk, srest, somega, srate):
        st = dataclasses.replace(
            state,
            masses=dataclasses.replace(state.masses, pos=pos0, vel=vel0),
            springs=dataclasses.replace(state.springs, k=sk, rest=srest,
                                        omega=somega, rate=srate))
        out = rollout_fn(st)
        loss = (jnp.sum(out.masses.pos * wpos)
                + jnp.sum(out.masses.vel * wvel))
        if shape.has_actuated:
            # the mutated remainder-rest OUTPUT carries its own
            # rate/rest cotangent chain
            loss = loss + jnp.sum(out.springs.rest * wrest_e)
        return loss

    args = (state.masses.pos, state.masses.vel, state.springs.k,
            state.springs.rest, state.springs.omega, state.springs.rate)
    g_adj = jax.grad(
        lambda *a: run(lambda s: adjoint_rollout(shape, s, 20, segment=10),
                       *a), argnums=tuple(range(6)))(*args)
    g_xla = jax.grad(
        lambda *a: run(lambda s: diff.rollout(xla_only_shape(shape), s, 20),
                       *a), argnums=tuple(range(6)))(*args)

    rem_ok = np.asarray(state.springs.valid
                        & state.masses.valid[state.springs.left]
                        & state.masses.valid[state.springs.right])
    names = ["pos", "vel", "k", "rest", "omega", "rate"]
    for name, a, x in zip(names, g_adj, g_xla):
        a, x = np.asarray(a), np.asarray(x)
        if name in ("pos", "vel"):
            a, x = a[:, :n], x[:, :n]
        elif name in ("k", "rate"):
            a, x = a * rem_ok, x * rem_ok
        scale = max(np.abs(x).max(), 1e-8)
        np.testing.assert_allclose(a / scale, x / scale, atol=5e-4,
                                   err_msg=f"grad[{name}] mismatch")


MAG_SCENES = {
    "magnet": dict(),
    "magnet_damping": dict(damping=0.3, friction=True),
    "magnet_verlet": dict(integrator="verlet", damping=0.2),
    "magnet_rk2": dict(integrator="rk2", friction=True),
    "magnet_deleted": dict(deleted=True),
}


@pytest.mark.parametrize("scene_name", sorted(MAG_SCENES))
def test_adjoint_rollout_magnet_grads_match_xla(scene_name, monkeypatch):
    """Magnets in the adjoint envelope: pos/vel flow through the dense
    pairwise sweep plus per-mass mag_rad/stiffness/maxf/scale gradients,
    against jax.grad of the independent XLA (exact pairwise) path.  The
    deleted scene checks validity masking (mass 3 carries magnet params
    but is deleted)."""
    from titan_tpu import diff
    from titan_tpu.state import xla_only_shape

    sim = _scene(**MAG_SCENES[scene_name])
    st = sim._store
    # a cluster of fat shell magnets + pull-only attractors, spaced so
    # shell contact AND attraction both bite within the horizon
    st.mag_rad[:6] = 0.35
    st.mag_stiffness[:6] = 5.0
    st.mag_maxf[:10] = 0.5
    st.mag_scale[:10] = 1.0
    if MAG_SCENES[scene_name].get("deleted"):
        st.mag_maxf[3] = 2.0                 # deleted mass 3 with params
    sim._marshal()
    shape, state = sim._shape, sim._state
    assert shape.has_magnets
    assert adjoint_supported(shape), adjoint_reject_reason(shape)
    _interp(monkeypatch)

    n = st.n_masses
    rng = np.random.RandomState(9)
    wpos = jnp.asarray(rng.normal(0, 1, (3, state.masses.pos.shape[1])),
                       jnp.float32).at[:, n:].set(0.0)
    wvel = jnp.asarray(rng.normal(0, 1, (3, state.masses.pos.shape[1])),
                       jnp.float32).at[:, n:].set(0.0)

    def run(rollout_fn, pos0, vel0, mrad, mstiff, mmaxf, mscale):
        st_ = dataclasses.replace(
            state,
            masses=dataclasses.replace(
                state.masses, pos=pos0, vel=vel0, mag_rad=mrad,
                mag_stiffness=mstiff, mag_maxf=mmaxf, mag_scale=mscale))
        out = rollout_fn(st_)
        return (jnp.sum(out.masses.pos * wpos)
                + jnp.sum(out.masses.vel * wvel))

    m = state.masses
    args = (m.pos, m.vel, m.mag_rad, m.mag_stiffness, m.mag_maxf,
            m.mag_scale)
    g_adj = jax.grad(
        lambda *a: run(lambda s: adjoint_rollout(shape, s, 20, segment=10),
                       *a), argnums=tuple(range(6)))(*args)
    g_xla = jax.grad(
        lambda *a: run(lambda s: diff.rollout(xla_only_shape(shape), s, 20),
                       *a), argnums=tuple(range(6)))(*args)

    vmask = np.asarray(state.masses.valid)
    names = ["pos", "vel", "mag_rad", "mag_stiffness", "mag_maxf",
             "mag_scale"]
    for name, a, x in zip(names, g_adj, g_xla):
        a, x = np.asarray(a), np.asarray(x)
        if name in ("pos", "vel"):
            a, x = a[:, :n], x[:, :n]
        else:
            a, x = a * vmask, x * vmask
        scale = max(np.abs(x).max(), 1e-8)
        np.testing.assert_allclose(a / scale, x / scale, atol=5e-4,
                                   err_msg=f"grad[{name}] mismatch")


def test_grad_rollout_routes(monkeypatch, caplog):
    """diff.grad_rollout picks the adjoint inside the envelope (no
    warning) and falls back to fast_rollout with a loud warning naming
    the failed condition outside it (f64 here)."""
    import logging

    from titan_tpu import diff

    sim = _scene(friction=True, damping=0.3)
    shape, state = sim._shape, sim._state
    _interp(monkeypatch)
    with caplog.at_level(logging.WARNING, logger="titan_tpu"):
        out_g = diff.grad_rollout(shape, state, 10, segment=5)
    assert not [r for r in caplog.records
                if r.levelno >= logging.WARNING]
    out_a = adjoint_rollout(shape, state, 10, segment=5)
    np.testing.assert_array_equal(np.asarray(out_g.masses.pos),
                                  np.asarray(out_a.masses.pos))

    from titan_tpu import SimConfig as SC
    sim64 = Simulation(SC(dtype="float64"))
    sim64.createLattice(Vec(0, 0, 2), Vec(1, 1, 1), 3, 3, 3)
    sim64.setTimeStep(1e-4)
    sim64._T = 0.0
    sim64._marshal()
    with caplog.at_level(logging.WARNING, logger="titan_tpu"):
        diff.grad_rollout(sim64._shape, sim64._state, 4, segment=2)
    msgs = [r.message for r in caplog.records
            if r.levelno >= logging.WARNING]
    assert any("adjoint envelope" in m and "float64" in m for m in msgs), \
        msgs


def test_adjoint_forward_matches_chunk(monkeypatch):
    """adjoint_rollout's primal == the plain fused chunk (same kernel)."""
    from titan_tpu.ops.pallas_step import build_pallas_chunk

    sim = _scene(friction=True, damping=0.3)
    shape, state = sim._shape, sim._state
    _interp(monkeypatch)
    out_a = adjoint_rollout(shape, state, 20, segment=10)
    out_c = build_pallas_chunk(shape)(state, jnp.int32(20))
    np.testing.assert_array_equal(np.asarray(out_a.masses.pos),
                                  np.asarray(out_c.masses.pos))
    np.testing.assert_array_equal(np.asarray(out_a.masses.vel),
                                  np.asarray(out_c.masses.vel))


def test_reject_reasons():
    from titan_tpu import Integrator

    sim = _scene(friction=True)
    assert adjoint_reject_reason(sim._shape) is None

    # all three integrators are inside the envelope
    sim2 = Simulation(SimConfig(integrator=Integrator("rk2")))
    sim2.createLattice(Vec(0, 0, 2), Vec(1, 1, 1), 4, 4, 4)
    sim2.createPlane(Vec(0, 0, 1), 0)
    sim2.setTimeStep(1e-4)
    sim2._T = 0.0
    sim2._marshal()
    assert adjoint_reject_reason(sim2._shape) is None

    # ACTUATED_* joined the envelope (closed-form rest, module docstring)
    sim3 = _scene()
    st = sim3._store
    from titan_tpu import ACTUATED_EXPAND
    st.s_type[:4] = ACTUATED_EXPAND
    st.l_max[:4] = st.rest[:4] * 1.2
    st.rate[:4] = 0.5
    sim3._marshal()
    assert adjoint_reject_reason(sim3._shape) is None

    # magnet scenes within magnet_pallas_max are INSIDE the envelope
    # (dense in-VMEM pairwise sweep + its transpose)
    sim4 = _scene()
    sim4._store.mag_stiffness[:2] = 1.0
    sim4._store.mag_rad[:2] = 0.5
    sim4._marshal()
    assert adjoint_reject_reason(sim4._shape) is None
    # ... but beyond magnet_pallas_max the scene leaves the VMEM kernel
    # envelope entirely (inherited from pallas_reject_reason)
    sim5 = Simulation(SimConfig(magnet_pallas_max=32))
    sim5.createLattice(Vec(0, 0, 2), Vec(1, 1, 1), 4, 4, 4)
    sim5._store.mag_stiffness[:2] = 1.0
    sim5._store.mag_rad[:2] = 0.5
    sim5.setTimeStep(1e-4)
    sim5._T = 0.0
    sim5._marshal()
    assert "magnet" in adjoint_reject_reason(sim5._shape)

    # breathing (ACTIVE_*) and Verlet are INSIDE the envelope
    assert adjoint_reject_reason(
        _scene(breathing=True, friction=True)._shape) is None
    assert adjoint_reject_reason(
        _scene(integrator="verlet", friction=True)._shape) is None


def test_adjoint_on_flat_batched_envs(monkeypatch):
    """The flat-packed batch (parallel.replicate_scene) is one big stencil
    scene, so adjoint_rollout differentiates VECTORIZED environments
    directly: per-env gradients of per-env objectives, matching the XLA
    path.  (Per-env plane offsets use local-constraint slots, which are
    in the envelope too since local constraints joined; this scene keeps
    the shared global plane.)"""
    from titan_tpu import diff
    from titan_tpu.models import walker
    from titan_tpu.parallel import replicate_scene
    from titan_tpu.state import xla_only_shape

    src = Simulation(SimConfig())
    walker(src, size=1.0, n=3, k=1500.0, omega=6.0)
    big, envs = replicate_scene(src, n_envs=4, spacing=Vec(3, 0, 0))
    big.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    # dt large enough that breathing deforms within the 20-step horizon,
    # so omega gradients have real magnitude (not f32 noise)
    big.setTimeStep(1e-3)
    big.setGlobalAcceleration(Vec(0, 0, -9.8))
    shape, state = diff.scene(big)
    assert adjoint_supported(shape), adjoint_reject_reason(shape)
    assert shape.has_breathing
    _interp(monkeypatch)

    n_per = src._store.n_masses
    # per-env loss: env e's mean x displacement, summed with distinct
    # weights so d loss / d omega separates per env
    w = jnp.asarray([1.0, -2.0, 3.0, 0.5])

    def loss(omega, rollout):
        st = dataclasses.replace(
            state, stencil=dataclasses.replace(state.stencil, omega=omega))
        out = rollout(st)
        xs = out.masses.pos[0, : 4 * n_per].reshape(4, n_per)
        return jnp.sum(w * jnp.mean(xs, axis=1))

    g_adj = jax.grad(lambda o: loss(
        o, lambda s: adjoint_rollout(shape, s, 20, segment=10)))(
            state.stencil.omega)
    g_xla = jax.grad(lambda o: loss(
        o, lambda s: diff.rollout(xla_only_shape(shape), s, 20)))(
            state.stencil.omega)
    a, x = np.asarray(g_adj), np.asarray(g_xla)
    msk = np.asarray(state.stencil.mask)
    scale = max(np.abs(x * msk).max(), 1e-12)
    np.testing.assert_allclose(a * msk / scale, x * msk / scale, atol=5e-4)
    assert scale > 1e-9, "omega gradients should be real-magnitude"
