"""The fused Pallas chunk vs the XLA chunk: identical physics.

On CPU the kernel runs in Pallas interpret mode (slow but exact), so this
validates the TPU fast path without TPU hardware."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.ops import pallas_step
from titan_tpu.ops.step import build_chunk_fn


def _scene(clamp=True, friction=False, ball=False, fixed_face=False,
           extern=False, damping=0.0, integrator=None, breathing=False,
           actuated=False, drag=0.0, deleted=False, magnets=False,
           local=None, remainder=False, remainder_actuated=False,
           config_extra=None):
    from titan_tpu import (Integrator, ACTIVE_CONTRACT_THEN_EXPAND,
                           ACTUATED_CONTRACT, ACTUATED_EXPAND,
                           CONSTRAINT_PLANE, CONTACT_PLANE, BALL, DIRECTION)
    cfg = dict(velocity_clamp=clamp)
    if integrator:
        cfg["integrator"] = Integrator(integrator)
    cfg.update(config_extra or {})
    sim = Simulation(SimConfig(**cfg))
    if fixed_face:
        sim.createBeam(Vec(0, 0, 2), Vec(1, 1, 1), 4, 4, 4)
    else:
        sim.createLattice(Vec(0, 0, 2), Vec(1, 1, 1), 4, 4, 4)
    sim.setAllSpringConstantValues(800.0)
    if damping:
        sim._store.damping[: sim._store.n_springs] = damping
    if breathing:
        st = sim._store
        half = st.n_springs // 2
        st.s_type[:half] = ACTIVE_CONTRACT_THEN_EXPAND
        st.omega[:half] = 7.0
    if actuated:
        st = sim._store
        s = st.n_springs
        third = s // 3
        st.s_type[:third] = ACTUATED_EXPAND
        st.l_max[:third] = st.rest[:third] * 1.2
        st.rate[:third] = 0.5
        st.s_type[third:2 * third] = ACTUATED_CONTRACT
        st.l_min[third:2 * third] = st.rest[third:2 * third] * 0.8
        st.rate[third:2 * third] = 0.5
    if drag:
        sim._store.drag[: sim._store.n_masses] = drag
    if deleted:
        sim._store.valid[3] = False
        sim._store.valid[17] = False
    if magnets:
        st = sim._store
        rng = np.random.RandomState(0)
        half = st.n_masses // 2
        st.mag_rad[:half] = rng.uniform(0.02, 0.06, half)
        st.mag_stiffness[:half] = 300.0
        st.mag_maxf[:half] = rng.uniform(0.0, 1.5, half)
        st.mag_scale[:half] = 1.0
    if local:
        for i in (2, 9, 30):
            if local == "cp":
                sim.masses[i].addConstraint(CONTACT_PLANE, Vec(0, 0, 1), -0.2)
            elif local == "cp_friction":
                sim.masses[i].addConstraint(CONTACT_PLANE, Vec(0, 1, 2), -0.3)
            elif local == "ball":
                sim.masses[i].addConstraint(BALL, Vec(0, 0, 1.5), 0.7)
            elif local == "pl":
                sim.masses[i].addConstraint(CONSTRAINT_PLANE, Vec(0, 0, 1),
                                            0.3)
            elif local == "dir":
                sim.masses[i].addConstraint(DIRECTION, Vec(1, 0, 0), 0.2)
    if remainder or remainder_actuated:
        # irregular extra springs: unique index deltas (23, 29, 31) are not
        # 4x4x4-lattice family offsets and occur once each (below
        # stencil_min_count), so they land in the remainder partition
        for base, d in ((10, 23), (2, 29), (17, 31)):
            sp = sim.createSpring(sim.masses[base], sim.masses[base + d])
            sp._k = 600.0
            sp.defaultLength()
            if remainder_actuated:
                sp._type = ACTUATED_CONTRACT
                sp._l_min = sp._rest * 0.75
                sp._rate = 0.6
    if friction:
        sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    else:
        sim.createPlane(Vec(0, 0, 1), 0)
    if ball:
        sim.createBall(Vec(0, 0, 1.0), 0.6)
    if extern:
        sim.masses[0].setExternalForce(Vec(0.05, -0.02, 0.0))
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(0.0001)
    sim._T = 0.0
    sim._marshal()
    return sim


@pytest.mark.parametrize("variant", ["plain", "clamp_off", "friction",
                                     "ball", "beam", "extern", "damping",
                                     "verlet", "breathing", "actuated",
                                     "rk2", "rk2_actuated", "rk2_friction",
                                     "drag", "deleted", "actuated_deleted",
                                     "magnets", "magnets_deleted",
                                     "local_cp", "local_cp_tilted",
                                     "local_ball", "local_pl", "local_dir",
                                     "remainder", "remainder_damped",
                                     "remainder_actuated",
                                     "remainder_deleted", "rk2_remainder"])
def test_pallas_matches_xla(variant, monkeypatch):
    kw = dict(clamp=variant != "clamp_off",
              friction=variant in ("friction", "rk2_friction"),
              ball=variant == "ball",
              fixed_face=variant == "beam",
              extern=variant == "extern",
              damping=0.5 if variant in ("damping", "remainder_damped")
              else 0.0,
              integrator=("verlet" if variant == "verlet"
                          else "rk2" if variant.startswith("rk2") else None),
              breathing=variant == "breathing",
              actuated=variant in ("actuated", "actuated_deleted",
                                   "rk2_actuated"),
              drag=0.3 if variant == "drag" else 0.0,
              deleted=variant in ("deleted", "actuated_deleted",
                                  "magnets_deleted", "remainder_deleted"),
              magnets=variant.startswith("magnets"),
              remainder=variant.startswith(("remainder", "rk2_remainder")),
              remainder_actuated=variant == "remainder_actuated",
              local={"local_cp": "cp", "local_cp_tilted": "cp_friction",
                     "local_ball": "ball", "local_pl": "pl",
                     "local_dir": "dir"}.get(variant))
    sim = _scene(**kw)
    assert pallas_step.pallas_supported(sim._shape), "scene left the envelope"

    # force interpret mode on CPU
    import jax.experimental.pallas as pl
    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig_call(*args, **kwargs)

    monkeypatch.setattr("titan_tpu.ops.pallas_step.pl.pallas_call",
                        interp_call)

    chunk_pallas = pallas_step.build_pallas_chunk(sim._shape)
    chunk_xla = build_chunk_fn(sim._shape)

    out_p = chunk_pallas(sim._state, jnp.int32(50))
    out_x = chunk_xla(sim._state, jnp.int32(50))

    # compare real masses only: the kernel lets padding slots integrate
    # (harmlessly: their springs have k=0), the XLA path freezes them
    n = sim._store.n_masses
    # f32: kernel and XLA path order float ops differently
    np.testing.assert_allclose(np.asarray(out_p.masses.pos)[:, :n],
                               np.asarray(out_x.masses.pos)[:, :n],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.masses.vel)[:, :n],
                               np.asarray(out_x.masses.vel)[:, :n],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.masses.T)[:n],
                               np.asarray(out_x.masses.T)[:n], atol=1e-7)
    assert float(out_p.t) == pytest.approx(float(out_x.t), abs=1e-7)
    if variant.startswith("actuated"):
        # actuated rest mutation must round-trip out of the kernel
        np.testing.assert_allclose(np.asarray(out_p.stencil.rest),
                                   np.asarray(out_x.stencil.rest),
                                   atol=1e-6, rtol=1e-6)
        assert not np.allclose(np.asarray(out_p.stencil.rest),
                               np.asarray(sim._state.stencil.rest)), \
            "actuation did nothing"
    if variant == "remainder_actuated":
        # actuated REMAINDER rest must round-trip out of the kernel too
        np.testing.assert_allclose(np.asarray(out_p.springs.rest),
                                   np.asarray(out_x.springs.rest),
                                   atol=1e-6, rtol=1e-6)
        assert not np.allclose(np.asarray(out_p.springs.rest),
                               np.asarray(sim._state.springs.rest)), \
            "remainder actuation did nothing"
    if variant.startswith(("remainder", "rk2_remainder")):
        assert sim._shape.has_remainder


@pytest.mark.parametrize("seed", range(8))
def test_pallas_matches_xla_random_combo(seed, monkeypatch):
    """Seeded random FEATURE COMBINATIONS through the same kernel-vs-XLA
    equivalence harness: the hand-picked variants above cover each feature
    and a few pairs; this covers interactions (e.g. damping + drag +
    magnets + local constraints + Verlet in one scene)."""
    rng = np.random.RandomState(1000 + seed)
    integ = [None, "verlet", "rk2"][rng.randint(3)]
    kw = dict(
        clamp=bool(rng.randint(2)),
        friction=bool(rng.randint(2)),
        ball=bool(rng.randint(2)),
        fixed_face=bool(rng.randint(2)),
        extern=bool(rng.randint(2)),
        damping=float(rng.choice([0.0, 0.4])),
        integrator=integ,
        breathing=bool(rng.randint(2)),
        actuated=bool(rng.randint(2)),
        drag=float(rng.choice([0.0, 0.25])),
        deleted=bool(rng.randint(2)),
        magnets=bool(rng.randint(2)),
        local={0: None, 1: "cp", 2: "ball", 3: "pl", 4: "dir"}[rng.randint(5)],
        remainder=bool(rng.randint(2)),
    )
    sim = _scene(**kw)
    assert pallas_step.pallas_supported(sim._shape), "scene left the envelope"

    import jax.experimental.pallas as pl
    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig_call(*args, **kwargs)

    monkeypatch.setattr("titan_tpu.ops.pallas_step.pl.pallas_call",
                        interp_call)

    chunk_p = pallas_step.build_pallas_chunk(sim._shape)
    chunk_x = build_chunk_fn(sim._shape)
    n = sim._store.n_masses

    # ONE step, tight: a semantic bug (wrong force order, missing term)
    # shows immediately; only f32 op-order ulps remain at this horizon
    p1 = chunk_p(sim._state, jnp.int32(1))
    x1 = chunk_x(sim._state, jnp.int32(1))
    np.testing.assert_allclose(np.asarray(p1.masses.pos)[:, :n],
                               np.asarray(x1.masses.pos)[:, :n],
                               atol=1e-6, rtol=1e-6)

    # 50 steps, loose: Verlet + stiff magnet shells amplify the per-step
    # ulp differences chaotically (measured ~1e-7 -> 3.5e-4 over 50 steps
    # with NO semantic difference; Euler reproduces bitwise)
    p50 = chunk_p(sim._state, jnp.int32(50))
    x50 = chunk_x(sim._state, jnp.int32(50))
    np.testing.assert_allclose(np.asarray(p50.masses.pos)[:, :n],
                               np.asarray(x50.masses.pos)[:, :n],
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(p50.masses.vel)[:, :n],
                               np.asarray(x50.masses.vel)[:, :n],
                               atol=2e-3, rtol=2e-3)


def test_pallas_matches_xla_big_remainder(monkeypatch):
    """Hundreds of irregular springs with SHARED endpoints (scatter
    collisions) through the factorized-selector remainder path -- the
    round-1 [2S, N] incidence only ever saw a handful of springs."""
    from titan_tpu import ACTUATED_CONTRACT
    sim = Simulation(SimConfig(velocity_clamp=False))
    sim.createLattice(Vec(0, 0, 2), Vec(1, 1, 1), 8, 8, 8)   # 512 masses
    sim.setAllSpringConstantValues(800.0)
    rng = np.random.RandomState(42)
    n = len(sim.masses)
    made = set()
    for _ in range(300):
        a = int(rng.randint(n))
        b = int(rng.randint(n))
        if a == b or (a, b) in made or (b, a) in made:
            continue
        made.add((a, b))
        sp = sim.createSpring(sim.masses[a], sim.masses[b])
        sp._k = float(rng.uniform(50.0, 300.0))
        sp.defaultLength()
        if rng.randint(4) == 0:
            sp._type = ACTUATED_CONTRACT
            sp._l_min = sp._rest * 0.8
            sp._rate = 0.5
    st = sim._store
    st.damping[: st.n_springs] = 0.2
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(0.0001)
    sim._T = 0.0
    sim._marshal()
    assert sim._shape.has_remainder
    # the real irregular count must be in the hundreds (most random deltas
    # are unique; a few may collide into stencil families)
    assert int(np.count_nonzero(np.asarray(sim._state.springs.valid))) > 200
    assert pallas_step.pallas_supported(sim._shape)

    import jax.experimental.pallas as pl
    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig_call(*args, **kwargs)

    monkeypatch.setattr("titan_tpu.ops.pallas_step.pl.pallas_call",
                        interp_call)

    out_p = pallas_step.build_pallas_chunk(sim._shape)(
        sim._state, jnp.int32(25))
    out_x = build_chunk_fn(sim._shape)(sim._state, jnp.int32(25))
    nm = sim._store.n_masses
    np.testing.assert_allclose(np.asarray(out_p.masses.pos)[:, :nm],
                               np.asarray(out_x.masses.pos)[:, :nm],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.masses.vel)[:, :nm],
                               np.asarray(out_x.masses.vel)[:, :nm],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.springs.rest),
                               np.asarray(out_x.springs.rest),
                               atol=1e-6, rtol=1e-6)


def test_remainder_capacity_multiagent_scale():
    """The factorized selectors admit thousands of irregular springs at the
    reference multiagent scale (12.5k masses); the round-1 [2S, N] one-hot
    capped out at ~160 there."""
    import dataclasses as dc
    sim = _scene(remainder=True)
    sh = sim._shape
    big = dc.replace(sh, n_masses=12544, n_springs=4096, has_remainder=True)
    assert pallas_step.pallas_supported(big)
    # and the budget still rejects genuinely huge irregular topologies
    # (the XLA gather path takes over)
    huge = dc.replace(sh, n_masses=12544, n_springs=100_000,
                      has_remainder=True)
    assert not pallas_step.pallas_supported(huge)


def test_envelope_rejections():
    # LARGE magnetic scenes stay outside the VMEM kernel (the in-kernel
    # pairwise sweep is O(N^2); the binned/pairwise XLA paths take over)
    from titan_tpu import SimConfig as _SC
    sim = Simulation(SimConfig(magnet_pallas_max=64))
    sim.createLattice(Vec(0, 0, 2), Vec(1, 1, 1), 5, 5, 5)  # 125 masses
    st = sim._store
    st.mag_maxf[:4] = 1.0
    st.mag_rad[:4] = 0.05
    sim.setTimeStep(1e-4)
    sim._T = 0.0
    sim._marshal()
    assert not pallas_step.pallas_supported(sim._shape)
    # small magnetic scenes are accepted
    sim2 = _scene(magnets=True)
    assert pallas_step.pallas_supported(sim2._shape)
