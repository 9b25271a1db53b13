"""Grid-tiled Pallas kernel (big scenes) vs the XLA chunk, interpret mode."""

import jax.numpy as jnp
import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.ops import pallas_tiled
from titan_tpu.ops.step import build_chunk_fn


def _interpret_tiled(monkeypatch):
    from conftest import force_tiled_interpret
    force_tiled_interpret(monkeypatch)


def _scene(friction=True, damping=0.0, breathing=False, drag=0.0,
           deleted=False, nonuniform_rest=False, nonuniform_k=False,
           integrator=None, actuated=False, local=None, magnets=False,
           remainder=False):
    from titan_tpu import (ACTIVE_CONTRACT_THEN_EXPAND, ACTUATED_CONTRACT,
                           ACTUATED_EXPAND, BALL, CONSTRAINT_PLANE,
                           CONTACT_PLANE, DIRECTION, Integrator, Vec as V)
    cfg = {}
    if integrator:
        cfg["integrator"] = Integrator(integrator)
    sim = Simulation(SimConfig(**cfg))
    sim.createLattice(Vec(0, 0, 3), Vec(4, 1, 1), 40, 6, 6)
    sim.setAllSpringConstantValues(800.0)
    st = sim._store
    if damping:
        st.damping[: st.n_springs] = damping
    if breathing:
        half = st.n_springs // 2
        st.s_type[:half] = ACTIVE_CONTRACT_THEN_EXPAND
        st.omega[:half] = 7.0
    if actuated:
        s = st.n_springs
        third = s // 3
        st.s_type[:third] = ACTUATED_EXPAND
        st.l_max[:third] = st.rest[:third] * 1.2
        st.rate[:third] = 0.5
        st.s_type[third:2 * third] = ACTUATED_CONTRACT
        st.l_min[third:2 * third] = st.rest[third:2 * third] * 0.8
        st.rate[third:2 * third] = 0.5
        # a few springs START past their bound: they must never advance
        st.l_max[:8] = st.rest[:8] * 0.9
    if local:
        for i in (2, 99, 380):
            if local == "cp":
                sim.masses[i].addConstraint(CONTACT_PLANE, V(0, 1, 2), -0.3)
            elif local == "ball":
                sim.masses[i].addConstraint(BALL, V(0, 0, 2.5), 0.7)
            elif local == "pl":
                sim.masses[i].addConstraint(CONSTRAINT_PLANE, V(0, 0, 1),
                                            0.3)
            elif local == "dir":
                sim.masses[i].addConstraint(DIRECTION, V(1, 0, 0), 0.2)
    if drag:
        st.drag[: st.n_masses] = drag
    if deleted:
        st.valid[7] = False
        st.valid[100] = False
    if nonuniform_rest:
        # perturb rest lengths so the per-family-uniform fast path is off
        rng = np.random.RandomState(0)
        st.rest[: st.n_springs] *= 1.0 + 0.01 * rng.rand(st.n_springs)
    if nonuniform_k:
        rng = np.random.RandomState(1)
        st.k[: st.n_springs] *= 1.0 + 0.1 * rng.rand(st.n_springs)
    if magnets:
        # a line of magnetic masses along x (index stride ny*nz = 36,
        # spacing ~0.103 < the 0.14 cutoff): magnet + remainder forces
        # run OUTSIDE the tiled kernel as per-step glue (round 3)
        for i in (0, 36, 72, 108, 144):
            st.mag_rad[i] = 0.05
            st.mag_stiffness[i] = 200.0
            st.mag_maxf[i] = 1e-4
            st.mag_scale[i] = 1.0
    if remainder:
        # irregular long-range springs: one spring per unique delta stays
        # below build_stencil_groups' min_count, so they all land in the
        # remainder (gather+segment-sum) path
        rng2 = np.random.RandomState(7)
        a_idx = rng2.choice(600, 10, replace=False)
        b_idx = 640 + rng2.choice(700, 10, replace=False)
        new = [sim.createSpring(sim.masses[int(a)], sim.masses[int(b)])
               for a, b in zip(a_idx, b_idx)]
        idx = np.array([sp._i for sp in new])
        st = sim._store          # createSpring may grow/replace store arrays
        st.k[idx] = 300.0
        if damping:
            st.damping[idx] = damping
        if breathing:
            st.s_type[idx[:3]] = ACTIVE_CONTRACT_THEN_EXPAND
            st.omega[idx[:3]] = 7.0
        if actuated:
            st.s_type[idx[3:6]] = ACTUATED_EXPAND
            st.l_max[idx[3:6]] = st.rest[idx[3:6]] * 1.1
            st.rate[idx[3:6]] = 0.5
    if friction:
        sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    else:
        sim.createPlane(Vec(0, 0, 1), 0)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(0.0001)
    sim._T = 0.0
    sim._marshal()
    return sim


VARIANTS = {
    "plain": dict(friction=False),
    "friction": dict(),
    "damping": dict(damping=0.4),
    "breathing": dict(breathing=True),
    "drag": dict(drag=0.3),
    "deleted": dict(deleted=True),
    "nonuniform_rest": dict(nonuniform_rest=True),
    "nonuniform_k": dict(nonuniform_k=True),
    "nonuniform_damped": dict(nonuniform_rest=True, damping=0.4),
    "verlet": dict(integrator="verlet"),
    "actuated": dict(actuated=True),
    "actuated_breathing_damped": dict(actuated=True, breathing=True,
                                      damping=0.4),
    "actuated_verlet": dict(actuated=True, integrator="verlet",
                            nonuniform_rest=True),
    "local_cp": dict(local="cp"),
    "local_ball": dict(local="ball"),
    "local_pl": dict(local="pl"),
    "local_dir": dict(local="dir"),
    "magnets": dict(magnets=True),
    "remainder": dict(remainder=True),
    "magnets_remainder_damped": dict(magnets=True, remainder=True,
                                     damping=0.4),
    "remainder_breathing_actuated": dict(remainder=True, breathing=True,
                                         actuated=True),
    # RK2 joined the tiled envelope late round 3 (two launches per step)
    "rk2": dict(integrator="rk2"),
    "rk2_damped_friction": dict(integrator="rk2", damping=0.4),
    "rk2_actuated": dict(integrator="rk2", actuated=True),
    "rk2_local_pl_drag": dict(integrator="rk2", local="pl", drag=0.3),
    "rk2_magnets_remainder": dict(integrator="rk2", magnets=True,
                                  remainder=True, damping=0.4),
}


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_tiled_matches_xla(variant, monkeypatch):
    sim = _scene(**VARIANTS[variant])
    assert pallas_tiled.tiled_supported(sim._shape)
    if variant == "nonuniform_rest":
        assert not sim._shape.stencil_uniform[1]   # (k, REST, damping, ...)
    if variant == "nonuniform_k":
        assert not sim._shape.stencil_uniform[0]
    if variant == "plain":
        assert sim._shape.stencil_uniform == (True,) * 5
    if "magnets" in variant:
        assert sim._shape.has_magnets
        from titan_tpu.ops.step import magnet_pass
        mp = np.asarray(magnet_pass(sim._state.masses, sim._shape))
        assert np.any(mp != 0.0), "magnet scene exerts no magnet force"
    if "remainder" in variant:
        assert sim._shape.has_remainder

    _interpret_tiled(monkeypatch)

    out_t = pallas_tiled.build_tiled_chunk(sim._shape)(sim._state,
                                                       jnp.int32(30))
    out_x = build_chunk_fn(sim._shape)(sim._state, jnp.int32(30))
    n = sim._store.n_masses
    # f32: kernel and XLA order float ops differently.  Actuated variants
    # add the closed-form-vs-iterative rest difference (<= steps * eps *
    # rest ~ 5e-7; pos stays within 6e-6 at 30 steps but vel amplifies it
    # by ~1/dt under undamped Verlet ringing -- measured 8e-4, the same
    # mechanism the random-combo harness below tolerates at 5e-3) -- see
    # the module docstring of pallas_tiled.
    act = "actuated" in variant
    ptol = dict(atol=3e-5, rtol=1e-4) if act else dict(atol=5e-6, rtol=1e-5)
    vtol = dict(atol=5e-3, rtol=1e-3) if act else dict(atol=5e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_t.masses.pos)[:, :n],
                               np.asarray(out_x.masses.pos)[:, :n], **ptol)
    np.testing.assert_allclose(np.asarray(out_t.masses.vel)[:, :n],
                               np.asarray(out_x.masses.vel)[:, :n], **vtol)
    # acc is k-amplified position noise (acc ~ k*(rest-len)/m: a 1e-6 f32
    # ordering difference in pos becomes ~k*1e-6 in acc), so its tolerance
    # scales with the spring constant (k=800 here); actuated variants add
    # the closed-form rest seed on top (same mechanism as vel above)
    atol_acc = 1.0 if act else 5e-2
    np.testing.assert_allclose(np.asarray(out_t.masses.acc)[:, :n],
                               np.asarray(out_x.masses.acc)[:, :n],
                               atol=atol_acc, rtol=1e-3)
    if act:
        # closed-form rest must track the XLA path's iterative advance
        # (difference is the fused vs accumulated f32 sums, ~1e-7 rel)
        np.testing.assert_allclose(np.asarray(out_t.stencil.rest),
                                   np.asarray(out_x.stencil.rest),
                                   atol=1e-5, rtol=1e-5)
        assert not np.allclose(np.asarray(out_t.stencil.rest),
                               np.asarray(sim._state.stencil.rest)), \
            "actuation did nothing"
    if "remainder" in variant:
        # remainder rest advances ITERATIVELY in the per-step glue -- the
        # same code as the XLA path, so it must match tightly; actuated
        # remainder variants must actually advance it
        np.testing.assert_allclose(np.asarray(out_t.springs.rest),
                                   np.asarray(out_x.springs.rest),
                                   atol=1e-6, rtol=1e-6)
        if act:
            assert not np.allclose(np.asarray(out_t.springs.rest),
                                   np.asarray(sim._state.springs.rest)), \
                "remainder actuation did nothing"


def test_tiled_envelope_acceptance():
    # ACTUATED_* and local constraints joined the envelope in round 3;
    # magnets and remainder springs (per-step glue outside the kernel)
    # and RK2 (two launches per step) joined late round 3 -- the tiled
    # envelope is now feature-complete for f32 scenes under every
    # reference integrator, like the reference kernels (sim.cu:1157-1367)
    assert pallas_tiled.tiled_supported(_scene(actuated=True)._shape)
    assert pallas_tiled.tiled_supported(_scene(local="cp")._shape)
    assert pallas_tiled.tiled_supported(_scene(magnets=True)._shape)
    assert pallas_tiled.tiled_supported(_scene(remainder=True)._shape)
    assert pallas_tiled.tiled_supported(_scene(integrator="rk2")._shape)
    assert pallas_tiled.tiled_supported(_scene()._shape)


def test_donate_chunk_builds_and_matches(monkeypatch):
    """donate=True wrapping (real buffer donation on TPU; ignored with a
    warning on CPU) must trace and produce the same physics."""
    _interpret_tiled(monkeypatch)
    sim = _scene()
    a = pallas_tiled.build_tiled_chunk(sim._shape)(sim._state, jnp.int32(5))
    b = pallas_tiled.build_tiled_chunk(sim._shape, donate=True)(
        sim._state, jnp.int32(5))
    np.testing.assert_array_equal(np.asarray(a.masses.pos),
                                  np.asarray(b.masses.pos))


@pytest.mark.parametrize("integrator", [None, "rk2"])
def test_carry_modes_agree(integrator, monkeypatch):
    """The padded-flat carry (round-3 glue-traffic fix) must be BITWISE
    equal to the legacy [3, n] carry: pads and slices change HBM copies,
    not the values the kernel sees.  RK2's two-launch step threads the
    carry through both launches, so it is pinned too."""
    _interpret_tiled(monkeypatch)
    sim = _scene(damping=0.4, deleted=True, integrator=integrator)
    outs = {}
    for mode in ("legacy", "padded"):
        monkeypatch.setattr(pallas_tiled, "CARRY_MODE", mode)
        outs[mode] = pallas_tiled.build_tiled_chunk(sim._shape)(
            sim._state, jnp.int32(10))
    for field in ("pos", "vel", "acc"):
        np.testing.assert_array_equal(
            np.asarray(getattr(outs["legacy"].masses, field)),
            np.asarray(getattr(outs["padded"].masses, field)))


@pytest.mark.parametrize("seed", list(range(4)) + ["rk2-0", "rk2-1"])
def test_tiled_matches_xla_random_combo(seed, monkeypatch):
    """Seeded random FEATURE COMBINATIONS through the tiled-vs-XLA
    harness (the named variants cover singles); two horizons like the
    VMEM-kernel fuzz: 1 step tight, 30 steps at the usual tolerance.
    The "rk2-N" seeds force integrator=rk2 over the same feature draw
    (appended so the original seeds' scenes are unchanged)."""
    force_rk2 = isinstance(seed, str)
    if force_rk2:
        seed = int(seed.split("-")[1])
    rng = np.random.RandomState(500 + seed)
    kw = dict(
        friction=bool(rng.randint(2)),
        damping=float(rng.choice([0.0, 0.4])),
        breathing=bool(rng.randint(2)),
        drag=float(rng.choice([0.0, 0.3])),
        deleted=bool(rng.randint(2)),
        nonuniform_rest=bool(rng.randint(2)),
        nonuniform_k=bool(rng.randint(2)),
        integrator=[None, "verlet"][rng.randint(2)],
        actuated=bool(rng.randint(2)),
        local={0: None, 1: "cp", 2: "ball", 3: "pl", 4: "dir"}[rng.randint(5)],
        # late round 3: magnets + remainder glue (drawn LAST so earlier
        # seeds' feature draws are unchanged)
        magnets=bool(rng.randint(2)),
        remainder=bool(rng.randint(2)),
    )
    if force_rk2:
        kw["integrator"] = "rk2"
    sim = _scene(**kw)
    assert pallas_tiled.tiled_supported(sim._shape)

    _interpret_tiled(monkeypatch)

    chunk_t = pallas_tiled.build_tiled_chunk(sim._shape)
    chunk_x = build_chunk_fn(sim._shape)
    n = sim._store.n_masses

    t1 = chunk_t(sim._state, jnp.int32(1))
    x1 = chunk_x(sim._state, jnp.int32(1))
    np.testing.assert_allclose(np.asarray(t1.masses.pos)[:, :n],
                               np.asarray(x1.masses.pos)[:, :n],
                               atol=1e-6)

    # loose horizon: feature combos under Verlet stack more f32
    # op-order perturbation sources than the single-feature variants
    # (measured: pos ulps grow smoothly to ~5e-6 by 30 steps; vel noise
    # is pos noise amplified by ~1/dt)
    t30 = chunk_t(sim._state, jnp.int32(30))
    x30 = chunk_x(sim._state, jnp.int32(30))
    np.testing.assert_allclose(np.asarray(t30.masses.pos)[:, :n],
                               np.asarray(x30.masses.pos)[:, :n],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t30.masses.vel)[:, :n],
                               np.asarray(x30.masses.vel)[:, :n],
                               atol=5e-3, rtol=1e-3)


# ---------------------------------------------------------------- mega
# Round 4: the resident grid ("mega") kernel -- one pallas_call advances
# MEGA_SEG steps over a (k_seg, n_tiles) grid with the state in two
# parity-alternating HBM buffers -- must reproduce the per-step launch
# path exactly.  The halo-width A/B decomposed the 100^3 per-step launch
# as ~80% fixed cost (docs/PERFORMANCE.md), which is what this amortizes.

_MEGA_VARIANTS = ["plain", "friction", "damping", "breathing", "drag",
                  "deleted", "nonuniform_k", "verlet", "actuated",
                  "actuated_breathing_damped", "actuated_verlet",
                  "local_pl"]


def _mega_vs_per_step(sim, monkeypatch, steps=10, seg=4):
    """10 steps with seg=4 covers two mega segments + a 2-step per-step
    tail in one call."""
    _interpret_tiled(monkeypatch)
    monkeypatch.setenv("TITAN_MEGA", "0")
    ref = pallas_tiled.build_tiled_chunk(sim._shape)(
        sim._state, jnp.int32(steps))
    monkeypatch.delenv("TITAN_MEGA")
    monkeypatch.setenv("TITAN_MEGA_SEG", str(seg))
    out = pallas_tiled.build_tiled_chunk(sim._shape)(
        sim._state, jnp.int32(steps))
    return ref, out


def _assert_mega_equal(ref, out, damping):
    for f in ("pos", "vel", "acc"):
        a = np.asarray(getattr(ref.masses, f))
        b = np.asarray(getattr(out.masses, f))
        if not damping:
            np.testing.assert_array_equal(a, b, err_msg=f)
        else:
            # damping scenes: the mega and single kernel BODIES compile
            # to 1-2 ulp different roundings of the identical damping
            # force chain (XLA CPU fuses/contracts the two programs
            # differently in interpret mode -- verified: seg=2 and seg=4
            # agree BITWISE with each other, every input plane is
            # bitwise identical, and all non-damping variants are exact;
            # same mechanism as the shard_map rk2/breathing 1-ulp note
            # in parallel/halo_adjoint.py).  acc is the k-amplified view
            # of the same noise.
            tol = dict(atol=5e-6, rtol=3e-6) if f == "acc" else \
                dict(atol=5e-8, rtol=1e-6)
            np.testing.assert_allclose(a, b, err_msg=f, **tol)
    np.testing.assert_array_equal(np.asarray(ref.stencil.rest),
                                  np.asarray(out.stencil.rest))


@pytest.mark.parametrize("variant", _MEGA_VARIANTS)
def test_mega_matches_per_step(variant, monkeypatch):
    sim = _scene(**VARIANTS[variant])
    assert pallas_tiled._mega_seg(sim._shape, 32768, 1024) > 0
    ref, out = _mega_vs_per_step(sim, monkeypatch)
    _assert_mega_equal(ref, out, "damp" in variant)


def test_mega_envelope():
    # glue scenes stay on per-step launches (magnet/remainder forces are
    # per-step XLA glue, which cannot run inside one launch); RK2 joined
    # via the fused two-pass cell
    assert pallas_tiled._mega_seg(_scene(magnets=True)._shape,
                                  32768, 1024) == 0
    assert pallas_tiled._mega_seg(_scene(remainder=True)._shape,
                                  32768, 1024) == 0
    assert pallas_tiled._mega_seg(_scene(integrator="rk2")._shape,
                                  32768, 1024) > 0
    # k_seg is forced even (the final state must land in buffer A)
    assert pallas_tiled._mega_seg(_scene()._shape, 32768, 1024) % 2 == 0


def test_mega_multitile_cross_prefetch(monkeypatch):
    """Shrunken tiles force a real multi-tile grid (n_tiles >= 4), which
    engages the cross-step window prefetch ((s, n-1) prefetches
    (s+1, 0)'s window from rows written earlier in step s) -- the path
    the default one-tile interpret scenes never touch."""
    from titan_tpu import Simulation, SimConfig, Vec as V
    monkeypatch.setattr(pallas_tiled, "_tile_size",
                        lambda h, shape=None: 1024)
    sim = Simulation(SimConfig())
    sim.createLattice(V(0, 0, 3), V(4, 1, 1), 130, 6, 6)
    sim.setAllSpringConstantValues(800.0)
    sim.createPlane(V(0, 0, 1), 0, 0.4, 0.6)
    sim.setGlobalAcceleration(V(0, 0, -9.8))
    sim.setTimeStep(0.0001)
    sim._T = 0.0
    sim._marshal()
    assert -(-sim._shape.n_masses // 1024) >= 4
    ref, out = _mega_vs_per_step(sim, monkeypatch, steps=6, seg=2)
    _assert_mega_equal(ref, out, damping=False)


def test_mega_multitile_no_cross_prefetch(monkeypatch):
    """n_tiles == 2 disables cross-step prefetch (h > (n_tiles-2)*T:
    tile 0's next-step window overlaps rows this step's LAST tile is
    still writing) -- each step's first cell self-issues instead."""
    monkeypatch.setattr(pallas_tiled, "_tile_size",
                        lambda h, shape=None: 1024)
    sim = _scene(friction=False)
    assert -(-sim._shape.n_masses // 1024) == 2
    ref, out = _mega_vs_per_step(sim, monkeypatch, steps=6, seg=2)
    _assert_mega_equal(ref, out, damping=False)


@pytest.mark.parametrize("variant", ["rk2", "rk2_actuated",
                                     "rk2_damped_friction",
                                     "rk2_local_pl_drag"])
def test_mega_rk2_matches_per_step(variant, monkeypatch):
    """The fused-RK2 resident grid kernel (grid (k_seg, 2, n_tiles), one
    cell per RK2 pass, midpoint buffer M between them) must reproduce
    the two-launch per-step RK2 path exactly."""
    sim = _scene(**VARIANTS[variant])
    assert pallas_tiled._mega_seg(sim._shape, 32768, 1024) > 0
    ref, out = _mega_vs_per_step(sim, monkeypatch)
    _assert_mega_equal(ref, out, "damp" in variant)


def test_mega_rk2_multitile(monkeypatch):
    """Multi-tile fused RK2: cross-pass prefetch ((s,0,nt-1) prefetches
    (s,1,0)'s midpoint window from tiles written earlier in pass A)."""
    from titan_tpu import Simulation, SimConfig, Vec as V
    from titan_tpu.config import Integrator as I
    monkeypatch.setattr(pallas_tiled, "_tile_size",
                        lambda h, shape=None: 1024)
    sim = Simulation(SimConfig(integrator=I.RK2))
    sim.createLattice(V(0, 0, 3), V(4, 1, 1), 130, 6, 6)
    sim.setAllSpringConstantValues(800.0)
    sim.createPlane(V(0, 0, 1), 0, 0.4, 0.6)
    sim.setGlobalAcceleration(V(0, 0, -9.8))
    sim.setTimeStep(0.0001)
    sim._T = 0.0
    sim._marshal()
    assert -(-sim._shape.n_masses // 1024) >= 4
    ref, out = _mega_vs_per_step(sim, monkeypatch, steps=6, seg=2)
    _assert_mega_equal(ref, out, damping=False)
