"""Distributed tiled kernel (shard_map + per-shard Pallas) vs the
single-device tiled chunk (expected BITWISE equal: same kernel, same
per-row op order, halo windows filled with the same true neighbor data)
and vs the XLA chunk (the tiled suite's tolerances)."""

import jax.numpy as jnp
import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.ops import pallas_tiled
from titan_tpu.ops.step import build_chunk_fn
from titan_tpu.parallel import make_mesh
from titan_tpu.parallel.halo import place
from titan_tpu.parallel.halo_tiled import (build_halo_tiled_chunk,
                                           halo_tiled_reject_reason,
                                           halo_tiled_supported)


def _interpret_tiled(monkeypatch):
    from conftest import force_tiled_interpret
    force_tiled_interpret(monkeypatch)


def _scene(friction=True, damping=0.0, breathing=False, drag=0.0,
           deleted=False, nonuniform_rest=False, integrator=None,
           actuated=False, local=None, magnets=False, remainder=False):
    from titan_tpu import (ACTIVE_CONTRACT_THEN_EXPAND, ACTUATED_CONTRACT,
                           ACTUATED_EXPAND, CONTACT_PLANE, Integrator,
                           Vec as V)
    cfg = {}
    if integrator:
        cfg["integrator"] = Integrator(integrator)
    if magnets:
        # force the binned structure at test scale (the distributed glue
        # uses it); widen the cutoff so lattice neighbors interact
        cfg.update(magnet_cutoff=0.6, magnet_binned_threshold=2,
                   magnet_cell_cap=64)
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
    if local:
        for i in (2, 99, 380):
            sim.masses[i].addConstraint(CONTACT_PLANE, V(0, 1, 2), -0.3)
    if drag:
        st.drag[: st.n_masses] = drag
    if magnets:
        # magnetic pairs inside the widened cutoff, incl. 63/79 straddling
        # a block boundary at test scale.  "attract" (rad = 0) engages
        # receiver COMPACTION -- the fast glue path; "shell" keeps shell
        # radii and the receiver-DENSE glue (whose CPU-interpret cost
        # scales with the tile-padded block, so its test shrinks the tile)
        for i in (3, 7, 19, 63, 79, 200, 204):
            if magnets == "shell":
                st.mag_rad[i] = 0.05
                st.mag_stiffness[i] = 200.0
            st.mag_maxf[i] = 1.0
            st.mag_scale[i] = 1.0
    if remainder:
        # unique index deltas so each lands in the remainder partition,
        # incl. spans wider than a device block (gathered evaluation
        # serves ANY span)
        for base, d in ((10, 23), (70, 29), (200, 31), (5, 449),
                        (100, 307)):
            sp = sim.createSpring(sim.masses[base], sim.masses[base + d])
            sp._k = 800.0
            sp.defaultLength()
            st = sim._store
    if deleted:
        st.valid[7] = False
        st.valid[100] = False
    if nonuniform_rest:
        rng = np.random.RandomState(0)
        st.rest[: st.n_springs] *= 1.0 + 0.01 * rng.rand(st.n_springs)
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
    "verlet": dict(integrator="verlet"),
    "verlet_damped": dict(integrator="verlet", damping=0.4),
    "actuated": dict(actuated=True),
    "actuated_breathing_damped": dict(actuated=True, breathing=True,
                                      damping=0.4),
    "local_cp": dict(local="cp"),
    "rk2": dict(integrator="rk2"),
    "rk2_damped_actuated": dict(integrator="rk2", damping=0.4,
                                actuated=True),
    "rk2_drag_local": dict(integrator="rk2", drag=0.3, local="cp"),
}


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_halo_tiled_matches_single_tiled(variant, monkeypatch):
    """Distributed (8-way) tiled chunk == single-device tiled chunk,
    bitwise: the same kernel runs per shard on halo'd windows that hold
    the same true neighbor rows the single-device windows DMA."""
    sim = _scene(**VARIANTS[variant])
    mesh = make_mesh(("shard",))
    assert halo_tiled_supported(sim._shape, 8), \
        halo_tiled_reject_reason(sim._shape, 8)

    _interpret_tiled(monkeypatch)
    # pin the single-device side to per-step launches: the distributed
    # path steps per-launch, and the mega kernel body is 1-2 f32 ulp off
    # the per-step body for damping scenes IN INTERPRET ONLY (XLA CPU
    # fuses the two programs differently; hardware is bitwise -- see
    # test_pallas_tiled._assert_mega_equal)
    monkeypatch.setenv("TITAN_MEGA", "0")
    sharded = place(sim._state, mesh)
    out_d = build_halo_tiled_chunk(sim._shape, mesh)(sharded, jnp.int32(30))
    out_s = pallas_tiled.build_tiled_chunk(sim._shape)(sim._state,
                                                       jnp.int32(30))
    n = sim._store.n_masses
    np.testing.assert_array_equal(np.asarray(out_d.masses.pos)[:, :n],
                                  np.asarray(out_s.masses.pos)[:, :n])
    np.testing.assert_array_equal(np.asarray(out_d.masses.vel)[:, :n],
                                  np.asarray(out_s.masses.vel)[:, :n])
    np.testing.assert_array_equal(np.asarray(out_d.masses.acc)[:, :n],
                                  np.asarray(out_s.masses.acc)[:, :n])
    np.testing.assert_array_equal(np.asarray(out_d.stencil.rest),
                                  np.asarray(out_s.stencil.rest))
    assert abs(float(out_d.t) - float(out_s.t)) < 1e-12
    assert len(out_d.masses.pos.sharding.device_set) == 8


DIST_MEGA_VARIANTS = {
    "plain": dict(friction=False),
    "friction": dict(),
    "damping_nofric": dict(damping=0.4, friction=False),
    "damping_friction": dict(damping=0.4),
    "verlet": dict(integrator="verlet", friction=False),
    "breathing_actuated": dict(breathing=True, actuated=True,
                               friction=False),
}


@pytest.mark.parametrize("variant", sorted(DIST_MEGA_VARIANTS))
def test_dist_mega_matches_single_mega(variant, monkeypatch):
    """Distributed mega (per-shard resident-grid segments over the
    KH-extended block) vs the single-device mega chunk.  Bitwise: the
    per-shard kernel is the UNCHANGED mega kernel, and every exact row's
    window holds the same values.  Exception (documented): scenes with
    BOTH damping and friction drift 1-2 f32 ulp in CPU interpret only
    (XLA fuses the different-geometry kernel bodies differently; a
    friction static/kinetic select flip then amplifies acc) -- the same
    class as test_pallas_tiled._assert_mega_equal; hardware is bitwise
    (scripts/tpu_dist_mega_check.py)."""
    import jax
    from jax.sharding import Mesh
    sim = _scene(**DIST_MEGA_VARIANTS[variant])
    _interpret_tiled(monkeypatch)
    monkeypatch.setenv("TITAN_MEGA_SEG", "2")
    monkeypatch.setenv("TITAN_DIST_MEGA", "1")
    from titan_tpu.parallel import halo_tiled as ht
    h, b, t = ht._geometry(sim._shape, 2)
    k, KH = ht._dist_mega_plan(sim._shape, b, t, h)
    assert k == 2 and KH % t == 0
    mesh = Mesh(np.array(jax.devices()[:2]), ("shard",))
    sharded = place(sim._state, mesh)
    # 7 steps = 3 mega segments of 2 + 1 per-step tail
    out_d = build_halo_tiled_chunk(sim._shape, mesh)(sharded, jnp.int32(7))
    out_s = pallas_tiled.build_tiled_chunk(sim._shape)(sim._state,
                                                       jnp.int32(7))
    n = sim._store.n_masses
    mixed = DIST_MEGA_VARIANTS[variant].get("damping") and \
        DIST_MEGA_VARIANTS[variant].get("friction", True)
    for f in ("pos", "vel", "acc"):
        a = np.asarray(getattr(out_d.masses, f))[:, :n]
        x = np.asarray(getattr(out_s.masses, f))[:, :n]
        if mixed:
            tol = dict(atol=1e-3, rtol=1e-4) if f == "acc" else \
                dict(atol=1e-6, rtol=1e-6)
            np.testing.assert_allclose(a, x, err_msg=f, **tol)
        else:
            np.testing.assert_array_equal(a, x, err_msg=f)
    np.testing.assert_array_equal(np.asarray(out_d.stencil.rest),
                                  np.asarray(out_s.stencil.rest))


def test_dist_mega_engagement(monkeypatch):
    """_dist_mega_plan gating: the >= ~1M-rows/shard auto threshold, the
    TITAN_DIST_MEGA force hooks, the KH <= block bound, and the glue
    exclusion."""
    from titan_tpu.parallel import halo_tiled as ht
    sim = _scene(friction=False)
    shape = sim._shape
    h, b, t = ht._geometry(shape, 8)
    monkeypatch.delenv("TITAN_DIST_MEGA", raising=False)
    # CPU-test blocks sit far below the threshold: stays per-step
    assert b < ht.DIST_MEGA_MIN_BLOCK
    assert ht._dist_mega_plan(shape, b, t, h) == (0, 0)
    # a block at the threshold engages without forcing
    k, KH = ht._dist_mega_plan(shape, ht.DIST_MEGA_MIN_BLOCK, t, h)
    assert k > 0 and KH % t == 0
    # forced on for tests
    monkeypatch.setenv("TITAN_DIST_MEGA", "1")
    k, KH = ht._dist_mega_plan(shape, b, t, h)
    assert k > 0 and KH <= b
    # k-step halo exceeding the block: stays per-step even when forced
    assert ht._dist_mega_plan(shape, t, t, t) == (0, 0)
    # forced off
    monkeypatch.setenv("TITAN_DIST_MEGA", "0")
    assert ht._dist_mega_plan(shape, ht.DIST_MEGA_MIN_BLOCK, t, h) \
        == (0, 0)
    # glue scenes never ride mega (XLA glue between steps)
    monkeypatch.setenv("TITAN_DIST_MEGA", "1")
    simg = _scene(remainder=True)
    assert ht._dist_mega_plan(simg._shape, ht.DIST_MEGA_MIN_BLOCK, t, h) \
        == (0, 0)


VARIANTS_GLUE = {
    "magnets": dict(magnets="attract"),
    "magnets_deleted": dict(magnets="attract", deleted=True),
    "magnets_dense": dict(magnets="shell"),    # receiver-dense glue
    "remainder": dict(remainder=True),
    "remainder_damped": dict(remainder=True, damping=0.4),
    "magnets_remainder": dict(magnets="attract", remainder=True),
    "rk2_magnets_remainder": dict(integrator="rk2", magnets="attract",
                                  remainder=True),
    "verlet_magnets": dict(integrator="verlet", magnets="attract"),
}


@pytest.mark.parametrize("variant", sorted(VARIANTS_GLUE))
def test_halo_tiled_glue_matches_single_tiled(variant, monkeypatch):
    """Magnet/remainder glue variants vs the single-device tiled chunk
    (the glue's D-way accumulation orders remainder terms differently, so
    tolerances rather than bitwise)."""
    if variant == "magnets_dense":
        # receiver-dense glue cost scales with the tile-PADDED block --
        # shrink the distributed path's tile so the CPU-interpret test
        # stays tractable (per-row math is tile-size independent)
        monkeypatch.setattr("titan_tpu.parallel.halo_tiled._tile_size",
                            lambda h, shape=None: 1024)
    sim = _scene(**VARIANTS_GLUE[variant])
    mesh = make_mesh(("shard",))
    assert halo_tiled_supported(sim._shape, 8), \
        halo_tiled_reject_reason(sim._shape, 8)
    if "magnets" in variant:
        assert sim._shape.has_magnets and sim._shape.magnet_binned
    if "remainder" in variant:
        assert sim._shape.has_remainder
        # spans include 449 > typical halo windows: gathered eval only
    _interpret_tiled(monkeypatch)
    sharded = place(sim._state, mesh)
    out_d = build_halo_tiled_chunk(sim._shape, mesh)(sharded, jnp.int32(30))
    out_s = pallas_tiled.build_tiled_chunk(sim._shape)(sim._state,
                                                       jnp.int32(30))
    n = sim._store.n_masses
    np.testing.assert_allclose(np.asarray(out_d.masses.pos)[:, :n],
                               np.asarray(out_s.masses.pos)[:, :n],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_d.masses.vel)[:, :n],
                               np.asarray(out_s.masses.vel)[:, :n],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_d.springs.rest),
                               np.asarray(out_s.springs.rest), atol=1e-6)
    assert len(out_d.masses.pos.sharding.device_set) == 8
    if "magnets" in variant:
        # the magnet term really fires in this scene
        from titan_tpu.ops.step import magnet_pass
        assert np.any(np.asarray(
            magnet_pass(sim._state.masses, sim._shape)) != 0.0)


@pytest.mark.parametrize("variant", ["friction", "damping", "verlet",
                                     "rk2", "actuated", "deleted"])
def test_halo_tiled_matches_xla(variant, monkeypatch):
    """And against the XLA step path, at the tiled suite's tolerances."""
    sim = _scene(**VARIANTS[variant])
    mesh = make_mesh(("shard",))
    _interpret_tiled(monkeypatch)
    sharded = place(sim._state, mesh)
    out_d = build_halo_tiled_chunk(sim._shape, mesh)(sharded, jnp.int32(30))
    out_x = build_chunk_fn(sim._shape)(sim._state, jnp.int32(30))
    n = sim._store.n_masses
    act = "actuated" in variant
    ptol = dict(atol=3e-5, rtol=1e-4) if act else dict(atol=5e-6, rtol=1e-5)
    vtol = dict(atol=5e-3, rtol=1e-3) if act else dict(atol=5e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_d.masses.pos)[:, :n],
                               np.asarray(out_x.masses.pos)[:, :n], **ptol)
    np.testing.assert_allclose(np.asarray(out_d.masses.vel)[:, :n],
                               np.asarray(out_x.masses.vel)[:, :n], **vtol)


def test_reject_reasons():
    """Envelope rejections name the failed condition."""
    sim = _scene()
    # magnets -> halo.py handles them
    st = sim._store
    st.mag_rad[3] = 0.05
    st.mag_stiffness[3] = 100.0
    st.mag_maxf[3] = 1e-4
    st.mag_scale[3] = 1.0
    sim._marshal()
    assert "magnet" in halo_tiled_reject_reason(sim._shape, 8)

    # remainder springs at ANY span are ACCEPTED (gathered glue)
    sim2 = _scene()
    sp = sim2.createSpring(sim2.masses[10], sim2.masses[400])
    sp._k = 100.0
    sp.defaultLength()
    sim2._marshal()
    assert halo_tiled_reject_reason(sim2._shape, 8) is None

    # a tiny scene with big stencil deltas is ACCEPTED: blocks are padded
    # up to a tile multiple (>= the halo width by construction), the pads
    # inert -- wasteful but correct (the _place_distributed gate keeps
    # such scenes on the halo-XLA path anyway)
    sim3 = Simulation(SimConfig())
    sim3.createLattice(Vec(0, 0, 3), Vec(1, 2, 2), 5, 33, 33)
    sim3.setAllSpringConstantValues(500.0)
    sim3._T = 0.0
    sim3._marshal()
    assert halo_tiled_reject_reason(sim3._shape, 8) is None

    # f64 stays on the XLA path (tiled envelope)
    sim4 = Simulation(SimConfig(dtype="float64"))
    sim4.createLattice(Vec(0, 0, 3), Vec(4, 1, 1), 40, 6, 6)
    sim4.setAllSpringConstantValues(500.0)
    sim4._T = 0.0
    sim4._marshal()
    assert halo_tiled_reject_reason(sim4._shape, 8) is not None


def test_place_distributed_picks_halo_tiled(monkeypatch):
    """Public control plane: distribute() routes beyond-VMEM scenes to the
    per-shard tiled kernel (gated on pallas_supported=False; forced here
    so a CPU-sized scene exercises the real selection + stepping path)."""
    from titan_tpu.parallel import make_mesh
    from titan_tpu.runtime import simulation as sim_mod

    _interpret_tiled(monkeypatch)
    monkeypatch.setattr("titan_tpu.ops.pallas_step.pallas_supported",
                        lambda shape: False)
    # both sides on per-step launches (interpret-only mega-vs-per-step
    # damping ulps; see test_halo_tiled_matches_single_tiled)
    monkeypatch.setenv("TITAN_MEGA", "0")

    sim = _scene(damping=0.3)
    mesh = make_mesh(("shard",))
    sim.distribute(mesh)
    sim.start()
    sim.pause(30 * 1e-4)
    sim.getAll()
    assert abs(sim.time() - 30e-4) < 1e-12
    assert len(sim._state.masses.pos.sharding.device_set) == 8

    # trajectory matches the single-device tiled chunk bitwise
    sim2 = _scene(damping=0.3)
    out_s = pallas_tiled.build_tiled_chunk(sim2._shape)(sim2._state,
                                                        jnp.int32(30))
    n = sim._store.n_masses
    np.testing.assert_array_equal(np.asarray(sim._state.masses.pos)[:, :n],
                                  np.asarray(out_s.masses.pos)[:, :n])
    sim.stop()
