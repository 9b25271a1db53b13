"""Explicit halo-exchange sharded stepping vs the single-device chunk."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.ops.step import build_chunk_fn
from titan_tpu.parallel import make_mesh
from titan_tpu.parallel.halo import build_halo_chunk, halo_supported, place


def _scene(damping=0.0, breathing=False, actuated=False, drag=0.0,
           deleted=False, local_constraint=False, integrator=None,
           magnets=False, remainder=False, remainder_actuated=False,
           magnet_plain=False, magnet_binned=False, remainder_long=False):
    from titan_tpu import (ACTIVE_CONTRACT_THEN_EXPAND, ACTUATED_EXPAND,
                           CONTACT_PLANE, Integrator)
    cfg = dict(velocity_clamp=False)
    if integrator:
        cfg["integrator"] = Integrator(integrator)
    if magnets:
        # lattice spacing (~0.26-0.33 m) exceeds the reference cutoff; widen
        # it so neighboring magnetic masses actually interact in the test
        cfg["magnet_cutoff"] = 0.6
    if magnet_binned:
        # force the cell-binned structure at test scale; cap raised so no
        # source drops (the 0.6 m 2-D cells hold a whole z-column of the
        # lattice) and the variant tests pure path equivalence
        cfg["magnet_binned_threshold"] = 2
        cfg["magnet_cell_cap"] = 64
    # long-x lattice so max(delta) (= ny*nz + nz + 1 = 21) << block (64)
    sim = Simulation(SimConfig(**cfg))
    sim.createLattice(Vec(0, 0, 3), Vec(8, 1, 1), 32, 4, 4)
    sim.setAllSpringConstantValues(500.0)
    if remainder or remainder_actuated:
        # irregular extra springs: unique index deltas (23, 29, 31, 37 --
        # none is a lattice family offset and each occurs once, below
        # stencil_min_count) so they land in the remainder partition;
        # spans stay well under the 64-mass device block
        for base, d in ((10, 23), (70, 29), (200, 31), (300, 37)):
            sp = sim.createSpring(sim.masses[base], sim.masses[base + d])
            sp._k = 800.0
            sp.defaultLength()
            if remainder_actuated:
                from titan_tpu import ACTUATED_CONTRACT
                sp._type = ACTUATED_CONTRACT
                sp._l_min = sp._rest * 0.8
                sp._rate = 0.4
    if remainder_long:
        # spans far beyond the 64-mass device block (round 3: these ride
        # the GATHERED remainder path -- replicated spring eval over
        # all-gathered pos); unique deltas so they stay remainder springs
        for base, d in ((10, 293), (40, 211), (5, 449), (100, 307)):
            sp = sim.createSpring(sim.masses[base], sim.masses[base + d])
            sp._k = 800.0
            sp.defaultLength()
    if magnets:
        # pairs within the widened cutoff, including the 63/79 pair that
        # straddles the 64-mass device-block boundary
        for i in (3, 7, 19, 63, 79, 200, 204):
            mm = sim.masses[i]
            mm.rad = 0.05
            mm.stiffness = 200.0
            mm.max_mag_force = 1.0
            mm.mag_scale_factor = 1.0
    if magnet_plain:
        # one wide-shelled magnet whose shell radius overlaps PLAIN
        # (non-magnetic) neighbor masses: those neighbors must still act as
        # shell-contact sources (ops/forces.magnet_forces treats every valid
        # mass as a source; the reference occupancy grid inserts every mass,
        # sim.cu:842) -- regression test for the halo path gathering only
        # magnetic masses as sources
        # mass 5 sits on the x==0 face: its only x-neighbor is at +x, so
        # the missing plain-source shell force is asymmetric (an interior
        # magnet's plain neighbors would cancel by symmetry and hide the
        # bug).  The neighbor (mass 21) gets ALL FOUR magnet params zeroed
        # -- the reference default stiffness is 1000, so without this the
        # old "gather only magnetic masses as sources" filter matched every
        # mass and the bug was invisible.  A fully zero-param mass is still
        # a source: the receiver's shell force needs only its presence.
        cfg_cutoff = sim.config.magnet_cutoff
        mm = sim.masses[5]
        mm.rad = 0.3            # lattice x-spacing ~0.258 < rad -> overlap
        mm.stiffness = 150.0
        mm.max_mag_force = 0.5
        mm.mag_scale_factor = 1.0
        sim._store.mag_stiffness[21] = 0.0
        assert cfg_cutoff > 0.26
    st = sim._store
    if damping:
        st.damping[: st.n_springs] = damping
    if breathing:
        half = st.n_springs // 2
        st.s_type[:half] = ACTIVE_CONTRACT_THEN_EXPAND
        st.omega[:half] = 6.0
    if actuated:
        q = st.n_springs // 4
        st.s_type[:q] = ACTUATED_EXPAND
        st.l_max[:q] = st.rest[:q] * 1.15
        st.rate[:q] = 0.3
    if drag:
        st.drag[: st.n_masses] = drag
    if deleted:
        st.valid[10] = False
        st.valid[200] = False
    if local_constraint:
        sim.masses[5].addConstraint(CONTACT_PLANE, Vec(0, 0, 1), -0.5)
    sim.createPlane(Vec(0, 0, 1), 0, 0.2, 0.3)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(0.0001)
    sim._T = 0.0
    sim._marshal()
    return sim


VARIANTS = {
    "plain": dict(),
    "damping": dict(damping=0.5),
    "breathing": dict(breathing=True),
    "actuated": dict(actuated=True),
    "drag": dict(drag=0.3),
    "deleted": dict(deleted=True),
    "local_constraint": dict(local_constraint=True),
    "verlet": dict(integrator="verlet"),
    "verlet_damped": dict(integrator="verlet", damping=0.4),
    "rk2": dict(integrator="rk2"),
    "rk2_damped_actuated": dict(integrator="rk2", damping=0.4,
                                actuated=True),
    "rk2_magnets_remainder": dict(integrator="rk2", magnets=True,
                                  remainder=True),
    "magnets": dict(magnets=True),
    "remainder": dict(remainder=True),
    "remainder_damped": dict(remainder=True, damping=0.5),
    "remainder_actuated": dict(remainder_actuated=True),
    "magnets_remainder": dict(magnets=True, remainder=True, deleted=True),
    "magnet_plain_contact": dict(magnets=True, magnet_plain=True),
    # round 3: cell-binned magnets ride the halo path (replicated global
    # bin structure, local receivers; bitwise-equal per receiver)
    "magnets_binned": dict(magnets=True, magnet_binned=True),
    "magnets_binned_deleted": dict(magnets=True, magnet_binned=True,
                                   deleted=True),
    "magnets_binned_plain": dict(magnets=True, magnet_binned=True,
                                 magnet_plain=True),
    "rk2_magnets_binned": dict(integrator="rk2", magnets=True,
                               magnet_binned=True, remainder=True),
    # round 3: remainder spans > device block ride the gathered path
    "remainder_long": dict(remainder_long=True),
    "remainder_long_damped": dict(remainder_long=True, damping=0.5),
    "remainder_long_actuated": dict(remainder_long=True, actuated=True,
                                    breathing=True),
    "rk2_remainder_long_magnets": dict(integrator="rk2",
                                       remainder_long=True, magnets=True),
}


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_halo_matches_single_device(variant):
    sim = _scene(**VARIANTS[variant])
    mesh = make_mesh(("shard",))
    assert halo_supported(sim._shape, 8)

    sharded = place(sim._state, mesh)
    chunk = build_halo_chunk(sim._shape, mesh)(sharded)
    out_h = chunk(sharded, jnp.int32(200))

    out_s = build_chunk_fn(sim._shape)(sim._state, jnp.int32(200))

    n = sim._store.n_masses
    # the gathered remainder path accumulates spring forces in a different
    # (but fixed) order than the single-device segment sums; under the
    # oscillatory actuated+breathing dynamics that 1-2-ulp seed grows to
    # ~5e-5 in vel over the 200-step f32 horizon (pos stays at 1e-5)
    atol = 1e-4 if variant == "remainder_long_actuated" else 1e-5
    np.testing.assert_allclose(np.asarray(out_h.masses.pos)[:, :n],
                               np.asarray(out_s.masses.pos)[:, :n],
                               atol=atol)
    np.testing.assert_allclose(np.asarray(out_h.masses.vel)[:, :n],
                               np.asarray(out_s.masses.vel)[:, :n],
                               atol=atol)
    if variant == "actuated":
        np.testing.assert_allclose(np.asarray(out_h.stencil.rest),
                                   np.asarray(out_s.stencil.rest),
                                   atol=1e-6)
        assert not np.allclose(np.asarray(out_h.stencil.rest),
                               np.asarray(sim._state.stencil.rest))
    if variant == "remainder_actuated":
        np.testing.assert_allclose(np.asarray(out_h.springs.rest),
                                   np.asarray(out_s.springs.rest),
                                   atol=1e-6)
        assert not np.allclose(np.asarray(out_h.springs.rest),
                               np.asarray(sim._state.springs.rest))
    if variant.startswith("remainder"):
        assert sim._shape.has_remainder
    if variant.startswith("magnets"):
        assert sim._shape.has_magnets
    if "binned" in variant:
        assert sim._shape.magnet_binned
    if "remainder_long" in variant:
        # spans exceed the 64-mass device block -> gathered remainder path
        assert sim._shape.remainder_span > sim._shape.n_masses // 8
    assert len(out_h.masses.pos.sharding.device_set) == 8


def test_control_plane_distribute():
    """sim.distribute(mesh): the SAME public control plane drives a scene
    block-sharded over the 8-device mesh -- trajectories match the
    single-device run and the live state stays sharded."""
    sim = _scene(damping=0.3)
    ref = _scene(damping=0.3)
    mesh = make_mesh(("shard",))
    sim.distribute(mesh)
    for s in (sim, ref):
        s.start()
        s.pause(0.05)
        s.getAll()
    n = ref._store.n_masses
    np.testing.assert_allclose(sim._store.pos[:n], ref._store.pos[:n],
                               atol=1e-5)
    np.testing.assert_allclose(sim._store.vel[:n], ref._store.vel[:n],
                               atol=1e-5)
    assert len(sim._state.masses.pos.sharding.device_set) == 8
    # a mid-run push + resume keeps working distributed
    sim.masses[0].setExternalForce(Vec(0.1, 0, 0))
    sim.set(sim.masses[0])
    sim.setBreakpoint(0.08)
    sim.resume()
    sim.waitForEvent()
    assert abs(sim.time() - 0.08) < 1e-9
    for s in (sim, ref):
        s.stop()


def test_distribute_falls_back_outside_halo_envelope():
    """Strict per-step extern-force mode leaves the halo envelope;
    distribute() must still work via the automatic SPMD partitioner."""
    sim = Simulation(SimConfig(velocity_clamp=False,
                               persistent_extern_force=False))
    sim.createLattice(Vec(0, 0, 3), Vec(8, 1, 1), 32, 4, 4)
    st = sim._store
    sim.distribute(make_mesh(("shard",)))
    sim.setTimeStep(1e-4)
    sim.start()
    sim.pause(0.01)
    sim.getAll()
    assert np.all(np.isfinite(st.pos[: st.n_masses]))
    sim.stop()


def test_halo_envelope():
    sim = _scene()
    # a cube-ish lattice has max(delta) > block at 8 devices -> rejected
    sim2 = Simulation(SimConfig(velocity_clamp=False))
    sim2.createLattice(Vec(0, 0, 3), Vec(1, 1, 1), 8, 8, 8)
    sim2._T = 0.0
    sim2._marshal()
    assert not halo_supported(sim2._shape, 8)
    assert halo_supported(sim._shape, 8)
    # exact pairwise magnets ride the halo path...
    sim3 = _scene()
    sim3._store.mag_maxf[:4] = 1.0
    sim3._store.mag_rad[:4] = 0.05
    sim3._marshal()
    assert halo_supported(sim3._shape, 8)
    # ...and so do cell-BINNED magnet scenes (round 3: replicated bin
    # structure over the gathered pos, local receivers only)
    sim4 = Simulation(SimConfig(velocity_clamp=False,
                                magnet_binned_threshold=2))
    sim4.createLattice(Vec(0, 0, 3), Vec(8, 1, 1), 32, 4, 4)
    sim4._store.mag_maxf[:4] = 1.0
    sim4._store.mag_rad[:4] = 0.05
    sim4._T = 0.0
    sim4._marshal()
    assert sim4._shape.magnet_binned
    assert halo_supported(sim4._shape, 8)
    # a remainder spring spanning more than a device block rides the halo
    # path too (round 3: gathered remainder evaluation)
    sim5 = _scene()
    sp = sim5.createSpring(sim5.masses[0], sim5.masses[100])
    sp._k = 100.0
    sp.defaultLength()
    sim5._marshal()
    assert sim5._shape.remainder_span == 100
    assert halo_supported(sim5._shape, 8)
    # strict per-step extern-force mode is (still) outside the envelope
    sim6 = Simulation(SimConfig(velocity_clamp=False,
                                persistent_extern_force=False))
    sim6.createLattice(Vec(0, 0, 3), Vec(8, 1, 1), 32, 4, 4)
    sim6._T = 0.0
    sim6._marshal()
    assert not halo_supported(sim6._shape, 8)


@pytest.mark.parametrize("seed", range(4))
def test_halo_matches_single_device_random_combo(seed):
    """Seeded random FEATURE COMBINATIONS through the halo-vs-single
    harness (the named variants cover singles and a few pairs).  Two
    horizons like the kernel fuzz: 10 steps tight (semantic bugs show
    immediately), 200 steps loose (chaotic f32 amplification only)."""
    rng = np.random.RandomState(77 + seed)
    kw = dict(
        damping=float(rng.choice([0.0, 0.4])),
        breathing=bool(rng.randint(2)),
        actuated=bool(rng.randint(2)),
        drag=float(rng.choice([0.0, 0.25])),
        deleted=bool(rng.randint(2)),
        local_constraint=bool(rng.randint(2)),
        integrator=[None, "verlet", "rk2"][rng.randint(3)],
        magnets=bool(rng.randint(2)),
        remainder=bool(rng.randint(2)),
        remainder_long=bool(rng.randint(2)),
    )
    if kw["magnets"]:
        kw["magnet_binned"] = bool(rng.randint(2))
    sim = _scene(**kw)
    mesh = make_mesh(("shard",))
    assert halo_supported(sim._shape, 8)
    sharded = place(sim._state, mesh)
    chunk_h = build_halo_chunk(sim._shape, mesh)(sharded)
    chunk_s = build_chunk_fn(sim._shape)
    n = sim._store.n_masses

    out_h = chunk_h(sharded, jnp.int32(10))
    out_s = chunk_s(sim._state, jnp.int32(10))
    np.testing.assert_allclose(np.asarray(out_h.masses.pos)[:, :n],
                               np.asarray(out_s.masses.pos)[:, :n],
                               atol=1e-6)

    out_h = chunk_h(sharded, jnp.int32(200))
    out_s = chunk_s(sim._state, jnp.int32(200))
    np.testing.assert_allclose(np.asarray(out_h.masses.pos)[:, :n],
                               np.asarray(out_s.masses.pos)[:, :n],
                               atol=2e-3)
