"""Cell-binned magnet neighbors (ops/magnets.py) vs the exact masked
pairwise pass: identical physics when per-cell occupancy fits the cap."""

import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.ops import forces as F
from titan_tpu.ops.magnets import binned_magnet_forces
from titan_tpu.state import pad_to


def _magnet_scene(n=400, seed=0, spread=1.5, threshold=10**9):
    """Random cloud of magnetic masses; spread chosen so cells hold a few
    masses each and many pairs straddle the 0.14 cutoff."""
    rng = np.random.RandomState(seed)
    sim = Simulation(SimConfig(magnet_binned_threshold=threshold))
    st = sim._store
    for i in range(n):
        sim.createMass(Vec(*rng.uniform(-spread, spread, 3)))
    st.mag_rad[:n] = rng.uniform(0.01, 0.05, n)
    st.mag_stiffness[:n] = rng.uniform(100, 500, n)
    st.mag_maxf[:n] = rng.uniform(0.0, 2.0, n)
    st.mag_scale[:n] = rng.choice([0.0, 1.0], n)
    sim.setTimeStep(1e-4)
    sim._T = 0.0
    sim._marshal()
    return sim


@pytest.mark.parametrize("seed", [0, 1])
def test_binned_matches_pairwise(seed):
    sim = _magnet_scene(seed=seed)
    m = sim._state.masses
    cutoff = sim.config.magnet_cutoff
    want = np.asarray(F.magnet_forces(m, cutoff))
    got = np.asarray(binned_magnet_forces(
        m, cutoff, n_cells=pad_to(400, 8), cell_cap=64))
    # f32 pair-sum order differs between the two accumulations
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * max(scale, 1.0),
                               rtol=1e-4)


def test_binned_with_deleted_and_nonmagnetic():
    sim = _magnet_scene(seed=2)
    st = sim._store
    st.valid[7] = False
    st.valid[123] = False
    # some masses fully non-magnetic: they receive zero force (stiffness
    # and max force both 0) but STILL act as shell-contact sources for
    # magnetic receivers, exactly like the pairwise pass and the reference
    # occupancy grid (insert-everything, sim.cu:842)
    for i in (3, 50, 200):
        st.mag_rad[i] = st.mag_stiffness[i] = 0.0
        st.mag_maxf[i] = st.mag_scale[i] = 0.0
    # ... and pin the source behavior: a wide-shelled magnet with a
    # zero-param mass INSIDE its shell radius must feel its shell force
    # (regression: the binned path used to drop zero-param masses from the
    # bin table entirely)
    st.pos[300] = (2.5, 2.5, 0.0)
    st.mag_rad[300] = 0.06
    st.mag_stiffness[300] = 200.0
    st.pos[301] = (2.53, 2.5, 0.0)          # dist 0.03 < rad 0.06
    st.mag_rad[301] = st.mag_stiffness[301] = 0.0
    st.mag_maxf[301] = st.mag_scale[301] = 0.0
    sim._marshal()
    m = sim._state.masses
    cutoff = sim.config.magnet_cutoff
    want = np.asarray(F.magnet_forces(m, cutoff))
    assert np.abs(want[:, 300]).max() > 0, "shell overlap not exercised"
    got = np.asarray(binned_magnet_forces(
        m, cutoff, n_cells=pad_to(400, 8), cell_cap=64))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * max(scale, 1.0),
                               rtol=1e-4)
    assert np.all(got[:, 7] == 0) and np.all(got[:, 123] == 0)


def test_marshal_selects_binned_by_threshold():
    sim = _magnet_scene(n=64, threshold=32)
    assert sim._shape.magnet_binned == (pad_to(64, 8),
                                        sim.config.magnet_cell_cap)
    sim2 = _magnet_scene(n=64, threshold=1000)
    assert sim2._shape.magnet_binned == ()


def test_binned_end_to_end_step():
    """The full step function with the binned path traced in."""
    import jax.numpy as jnp
    from titan_tpu.ops.step import build_chunk_fn
    sim = _magnet_scene(n=128, threshold=16)
    assert sim._shape.magnet_binned
    out = build_chunk_fn(sim._shape)(sim._state, jnp.int32(20))
    p = np.asarray(out.masses.pos)
    assert np.isfinite(p).all()

    # same scene through the pairwise path -> same trajectory
    sim2 = _magnet_scene(n=128, threshold=10**9)
    assert not sim2._shape.magnet_binned
    out2 = build_chunk_fn(sim2._shape)(sim2._state, jnp.int32(20))
    np.testing.assert_allclose(p, np.asarray(out2.masses.pos),
                               atol=1e-5, rtol=1e-4)


def _attractor_scene(n=600, n_att=24, seed=3, threshold=16):
    """Sparse pure attractors (mag_rad == 0 everywhere) in a big cloud:
    the receiver-compaction case (SceneShape.magnet_receivers)."""
    rng = np.random.RandomState(seed)
    sim = Simulation(SimConfig(magnet_binned_threshold=threshold))
    st = sim._store
    for i in range(n):
        sim.createMass(Vec(*rng.uniform(-1.5, 1.5, 3)))
    att = rng.choice(n, n_att, replace=False)
    st.mag_maxf[att] = rng.uniform(0.5, 2.0, n_att)
    st.mag_scale[:n] = 1.0     # every mass is a susceptibility source
    sim.setTimeStep(1e-4)
    sim._T = 0.0
    sim._marshal()
    return sim, att


def test_receiver_compaction_marshal_flags():
    sim, _ = _attractor_scene()
    # sparse attractors, all shell radii zero -> compaction engages and
    # the grid kernel stays off (its per-slot compute scans every source)
    assert sim._shape.magnet_receivers == pad_to(24, 8)
    assert not sim._shape.magnet_grid

    # any nonzero shell radius makes compaction inexact -> receiver-dense
    sim2, att2 = _attractor_scene(seed=4)
    sim2._store.mag_rad[att2[0]] = 0.05
    sim2._marshal()
    assert sim2._shape.magnet_receivers == 0

    # dense attractors (>= 1/4 of the scene) -> compaction not worth it
    sim3, _ = _attractor_scene(n=64, n_att=40)
    assert sim3._shape.magnet_receivers == 0


def test_receiver_compaction_exact():
    """Compacted receivers == receiver-dense binned == pairwise, with
    deleted masses (incl. a deleted attractor, which must receive nothing
    and stop attracting)."""
    sim, att = _attractor_scene()
    st = sim._store
    st.valid[att[0]] = False      # deleted attractor
    st.valid[17] = False
    sim._marshal()
    assert sim._shape.magnet_receivers
    m = sim._state.masses
    cutoff = sim.config.magnet_cutoff
    a_cells, cap = sim._shape.magnet_binned

    dense = np.asarray(binned_magnet_forces(m, cutoff, a_cells, cap))
    compact = np.asarray(binned_magnet_forces(
        m, cutoff, a_cells, cap, receivers=sim._shape.magnet_receivers))
    # with all shell radii zero, non-attractors receive exactly 0 on the
    # dense path too -- per-receiver math identical -> bitwise
    np.testing.assert_array_equal(compact, dense)

    want = np.asarray(F.magnet_forces(m, cutoff))
    scale = np.abs(want).max()
    np.testing.assert_allclose(compact, want, atol=2e-5 * max(scale, 1.0),
                               rtol=1e-4)
    # the compacted rows really are just the attractors
    nz = np.nonzero(np.any(compact != 0.0, axis=0))[0]
    assert set(nz) <= set(att.tolist())


def test_receiver_compaction_push_overflow_remarshals():
    """set()-pushes that break the compaction preconditions (new shell
    radius, or more attractors than the padded capacity) re-marshal."""
    import jax.numpy as jnp
    sim, att = _attractor_scene(n_att=9)   # padded capacity 16
    assert sim._shape.magnet_receivers == pad_to(9, 8)
    sim.start()
    sim.pause(0.0)

    # adding attractors up to the padded capacity: plain push, no re-marshal
    shape_before = sim._shape
    for i in range(7):
        mm = sim.masses[500 + i]
        mm.max_mag_force = 1.0
        sim.set(mm)
    assert sim._shape is shape_before

    # one more attractor overflows the static capacity -> re-marshal
    mm = sim.masses[550]
    mm.max_mag_force = 1.0
    sim.set(mm)
    assert sim._shape.magnet_receivers >= 17 or sim._structure_dirty

    # a new shell radius breaks the all-rad-zero precondition
    sim2, _ = _attractor_scene(n_att=9)
    sim2.start()
    sim2.pause(0.0)
    mm2 = sim2.masses[100]
    mm2.rad = 0.05
    sim2.set(mm2)
    assert sim2._shape.magnet_receivers == 0 or sim2._structure_dirty
    sim.stop()
    sim2.stop()


def test_deleted_mass_never_pollutes_trash_row():
    """Regression: invalid masses used to be scattered into bins row A --
    the TRASH row every empty-cell lookup reads -- so a receiver with any
    empty neighbor cell felt a DELETED magnet's stale-position force
    (measured 3.1e3 N on this scene before the fix).  Invalid masses must
    drop out of the table entirely."""
    sim = Simulation(SimConfig())
    st = sim._store
    # receiver at origin; deleted magnet 0.05 m away (inside the cutoff);
    # the rest of the cloud far away so the receiver's 3x3 window is
    # mostly EMPTY cells (-> rows9 includes the trash row)
    sim.createMass(Vec(0, 0, 0))
    sim.createMass(Vec(0.05, 0, 0))
    for i in range(30):
        sim.createMass(Vec(5 + i * 0.5, 5, 5))
    n = st.n_masses
    st.mag_rad[:2] = 0.05
    st.mag_stiffness[:2] = 200.0
    st.mag_maxf[:2] = 1.0
    st.mag_scale[:2] = 1.0
    st.valid[1] = False
    sim.setTimeStep(1e-4)
    sim._T = 0.0
    sim._marshal()
    m = sim._state.masses
    cutoff = sim.config.magnet_cutoff
    want = np.asarray(F.magnet_forces(m, cutoff))
    got = np.asarray(binned_magnet_forces(m, cutoff, pad_to(n, 8), 16))
    np.testing.assert_allclose(got, want, atol=1e-7)
    assert np.all(got[:, 0] == 0.0)     # nothing left in range
