"""Dense-grid Pallas magnet kernel (ops/magnets_grid.py) vs the binned and
exact pairwise paths.  On CPU the kernel runs in Pallas interpret mode."""

import jax
import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.ops import forces as F
from titan_tpu.ops.magnets import binned_magnet_forces
from titan_tpu.ops.magnets_grid import grid_magnet_forces
from titan_tpu.state import pad_to

INTERP = "cpu" in jax.devices()[0].platform.lower()


def _magnet_scene(n=400, seed=0, spread=1.5, threshold=10**9):
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
def test_grid_matches_pairwise(seed):
    sim = _magnet_scene(seed=seed)
    m = sim._state.masses
    cutoff = sim.config.magnet_cutoff
    want = np.asarray(F.magnet_forces(m, cutoff))
    got = np.asarray(grid_magnet_forces(
        m, cutoff, pad_to(400, 8), 64, INTERP))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * max(scale, 1.0),
                               rtol=1e-4)


def test_grid_matches_binned_bitwise_coverage():
    """Same pairs as the binned path: tight tolerance (only pair-sum order
    differs within a receiver's 9 cells)."""
    sim = _magnet_scene(seed=3, spread=0.9)
    m = sim._state.masses
    cutoff = sim.config.magnet_cutoff
    want = np.asarray(binned_magnet_forces(m, cutoff, pad_to(400, 8), 32))
    got = np.asarray(grid_magnet_forces(
        m, cutoff, pad_to(400, 8), 32, INTERP))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=1e-4)


def test_grid_overflow_falls_back_to_binned():
    """A cell holding more than cell_cap masses must flip the lax.cond to
    the binned path, which keeps over-cap masses as receivers."""
    sim = _magnet_scene(n=64, seed=4, spread=0.01)   # all in ~one cell
    m = sim._state.masses
    cutoff = sim.config.magnet_cutoff
    want = np.asarray(binned_magnet_forces(m, cutoff, pad_to(64, 8), 8))
    got = np.asarray(grid_magnet_forces(m, cutoff, pad_to(64, 8), 8, INTERP))
    np.testing.assert_array_equal(got, want)


def test_grid_with_deleted_and_zero_param_sources():
    sim = _magnet_scene(seed=5)
    st = sim._store
    st.valid[11] = False
    st.valid[222] = False
    # zero-param mass inside a magnet's shell: must still act as a shell
    # contact source (reference inserts every mass, sim.cu:842)
    st.mag_rad[0] = 0.12
    st.mag_stiffness[0] = 400.0
    st.pos[1] = st.pos[0] + np.asarray([0.05, 0.0, 0.0])
    st.mag_rad[1] = st.mag_stiffness[1] = 0.0
    st.mag_maxf[1] = st.mag_scale[1] = 0.0
    sim._marshal()
    m = sim._state.masses
    cutoff = sim.config.magnet_cutoff
    want = np.asarray(F.magnet_forces(m, cutoff))
    assert np.abs(want[:, 0]).max() > 1.0    # the shell force is real
    got = np.asarray(grid_magnet_forces(
        m, cutoff, pad_to(400, 8), 64, INTERP))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=1e-4)


def _big_magnet_sim(**cfg_kw):
    """12k magnetic masses via direct store fill (marshal only, no steps)."""
    rng = np.random.RandomState(7)
    n = 12000
    sim = Simulation(SimConfig(**cfg_kw))
    st = sim._store
    st.reserve_masses(n)
    st.pos[:n] = rng.uniform(-3, 3, (n, 3))
    st.valid[:n] = True
    st.n_masses = n
    st.mag_rad[:n] = 0.03
    st.mag_stiffness[:n] = 200.0
    st.mag_maxf[:n] = 1.0
    st.mag_scale[:n] = 1.0
    sim.setTimeStep(1e-4)
    sim._T = 0.0
    sim._marshal()
    return sim


def test_marshal_sets_magnet_grid_flag():
    from titan_tpu.state import xla_only_shape
    shape = _big_magnet_sim()._shape
    assert shape.magnet_binned and shape.magnet_grid
    # AD / vmap / auto-SPMD step builders must drop the Pallas sub-path
    cleared = xla_only_shape(shape)
    assert not cleared.magnet_grid and cleared.magnet_binned

    # f64 scenes and non-multiple-of-8 caps stay on the XLA binned path
    assert not _big_magnet_sim(dtype="float64")._shape.magnet_grid
    assert not _big_magnet_sim(magnet_cell_cap=12)._shape.magnet_grid
    assert not _big_magnet_sim(magnet_grid_threshold=10**9)._shape.magnet_grid
    # use_pallas=False must keep the step Pallas-free end to end
    assert not _big_magnet_sim(use_pallas=False)._shape.magnet_grid


def test_grid_edge_cells():
    """Masses clipped into edge cells (positions beyond the grid span) and
    pairs straddling the edge-cell boundary stay exact."""
    rng = np.random.RandomState(6)
    sim = Simulation(SimConfig())
    n = 96
    for i in range(n):
        base = np.asarray([-30.0, -30.0, 0.0])   # far outside +-17.9 m span
        sim.createMass(Vec(*(base + rng.uniform(0, 0.3, 3))))
    st = sim._store
    st.mag_rad[:n] = 0.04
    st.mag_stiffness[:n] = 300.0
    st.mag_maxf[:n] = 1.0
    st.mag_scale[:n] = 1.0
    sim.setTimeStep(1e-4)
    sim._marshal()
    m = sim._state.masses
    cutoff = sim.config.magnet_cutoff
    want = np.asarray(binned_magnet_forces(m, cutoff, pad_to(n, 8), 128))
    got = np.asarray(grid_magnet_forces(m, cutoff, pad_to(n, 8), 128, INTERP))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=1e-4)
