"""Explicit halo-exchange sharded stepping vs the single-device chunk."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.ops.step import build_chunk_fn
from titan_tpu.parallel import make_mesh
from titan_tpu.parallel.halo import build_halo_chunk, halo_supported, place


def _scene(damping=0.0):
    # long-x lattice so max(delta) (= ny*nz + nz + 1 = 21) << block (64)
    sim = Simulation(SimConfig(velocity_clamp=False))
    sim.createLattice(Vec(0, 0, 3), Vec(8, 1, 1), 32, 4, 4)
    sim.setAllSpringConstantValues(500.0)
    if damping:
        st = sim._store
        st.damping[: st.n_springs] = damping
    sim.createPlane(Vec(0, 0, 1), 0, 0.2, 0.3)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(0.0001)
    sim._T = 0.0
    sim._marshal()
    return sim


@pytest.mark.parametrize("damping", [0.0, 0.5])
def test_halo_matches_single_device(damping):
    sim = _scene(damping)
    mesh = make_mesh(("shard",))
    assert halo_supported(sim._shape, 8)

    sharded = place(sim._state, mesh)
    chunk = build_halo_chunk(sim._shape, mesh)(sharded)
    out_h = chunk(sharded, jnp.int32(200))

    out_s = build_chunk_fn(sim._shape)(sim._state, jnp.int32(200))

    n = sim._store.n_masses
    np.testing.assert_allclose(np.asarray(out_h.masses.pos)[:, :n],
                               np.asarray(out_s.masses.pos)[:, :n],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_h.masses.vel)[:, :n],
                               np.asarray(out_s.masses.vel)[:, :n],
                               atol=1e-5)
    assert len(out_h.masses.pos.sharding.device_set) == 8


def test_halo_envelope():
    sim = _scene()
    # a cube-ish lattice has max(delta) > block at 8 devices -> rejected
    sim2 = Simulation(SimConfig(velocity_clamp=False))
    sim2.createLattice(Vec(0, 0, 3), Vec(1, 1, 1), 8, 8, 8)
    sim2._T = 0.0
    sim2._marshal()
    assert not halo_supported(sim2._shape, 8)
    assert halo_supported(sim._shape, 8)
