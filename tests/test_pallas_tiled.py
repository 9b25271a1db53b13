"""Grid-tiled Pallas kernel (big scenes) vs the XLA chunk, interpret mode."""

import jax.numpy as jnp
import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.ops import pallas_tiled
from titan_tpu.ops.step import build_chunk_fn


def _scene(friction=True):
    sim = Simulation(SimConfig())
    sim.createLattice(Vec(0, 0, 3), Vec(4, 1, 1), 40, 6, 6)
    sim.setAllSpringConstantValues(800.0)
    if friction:
        sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    else:
        sim.createPlane(Vec(0, 0, 1), 0)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(0.0001)
    sim._T = 0.0
    sim._marshal()
    return sim


@pytest.mark.parametrize("friction", [False, True])
def test_tiled_matches_xla(friction, monkeypatch):
    sim = _scene(friction)
    assert pallas_tiled.tiled_supported(sim._shape)

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr("titan_tpu.ops.pallas_tiled.pl.pallas_call", interp)

    out_t = pallas_tiled.build_tiled_chunk(sim._shape)(sim._state,
                                                       jnp.int32(30))
    out_x = build_chunk_fn(sim._shape)(sim._state, jnp.int32(30))
    n = sim._store.n_masses
    np.testing.assert_allclose(np.asarray(out_t.masses.pos)[:, :n],
                               np.asarray(out_x.masses.pos)[:, :n],
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_t.masses.vel)[:, :n],
                               np.asarray(out_x.masses.vel)[:, :n],
                               atol=1e-6, rtol=1e-6)
