"""Fast kernel-path representatives for the smoke tier.

The full kernel test files (test_pallas_step / test_pallas_tiled /
test_halo_tiled / test_adjoint*) sweep dozens of feature variants and
only run in the multi-hour full suite; this module runs ONE
interpret-mode representative of each kernel subsystem so
``pytest -m smoke`` covers every Pallas code path (r4 VERDICT item 8):

- the VMEM-resident fused kernel (ops/pallas_step.py),
- the grid-tiled kernel AND a resident-grid ("mega") segment
  (ops/pallas_tiled.py),
- the distributed tiled kernel on a CPU mesh (parallel/halo_tiled.py),
- the VMEM adjoint (ops/adjoint.py) and the tiled mega adjoint
  (ops/adjoint_tiled.py).

Each test delegates to the full file's own scene builders/assertions so
the smoke representative can never drift from the real suite's
semantics.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from titan_tpu import Simulation, SimConfig, Vec, diff
from titan_tpu.state import xla_only_shape


def test_vmem_kernel_smoke(monkeypatch):
    """VMEM-resident fused kernel vs XLA, one damped-friction variant."""
    from test_pallas_step import _scene
    from titan_tpu.ops import pallas_step
    from titan_tpu.ops.step import build_chunk_fn
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr("titan_tpu.ops.pallas_step.pl.pallas_call", interp)
    sim = _scene(friction=True, damping=0.5)
    assert pallas_step.pallas_supported(sim._shape)
    out_p = pallas_step.build_pallas_chunk(sim._shape)(sim._state,
                                                       jnp.int32(30))
    out_x = build_chunk_fn(sim._shape)(sim._state, jnp.int32(30))
    n = sim._store.n_masses
    np.testing.assert_allclose(np.asarray(out_p.masses.pos)[:, :n],
                               np.asarray(out_x.masses.pos)[:, :n],
                               atol=1e-5, rtol=1e-5)


def test_tiled_and_mega_smoke(monkeypatch):
    """Grid-tiled kernel vs XLA, plus one resident-grid (mega) segment
    vs the per-step launches, on one scene."""
    from test_pallas_tiled import (_interpret_tiled, _mega_vs_per_step,
                                   _assert_mega_equal, _scene)
    from titan_tpu.ops import pallas_tiled
    from titan_tpu.ops.step import build_chunk_fn
    sim = _scene(friction=False)
    _interpret_tiled(monkeypatch)
    out_t = pallas_tiled.build_tiled_chunk(sim._shape)(sim._state,
                                                       jnp.int32(20))
    out_x = build_chunk_fn(sim._shape)(sim._state, jnp.int32(20))
    n = sim._store.n_masses
    np.testing.assert_allclose(np.asarray(out_t.masses.pos)[:, :n],
                               np.asarray(out_x.masses.pos)[:, :n],
                               atol=5e-6, rtol=1e-5)
    ref, out = _mega_vs_per_step(sim, monkeypatch, steps=8, seg=4)
    _assert_mega_equal(ref, out, damping=False)


def test_halo_tiled_smoke(monkeypatch):
    """Distributed tiled kernel on a 2-device CPU mesh, bitwise vs the
    single-device tiled chunk (per-step launches pinned both sides)."""
    from jax.sharding import Mesh
    from test_halo_tiled import _interpret_tiled, _scene
    from titan_tpu.ops import pallas_tiled
    from titan_tpu.parallel.halo import place
    from titan_tpu.parallel.halo_tiled import build_halo_tiled_chunk
    sim = _scene(friction=False)
    _interpret_tiled(monkeypatch)
    monkeypatch.setenv("TITAN_MEGA", "0")
    mesh = Mesh(np.array(jax.devices()[:2]), ("shard",))
    sharded = place(sim._state, mesh)
    out_d = build_halo_tiled_chunk(sim._shape, mesh)(sharded,
                                                     jnp.int32(10))
    out_s = pallas_tiled.build_tiled_chunk(sim._shape)(sim._state,
                                                       jnp.int32(10))
    n = sim._store.n_masses
    np.testing.assert_array_equal(np.asarray(out_d.masses.pos)[:, :n],
                                  np.asarray(out_s.masses.pos)[:, :n])


def test_vmem_adjoint_smoke(monkeypatch):
    """Fused VMEM adjoint gradients vs jax.grad through the XLA path on
    one small pre-stressed scene."""
    from titan_tpu.ops import adjoint
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr("titan_tpu.ops.pallas_step.pl.pallas_call", interp)
    monkeypatch.setattr("titan_tpu.ops.adjoint.pl.pallas_call", interp)
    sim = Simulation(SimConfig(velocity_clamp=False,
                               host_store_dtype="float32"))
    sim.createLattice(Vec(0, 0, 2), Vec(1, 1, 1), 4, 4, 4)
    sim.setAllSpringConstantValues(800.0)
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim._store.rest[: sim._store.n_springs] *= 1.03
    sim._T = 0.0
    sim._marshal()
    shape, state = sim._shape, sim._state
    assert adjoint.adjoint_supported(shape), \
        adjoint.adjoint_reject_reason(shape)

    def mk(rollout):
        def f(pos0):
            s = dataclasses.replace(
                state, masses=dataclasses.replace(state.masses, pos=pos0))
            return jnp.sum(rollout(s).masses.pos)
        return f

    g_a = jax.grad(mk(lambda s: adjoint.adjoint_rollout(
        shape, s, 8, segment=8)))(state.masses.pos)
    g_x = jax.grad(mk(lambda s: diff.rollout(
        xla_only_shape(shape), s, 8)))(state.masses.pos)
    a, x = np.asarray(g_a), np.asarray(g_x)
    scale = max(np.abs(x).max(), 1e-8)
    assert float((np.abs(a - x) / scale).max()) < 2e-4


def test_mega_adjoint_smoke(monkeypatch):
    """Tiled mega adjoint (megatrace + reverse-sweep backward) gradients
    vs jax.grad through the XLA path."""
    from test_adjoint_tiled import _check_grads, _interpret, _scene
    from titan_tpu.ops import adjoint_tiled
    monkeypatch.setenv("TITAN_MEGA_SEG", "4")
    _interpret(monkeypatch)
    sim = _scene()
    assert adjoint_tiled._mega_adjoint_ok(sim._shape)
    _check_grads(sim, 8, 8)
