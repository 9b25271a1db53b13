"""Grid-tiled Pallas kernel (big scenes) vs the XLA chunk, interpret mode."""

import jax.numpy as jnp
import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.ops import pallas_tiled
from titan_tpu.ops.step import build_chunk_fn


def _scene(friction=True, damping=0.0, breathing=False, drag=0.0,
           deleted=False, nonuniform_rest=False, nonuniform_k=False,
           integrator=None):
    from titan_tpu import ACTIVE_CONTRACT_THEN_EXPAND, Integrator
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
    # f32: kernel and XLA order float ops differently
    np.testing.assert_allclose(np.asarray(out_t.masses.pos)[:, :n],
                               np.asarray(out_x.masses.pos)[:, :n],
                               atol=5e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_t.masses.vel)[:, :n],
                               np.asarray(out_x.masses.vel)[:, :n],
                               atol=5e-6, rtol=1e-5)
    # acc is k-amplified position noise (acc ~ k*(rest-len)/m: a 1e-6 f32
    # ordering difference in pos becomes ~k*1e-6 in acc), so its tolerance
    # scales with the spring constant (k=800 here)
    np.testing.assert_allclose(np.asarray(out_t.masses.acc)[:, :n],
                               np.asarray(out_x.masses.acc)[:, :n],
                               atol=5e-2, rtol=1e-3)


def test_tiled_envelope_rejections():
    from titan_tpu import ACTUATED_EXPAND
    sim = _scene()
    st = sim._store
    st.s_type[: st.n_springs] = ACTUATED_EXPAND
    st.l_max[: st.n_springs] = 2.0
    st.rate[: st.n_springs] = 0.1
    sim._marshal()
    assert not pallas_tiled.tiled_supported(sim._shape)


@pytest.mark.parametrize("seed", range(4))
def test_tiled_matches_xla_random_combo(seed, monkeypatch):
    """Seeded random FEATURE COMBINATIONS through the tiled-vs-XLA
    harness (the named variants cover singles); two horizons like the
    VMEM-kernel fuzz: 1 step tight, 30 steps at the usual tolerance."""
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
    )
    sim = _scene(**kw)
    assert pallas_tiled.tiled_supported(sim._shape)

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr("titan_tpu.ops.pallas_tiled.pl.pallas_call", interp)

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
