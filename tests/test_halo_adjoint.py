"""Distributed fused adjoint (shard_map + per-shard backward tile kernel)
vs the single-device tiled adjoint.

Expected BITWISE equal: the same backward kernel runs per shard on halo'd
windows that hold the same true neighbor rows the single-device windows
DMA (the forward suite's bitwise argument, applied to the transpose).
Scenes are sized so real lattice rows span MULTIPLE shards -- cross-shard
gradient flow through the ppermuted cotangent halos actually bites.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titan_tpu import Integrator, SimConfig, Simulation, Vec
from titan_tpu.ops import adjoint_tiled, pallas_tiled
from titan_tpu.parallel import halo_adjoint, halo_tiled, make_mesh


def _interpret(monkeypatch, tile=4096):
    from conftest import force_tiled_interpret
    force_tiled_interpret(monkeypatch)
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr(
        "titan_tpu.ops.adjoint_tiled.pl.pallas_call", interp)
    # shrink consistently: pallas_tiled (single-device chunk + the
    # adjoint_tiled geometry, late-bound) AND halo_tiled (imports the
    # name, so patch its module binding too)
    tl = lambda h, shape=None: max(h, tile)
    monkeypatch.setattr(pallas_tiled, "_tile_size", tl)
    monkeypatch.setattr(halo_tiled, "_tile_size", tl)


def _scene(nx=240, damping=12.0, friction=True, drag=0.0,
           breathing=False, actuated=False, integrator=None, fixed=False):
    from titan_tpu import ACTIVE_CONTRACT_THEN_EXPAND, ACTUATED_EXPAND
    cfg = dict(velocity_clamp=False, host_store_dtype="float32")
    if integrator:
        cfg["integrator"] = Integrator(integrator)
    sim = Simulation(SimConfig(**cfg))
    sim.createLattice(Vec(0, 0, 3), Vec(10, 1, 1), nx, 6, 6)
    sim.setAllSpringConstantValues(800.0)
    if friction:
        sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    st = sim._store
    st.rest[: st.n_springs] *= 1.03
    if damping:
        st.damping[: st.n_springs] = damping
    if drag:
        st.drag[: st.n_masses] = drag
    if fixed:
        st.fixed[3] = True
        st.fixed[5000] = True
    if breathing:
        half = st.n_springs // 2
        st.s_type[:half] = ACTIVE_CONTRACT_THEN_EXPAND
        st.omega[:half] = 7.0
    if actuated:
        third = st.n_springs // 3
        st.s_type[:third] = ACTUATED_EXPAND
        st.l_max[:third] = st.rest[:third] * 1.2
        st.rate[:third] = 0.5
    sim._T = 0.0
    sim._marshal()
    return sim


def _mesh2():
    import numpy as _np
    return jax.sharding.Mesh(_np.array(jax.devices()[:2]), ("shard",))


def _grads(sim, rollout, wpos):
    shape, state = sim._shape, sim._state

    def f(pos0, vel0, k, rest):
        s = dataclasses.replace(
            state,
            masses=dataclasses.replace(state.masses, pos=pos0, vel=vel0),
            stencil=dataclasses.replace(state.stencil, k=k, rest=rest))
        return jnp.sum(rollout(s).masses.pos * wpos)

    m, stc = state.masses, state.stencil
    return jax.grad(f, argnums=(0, 1, 2, 3))(m.pos, m.vel, stc.k,
                                             stc.rest)


VARIANTS = {
    "damping_friction": dict(),
    "drag": dict(drag=0.3, friction=False),
    "verlet_fixed": dict(integrator="verlet", fixed=True),
    "breathing": dict(breathing=True),
    "actuated": dict(actuated=True),
    "rk2": dict(integrator="rk2"),
}


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_halo_adjoint_matches_single_tiled(variant, monkeypatch):
    _interpret(monkeypatch)
    sim = _scene(**VARIANTS[variant])
    shape, state = sim._shape, sim._state
    mesh = _mesh2()
    r = halo_adjoint.halo_adjoint_reject_reason(shape, 2)
    assert r is None, r
    # real rows must span both shards (cross-shard cotangent flow)
    _, _, b, _, _ = halo_adjoint._geom_dist(shape, 2)
    assert shape.n_masses > b

    rng = np.random.RandomState(0)
    n = sim._store.n_masses
    npad = state.masses.pos.shape[1]
    wpos = jnp.asarray(rng.normal(0, 1, (3, npad)),
                       jnp.float32).at[:, n:].set(0.0)

    steps, seg = 4, 2
    g_d = _grads(
        sim,
        lambda s: halo_adjoint.halo_adjoint_rollout(shape, s, mesh,
                                                    steps, segment=seg),
        wpos)
    g_s = _grads(
        sim,
        lambda s: adjoint_tiled.tiled_adjoint_rollout(shape, s, steps,
                                                      segment=seg),
        wpos)
    for name, a, x in zip(("pos", "vel", "k", "rest"), g_d, g_s):
        a = np.asarray(a)[..., :n]
        x = np.asarray(x)[..., :n]
        if variant in ("rk2", "breathing"):
            # interpret-mode XLA fuses the sin/double-pass chains
            # differently inside vs outside shard_map: measured 2/25,920
            # entries off by ONE f32 ULP (1.9e-9 abs).  Real Mosaic
            # compiles the same kernel for both paths
            # (scripts/tpu_halo_adjoint_check.py pins bitwise there).
            np.testing.assert_allclose(a, x, rtol=3e-6,
                                       atol=1e-8 * max(np.abs(x).max(), 1),
                                       err_msg=f"{variant}:{name}")
        else:
            np.testing.assert_array_equal(a, x,
                                          err_msg=f"{variant}:{name}")


def test_eight_shards(monkeypatch):
    """All 8 virtual devices; the lattice spans the first shards, the
    rest are inert padding -- grads still bitwise the single-device
    tiled adjoint."""
    _interpret(monkeypatch, tile=2048)
    sim = _scene(nx=240)                 # 8640 masses, b=2048 -> 5 real
    shape, state = sim._shape, sim._state
    mesh = make_mesh(("shard",))
    r = halo_adjoint.halo_adjoint_reject_reason(shape, 8)
    assert r is None, r
    rng = np.random.RandomState(1)
    n = sim._store.n_masses
    npad = state.masses.pos.shape[1]
    wpos = jnp.asarray(rng.normal(0, 1, (3, npad)),
                       jnp.float32).at[:, n:].set(0.0)
    g_d = _grads(sim, lambda s: halo_adjoint.halo_adjoint_rollout(
        shape, s, mesh, 2, segment=2), wpos)
    g_s = _grads(sim, lambda s: adjoint_tiled.tiled_adjoint_rollout(
        shape, s, 2, segment=2), wpos)
    for name, a, x in zip(("pos", "vel", "k", "rest"), g_d, g_s):
        np.testing.assert_array_equal(
            np.asarray(a)[..., :n], np.asarray(x)[..., :n],
            err_msg=name)


def test_reject_reasons(monkeypatch):
    _interpret(monkeypatch)
    sim = _scene()
    assert halo_adjoint.halo_adjoint_supported(sim._shape, 2)
    st = sim._store
    st.mag_rad[0] = 0.05
    st.mag_stiffness[0] = 100.0
    st.mag_maxf[0] = 1.0
    sim._marshal()
    r = halo_adjoint.halo_adjoint_reject_reason(sim._shape, 2)
    assert r is not None
