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
    # pin the single-device side to the round-4 per-step trace/backward:
    # the distributed adjoint runs per-step kernels, and the round-5
    # mega adjoint's differently-fused interpret programs drift ulps
    # (the CROSS-PATH TEST TRAP, CLAUDE.md; hardware is checked by
    # scripts/tpu_mega_adjoint_check.py)
    monkeypatch.setenv("TITAN_MEGA_ADJ", "0")
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
    monkeypatch.setenv("TITAN_MEGA_ADJ", "0")   # cross-path pin (above)
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
    # 8640 masses >= magnet_binned_threshold: the binned glue serves the
    # scene, and binned glue scenes are IN the adjoint envelope now
    assert sim._shape.magnet_binned
    assert halo_adjoint.halo_adjoint_supported(sim._shape, 2)
    # below the threshold the forward runs exact-pairwise magnets, which
    # have no distributed glue -- rejected by the forward's own envelope
    sim_small = _scene(nx=200)
    st = sim_small._store
    st.mag_rad[0] = 0.05
    st.mag_stiffness[0] = 100.0
    st.mag_maxf[0] = 1.0
    sim_small._marshal()
    assert not sim_small._shape.magnet_binned
    r = halo_adjoint.halo_adjoint_reject_reason(sim_small._shape, 2)
    assert r is not None and "pairwise" in r


# ---------------------------------------------------------------------------
# Glue scenes: magnet / remainder forces as per-step glue, transposed
# via jax.vjp of the same per-shard glue (halo_tiled.dist_glue_force)
# ---------------------------------------------------------------------------

def _glue_scene(cross=0, cross_actuated=False, magnets=False,
                integrator=None):
    """240x6x6 lattice (real rows span both shards at tile 4096) with
    cross-half remainder links and/or binned attract-mode magnets
    (receiver compaction -- the fast glue path; the receiver-dense CPU
    cost trap is documented in halo_tiled's test suite)."""
    from titan_tpu import ACTUATED_CONTRACT, ACTUATED_EXPAND
    cfg = dict(velocity_clamp=False, host_store_dtype="float32")
    if integrator:
        cfg["integrator"] = Integrator(integrator)
    if magnets:
        cfg.update(magnet_cutoff=0.6, magnet_binned_threshold=2,
                   magnet_cell_cap=64)
    sim = Simulation(SimConfig(**cfg))
    sim.createLattice(Vec(0, 0, 3), Vec(10, 1, 1), 240, 6, 6)
    sim.setAllSpringConstantValues(800.0)
    st = sim._store
    nm = st.n_masses
    if cross:
        rng = np.random.RandomState(3)
        for _ in range(cross):
            a = int(rng.randint(0, nm // 2))
            c = int(rng.randint(nm // 2, nm))
            sim.createSpring(sim.getMassByIndex(a), sim.getMassByIndex(c))
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    st.rest[: st.n_springs] *= 1.03
    st.damping[: st.n_springs] = 12.0
    if cross_actuated:
        i0 = st.n_springs - cross
        half = cross // 2
        st.s_type[i0: i0 + half] = ACTUATED_EXPAND
        st.l_max[i0: i0 + half] = st.rest[i0: i0 + half] * 1.001
        st.rate[i0: i0 + half] = 0.6
        st.s_type[i0 + half: i0 + cross] = ACTUATED_CONTRACT
        st.l_min[i0 + half: i0 + cross] = st.rest[i0 + half:
                                                  i0 + cross] * 0.5
        st.rate[i0 + half: i0 + cross] = 0.8
    if magnets:
        # attractors in BOTH shards (block = 8192 at tile 4096; rows
        # 8500/8600 land on shard 1)
        for i in (3, 500, 501, 4000, 4300, 4350, 8500, 8600):
            st.mag_maxf[i] = 0.5
            st.mag_scale[i] = 1.0
    sim._T = 0.0
    sim._marshal()
    return sim


GLUE_VARIANTS = {
    "remainder": dict(cross=48, cross_actuated=True),
    "magnets": dict(magnets=True),
    "both_verlet": dict(cross=48, magnets=True, integrator="verlet"),
    # RK2 glue: the distributed SPLIT backward (pass-2 kernel ->
    # midpoint glue vjp -> second cotangent exchange -> pass-1 kernel
    # -> step glue vjp), incl. the per-pass rest chain through the
    # actuated cross links (two advances per dt)
    "rk2_remainder": dict(cross=48, cross_actuated=True,
                          integrator="rk2"),
    "rk2_both": dict(cross=48, magnets=True, integrator="rk2"),
}


@pytest.mark.parametrize("variant", sorted(GLUE_VARIANTS))
def test_halo_adjoint_glue_matches_xla(variant, monkeypatch):
    """Distributed glue adjoint vs jax.grad through the XLA step path:
    pos plus every glue parameter -- per-spring k/rest/omega/rate on
    state.springs (incl. the actuated rest's reverse chain) and per-mass
    mag_* -- with the loss also reading the mutated remainder-rest
    OUTPUT so the chain seed bites."""
    from titan_tpu import diff
    from titan_tpu.state import xla_only_shape
    _interpret(monkeypatch)
    sim = _glue_scene(**GLUE_VARIANTS[variant])
    shape, state = sim._shape, sim._state
    mesh = _mesh2()
    r = halo_adjoint.halo_adjoint_reject_reason(shape, 2)
    assert r is None, r
    _, _, b, _, _ = halo_adjoint._geom_dist(shape, 2)
    assert shape.n_masses > b          # real rows span both shards

    rng = np.random.RandomState(0)
    n = sim._store.n_masses
    npad = state.masses.pos.shape[1]
    w = jnp.asarray(rng.normal(0, 1, (3, npad)),
                    jnp.float32).at[:, n:].set(0.0)
    wrest = (jnp.asarray(rng.normal(0, 1, state.springs.rest.shape),
                         jnp.float32) if shape.has_remainder else None)

    names = ["pos"]
    m0, sp0 = state.masses, state.springs
    args = [m0.pos]
    if shape.has_magnets:
        names += ["mag_rad", "mag_stiffness", "mag_maxf", "mag_scale"]
        args += [m0.mag_rad, m0.mag_stiffness, m0.mag_maxf, m0.mag_scale]
    if shape.has_remainder:
        names += ["k", "rest", "omega", "rate"]
        args += [sp0.k, sp0.rest, sp0.omega, sp0.rate]

    def mk(rollout):
        def f(*a):
            s = state
            mm = dataclasses.replace(s.masses, pos=a[0])
            i = 1
            if shape.has_magnets:
                mm = dataclasses.replace(
                    mm, mag_rad=a[i], mag_stiffness=a[i + 1],
                    mag_maxf=a[i + 2], mag_scale=a[i + 3])
                i += 4
            s = dataclasses.replace(s, masses=mm)
            if shape.has_remainder:
                s = dataclasses.replace(
                    s, springs=dataclasses.replace(
                        s.springs, k=a[i], rest=a[i + 1],
                        omega=a[i + 2], rate=a[i + 3]))
            out = rollout(s)
            loss = jnp.sum(out.masses.pos * w)
            if wrest is not None:
                loss = loss + jnp.sum(out.springs.rest * wrest)
            return loss
        return f

    steps, seg = 4, 2
    idx = tuple(range(len(args)))
    gt = jax.grad(mk(lambda s: halo_adjoint.halo_adjoint_rollout(
        shape, s, mesh, steps, segment=seg)), argnums=idx)(*args)
    gx = jax.grad(mk(lambda s: diff.rollout(
        xla_only_shape(shape), s, steps)), argnums=idx)(*args)
    rem_ok = (np.asarray(sp0.valid & m0.valid[sp0.left]
                         & m0.valid[sp0.right])
              if shape.has_remainder else None)
    vmask = np.asarray(m0.valid)
    for name, a, x in zip(names, gt, gx):
        a, x = np.asarray(a), np.asarray(x)
        if name == "pos":
            a, x = a[:, :n], x[:, :n]
        elif name.startswith("mag_"):
            a, x = a * vmask, x * vmask
        elif name in ("k", "rate"):
            a, x = a * rem_ok, x * rem_ok
        scale = max(np.abs(x).max(), 1e-8)
        err = float((np.abs(a - x) / scale).max())
        assert err < 2e-3, (variant, name, err)


def test_grad_rollout_mesh_routes(monkeypatch, caplog):
    """diff.grad_rollout(mesh=...) picks the distributed adjoint inside
    its envelope, and falls back to the single-device routing with a
    warning naming the rejection outside it (exact-pairwise magnets
    here, which have no distributed glue)."""
    import logging

    from titan_tpu import diff
    from titan_tpu.parallel import halo_adjoint as ha

    _interpret(monkeypatch)
    sim = _scene()
    mesh = _mesh2()
    called = {}
    orig = ha.halo_adjoint_rollout

    def spy(*a, **k):
        called["dist"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ha, "halo_adjoint_rollout", spy)
    with caplog.at_level(logging.WARNING, logger="titan_tpu"):
        out = diff.grad_rollout(sim._shape, sim._state, 2, segment=2,
                                mesh=mesh)
    assert called.get("dist")
    assert not [r for r in caplog.records
                if r.levelno >= logging.WARNING]
    ref = orig(sim._shape, sim._state, mesh, 2, segment=2)
    np.testing.assert_array_equal(np.asarray(out.masses.pos),
                                  np.asarray(ref.masses.pos))

    sim_small = _scene(nx=200)
    st = sim_small._store
    st.mag_rad[0] = 0.05
    st.mag_stiffness[0] = 100.0
    st.mag_maxf[0] = 1.0
    sim_small._marshal()
    assert not sim_small._shape.magnet_binned      # exact-pairwise
    # stub the single-device tier: this test pins the ROUTING, the
    # single-device adjoints have their own suites
    monkeypatch.setattr(diff, "adjoint_reject_reason", lambda s: None)
    monkeypatch.setattr(diff, "adjoint_rollout",
                        lambda *a, **k: "SINGLE")
    with caplog.at_level(logging.WARNING, logger="titan_tpu"):
        out = diff.grad_rollout(sim_small._shape, sim_small._state, 2,
                                segment=2, mesh=mesh)
    assert out == "SINGLE"
    msgs = [r.message for r in caplog.records
            if r.levelno >= logging.WARNING]
    assert any("distributed adjoint" in m for m in msgs), msgs


def test_grad_rollout_mesh_refuses_recompute_fallback(monkeypatch):
    """A MESHED scene outside every fused adjoint envelope raises
    instead of silently attempting fast_rollout's single-device
    XLA-recompute backward (whose padded residuals can OOM the chip on
    exactly the scenes users distribute)."""
    from titan_tpu import diff

    _interpret(monkeypatch)
    sim = _scene()
    mesh = _mesh2()
    monkeypatch.setattr(diff, "adjoint_reject_reason",
                        lambda s: "stub: outside VMEM envelope")
    monkeypatch.setattr(diff, "tiled_adjoint_reject_reason",
                        lambda s: "stub: outside tiled envelope")
    monkeypatch.setattr(
        "titan_tpu.parallel.halo_adjoint.halo_adjoint_reject_reason",
        lambda s, n: "stub: outside distributed envelope")
    with pytest.raises(RuntimeError, match="outside every fused"):
        diff.grad_rollout(sim._shape, sim._state, 2, segment=2,
                          mesh=mesh)
    # without mesh the same scene still gets the warned fast_rollout
    monkeypatch.setattr(diff, "fast_rollout",
                        lambda *a, **k: "FAST")
    assert diff.grad_rollout(sim._shape, sim._state, 2,
                             segment=2) == "FAST"


def test_glue_rk2_accepted(monkeypatch):
    """RK2 glue scenes are IN the distributed envelope (the distributed
    split backward, module docstring) -- grads covered by the
    rk2_remainder/rk2_both variants above."""
    _interpret(monkeypatch)
    sim = _glue_scene(magnets=True, integrator="rk2")
    assert halo_adjoint.halo_adjoint_reject_reason(sim._shape, 2) is None
    from titan_tpu.ops import adjoint_tiled
    assert adjoint_tiled.tiled_adjoint_supported(sim._shape)
