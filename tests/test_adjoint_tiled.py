"""Tiled (beyond-VMEM) fused adjoint vs jax.grad of the XLA path.

The tiled adjoint (ops/adjoint_tiled.py) reuses ops/adjoint.backward_step
on halo'd windows; these tests pin its gradients against jax.grad through
the XLA step path (the independent implementation of the same physics) on
feature variants, in interpret mode, including multi-tile geometry (tile
size shrunk so several tiles + halo windows actually exchange gradient
flow) and multi-segment rollouts.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titan_tpu import Integrator, SimConfig, Simulation, Vec, diff
from titan_tpu.ops import adjoint_tiled, pallas_tiled
from titan_tpu.state import xla_only_shape


def _interpret(monkeypatch, tile=1024):
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
    if tile:
        # shrink tiles so the scene spans SEVERAL tiles (cross-tile
        # gradient flow through the halo windows actually bites);
        # adjoint_tiled late-binds pallas_tiled._tile_size so the primal
        # chunk, trace replay, and backward all reshape together
        monkeypatch.setattr(pallas_tiled, "_tile_size",
                            lambda h, shape=None: max(h, tile))


def _scene(damping=0.0, friction=False, drag=0.0, clamp=False,
           deleted=False, fixed=False, breathing=False, actuated=False,
           integrator=None, local=None, nonuniform=False, nx=80,
           cross=False, cross_actuated=False, magnets=False):
    from titan_tpu import (ACTIVE_CONTRACT_THEN_EXPAND, ACTUATED_CONTRACT,
                           ACTUATED_EXPAND, BALL, CONSTRAINT_PLANE,
                           CONTACT_PLANE, DIRECTION)
    cfg = dict(velocity_clamp=clamp, host_store_dtype="float32")
    if integrator:
        cfg["integrator"] = Integrator(integrator)
    sim = Simulation(SimConfig(**cfg))
    sim.createLattice(Vec(0, 0, 3), Vec(4, 1, 1), nx, 6, 6)
    if cross:
        # long-span irregular links that bucket as remainder springs and
        # (tile 1024) CROSS tile boundaries, so the glue vjp's gradient
        # flow spans tiles the kernel transpose can't reach
        for a, b in [(0, 1500), (5, 2050), (12, 2600), (12, 977),
                     (40, 1203)]:
            sim.createSpring(sim.getMassByIndex(a), sim.getMassByIndex(b))
    sim.setAllSpringConstantValues(800.0)
    if friction:
        sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    else:
        sim.createPlane(Vec(0, 0, 1), 0)
    sim.createBall(Vec(1.0, 0.2, 2.2), 0.5)
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    st = sim._store
    # pre-stress: at natural rest a free lattice has zero deformation and
    # k/rest grads are f32 noise (the test-conditioning trap, CLAUDE.md)
    st.rest[: st.n_springs] *= 1.03
    if damping:
        st.damping[: st.n_springs] = damping
    if drag:
        st.drag[: st.n_masses] = drag
    if deleted:
        st.valid[7] = False
        st.valid[100] = False
    if fixed:
        st.fixed[3] = True
        st.fixed[50] = True
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
        st.l_max[:8] = st.rest[:8] * 0.9   # already past bound: no advance
    if local:
        for i in (2, 99, 380):
            if local == "cp":
                sim.masses[i].addConstraint(CONTACT_PLANE, Vec(0, 1, 2),
                                            -0.3)
            elif local == "ball":
                sim.masses[i].addConstraint(BALL, Vec(0, 0, 2.5), 0.7)
            elif local == "pl":
                sim.masses[i].addConstraint(CONSTRAINT_PLANE, Vec(0, 0, 1),
                                            0.3)
            elif local == "dir":
                sim.masses[i].addConstraint(DIRECTION, Vec(1, 0, 0), 0.2)
    if nonuniform:
        rng = np.random.RandomState(0)
        st.k[: st.n_springs] *= 1.0 + 0.1 * rng.rand(st.n_springs)
        st.rest[: st.n_springs] *= 1.0 + 0.01 * rng.rand(st.n_springs)
    if cross_actuated:
        i0 = st.n_springs - 4
        st.s_type[i0: i0 + 2] = ACTUATED_EXPAND
        st.l_max[i0: i0 + 2] = st.rest[i0: i0 + 2] * 1.001
        st.rate[i0: i0 + 2] = 0.6
        st.s_type[i0 + 2: i0 + 3] = ACTUATED_CONTRACT
        st.l_min[i0 + 2: i0 + 3] = st.rest[i0 + 2: i0 + 3] * 0.5
        st.rate[i0 + 2: i0 + 3] = 0.8
    if magnets:
        # fat shell magnets + pull-only attractors spread across tiles
        # (test_adjoint.py's magnet conditioning, scaled to this lattice)
        nm = st.n_masses
        for i in (0, 3, nm // 4, nm // 2, 2 * nm // 3, nm - 40):
            st.mag_rad[i] = 0.35
            st.mag_stiffness[i] = 5.0
        for i in (0, 3, 9, nm // 4, nm // 4 + 10, nm // 2,
                  2 * nm // 3, 2 * nm // 3 + 13, nm - 40, nm - 30):
            st.mag_maxf[i] = 0.5
            st.mag_scale[i] = 1.0
    sim._T = 0.0
    sim._marshal()
    return sim


VARIANTS = {
    "plain": dict(),
    "damping_friction": dict(damping=12.0, friction=True),
    "drag_clamp": dict(drag=0.3, clamp=True),
    "fixed_deleted": dict(fixed=True, deleted=True, damping=12.0),
    "breathing": dict(breathing=True, damping=12.0),
    "actuated": dict(actuated=True, damping=12.0),
    "verlet": dict(integrator="verlet", damping=12.0, friction=True),
    "rk2": dict(integrator="rk2", damping=12.0, friction=True),
    "local_cp": dict(local="cp", damping=12.0),
    "local_dir": dict(local="dir", drag=0.2),
    "nonuniform": dict(nonuniform=True, damping=12.0),
    # glue scenes: magnet/remainder forces enter the kernel through its
    # per-step constant-force input; the backward routes the traced cf
    # cotangent through jax.vjp of the same glue
    "remainder_glue": dict(cross=True, damping=12.0),
    "magnet_glue": dict(magnets=True, damping=12.0),
    "glue_verlet": dict(cross=True, magnets=True, integrator="verlet",
                        damping=12.0),
    "glue_everything": dict(cross=True, magnets=True, damping=12.0,
                            friction=True, drag=0.2, fixed=True,
                            deleted=True),
    # RK2 glue: the SPLIT backward (pass-2 kernel -> midpoint glue vjp
    # -> pass-1 kernel)
    "rk2_remainder_glue": dict(cross=True, cross_actuated=True,
                               integrator="rk2", damping=12.0),
    "rk2_magnet_glue": dict(magnets=True, integrator="rk2",
                            damping=12.0),
    "rk2_glue_everything": dict(cross=True, magnets=True,
                                integrator="rk2", damping=12.0,
                                friction=True, drag=0.2),
}


def _check_grads(sim, steps, seg, atol=2e-4):
    shape, state = sim._shape, sim._state
    r = adjoint_tiled.tiled_adjoint_reject_reason(shape)
    assert r is None, r
    rng = np.random.RandomState(0)
    n = sim._store.n_masses
    npad = state.masses.pos.shape[1]
    wpos = jnp.asarray(rng.normal(0, 1, (3, npad)),
                       jnp.float32).at[:, n:].set(0.0)
    wvel = jnp.asarray(rng.normal(0, 1, (3, npad)),
                       jnp.float32).at[:, n:].set(0.0)

    def mk(rollout):
        def f(pos0, vel0, k, rest):
            s = dataclasses.replace(
                state,
                masses=dataclasses.replace(state.masses, pos=pos0,
                                           vel=vel0),
                stencil=dataclasses.replace(state.stencil, k=k, rest=rest))
            out = rollout(s)
            return (jnp.sum(out.masses.pos * wpos)
                    + jnp.sum(out.masses.vel * wvel))
        return f

    f_t = mk(lambda s: adjoint_tiled.tiled_adjoint_rollout(
        shape, s, steps, segment=seg))
    f_x = mk(lambda s: diff.rollout(xla_only_shape(shape), s, steps))
    m, stc = state.masses, state.stencil
    args = (m.pos, m.vel, stc.k, stc.rest)
    gt = jax.grad(f_t, argnums=(0, 1, 2, 3))(*args)
    gx = jax.grad(f_x, argnums=(0, 1, 2, 3))(*args)
    for name, a, x in zip(("pos", "vel", "k", "rest"), gt, gx):
        a, x = np.asarray(a), np.asarray(x)
        scale = max(np.abs(x).max(), 1e-8)
        err = float((np.abs(a - x) / scale).max())
        assert err < atol, (name, err)


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_tiled_adjoint_matches_xla(variant, monkeypatch):
    _interpret(monkeypatch)
    sim = _scene(**VARIANTS[variant])
    # 80x6x6 = 2880 masses; tile 1024 -> 3 tiles, so the transpose's
    # halo-window gather crosses tile boundaries
    assert adjoint_tiled._geom(sim._shape)[4] >= 2
    _check_grads(sim, steps=4, seg=2)


def test_multi_segment_scan(monkeypatch):
    """Several custom_vjp segments chained through lax.scan."""
    _interpret(monkeypatch)
    sim = _scene(damping=12.0, friction=True)
    _check_grads(sim, steps=6, seg=2)


def test_param_grads_flow(monkeypatch):
    """m / extern_force / drag / g gradients reach their leaves (shape
    and nonzero checks; value correctness is covered by the XLA pin on
    pos/vel/k/rest plus assemble_ct being shared with the VMEM adjoint
    whose full leaf set is pinned in test_adjoint.py)."""
    _interpret(monkeypatch)
    sim = _scene(drag=0.3, damping=12.0)
    shape, state = sim._shape, sim._state
    n = sim._store.n_masses

    def f(m_, ext, drag_, g_):
        s = dataclasses.replace(
            state,
            masses=dataclasses.replace(state.masses, m=m_,
                                       extern_force=ext, drag=drag_),
            g=g_)
        out = adjoint_tiled.tiled_adjoint_rollout(shape, s, 4, segment=2)
        return jnp.sum(out.masses.pos[:, :n])

    ms = state.masses
    gm, gext, gdrag, gg = jax.grad(f, argnums=(0, 1, 2, 3))(
        ms.m, ms.extern_force, ms.drag, state.g)
    assert gm.shape == ms.m.shape and float(jnp.abs(gm[:n]).max()) > 0
    assert gext.shape == ms.extern_force.shape
    assert float(jnp.abs(gext[:, :n]).max()) > 0
    assert float(jnp.abs(gdrag[:n]).max()) > 0
    assert gg.shape == (3,) and float(jnp.abs(gg).max()) > 0


def test_trace_replay_is_bitwise_primal(monkeypatch):
    """The trace replay must consume exactly the states the primal tiled
    chunk produced (gradient correctness transposes THAT trajectory)."""
    _interpret(monkeypatch)
    sim = _scene(damping=12.0, friction=True)
    shape, state = sim._shape, sim._state
    seg = 3
    trace, rtrace = adjoint_tiled.build_tiled_trace(shape, seg)(state)
    assert rtrace is None
    _, hw, _, _, _, n_t = adjoint_tiled._geom(shape)
    n = shape.n_masses
    chunk = pallas_tiled.build_tiled_chunk(shape)
    s = state
    for i in range(seg):
        # per-step trace = 6 planes; mega trace = 9 (pos 0:3 / vel 3:6
        # in both)
        flat = np.asarray(trace[i]).reshape(trace.shape[1], n_t + 2 * hw)
        got = flat[:, hw:hw + n]
        np.testing.assert_array_equal(got[0:3],
                                      np.asarray(s.masses.pos)[:, :n])
        np.testing.assert_array_equal(got[3:6],
                                      np.asarray(s.masses.vel)[:, :n])
        s = chunk(s, 1)


def test_mega_adjoint_trace_is_bitwise_primal(monkeypatch):
    """With the segment a multiple of the primal mega segment, the trace
    replay runs megatrace launches that must reproduce the primal's
    states bitwise (same kernel math, same per-launch scalars)."""
    monkeypatch.setenv("TITAN_MEGA_SEG", "4")
    _interpret(monkeypatch)
    sim = _scene(damping=12.0)
    shape, state = sim._shape, sim._state
    assert adjoint_tiled._mega_adjoint_ok(shape)
    seg = 8                               # 2 megatrace launches of 4
    trace, rtrace = adjoint_tiled.build_tiled_trace(shape, seg)(state)
    assert rtrace is None
    assert trace.shape[0] == seg + 1 and trace.shape[1] == 9
    _, hw, _, _, _, n_t = adjoint_tiled._geom(shape)
    n = shape.n_masses
    chunk = pallas_tiled.build_tiled_chunk(shape)
    s = state
    for i in range(seg):
        flat = np.asarray(trace[i]).reshape(9, n_t + 2 * hw)
        got = flat[:, hw:hw + n]
        np.testing.assert_array_equal(got[0:3],
                                      np.asarray(s.masses.pos)[:, :n])
        np.testing.assert_array_equal(got[3:6],
                                      np.asarray(s.masses.vel)[:, :n])
        s = chunk(s, 1)


@pytest.mark.parametrize("variant", ["plain", "damping_friction",
                                     "verlet", "breathing", "actuated"])
def test_mega_adjoint_grads_match_xla(variant, monkeypatch):
    """Gradients through the round-5 mega adjoint (megatrace launches +
    the one-launch reverse-sweep backward) vs jax.grad of the XLA path.
    TITAN_MEGA_SEG=4 so seg=8 exercises real resident-grid launches."""
    monkeypatch.setenv("TITAN_MEGA_SEG", "4")
    _interpret(monkeypatch)
    sim = _scene(**VARIANTS[variant])
    assert adjoint_tiled._mega_adjoint_ok(sim._shape)
    _check_grads(sim, 8, 8)


def test_mega_adjoint_matches_per_step_backward(monkeypatch):
    """The mega backward is the per-step backward re-orchestrated (same
    per-cell math, same accumulation order); its gradients must match the
    TITAN_MEGA_ADJ=0 path to interpret-fusion ulps."""
    _interpret(monkeypatch)
    monkeypatch.setenv("TITAN_MEGA_SEG", "4")
    sim = _scene(damping=12.0, friction=True)
    shape, state = sim._shape, sim._state
    rng = np.random.RandomState(0)
    n = sim._store.n_masses
    npad = state.masses.pos.shape[1]
    w = jnp.asarray(rng.normal(0, 1, (3, npad)),
                    jnp.float32).at[:, n:].set(0.0)

    def loss(s):
        out = adjoint_tiled.tiled_adjoint_rollout(shape, s, 8, segment=8)
        return jnp.sum(out.masses.pos * w)

    def grads():
        adjoint_tiled._tiled_adjoint_segment_cached.cache_clear()
        return jax.grad(
            lambda p: loss(dataclasses.replace(
                state, masses=dataclasses.replace(state.masses, pos=p))))(
            state.masses.pos)

    monkeypatch.setenv("TITAN_MEGA_ADJ", "1")
    g_mega = np.asarray(grads())
    monkeypatch.setenv("TITAN_MEGA_ADJ", "0")
    g_step = np.asarray(grads())
    scale = max(np.abs(g_step).max(), 1e-8)
    assert float((np.abs(g_mega - g_step) / scale).max()) < 1e-5


def test_trace_replay_glue_is_bitwise_primal(monkeypatch):
    """Glue scenes: the trace replay's per-step total cf and remainder
    rest must also be exactly the primal chunk's (the backward
    re-linearizes the glue at the traced values)."""
    _interpret(monkeypatch)
    sim = _scene(cross=True, cross_actuated=True, magnets=True,
                 damping=12.0)
    shape, state = sim._shape, sim._state
    seg = 3
    trace, rtrace = adjoint_tiled.build_tiled_trace(shape, seg)(state)
    _, hw, _, _, _, n_t = adjoint_tiled._geom(shape)
    n = shape.n_masses
    chunk = pallas_tiled.build_tiled_chunk(shape)
    s = state
    for i in range(seg):
        flat = np.asarray(trace[i]).reshape(9, n_t + 2 * hw)
        got = flat[:, hw:hw + n]
        np.testing.assert_array_equal(got[0:3],
                                      np.asarray(s.masses.pos)[:, :n])
        np.testing.assert_array_equal(got[3:6],
                                      np.asarray(s.masses.vel)[:, :n])
        np.testing.assert_array_equal(np.asarray(rtrace[i]),
                                      np.asarray(s.springs.rest))
        s = chunk(s, 1)


def test_trace_replay_rk2_glue_is_bitwise_primal(monkeypatch):
    """RK2 glue: the 12-plane trace (pos, vel, cf_a, cf_b) and the
    2-row rest trace (rest_in, rest_mid) replay the primal bitwise."""
    _interpret(monkeypatch)
    sim = _scene(cross=True, cross_actuated=True, magnets=True,
                 integrator="rk2", damping=12.0)
    shape, state = sim._shape, sim._state
    seg = 2
    trace, rtrace = adjoint_tiled.build_tiled_trace(shape, seg)(state)
    _, hw, _, _, _, n_t = adjoint_tiled._geom(shape)
    n = shape.n_masses
    assert trace.shape[1] == 12 and rtrace.shape[1] == 2
    chunk = pallas_tiled.build_tiled_chunk(shape)
    s = state
    for i in range(seg):
        flat = np.asarray(trace[i]).reshape(12, n_t + 2 * hw)
        got = flat[:, hw:hw + n]
        np.testing.assert_array_equal(got[0:3],
                                      np.asarray(s.masses.pos)[:, :n])
        np.testing.assert_array_equal(got[3:6],
                                      np.asarray(s.masses.vel)[:, :n])
        # rest_in is the step's input rest; the per-pass cf planes and
        # rest_mid are pinned transitively by the gradient suite (any
        # drift fails the vs-XLA pins)
        np.testing.assert_array_equal(np.asarray(rtrace[i, 0]),
                                      np.asarray(s.springs.rest))
        s = chunk(s, 1)


def test_reject_reasons():
    sim = _scene(nx=40)
    shape = sim._shape
    assert adjoint_tiled.tiled_adjoint_supported(shape)
    # Euler/Verlet glue scenes are IN the envelope (traced-cf transpose)
    st = sim._store
    st.mag_rad[0] = 0.05
    st.mag_stiffness[0] = 100.0
    sim._marshal()
    assert adjoint_tiled.tiled_adjoint_supported(sim._shape)
    # RK2 glue scenes run the SPLIT backward (pass-2 kernel -> midpoint
    # glue vjp -> pass-1 kernel): in the envelope, with 2h windows
    sim_rk2 = _scene(nx=40, magnets=True, integrator="rk2")
    assert adjoint_tiled.tiled_adjoint_supported(sim_rk2._shape)
    assert adjoint_tiled._halo_mult(sim_rk2._shape) == 2
    assert adjoint_tiled._tr_planes(sim_rk2._shape) == 12
    # fused (non-glue) RK2 keeps the 4h window
    sim_rk2_plain = _scene(nx=40, integrator="rk2")
    assert adjoint_tiled._halo_mult(sim_rk2_plain._shape) == 4


def test_grad_rollout_routes_tiled(monkeypatch, caplog):
    """diff.grad_rollout picks the tiled adjoint for beyond-VMEM scenes
    inside its envelope (no fallback warning)."""
    import logging
    _interpret(monkeypatch)
    # force the scene out of the VMEM adjoint so routing reaches the
    # tiled tier (grad_rollout reads diff's imported reference)
    monkeypatch.setattr(
        diff, "adjoint_reject_reason",
        lambda shape: "forced-out-for-test")
    sim = _scene(damping=12.0)
    shape, state = sim._shape, sim._state
    with caplog.at_level(logging.WARNING, logger="titan_tpu"):
        out = diff.grad_rollout(shape, state, 2, segment=2)
    assert not [r for r in caplog.records if "falling back" in r.message]
    ref = adjoint_tiled.tiled_adjoint_rollout(shape, state, 2, segment=2)
    np.testing.assert_array_equal(np.asarray(out.masses.pos),
                                  np.asarray(ref.masses.pos))


def test_tiled_remainder_glue_param_grads(monkeypatch):
    """Glue remainder springs: per-spring k/rest/omega/rate gradients
    onto state.springs via the traced-cf transpose (the per-step jax.vjp
    of the glue), including the actuated rest's reverse chain seeded by
    the chunk-output rest cotangent -- against jax.grad of the
    independent XLA path."""
    _interpret(monkeypatch)
    sim = _scene(cross=True, cross_actuated=True, damping=12.0)
    shape, state = sim._shape, sim._state
    assert shape.has_remainder
    assert adjoint_tiled.tiled_adjoint_supported(shape), \
        adjoint_tiled.tiled_adjoint_reject_reason(shape)

    n = sim._store.n_masses
    rng = np.random.RandomState(5)
    npad = state.masses.pos.shape[1]
    wpos = jnp.asarray(rng.normal(0, 1, (3, npad)),
                       jnp.float32).at[:, n:].set(0.0)
    wrest_e = jnp.asarray(rng.normal(0, 1, state.springs.rest.shape),
                          jnp.float32)

    def run(rollout_fn, pos0, sk, srest, somega, srate):
        st = dataclasses.replace(
            state,
            masses=dataclasses.replace(state.masses, pos=pos0),
            springs=dataclasses.replace(state.springs, k=sk, rest=srest,
                                        omega=somega, rate=srate))
        out = rollout_fn(st)
        # the mutated remainder-rest OUTPUT carries its own cotangent
        return (jnp.sum(out.masses.pos * wpos)
                + jnp.sum(out.springs.rest * wrest_e))

    args = (state.masses.pos, state.springs.k, state.springs.rest,
            state.springs.omega, state.springs.rate)
    g_t = jax.grad(
        lambda *a: run(lambda s: adjoint_tiled.tiled_adjoint_rollout(
            shape, s, 4, segment=2), *a),
        argnums=tuple(range(5)))(*args)
    g_x = jax.grad(
        lambda *a: run(lambda s: diff.rollout(xla_only_shape(shape), s, 4),
                       *a), argnums=tuple(range(5)))(*args)

    rem_ok = np.asarray(state.springs.valid
                        & state.masses.valid[state.springs.left]
                        & state.masses.valid[state.springs.right])
    for name, a, x in zip(("pos", "k", "rest", "omega", "rate"), g_t, g_x):
        a, x = np.asarray(a), np.asarray(x)
        if name == "pos":
            a, x = a[:, :n], x[:, :n]
        elif name in ("k", "rate"):
            a, x = a * rem_ok, x * rem_ok
        scale = max(np.abs(x).max(), 1e-8)
        err = float((np.abs(a - x) / scale).max())
        assert err < 5e-4, (name, err)


def test_tiled_magnet_glue_param_grads(monkeypatch):
    """Glue magnets: per-mass mag_rad/stiffness/maxf/scale gradients via
    the traced-cf transpose, against jax.grad of the XLA path."""
    _interpret(monkeypatch)
    sim = _scene(magnets=True, damping=12.0)
    shape, state = sim._shape, sim._state
    assert shape.has_magnets
    assert adjoint_tiled.tiled_adjoint_supported(shape), \
        adjoint_tiled.tiled_adjoint_reject_reason(shape)

    n = sim._store.n_masses
    rng = np.random.RandomState(9)
    npad = state.masses.pos.shape[1]
    wpos = jnp.asarray(rng.normal(0, 1, (3, npad)),
                       jnp.float32).at[:, n:].set(0.0)

    def run(rollout_fn, pos0, mrad, mstiff, mmaxf, mscale):
        st = dataclasses.replace(
            state,
            masses=dataclasses.replace(
                state.masses, pos=pos0, mag_rad=mrad,
                mag_stiffness=mstiff, mag_maxf=mmaxf, mag_scale=mscale))
        out = rollout_fn(st)
        return jnp.sum(out.masses.pos * wpos)

    m = state.masses
    args = (m.pos, m.mag_rad, m.mag_stiffness, m.mag_maxf, m.mag_scale)
    g_t = jax.grad(
        lambda *a: run(lambda s: adjoint_tiled.tiled_adjoint_rollout(
            shape, s, 4, segment=2), *a),
        argnums=tuple(range(5)))(*args)
    g_x = jax.grad(
        lambda *a: run(lambda s: diff.rollout(xla_only_shape(shape), s, 4),
                       *a), argnums=tuple(range(5)))(*args)

    vmask = np.asarray(state.masses.valid)
    names = ("pos", "mag_rad", "mag_stiffness", "mag_maxf", "mag_scale")
    for name, a, x in zip(names, g_t, g_x):
        a, x = np.asarray(a), np.asarray(x)
        if name == "pos":
            a, x = a[:, :n], x[:, :n]
        else:
            a, x = a * vmask, x * vmask
        scale = max(np.abs(x).max(), 1e-8)
        err = float((np.abs(a - x) / scale).max())
        assert err < 5e-4, (name, err)
