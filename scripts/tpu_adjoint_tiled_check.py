#!/usr/bin/env python
"""Hardware check: the TILED fused adjoint (ops/adjoint_tiled.py).

1. Gradient correctness vs jax.grad through the XLA step path on a 50^3
   lattice (125k masses / 1.5M springs, 4 tiles -- cross-tile gradient
   flow through real Mosaic windows), euler + rk2 + actuated variants.
2. fwd+bwd timing at 100^3 (1M masses / 12.7M springs): tiled adjoint vs
   diff.fast_rollout (tiled primal + XLA-recompute backward).

HORIZON NOTE (measured, 2026-08-18): the friction-contact variants use a
SHORT horizon because the comparison crosses two forward
implementations -- the adjoint differentiates the tiled kernel's own
trajectory (trace replay bitwise-pinned), jax.grad differentiates the
XLA step's, and their f32 trajectories drift ~1e-6 apart.  At a
static/kinetic friction select boundary that drift flips the branch and
the two (both correct) subgradients differ by O(1): at 50^3 x 20 steps,
783 of 375,000 gradient entries flipped (rel err 10) while a no-contact
20-step run matched to 1.8e-6 and the same friction scene at 4 steps
matched everywhere (scripts/tpu_adjoint_tiled_bisect*.py; the backward
kernel itself is BITWISE equal to its XLA window replica per tile).
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from titan_tpu import Simulation, SimConfig, Vec, diff
from titan_tpu.ops import adjoint_tiled
from titan_tpu.state import xla_only_shape


def build(n=50, integrator=None, actuated=False, friction=True):
    cfg = dict(velocity_clamp=False, host_store_dtype="float32")
    if integrator:
        from titan_tpu import Integrator
        cfg["integrator"] = Integrator(integrator)
    sim = Simulation(SimConfig(**cfg))
    sim.createLattice(Vec(0, 0, 1), Vec(4, 4, 4), n, n, n)
    sim.setAllSpringConstantValues(800.0)
    if friction:
        sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    # friction=False: NO plane at all -- see the horizon note above
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    st = sim._store
    st.rest[: st.n_springs] *= 1.03        # pre-stress (CLAUDE.md trap)
    st.damping[: st.n_springs] = 12.0
    if actuated:
        from titan_tpu import ACTUATED_EXPAND
        third = st.n_springs // 3
        st.s_type[:third] = ACTUATED_EXPAND
        st.l_max[:third] = st.rest[:third] * 1.2
        st.rate[:third] = 0.5
    sim._T = 0.0
    sim._marshal()
    r = adjoint_tiled.tiled_adjoint_reject_reason(sim._shape)
    assert r is None, r
    return sim


def check(tag, sim, steps=4, seg=2):
    shape, state = sim._shape, sim._state
    rng = np.random.RandomState(0)
    n = sim._store.n_masses
    npad = state.masses.pos.shape[1]
    w = jnp.asarray(rng.normal(0, 1, (3, npad)),
                    jnp.float32).at[:, n:].set(0.0)

    def mk(rollout):
        def f(pos0, k, rest):
            s = dataclasses.replace(
                state,
                masses=dataclasses.replace(state.masses, pos=pos0),
                stencil=dataclasses.replace(state.stencil, k=k,
                                            rest=rest))
            out = rollout(s)
            return jnp.sum(out.masses.pos * w)
        return f

    f_t = mk(lambda s: adjoint_tiled.tiled_adjoint_rollout(
        shape, s, steps, segment=seg))
    f_x = mk(lambda s: diff.rollout(xla_only_shape(shape), s, steps))
    m, stc = state.masses, state.stencil
    args = (m.pos, stc.k, stc.rest)
    gt = jax.jit(jax.grad(f_t, argnums=(0, 1, 2)))(*args)
    gx = jax.jit(jax.grad(f_x, argnums=(0, 1, 2)))(*args)
    for name, a, x in zip(("pos", "k", "rest"), gt, gx):
        a, x = np.asarray(jax.device_get(a)), np.asarray(jax.device_get(x))
        if name == "pos":
            a, x = a[:, :n], x[:, :n]
        scale = max(np.abs(x).max(), 1e-8)
        err = float((np.abs(a - x) / scale).max())
        print(json.dumps({"check": f"adjoint_tiled[{tag}:{name}]",
                          "rel_maxabs_err": err}), flush=True)
        assert err < 2e-3, (tag, name, err)


def timing():
    sim = build(n=100, friction=True)
    shape, state = sim._shape, sim._state
    n_steps, seg = 200, 50

    def mk(rollout, steps):
        def f(pos0):
            s = dataclasses.replace(
                state, masses=dataclasses.replace(state.masses, pos=pos0))
            return jnp.sum(rollout(s, steps).masses.pos)
        return jax.jit(jax.grad(f))

    g_adj = mk(lambda s, st: adjoint_tiled.tiled_adjoint_rollout(
        shape, s, st, segment=seg), n_steps)
    runs = [("tiled_adjoint", g_adj, n_steps)]
    try:
        g_fast = mk(lambda s, st: diff.fast_rollout(shape, s, st,
                                                    segment=10), 100)
        runs.append(("fast_xla_bwd", g_fast, 100))
    except Exception as e:                      # pragma: no cover
        print(json.dumps({"note": f"fast_rollout build failed: {e}"}))
    for tag, fn, steps in runs:
        try:
            out = fn(state.masses.pos)
            np.asarray(jax.device_get(out[0, 0]))      # sync
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                out = fn(state.masses.pos)
            np.asarray(jax.device_get(out[0, 0]))
            dt_ = (time.perf_counter() - t0) / reps
            print(json.dumps({
                "timing": f"tiled100_{tag}",
                "fwd_bwd_steps_per_s": steps / dt_,
                "n_springs": 12731796,
            }), flush=True)
        except Exception as e:                  # pragma: no cover
            print(json.dumps({"note": f"{tag} failed: {e!r}"}), flush=True)


def main():
    check("euler", build())
    check("rk2", build(integrator="rk2"))
    check("actuated", build(actuated=True))
    # long horizon without contact: 20 steps across two scanned segments
    check("euler_nocontact", build(friction=False), steps=20, seg=10)
    timing()
    print("TILED adjoint hardware check OK", flush=True)


if __name__ == "__main__":
    main()
