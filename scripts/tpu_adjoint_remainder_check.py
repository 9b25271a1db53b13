#!/usr/bin/env python
"""Hardware check: remainder (irregular) springs in the fused adjoint
kernel.

adjoint_rollout gradients (Mosaic kernels, factorized one-hot MXU
gather/scatter transpose) vs jax.grad through the XLA step path on a
multi-agent-style scene: a grid of small lattices joined by cross-agent
links (the reference's multi-agent mechanism,
multiagent_unittest.cpp:29-35).  Covers per-spring k/rest gradients
onto state.springs plus pos/vel flow through the gather/scatter, for
euler, rk2, and ACTUATED_* cross links (rate gradients).  Ends with a
one-process fwd+bwd timing vs diff.fast_rollout on the same scene.
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
from titan_tpu.ops import adjoint
from titan_tpu.state import xla_only_shape


def build(agents=9, nx=5, links_per=8, integrator=None, actuated=False):
    """agents x nx^3 lattices in a row, linked by irregular springs
    between adjacent agents (random mass pairs -> remainder bucketing)."""
    cfg = dict(velocity_clamp=False, host_store_dtype="float32")
    if integrator:
        from titan_tpu import Integrator
        cfg["integrator"] = Integrator(integrator)
    sim = Simulation(SimConfig(**cfg))
    per = nx ** 3
    for a in range(agents):
        sim.createLattice(Vec(2.5 * a, 0, 5), Vec(1, 1, 1), nx, nx, nx)
    rng = np.random.RandomState(11)
    for a in range(agents - 1):
        for _ in range(links_per):
            i = a * per + int(rng.randint(per))
            j = (a + 1) * per + int(rng.randint(per))
            sim.createSpring(sim.getMassByIndex(i), sim.getMassByIndex(j))
    sim.setAllSpringConstantValues(800.0)
    st = sim._store
    st.damping[: st.n_springs] = 0.3
    st.rest[: st.n_springs] *= 1.03
    if actuated:
        from titan_tpu import ACTUATED_CONTRACT, ACTUATED_EXPAND
        i0 = st.n_springs - (agents - 1) * links_per
        half = i0 + (st.n_springs - i0) // 2
        st.s_type[i0:half] = ACTUATED_EXPAND
        st.l_max[i0:half] = st.rest[i0:half] * 1.001
        st.rate[i0:half] = 0.6
        st.s_type[half: st.n_springs] = ACTUATED_CONTRACT
        st.l_min[half: st.n_springs] = st.rest[half: st.n_springs] * 0.5
        st.rate[half: st.n_springs] = 0.8
    sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim._T = 0.0
    sim._marshal()
    assert sim._shape.has_remainder, "cross links must bucket as remainder"
    assert adjoint.adjoint_supported(sim._shape), \
        adjoint.adjoint_reject_reason(sim._shape)
    return sim


def check(tag, sim):
    shape, state = sim._shape, sim._state
    rng = np.random.RandomState(0)
    npad = state.masses.pos.shape[1]
    n = sim._store.n_masses
    wpos = jnp.asarray(rng.normal(0, 1, (3, npad)), jnp.float32
                       ).at[:, n:].set(0.0)
    wvel = jnp.asarray(rng.normal(0, 1, (3, npad)), jnp.float32
                       ).at[:, n:].set(0.0)
    wrest_e = jnp.asarray(rng.normal(0, 1, state.springs.rest.shape),
                          jnp.float32)

    def loss_fn(rollout):
        def f(pos0, vel0, sk, srest, srate):
            st = dataclasses.replace(
                state,
                masses=dataclasses.replace(state.masses, pos=pos0,
                                           vel=vel0),
                springs=dataclasses.replace(state.springs, k=sk,
                                            rest=srest, rate=srate))
            out = rollout(st)
            loss = (jnp.sum(out.masses.pos * wpos)
                    + jnp.sum(out.masses.vel * wvel))
            if shape.has_actuated:
                loss = loss + jnp.sum(out.springs.rest * wrest_e)
            return loss
        return f

    f_adj = loss_fn(lambda s: adjoint.adjoint_rollout(shape, s, 40,
                                                      segment=20))
    f_xla = loss_fn(lambda s: diff.rollout(xla_only_shape(shape), s, 40))
    args = (state.masses.pos, state.masses.vel, state.springs.k,
            state.springs.rest, state.springs.rate)
    ga = jax.jit(jax.grad(f_adj, argnums=(0, 1, 2, 3, 4)))(*args)
    gx = jax.jit(jax.grad(f_xla, argnums=(0, 1, 2, 3, 4)))(*args)
    rem_ok = np.asarray(state.springs.valid
                        & state.masses.valid[state.springs.left]
                        & state.masses.valid[state.springs.right])
    for name, a, x in zip(("pos", "vel", "k_e", "rest_e", "rate_e"),
                          ga, gx):
        a, x = np.asarray(a), np.asarray(x)
        if name in ("pos", "vel"):
            a, x = a[:, :n], x[:, :n]
        elif name in ("k_e", "rate_e"):
            a, x = a * rem_ok, x * rem_ok
        scale = max(np.abs(x).max(), 1e-8)
        err = float((np.abs(a - x) / scale).max())
        print(json.dumps({"check": f"adjoint_remainder[{tag}:{name}]",
                          "rel_maxabs_err": err}), flush=True)
        assert err < 2e-3, (tag, name, err)


def timing():
    """One-process fwd+bwd A/B: adjoint vs fast_rollout on a remainder
    scene (27 agents of 6^3 + 26*16 cross links)."""
    sim = build(agents=27, nx=6, links_per=16)
    shape, state = sim._shape, sim._state
    n_steps, seg = 400, 100

    def mk(rollout):
        def f(pos0):
            st = dataclasses.replace(
                state, masses=dataclasses.replace(state.masses, pos=pos0))
            out = rollout(st)
            return jnp.sum(out.masses.pos)
        return jax.jit(jax.grad(f))

    g_adj = mk(lambda s: adjoint.adjoint_rollout(shape, s, n_steps,
                                                 segment=seg))
    g_fast = mk(lambda s: diff.fast_rollout(shape, s, n_steps,
                                            segment=seg))
    for tag, fn in (("adjoint", g_adj), ("fast_xla_bwd", g_fast)):
        out = fn(state.masses.pos)
        np.asarray(jax.device_get(out[0, 0]))      # sync
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = fn(state.masses.pos)
        np.asarray(jax.device_get(out[0, 0]))
        dt_ = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "timing": f"remainder_{tag}",
            "fwd_bwd_steps_per_s": n_steps / dt_,
            "n_masses": int(sim._store.n_masses),
            "n_cross_links": int(np.asarray(shape.n_springs)),
        }), flush=True)


def main():
    for tag, kw in (("euler", {}), ("rk2", dict(integrator="rk2")),
                    ("actuated", dict(actuated=True))):
        check(tag, build(**kw))
    timing()
    print("REMAINDER adjoint hardware check OK", flush=True)


if __name__ == "__main__":
    main()
