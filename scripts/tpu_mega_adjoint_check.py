#!/usr/bin/env python
"""Hardware check: the MEGA adjoint (round 5, ops/adjoint_tiled.py).

1. Gradient correctness vs jax.grad through the XLA step path at 50^3
   (euler + verlet), with the trace replay running real megatrace
   launches and the backward a single reverse-sweep pallas_call per
   segment on Mosaic.
2. fwd+bwd timing at 100^3 (1M masses / 12.7M springs), one-process A/B:
   TITAN_MEGA_ADJ=1 (mega trace + mega backward) vs =0 (the round-4
   per-step trace replay + per-step backward launches, 284 steps/s in
   the round-4 record).

Same horizon rules as tpu_adjoint_tiled_check.py (short under contact).
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


def build(n=50, integrator=None, friction=True, damping=12.0):
    cfg = dict(velocity_clamp=False, host_store_dtype="float32")
    if integrator:
        from titan_tpu import Integrator
        cfg["integrator"] = Integrator(integrator)
    sim = Simulation(SimConfig(**cfg))
    sim.createLattice(Vec(0, 0, 1), Vec(4, 4, 4), n, n, n)
    sim.setAllSpringConstantValues(800.0)
    if friction:
        sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    st = sim._store
    st.rest[: st.n_springs] *= 1.03        # pre-stress (CLAUDE.md trap)
    if damping:
        st.damping[: st.n_springs] = damping
    sim._T = 0.0
    sim._marshal()
    assert adjoint_tiled._mega_adjoint_ok(sim._shape), \
        "mega adjoint did not engage"
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
        print(json.dumps({"check": f"mega_adjoint[{tag}:{name}]",
                          "rel_maxabs_err": err}), flush=True)
        assert err < 2e-3, (tag, name, err)


def timing():
    """One-process A/B at 100^3: mega adjoint vs the per-step adjoint."""
    sim = build(n=100, friction=True)
    shape, state = sim._shape, sim._state
    n_steps = 192

    def mk():
        def f(pos0):
            s = dataclasses.replace(
                state, masses=dataclasses.replace(state.masses, pos=pos0))
            return jnp.sum(adjoint_tiled.tiled_adjoint_rollout(
                shape, s, n_steps).masses.pos)
        return jax.jit(jax.grad(f))

    for mode in ("0", "1"):
        os.environ["TITAN_MEGA_ADJ"] = mode
        adjoint_tiled._tiled_adjoint_segment_cached.cache_clear()
        fn = mk()
        out = fn(state.masses.pos)
        np.asarray(jax.device_get(out[0, 0]))      # compile + sync
        t0 = time.perf_counter()
        out = fn(state.masses.pos)
        np.asarray(jax.device_get(out[0, 0]))
        dt_ = time.perf_counter() - t0
        print(json.dumps({
            "timing": ("mega_adjoint_100" if mode == "1"
                       else "per_step_adjoint_100"),
            "fwd_bwd_steps_per_s": round(n_steps / dt_, 1),
            "n_springs": 12731796,
        }), flush=True)
    os.environ.pop("TITAN_MEGA_ADJ", None)


def main():
    check("euler", build())
    check("verlet", build(integrator="verlet"))
    # long horizon without contact, multi-launch megatrace (seg = 16)
    simn = build(friction=False)
    check("euler_nocontact", simn, steps=32, seg=16)
    timing()
    print("MEGA adjoint hardware check OK", flush=True)


if __name__ == "__main__":
    main()
