#!/usr/bin/env python
"""Hardware check: the DISTRIBUTED adjoint on real Mosaic (1-dev mesh).

The CPU suite proves the multi-shard exchanges (8-virtual-device mesh,
bitwise vs the single-device tiled adjoint); this script proves the same
composed program -- shard_map + per-shard trace replay + backward tile
kernel + ppermuted halo windows -- compiles and runs on the REAL TPU,
bitwise against the single-device tiled adjoint, and times the overhead
of the distributed wrapper at a 50^3 scene.
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

from jax.sharding import Mesh

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.ops import adjoint_tiled
from titan_tpu.parallel import halo_adjoint


def build(n=50, integrator=None):
    cfg = dict(velocity_clamp=False, host_store_dtype="float32")
    if integrator:
        from titan_tpu import Integrator
        cfg["integrator"] = Integrator(integrator)
    sim = Simulation(SimConfig(**cfg))
    sim.createLattice(Vec(0, 0, 1), Vec(4, 4, 4), n, n, n)
    sim.setAllSpringConstantValues(800.0)
    sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    st = sim._store
    st.rest[: st.n_springs] *= 1.03
    st.damping[: st.n_springs] = 12.0
    sim._T = 0.0
    sim._marshal()
    return sim


def grads(sim, rollout):
    shape, state = sim._shape, sim._state
    rng = np.random.RandomState(0)
    n = sim._store.n_masses
    npad = state.masses.pos.shape[1]
    w = jnp.asarray(rng.normal(0, 1, (3, npad)),
                    jnp.float32).at[:, n:].set(0.0)

    def f(pos0, k, rest):
        s = dataclasses.replace(
            state,
            masses=dataclasses.replace(state.masses, pos=pos0),
            stencil=dataclasses.replace(state.stencil, k=k, rest=rest))
        return jnp.sum(rollout(s).masses.pos * w)

    m, stc = state.masses, state.stencil
    return jax.jit(jax.grad(f, argnums=(0, 1, 2)))(m.pos, stc.k, stc.rest)


def main():
    mesh = Mesh(np.array(jax.devices()[:1]), ("shard",))
    for tag in ("euler", "rk2"):
        sim = build(integrator=None if tag == "euler" else tag)
        shape = sim._shape
        r = halo_adjoint.halo_adjoint_reject_reason(shape, 1)
        assert r is None, r
        steps, seg = 4, 2
        g_d = grads(sim, lambda s: halo_adjoint.halo_adjoint_rollout(
            shape, s, mesh, steps, segment=seg))
        g_s = grads(sim, lambda s: adjoint_tiled.tiled_adjoint_rollout(
            shape, s, steps, segment=seg))
        n = sim._store.n_masses
        for name, a, x in zip(("pos", "k", "rest"), g_d, g_s):
            a = np.asarray(jax.device_get(a))
            x = np.asarray(jax.device_get(x))
            eq = bool((a[..., :n] == x[..., :n]).all())
            print(json.dumps({"check": f"halo_adjoint[{tag}:{name}]",
                              "bitwise_equal": eq}), flush=True)
            assert eq, (tag, name,
                        float(np.abs(a[..., :n] - x[..., :n]).max()))

    # timing: distributed wrapper overhead at 50^3, 200 steps
    sim = build()
    shape, state = sim._shape, sim._state
    n_steps, seg = 200, 50

    def mk(rollout):
        def f(pos0):
            s = dataclasses.replace(
                state, masses=dataclasses.replace(state.masses, pos=pos0))
            return jnp.sum(rollout(s).masses.pos)
        return jax.jit(jax.grad(f))

    g_d = mk(lambda s: halo_adjoint.halo_adjoint_rollout(
        shape, s, mesh, n_steps, segment=seg))
    g_s = mk(lambda s: adjoint_tiled.tiled_adjoint_rollout(
        shape, s, n_steps, segment=seg))
    for tag, fn in (("halo_adjoint_1dev", g_d), ("tiled_adjoint", g_s)):
        out = fn(state.masses.pos)
        np.asarray(jax.device_get(out[0, 0]))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = fn(state.masses.pos)
        np.asarray(jax.device_get(out[0, 0]))
        dt_ = (time.perf_counter() - t0) / reps
        print(json.dumps({"timing": f"adj50_{tag}",
                          "fwd_bwd_steps_per_s": n_steps / dt_}),
              flush=True)
    print("HALO adjoint hardware check OK", flush=True)


if __name__ == "__main__":
    main()
