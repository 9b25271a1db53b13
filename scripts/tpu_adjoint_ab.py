#!/usr/bin/env python
"""TPU check + A/B of the fused adjoint kernel (ops/adjoint.py).

1. Correctness on hardware: adjoint_rollout gradients (Mosaic kernels)
   vs jax.grad through the XLA step path at 20^3 with plane friction +
   damping + clamp.
2. Perf A/B at the 1M-spring bench scene (43^3): fwd+bwd steps/s through
   adjoint_rollout vs diff.fast_rollout (fused primal, XLA-recompute
   backward -- the round-3 state of the art, measured 739 steps/s).
   One process, same scene, interleaved.
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


def build(nx, clamp=True, breathing=False, integrator=None):
    cfg = dict(velocity_clamp=clamp, host_store_dtype="float32")
    if integrator:
        from titan_tpu import Integrator
        cfg["integrator"] = Integrator(integrator)
    sim = Simulation(SimConfig(**cfg))
    sim.createLattice(Vec(0, 0, 5), Vec(4, 4, 4), nx, nx, nx)
    sim.setAllSpringConstantValues(1000.0)
    st = sim._store
    st.damping[: st.n_springs] = 0.3
    st.rest[: st.n_springs] *= 1.03     # pre-stress: real spring grads
    if breathing:
        from titan_tpu import ACTIVE_CONTRACT_THEN_EXPAND
        half = st.n_springs // 2
        st.s_type[:half] = ACTIVE_CONTRACT_THEN_EXPAND
        st.omega[:half] = 7.0
    sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim._T = 0.0
    sim._marshal()
    assert adjoint.adjoint_supported(sim._shape), \
        adjoint.adjoint_reject_reason(sim._shape)
    return sim


def loss_fn(shape, state, rollout, wpos, wvel):
    def f(pos0, vel0):
        st = dataclasses.replace(
            state, masses=dataclasses.replace(state.masses, pos=pos0,
                                              vel=vel0))
        out = rollout(st)
        return (jnp.sum(out.masses.pos * wpos)
                + jnp.sum(out.masses.vel * wvel))
    return f


# --- correctness at 20^3: euler / breathing / verlet ---
for tag, kw in (("euler", {}), ("breathing", dict(breathing=True)),
                ("verlet", dict(integrator="verlet")),
                ("rk2", dict(integrator="rk2"))):
    sim = build(20, **kw)
    shape, state = sim._shape, sim._state
    rng = np.random.RandomState(0)
    npad = state.masses.pos.shape[1]
    n = sim._store.n_masses
    wpos = jnp.asarray(rng.normal(0, 1, (3, npad)), jnp.float32
                       ).at[:, n:].set(0.0)
    wvel = jnp.asarray(rng.normal(0, 1, (3, npad)), jnp.float32
                       ).at[:, n:].set(0.0)

    f_adj = loss_fn(shape, state,
                    lambda s: adjoint.adjoint_rollout(shape, s, 40,
                                                      segment=20),
                    wpos, wvel)
    f_xla = loss_fn(shape, state,
                    lambda s: diff.rollout(xla_only_shape(shape), s, 40),
                    wpos, wvel)
    ga = jax.jit(jax.grad(f_adj, argnums=(0, 1)))(state.masses.pos,
                                                  state.masses.vel)
    gx = jax.jit(jax.grad(f_xla, argnums=(0, 1)))(state.masses.pos,
                                                  state.masses.vel)
    for name, a, x in zip(("pos", "vel"), ga, gx):
        a = np.asarray(a)[:, :n]
        x = np.asarray(x)[:, :n]
        scale = max(np.abs(x).max(), 1e-8)
        err = float(np.max(np.abs(a - x)) / scale)
        print(json.dumps({"check": f"adjoint_vs_xla_grad_20^3"
                                   f"[{tag}:{name}]",
                          "rel_maxabs_err": err}), flush=True)
        assert err < 1e-3, err

# --- perf A/B at 43^3 (the 1M-spring bench scene) ---
big = build(43)
shape, state = big._shape, big._state
npad = state.masses.pos.shape[1]
wpos = jnp.ones((3, npad), jnp.float32)
wvel = jnp.zeros((3, npad), jnp.float32)

STEPS = int(os.environ.get("TITAN_AB_STEPS", "500"))
SEG = int(os.environ.get("TITAN_AB_SEG", "100"))

runs = {
    "adjoint_kernel": lambda s: adjoint.adjoint_rollout(
        shape, s, STEPS, segment=SEG),
    "adjoint_kernel_nostash": lambda s: adjoint.adjoint_rollout(
        shape, s, STEPS, segment=SEG, _famstash=False),
    "fast_rollout_xla_bwd": lambda s: diff.fast_rollout(
        shape, s, STEPS, segment=SEG),
}
for name, ro in runs.items():
    f = loss_fn(shape, state, ro, wpos, wvel)
    gfn = jax.jit(jax.grad(f, argnums=(0, 1)))
    t0 = time.perf_counter()
    g = gfn(state.masses.pos, state.masses.vel)
    jax.device_get(g[0][0, 0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    g = gfn(state.masses.pos, state.masses.vel)
    jax.device_get(g[0][0, 0])
    el = time.perf_counter() - t0
    print(json.dumps({
        "path": name, "fwdbwd_steps_per_sec": round(STEPS / el, 1),
        "spring_grad_updates_per_sec": round(big._store.n_springs
                                             * STEPS / el),
        "grad_finite": bool(np.isfinite(np.asarray(g[0])).all()),
        "compile_s": round(compile_s, 1)}), flush=True)
