#!/usr/bin/env python
"""TPU hardware check of the tiled kernel's RK2 path (late round 3: two
pallas launches per step -- midpoint predictor + corrector).

Interpret-mode equivalence is pinned by tests/test_pallas_tiled.py; this
drives the REAL Mosaic lowering on one chip: a small RK2 scene (with
damping, friction plane, and actuated springs) run through
build_tiled_chunk vs the XLA step path in one process, plus a step-rate
reading at a beyond-VMEM 100^3 RK2 scene -- the scene class that used to
fall off both kernels to the ~5x-slower XLA path.
"""
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

from titan_tpu import ACTUATED_EXPAND, Integrator, Simulation, SimConfig, Vec
from titan_tpu.ops import pallas_tiled
from titan_tpu.ops.step import build_step_fn


def sync(st):
    return float(jax.device_get(st.t))


def build(nx, ny, nz, extent):
    sim = Simulation(SimConfig(integrator=Integrator.RK2,
                               host_store_dtype="float32"))
    sim.createLattice(Vec(0, 0, extent[2] + 1), Vec(*extent), nx, ny, nz)
    sim.setAllSpringConstantValues(1000.0)
    sim.defaultRestLengths()
    st = sim._store
    st.damping[: st.n_springs] = 0.3
    third = st.n_springs // 3
    st.s_type[:third] = ACTUATED_EXPAND
    st.l_max[:third] = st.rest[:third] * 1.1
    st.rate[:third] = 0.5
    sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim._T = 0.0
    sim._marshal()
    return sim


# --- correctness: tiled RK2 vs XLA RK2 on hardware (small scene) ---
sim = build(40, 6, 6, (4, 1, 1))
reason = pallas_tiled.tiled_reject_reason(sim._shape)
assert reason is None, reason
tiled = pallas_tiled.build_tiled_chunk(sim._shape)
step = build_step_fn(sim._shape)
xla = jax.jit(lambda s, k: jax.lax.fori_loop(0, k, lambda i, ss: step(ss), s))

out_t = tiled(sim._state, jnp.int32(50))
out_x = xla(sim._state, jnp.int32(50))
n = sim._store.n_masses
pt = np.asarray(out_t.masses.pos)[:, :n]
px = np.asarray(out_x.masses.pos)[:, :n]
vt = np.asarray(out_t.masses.vel)[:, :n]
vx = np.asarray(out_x.masses.vel)[:, :n]
pos_err = float(np.max(np.abs(pt - px)))
vel_err = float(np.max(np.abs(vt - vx)))
rest_err = float(np.max(np.abs(np.asarray(out_t.stencil.rest)
                               - np.asarray(out_x.stencil.rest))))
print(json.dumps({"check": "tiled_rk2_vs_xla_50_steps",
                  "pos_maxabs_err": pos_err, "vel_maxabs_err": vel_err,
                  "rest_maxabs_err": rest_err}), flush=True)
assert pos_err < 1e-4 and rest_err < 1e-5, (pos_err, vel_err, rest_err)

# --- rate: 100^3 RK2 (beyond-VMEM; previously XLA-only) ---
nx = int(os.environ.get("TITAN_BENCH_NX", "100"))
big = build(nx, nx, nx, (4, 4, 4))
reason = pallas_tiled.tiled_reject_reason(big._shape)
assert reason is None, reason
chunk = pallas_tiled.build_tiled_chunk(big._shape, donate=True)
state = big._state
t0 = time.perf_counter()
state = chunk(state, jnp.int32(1))
sync(state)
compile_s = time.perf_counter() - t0
state = chunk(state, jnp.int32(100))
sync(state)
steps = int(os.environ.get("TITAN_AB_STEPS", "600"))
t0 = time.perf_counter()
state = chunk(state, jnp.int32(steps))
sync(state)
el = time.perf_counter() - t0
n_springs = big._store.n_springs
print(json.dumps({
    "check": f"tiled_rk2_rate_{nx}^3", "steps_per_sec": round(steps / el, 1),
    "springs_per_sec": round(n_springs * steps / el),
    "compile_s": round(compile_s, 1)}), flush=True)
