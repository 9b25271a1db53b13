#!/usr/bin/env python
"""Single-process TPU A/B of VMEM-kernel lane-rotation modes.

Modes (SimConfig.pallas_rotation): 'vpu' (pltpu.roll), 'mxu' (gather+scatter
rotations as exact 3-term-bf16 permutation matmuls), 'hybrid' (gather MXU,
scatter VPU).  Also asserts small-scene trajectory bit-equality across modes
before timing.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.ops.step import build_chunk_fn


def build(nx, mode):
    sim = Simulation(SimConfig(host_store_dtype="float32",
                               pallas_rotation=mode))
    sim.createLattice(Vec(0, 0, 5), Vec(4, 4, 4), nx, nx, nx)
    sim.setAllSpringConstantValues(1000.0)
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.defaultRestLengths()
    sim.createPlane(Vec(0, 0, 1), 0)
    sim._T = 0.0
    sim._marshal()
    return sim


def sync(st):
    return float(jax.device_get(st.t))


MODES = os.environ.get("ROT_MODES", "vpu,hybrid,mxu").split(",")

# --- correctness: bit-equality at 9^3 over 500 steps ---
ref_pos = None
for mode in MODES:
    sim = build(9, mode)
    chunk = build_chunk_fn(sim._shape, donate=False)
    st = chunk(sim._state, jnp.int32(500))
    pos = jax.device_get(st.masses.pos)
    if ref_pos is None:
        ref_pos = pos
    else:
        same = bool((pos == ref_pos).all())
        print(f"bitcheck {mode} vs {MODES[0]}: {'IDENTICAL' if same else 'DIFFERS'}",
              flush=True)
        if not same:
            import numpy as np
            print("  max |d| =", float(abs(pos - ref_pos).max()), flush=True)

# --- perf: 43^3 in one process ---
for mode in MODES:
    sim = build(43, mode)
    chunk = build_chunk_fn(sim._shape, donate=True)
    state = sim._state
    t0 = time.perf_counter()
    state = chunk(state, jnp.int32(1))
    sync(state)
    compile_s = time.perf_counter() - t0
    state = chunk(state, jnp.int32(200))
    sync(state)
    steps = 2000
    t0 = time.perf_counter()
    state = chunk(state, jnp.int32(steps))
    sync(state)
    el = time.perf_counter() - t0
    print(json.dumps({"mode": mode, "steps_per_sec": round(steps / el, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)
