#!/usr/bin/env python
"""Single-process TPU A/B of the tiled chunk's fori_loop carry layout at
100^3 (12.7M springs, bench config).

"legacy" carries [3, n] state and pays per-step output slices + input
right-pads (~100 MB/step of tile-size-independent XLA copies -- the
suspected reason bigger tiles measured a wash in round 3); "padded"
(shipped) keeps the carry in the kernel's padded-flat [3, n_t] layout so
only the (h, h) halo pad of the windowed planes remains per step.

Timing order legacy -> padded -> legacy bounds run-to-run drift.
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
from titan_tpu.ops import pallas_tiled


def sync(st):
    return float(jax.device_get(st.t))


nx = int(os.environ.get("TITAN_BENCH_NX", "100"))
t0 = time.perf_counter()
sim = Simulation(SimConfig(host_store_dtype="float32"))
sim.createLattice(Vec(0, 0, 5), Vec(4, 4, 4), nx, nx, nx)
sim.setAllSpringConstantValues(1000.0)
sim.setTimeStep(0.0001)
sim.setGlobalAcceleration(Vec(0, 0, -9.8))
sim.defaultRestLengths()
sim.createPlane(Vec(0, 0, 1), 0)
sim._T = 0.0
sim._marshal()
print(f"setup {time.perf_counter()-t0:.1f}s  springs={sim._store.n_springs}",
      flush=True)

chunks = {}
for mode in ("legacy", "padded"):
    pallas_tiled.CARRY_MODE = mode
    chunks[mode] = pallas_tiled.build_tiled_chunk(sim._shape)
pallas_tiled.CARRY_MODE = "padded"

steps = int(os.environ.get("TITAN_AB_STEPS", "600"))
for mode in ("legacy", "padded", "legacy"):
    chunk = chunks[mode]
    state = sim._state
    t0 = time.perf_counter()
    state = chunk(state, jnp.int32(1))
    sync(state)
    compile_s = time.perf_counter() - t0
    state = chunk(state, jnp.int32(100))
    sync(state)
    t0 = time.perf_counter()
    state = chunk(state, jnp.int32(steps))
    sync(state)
    el = time.perf_counter() - t0
    print(json.dumps({
        "carry": mode, "steps_per_sec": round(steps / el, 1),
        "springs_per_sec": round(sim._store.n_springs * steps / el),
        "compile_s": round(compile_s, 1)}), flush=True)
