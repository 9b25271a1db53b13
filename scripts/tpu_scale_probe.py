#!/usr/bin/env python
"""Single-chip scale probe: nx^3 lattice through the shipped chunk path
(tiled kernel at this scale).  One size per process (a TPU worker crash
poisons the session); prints one JSON line on success.

Round-3 context: 130^3 = 904 steps/s, 160^3 = 446, 200^3 crashes the
worker reproducibly -- this script bisects the cliff edge.
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


def sync(st):
    return float(jax.device_get(st.t))


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 170
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
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
    n_springs = sim._store.n_springs
    print(f"setup {time.perf_counter()-t0:.1f}s  nx={nx}  "
          f"springs={n_springs}", flush=True)

    chunk = build_chunk_fn(sim._shape, donate=True)
    state = sim._state
    t0 = time.perf_counter()
    state = chunk(state, jnp.int32(1))
    sync(state)
    compile_s = time.perf_counter() - t0
    print(f"compile+1st {compile_s:.1f}s", flush=True)
    state = chunk(state, jnp.int32(50))
    sync(state)
    t0 = time.perf_counter()
    state = chunk(state, jnp.int32(steps))
    sync(state)
    el = time.perf_counter() - t0
    print(json.dumps({"nx": nx, "steps_per_sec": round(steps / el, 1),
                      "springs_per_sec": round(n_springs * steps / el),
                      "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
