#!/usr/bin/env python
"""Single-process TPU A/B of tiled-kernel tile sizes at 100^3, POST
padded-carry.

The round-3 tile-size A/B (scripts/tpu_tiled_ab.py: 131072 vs the
max(4h, 32768) floor) measured a wash (1,424 vs 1,450 steps/s) -- but
that was with the legacy [3, n] fori carry whose tile-size-independent
per-step pad/slice glue was later shown to be the pace-setter (the
CARRY_MODE A/B, +19% from the padded-flat carry).  With the glue gone,
the halo-window work ratio (1.50x at the floor tile vs 1.21x at 131072
for 100^3) may now convert to wall time.  This script re-runs the same
comparison under the shipped padded carry, with timed windows long
enough to amortize the ~25 ms tunnel dispatch+readback latency
(CLAUDE.md: TIMED WINDOWS MUST BE LONG).

Timing order floor -> 2x -> 131072 -> floor bounds run-to-run drift.
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
print(f"setup {time.perf_counter()-t0:.1f}s  springs={sim._store.n_springs}"
      f"  carry={pallas_tiled.CARRY_MODE}", flush=True)

shipped = pallas_tiled._tile_size


def make_pick(mult=None, fixed=None):
    def pick(h, shape=None):
        t = (pallas_tiled._round_up(fixed, 1024) if fixed
             else mult * shipped(h, None))
        # respect the VMEM shrink guard so a bad pick can't crash the chip
        if shape is not None:
            floor = pallas_tiled._round_up(h, 1024)
            while (t > floor and pallas_tiled._vmem_bytes(shape, t, h)
                   >= pallas_tiled._VMEM_EST_BUDGET):
                t = pallas_tiled._round_up(max(t // 2, h), 1024)
        return t
    return pick


variants = [("floor", shipped), ("2x", make_pick(mult=2)),
            ("131072", make_pick(fixed=131072)), ("floor_again", shipped)]

for name, fn in variants:
    pallas_tiled._tile_size = fn
    chunk = pallas_tiled.build_tiled_chunk(sim._shape)
    state = sim._state
    t0 = time.perf_counter()
    state = chunk(state, jnp.int32(1))
    sync(state)
    compile_s = time.perf_counter() - t0
    state = chunk(state, jnp.int32(600))
    sync(state)
    steps = 6000            # ~3 s at ~2.2k steps/s; dispatch latency <1%
    t0 = time.perf_counter()
    state = chunk(state, jnp.int32(steps))
    sync(state)
    el = time.perf_counter() - t0
    print(json.dumps({"tile_mode": name,
                      "steps_per_sec": round(steps / el, 1),
                      "springs_per_sec": round(
                          sim._store.n_springs * steps / el),
                      "compile_s": round(compile_s, 1)}), flush=True)
pallas_tiled._tile_size = shipped
