#!/usr/bin/env python
"""Explain the 280^3 edge falloff (round-5 VERDICT item 9).

Round 4 measured the mega envelope holding ~4e10 springs/s through
260^3 but only 68 steps/s = 1.9e10 at 280^3.  Candidate causes:
(a) tile shrink -- the VMEM fit halves the tile toward the one-halo
    floor at the edge, multiplying window overhead (t + 2h)/t;
(b) genuine HBM pressure near the ceiling.

Protocol (one process per leg -- run via the driver shell):
  leg A: nx with its DEFAULT tile geometry (prints t_size, n_tiles,
         k_seg, window overhead, rate);
  leg B: a SMALLER on-trend size (260) FORCED onto the larger size's
         shrunken tile via pallas_tiled._tile_size -- if us/cell matches
         the 280^3 rate, the falloff is the tile shrink, not HBM.

Usage: tpu_280_falloff_ab.py NX [STEPS] [FORCE_TILE]
Dispatches are chunked <= ~20 s (the tunnel kill; 280^3 at ~68 steps/s
means <= ~1400-step dispatches).
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
from titan_tpu.ops.step import build_chunk_fn


def sync(st):
    return float(jax.device_get(st.t))


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 280
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    force_tile = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    if force_tile:
        orig = pallas_tiled._tile_size
        pallas_tiled._tile_size = \
            lambda h, shape=None: min(force_tile, orig(h, shape))
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
    shape = sim._shape
    from titan_tpu.ops.pallas_tiled import (_mega_fit, _round_up,
                                            _tile_size)
    h = _round_up(max(abs(d) for d in shape.stencil_deltas), 1024)
    t = _tile_size(h, shape)
    t_m, k_seg = _mega_fit(shape, t, h)
    n_tiles = -(-shape.n_masses // t_m)
    print(json.dumps({
        "nx": nx, "springs": n_springs, "setup_s":
        round(time.perf_counter() - t0, 1),
        "h": h, "tile": t_m, "k_seg": k_seg, "n_tiles": n_tiles,
        "window_overhead": round((t_m + 2 * h) / t_m, 3),
        "forced_tile": force_tile or None}), flush=True)

    chunk = build_chunk_fn(shape, donate=True)
    state = sim._state
    t0 = time.perf_counter()
    state = chunk(state, jnp.int32(1))
    sync(state)
    print(json.dumps({"compile_s": round(time.perf_counter() - t0, 1)}),
          flush=True)
    # probe rate to size dispatches under the tunnel kill
    state = chunk(state, jnp.int32(64))
    sync(state)
    t0 = time.perf_counter()
    state = chunk(state, jnp.int32(64))
    sync(state)
    rate = 64 / (time.perf_counter() - t0)
    per_disp = max(32, min(steps, int(rate * 15)))
    n_disp = max(1, steps // per_disp)
    t0 = time.perf_counter()
    for _ in range(n_disp):
        state = chunk(state, jnp.int32(per_disp))
    sync(state)
    el = time.perf_counter() - t0
    done = n_disp * per_disp
    r = done / el
    print(json.dumps({
        "nx": nx, "tile": t_m, "steps_per_sec": round(r, 1),
        "springs_per_sec": round(n_springs * r),
        "us_per_cell_step": round(1e6 / (r * n_tiles), 2),
        "rows_per_cell_incl_halo": (t_m + 2 * h) // 128}), flush=True)


if __name__ == "__main__":
    main()
