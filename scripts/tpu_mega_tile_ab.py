#!/usr/bin/env python
"""TPU A/B at 100^3: (a) the vel-as-tile-rows mega window split (round-4
follow-up -- the mega kernel measured HBM-bound, so fewer window planes
should convert directly), and (b) TILE SIZE under the mega kernel.

The round-3 "bigger tiles lose" verdict (scripts/tpu_tiled_tile_ab2.py)
was measured on the per-step launch path whose 320 us fixed cost
dominated; under mega the per-cell cost is ~pure HBM traffic, and a
bigger tile cuts both the cell count and the halo re-read fraction
((T+2h)/T), so the calculus may invert.  Sweeps tile = floor, 2x, 3x
with a per-variant 20-step bitwise check vs the per-step path.

Timing order: per-step -> mega@floor -> mega@2x -> mega@3x -> mega@floor.
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
n_springs = sim._store.n_springs
print(f"setup {time.perf_counter()-t0:.1f}s  springs={n_springs}",
      flush=True)

orig_tile = pallas_tiled._tile_size
floor_t = orig_tile(10240, sim._shape)
print(f"floor tile {floor_t}", flush=True)

chunks = {}
os.environ["TITAN_MEGA"] = "0"
chunks["per-step"] = pallas_tiled.build_tiled_chunk(sim._shape)
os.environ.pop("TITAN_MEGA")
for mult in (1, 2, 3):
    pallas_tiled._tile_size = lambda h, shape=None, m=mult: floor_t * m
    chunks[f"mega@{mult}x"] = pallas_tiled.build_tiled_chunk(sim._shape)
pallas_tiled._tile_size = orig_tile

ref20 = chunks["per-step"](sim._state, jnp.int32(20))
rf = {f: np.asarray(jax.device_get(getattr(ref20.masses, f)))
      for f in ("pos", "vel", "acc")}
del ref20
for name in ("mega@1x", "mega@2x", "mega@3x"):
    m20 = chunks[name](sim._state, jnp.int32(20))
    worst = 0.0
    for f in ("pos", "vel", "acc"):
        d = np.abs(rf[f] - np.asarray(jax.device_get(getattr(m20.masses, f))))
        worst = max(worst, float(d.max()))
    print(json.dumps({"check": name, "bitwise": worst == 0.0,
                      "maxdiff": worst}), flush=True)
    del m20

WARM = 600
STEPS = int(os.environ.get("TITAN_AB_STEPS", "6000"))
for name in ("per-step", "mega@1x", "mega@2x", "mega@3x", "mega@1x"):
    chunk = chunks[name]
    st = chunk(sim._state, jnp.int32(WARM))
    sync(st)
    t1 = time.perf_counter()
    st = chunk(st, jnp.int32(STEPS))
    sync(st)
    el = time.perf_counter() - t1
    rate = STEPS / el
    print(json.dumps({"mode": name, "steps_per_sec": round(rate, 1),
                      "springs_per_sec": round(rate * n_springs)}),
          flush=True)
