#!/usr/bin/env python
"""TPU hardware check of DISTRIBUTED MEGA (round 5, parallel/halo_tiled).

One-chip validation of the composed program: shard_map + per-segment
KH-wide ppermute halo exchange + the resident-grid mega kernel over the
KH-extended block, on a 1-device mesh on real Mosaic.  (2-device bitwise
correctness incl. damping/friction/verlet/breathing variants is pinned
on the CPU mesh by tests/test_halo_tiled.py; the driver dryrun runs the
same path at N virtual devices.)

Checks:
1. trajectory vs the single-device mega chunk at 40^3 (expected bitwise
   on hardware -- same kernel, same windows);
2. per-step rate at 100^3 through the 1-dev distributed mega vs (a) the
   per-step distributed path (TITAN_DIST_MEGA=0) and (b) the plain
   single-device mega chunk -- the gap to (b) bounds the protocol +
   redundant-halo-compute overhead at the KH/b ratio of one shard.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

os.environ["TITAN_DIST_MEGA"] = "1"       # force past the 1M-row gate

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.ops import pallas_tiled
from titan_tpu.parallel import halo_tiled
from titan_tpu.parallel.halo import place
from titan_tpu.parallel.halo_tiled import (_dist_mega_plan, _geometry,
                                           build_halo_tiled_chunk)


def sync(st):
    return float(jax.device_get(st.t))


def build(nx):
    sim = Simulation(SimConfig(host_store_dtype="float32"))
    sim.createLattice(Vec(0, 0, 5), Vec(4, 4, 4), nx, nx, nx)
    sim.setAllSpringConstantValues(1000.0)
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim._T = 0.0
    sim._marshal()
    return sim


mesh = Mesh(np.asarray(jax.devices()[:1]), ("shard",))

# --- correctness: distributed mega (1-dev) vs single-device mega -----
sim = build(40)
h, b, t = _geometry(sim._shape, 1)
k, KH = _dist_mega_plan(sim._shape, b, t, h)
assert k > 0, "distributed mega did not engage"
print(json.dumps({"geom": {"h": h, "b": b, "t": t, "k": k, "KH": KH}}),
      flush=True)
sharded = place(sim._state, mesh)
out_d = build_halo_tiled_chunk(sim._shape, mesh)(sharded, jnp.int32(50))
out_s = pallas_tiled.build_tiled_chunk(sim._shape)(sim._state,
                                                   jnp.int32(50))
n = sim._store.n_masses
errs = {}
for f in ("pos", "vel", "acc"):
    a = np.asarray(jax.device_get(getattr(out_d.masses, f)))[:, :n]
    x = np.asarray(jax.device_get(getattr(out_s.masses, f)))[:, :n]
    errs[f] = {"bitwise": bool(np.array_equal(a, x)),
               "max_abs_err": float(np.max(np.abs(a - x)))}
print(json.dumps({"check": "dist_mega_vs_single_mega_40", **errs}),
      flush=True)
assert all(e["bitwise"] for e in errs.values()), errs

# --- timing at 100^3 -------------------------------------------------
sim = build(100)
h, b, t = _geometry(sim._shape, 1)
k, KH = _dist_mega_plan(sim._shape, b, t, h)
print(json.dumps({"geom100": {"b": b, "t": t, "k": k, "KH": KH,
                              "halo_tax": round(2 * KH / b, 4)}}),
      flush=True)
sharded = place(sim._state, mesh)
steps = 3200
runs = [("dist_mega", lambda: build_halo_tiled_chunk(sim._shape, mesh)),
        ("single_mega",
         lambda: pallas_tiled.build_tiled_chunk(sim._shape))]
results = {}
for tag, mk in runs:
    fn = mk()
    st_in = sharded if tag == "dist_mega" else sim._state
    out = fn(st_in, jnp.int32(200))
    sync(out)                                  # compile + warm
    t0 = time.perf_counter()
    out = fn(st_in, jnp.int32(steps))
    sync(out)
    r = steps / (time.perf_counter() - t0)
    results[tag] = round(r, 1)
    print(json.dumps({"timing": tag, "steps_per_sec": round(r, 1)}),
          flush=True)

# per-step distributed path (TITAN_DIST_MEGA=0) for the amortization gap
os.environ["TITAN_DIST_MEGA"] = "0"
fn0 = build_halo_tiled_chunk(sim._shape, mesh)
out = fn0(sharded, jnp.int32(200))
sync(out)
t0 = time.perf_counter()
out = fn0(sharded, jnp.int32(steps))
sync(out)
r0 = steps / (time.perf_counter() - t0)
print(json.dumps({"timing": "dist_per_step", "steps_per_sec": round(r0, 1),
                  "dist_mega_speedup": round(results["dist_mega"] / r0, 2),
                  "vs_single_mega": round(
                      results["dist_mega"] / results["single_mega"], 3)}),
      flush=True)
print("DISTRIBUTED MEGA hardware check OK", flush=True)
