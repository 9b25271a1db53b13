#!/usr/bin/env python
"""Single-process TPU A/B of the round-4 resident grid ("mega") kernel
at 100^3 (12.7M springs, bench config).

"per-step" (TITAN_MEGA=0) launches one pallas_call per step and pays the
measured ~320 us fixed cost per launch (80% of the 401 us step --
docs/PERFORMANCE.md halo-width decomposition); "mega" advances
TITAN_MEGA_SEG steps per launch with the state resident in two
parity-alternating HBM buffers.  Also checks the 20-step trajectory
against the per-step path (expected bitwise on Mosaic for this
no-damping scene; the CPU-interpret tests pin damping scenes at 1-2 ulp
from kernel-body fusion differences).

Timing order per-step -> mega(seg sweep) -> per-step bounds drift.
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
n = sim._store.n_masses
n_springs = sim._store.n_springs
print(f"setup {time.perf_counter()-t0:.1f}s  springs={n_springs}",
      flush=True)

SEGS = [int(x) for x in os.environ.get("TITAN_AB_SEGS", "16,64,128").split(",")]
chunks = {}
os.environ["TITAN_MEGA"] = "0"
chunks["per-step"] = pallas_tiled.build_tiled_chunk(sim._shape)
os.environ.pop("TITAN_MEGA")
for seg in SEGS:
    os.environ["TITAN_MEGA_SEG"] = str(seg)
    chunks[f"mega{seg}"] = pallas_tiled.build_tiled_chunk(sim._shape)
os.environ.pop("TITAN_MEGA_SEG", None)

# trajectory check: 20 steps (covers segment boundary at seg=16 + tail)
ref20 = chunks["per-step"](sim._state, jnp.int32(20))
m20 = chunks["mega16"](sim._state, jnp.int32(20))
for f in ("pos", "vel", "acc"):
    a = np.asarray(jax.device_get(getattr(ref20.masses, f)))
    b = np.asarray(jax.device_get(getattr(m20.masses, f)))
    d = np.abs(a - b)
    print(json.dumps({"check": f, "bitwise": bool(d.max() == 0),
                      "maxdiff": float(d.max())}), flush=True)
del ref20, m20

WARM = 600
STEPS = int(os.environ.get("TITAN_AB_STEPS", "6000"))
order = ["per-step"] + [f"mega{s}" for s in SEGS] + ["per-step"]
for name in order:
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
