#!/usr/bin/env python
"""Price a k-steps-per-launch tiled kernel WITHOUT building it (round-4
VERDICT item 3): single-process TPU A/B of halo width at 100^3.

A k-step launch must widen every tile's halo'd window to T + 2*k*H (the
valid region shrinks by H per fused step), so per simulated step it
computes (T + 2kH)/k window rows per tile vs (T + 2H) for the shipped
one-step launch, in exchange for paying the per-launch fixed cost once
per k steps.  TITAN_HALO_AB widens the halo by a factor m at the SAME
tile size -- physics unchanged, purely redundant rows -- so the measured
per-step time tau(m) is exactly the cost of a k=m-fused step BEFORE its
1/k launch-cost discount.  A linear fit tau(m) = a*(T + 2mH) + b then
decomposes the step into window-row compute (a*w) and fixed per-launch
cost (b): the k-step design wins iff b/k savings outrun the a*2(k-1)H
extra compute, i.e. iff b > 2aH * k/(k-1)-ish -- read the numbers.

Timing m=1 -> 2 -> 4 -> 1 bounds run-to-run drift.
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
n_springs = sim._store.n_springs
print(f"setup {time.perf_counter()-t0:.1f}s  springs={n_springs}",
      flush=True)

h0 = pallas_tiled._round_up(
    max(abs(d) for d in sim._shape.stencil_deltas), 1024)
t_size = pallas_tiled._tile_size(h0, sim._shape)
print(f"h={h0} tile={t_size} window_m1={t_size + 2 * h0}", flush=True)

chunks = {}
for m in (1, 2, 4):
    os.environ["TITAN_HALO_AB"] = str(m)
    chunks[m] = pallas_tiled.build_tiled_chunk(sim._shape, donate=False)
os.environ.pop("TITAN_HALO_AB", None)

state0 = sim._state
WARM, STEPS = 600, 6000
results = {}
for m in (1, 2, 4, 1):
    chunk = chunks[m]
    st = chunk(state0, jnp.int32(WARM))
    sync(st)
    t1 = time.perf_counter()
    st = chunk(st, jnp.int32(STEPS))
    sync(st)
    el = time.perf_counter() - t1
    rate = STEPS / el
    results.setdefault(m, []).append(rate)
    print(json.dumps({"halo_mult": m, "steps_per_sec": round(rate, 1),
                      "window_rows": t_size + 2 * m * h0,
                      "springs_per_sec": round(rate * n_springs)}),
          flush=True)

# decomposition: tau = a * window_rows + b  (per step, per tile implicit)
ms = sorted(results)
taus = {m: 1.0 / (sum(r) / len(r)) for m, r in results.items()}
ws = {m: t_size + 2 * m * h0 for m in ms}
a = (taus[4] - taus[1]) / (ws[4] - ws[1])
b = taus[1] - a * ws[1]
print(json.dumps({
    "tau_s_per_step": {str(m): taus[m] for m in ms},
    "slope_s_per_window_row": a,
    "fixed_s_per_step": b,
    "fixed_frac_of_step": b / taus[1] if taus[1] else None,
    "k2_fused_step_s": 2 * (a * ws[2]) + b,   # 2 window passes + 1 launch
    "k2_two_launches_s": 2 * taus[1],
    "verdict": ("k-step WINS" if 2 * a * ws[2] + b < 2 * taus[1]
                else "k-step LOSES"),
}), flush=True)
