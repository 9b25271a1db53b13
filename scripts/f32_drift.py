#!/usr/bin/env python
"""Long-horizon f32 energy-drift characterization (round-4 VERDICT item 9).

Runs the reference's own energy-invariant scene (20^3 lattice, k=1000,
bouncing on a plane; test/physics/energy_unittest.cpp:15-40) for 1e5
steps (10 sim-seconds, dt=1e-4) in BOTH precisions and reports the
EMA-smoothed total-energy drift vs the initial energy at checkpoints.
The f64 leg is the oracle (the reference runs double); the f32 leg is
the production TPU configuration.

Backend: runs on whatever JAX platform is active (pass TITAN_CPU=1 to
force CPU).  Results land in docs/PERFORMANCE.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TITAN_CPU"):
    jax.config.update("jax_platforms", "cpu")

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.testutil import energy

CHECKPOINTS = [1.0, 2.0, 5.0, 10.0]


def run(dtype: str):
    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    sim = Simulation(SimConfig(velocity_clamp=False, dtype=dtype))
    sim.createLattice(Vec(0, 0, 5), Vec(4, 4, 4), 20, 20, 20)
    sim.setAllSpringConstantValues(1000)
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.defaultRestLengths()
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.start()
    e0 = energy(sim)
    avg = e0
    alpha = 0.7
    out = {}
    t_wall = time.perf_counter()
    nxt = iter(CHECKPOINTS)
    target = next(nxt)
    while sim.time() < CHECKPOINTS[-1] - 1e-9:
        sim.wait(0.1)
        avg = 0.3 * energy(sim) + 0.7 * avg
        if sim.time() >= target - 1e-9:
            out[target] = (avg - e0) / e0
            target = next(nxt, float("inf"))
        sim.resume()
    sim.stop()
    if dtype == "float64":
        jax.config.update("jax_enable_x64", False)
    return e0, out, time.perf_counter() - t_wall


for dtype in ("float32", "float64"):
    e0, drift, wall = run(dtype)
    print(json.dumps({
        "dtype": dtype, "e0": e0, "steps": int(CHECKPOINTS[-1] / 1e-4),
        "ema_rel_drift_at_t": {str(t): round(d, 7)
                               for t, d in drift.items()},
        "wall_s": round(wall, 1),
        "device": str(jax.devices()[0]),
    }), flush=True)
