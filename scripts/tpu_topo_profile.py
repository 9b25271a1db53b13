#!/usr/bin/env python
"""Phase-level timing of the incremental topology-edit path at 100^3
(round-4: where do the seconds of a churn cycle go?).

Wraps the journal-apply helpers with wall-clock timers (no extra device
syncs: attribution is approximate, totals are real) and runs churn
cycles mixing delete / create-spring / create-mass edits, reporting
per-phase means after a warm-up cycle.
"""
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.runtime import incremental, simulation

acc = defaultdict(list)


def wrap(obj, name):
    orig = getattr(obj, name)

    def timed(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        acc[name].append(time.perf_counter() - t0)
        return out

    setattr(obj, name, timed)


wrap(incremental, "apply_structural_edits")
wrap(simulation, "_build_remainder_states")
wrap(simulation, "_remainder_degree_span")
wrap(simulation.Simulation, "_pull_springs_rest")
wrap(simulation.Simulation, "_refresh_mass_rows")
wrap(simulation.Simulation, "_push_springs")
wrap(simulation.Simulation, "_push_mass_rows_full")
wrap(simulation.Simulation, "resume")
wrap(simulation.Simulation, "wait")

nx = int(os.environ.get("TITAN_BENCH_NX", "100"))
t0 = time.perf_counter()
sim = Simulation(SimConfig(host_store_dtype="float32"))
sim.createLattice(Vec(0, 0, 5), Vec(4, 4, 4), nx, nx, nx)
sim.setAllSpringConstantValues(1000.0)
sim.setTimeStep(0.0001)
sim.setGlobalAcceleration(Vec(0, 0, -9.8))
sim.defaultRestLengths()
sim.createPlane(Vec(0, 0, 1), 0)
print(json.dumps({"setup_s": round(time.perf_counter() - t0, 1)}), flush=True)

sim.start()
sim.wait(0.002)

rng = np.random.RandomState(0)
N_CYC = 12
cycle_t = []
for i in range(N_CYC):
    t1 = time.perf_counter()
    kind = i % 3
    if kind == 0:
        sim.deleteSpring(sim.springs[int(rng.randint(0, 12_000_000))])
    elif kind == 1:
        s = sim.createSpring(sim.masses[int(rng.randint(0, 1_000_000))],
                             sim.masses[int(rng.randint(0, 1_000_000))])
        s._k = 50.0
    else:
        m = sim.createMass(Vec(rng.rand() * 4, rng.rand() * 4, 8.0))
        s = sim.createSpring(sim.masses[int(rng.randint(0, 1_000_000))], m)
        s._k = 50.0
    sim.resume()
    sim.wait(20e-4)
    cycle_t.append(time.perf_counter() - t1)
    print(json.dumps({"cycle": i, "kind": kind,
                      "cost_s": round(cycle_t[-1], 3)}), flush=True)

sim.stop()


def stats(v, skip=3):
    v = v[skip:] if len(v) > skip else v
    return {"n": len(v), "mean_s": round(float(np.mean(v)), 4),
            "max_s": round(float(np.max(v)), 4)}


out = {k: stats(v) for k, v in sorted(acc.items())}
out["CYCLE"] = stats(cycle_t)
print(json.dumps(out, indent=1), flush=True)
