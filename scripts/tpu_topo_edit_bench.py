#!/usr/bin/env python
"""Hardware cost of post-start topology edits at 100^3 (round-4 VERDICT
item 1 'done' criterion: a one-spring edit at a pause boundary < 1 s,
vs ~15 s for the round-3 full re-stage).

Measures, at the 100^3 bench scene (1M masses / 12.7M springs), the
wall-clock cost of pause -> edit -> resume for:
  - deleteSpring of a stencil spring (mask-bit clear; no shape change)
  - set() of one spring's k (uniformity break: demote + retrace)
  - createSpring between existing masses (remainder flip; retrace)
  - createMass + createSpring to it (row push + remainder rebuild)
  - control: the forced FULL re-marshal path for the same one-spring
    delete (the round-3 cost, for the headline comparison)
plus a churn soak: 30 edit/resume/step cycles mixing all edit kinds,
with a finite-state check at the end.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from titan_tpu import Simulation, SimConfig, Vec

nx = int(os.environ.get("TITAN_BENCH_NX", "100"))
t0 = time.perf_counter()
sim = Simulation(SimConfig(host_store_dtype="float32"))
sim.createLattice(Vec(0, 0, 5), Vec(4, 4, 4), nx, nx, nx)
sim.setAllSpringConstantValues(1000.0)
sim.setTimeStep(0.0001)
sim.setGlobalAcceleration(Vec(0, 0, -9.8))
sim.defaultRestLengths()
sim.createPlane(Vec(0, 0, 1), 0)
use_mesh = os.environ.get("TITAN_TOPO_MESH", "") == "1"
if use_mesh:
    # distributed edit churn (round 5: the incremental path runs on
    # mesh-sharded state too); 1-dev mesh on the one real chip --
    # exercises the full place/shard_map/journal path, ICI excluded
    from jax.sharding import Mesh
    sim.distribute(Mesh(np.asarray(jax.devices()[:1]), ("shard",)))
print(json.dumps({"setup_s": round(time.perf_counter() - t0, 1),
                  "springs": sim._store.n_springs,
                  "mesh": use_mesh}), flush=True)

sim.start()
sim.wait(0.002)   # compile + a short run; park at a pause boundary


def timed(label, fn, steps_after=20):
    t1 = time.perf_counter()
    fn()
    sim.resume()                      # applies the journal
    sim.wait(steps_after * 1e-4)      # park again (includes any retrace)
    cost = time.perf_counter() - t1
    print(json.dumps({"edit": label, "cost_s": round(cost, 3)}), flush=True)
    return cost


# 1. stencil delete: mask-bit clear, shape unchanged
timed("delete_stencil_spring", lambda: sim.deleteSpring(sim.springs[1000]))

# 2. one-spring set(): breaks k uniformity -> demote + retrace
def edit_set():
    s = sim.springs[2000]
    s._k = 999.0
    sim.set(s)
timed("set_one_spring_k", edit_set)

# 3. createSpring between distant masses: remainder flip + retrace
def edit_create():
    s = sim.createSpring(sim.masses[10], sim.masses[500000])
    s._k = 100.0
timed("create_remainder_spring", edit_create)

# 4. createMass + spring to it
def edit_mass():
    m = sim.createMass(Vec(0, 0, 8))
    s = sim.createSpring(sim.masses[0], m)
    s._k = 100.0
timed("create_mass_and_spring", edit_mass)

# 1b-4b. WARM repeats (the first of each kind pays the one-time compile
# of its surgery programs / retraced chunk; steady state is what the
# reference's O(1) device-side edit should be compared against)
timed("delete_stencil_spring_warm",
      lambda: sim.deleteSpring(sim.springs[3000]))


def edit_set2():
    s = sim.springs[4000]
    s._k = 998.0
    sim.set(s)
timed("set_one_spring_k_warm", edit_set2)


def edit_create2():
    s = sim.createSpring(sim.masses[20], sim.masses[600000])
    s._k = 100.0
timed("create_remainder_spring_warm", edit_create2)


def edit_mass2():
    m = sim.createMass(Vec(0, 1, 8))
    s = sim.createSpring(sim.masses[1], m)
    s._k = 100.0
timed("create_mass_and_spring_warm", edit_mass2)

# 5. control: forced FULL re-marshal for a one-spring delete (round-3 path)
def edit_full():
    sim.deleteSpring(sim.springs[1001])
    sim._journal.force_full = True
timed("delete_FORCED_FULL_remarshal", edit_full)

# churn soak: 30 mixed cycles
t1 = time.perf_counter()
rng = np.random.RandomState(0)
made = []
for i in range(30):
    kind = i % 3
    if kind == 0:
        sim.deleteSpring(sim.springs[int(rng.randint(0, 12_000_000))])
    elif kind == 1:
        s = sim.createSpring(sim.masses[int(rng.randint(0, 1_000_000))],
                             sim.masses[int(rng.randint(0, 1_000_000))])
        s._k = 50.0
        made.append(s)
    else:
        m = sim.createMass(Vec(rng.rand() * 4, rng.rand() * 4, 8.0))
        s = sim.createSpring(sim.masses[int(rng.randint(0, 1_000_000))], m)
        s._k = 50.0
    sim.resume()
    sim.wait(20e-4)
churn = time.perf_counter() - t1
sim.getAll()
finite = bool(np.isfinite(
    sim._store.pos[:sim._store.n_masses]).all())
print(json.dumps({"churn_30_cycles_s": round(churn, 1),
                  "per_cycle_s": round(churn / 30, 3),
                  "finite": finite,
                  "t_sim": sim.time()}), flush=True)
sim.stop()
