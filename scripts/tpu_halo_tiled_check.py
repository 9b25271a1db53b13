#!/usr/bin/env python
"""TPU hardware check of the distributed tiled path (parallel/halo_tiled).

Multi-chip hardware is not reachable from this environment, so this
validates what CAN be validated on one chip: the composed program --
shard_map + per-shard ppermute halo exchange + the tiled Pallas kernel --
Mosaic-lowers and runs on a real TPU over a 1-device mesh, and its
trajectory matches the single-device tiled chunk.  (8-way correctness is
pinned bitwise on the CPU mesh by tests/test_halo_tiled.py; the driver
dryrun exercises the same path at N virtual devices.)

Also reads the per-step rate through the 1-device distributed program vs
the plain tiled chunk at 100^3 -- the distributed path's only extra
per-step work is the self-ppermute halo exchange, so the gap measured
here bounds the protocol overhead (ICI latency excluded, one chip)."""
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

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.ops import pallas_tiled
from titan_tpu.parallel.halo import place
from titan_tpu.parallel.halo_tiled import (build_halo_tiled_chunk,
                                           halo_tiled_reject_reason)


def sync(st):
    return float(jax.device_get(st.t))


def build(nx, integrator=None):
    cfg = {"host_store_dtype": "float32"}
    if integrator:
        from titan_tpu import Integrator
        cfg["integrator"] = Integrator(integrator)
    sim = Simulation(SimConfig(**cfg))
    sim.createLattice(Vec(0, 0, 5), Vec(4, 4, 4), nx, nx, nx)
    sim.setAllSpringConstantValues(1000.0)
    st = sim._store
    st.damping[: st.n_springs] = 0.3
    sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim._T = 0.0
    sim._marshal()
    return sim


mesh = Mesh(np.asarray(jax.devices()[:1]), ("shard",))

# --- correctness on hardware: distributed(1-dev) vs single tiled ---
sim = build(40)
reason = halo_tiled_reject_reason(sim._shape, 1)
assert reason is None, reason
sharded = place(sim._state, mesh)
dist = build_halo_tiled_chunk(sim._shape, mesh)
single = pallas_tiled.build_tiled_chunk(sim._shape)

out_d = dist(sharded, jnp.int32(50))
out_s = single(sim._state, jnp.int32(50))
n = sim._store.n_masses
pd = np.asarray(out_d.masses.pos)[:, :n]
ps = np.asarray(out_s.masses.pos)[:, :n]
vd = np.asarray(out_d.masses.vel)[:, :n]
vs = np.asarray(out_s.masses.vel)[:, :n]
pos_err = float(np.max(np.abs(pd - ps)))
vel_err = float(np.max(np.abs(vd - vs)))
print(json.dumps({"check": "halo_tiled_1dev_vs_single_50_steps",
                  "pos_maxabs_err": pos_err, "vel_maxabs_err": vel_err}),
      flush=True)
assert pos_err == 0.0 and vel_err == 0.0, (pos_err, vel_err)

# --- rate: 100^3 through the 1-device distributed program ---
nx = int(os.environ.get("TITAN_BENCH_NX", "100"))
steps = int(os.environ.get("TITAN_AB_STEPS", "600"))
big = build(nx)
reason = halo_tiled_reject_reason(big._shape, 1)
assert reason is None, reason
for name, chunk, state in (
        ("tiled_single", pallas_tiled.build_tiled_chunk(big._shape),
         big._state),
        ("halo_tiled_1dev", build_halo_tiled_chunk(big._shape, mesh),
         place(big._state, mesh))):
    t0 = time.perf_counter()
    state = chunk(state, jnp.int32(1))
    sync(state)
    compile_s = time.perf_counter() - t0
    state = chunk(state, jnp.int32(100))
    sync(state)
    t0 = time.perf_counter()
    state = chunk(state, jnp.int32(steps))
    sync(state)
    el = time.perf_counter() - t0
    print(json.dumps({
        "path": name, "steps_per_sec": round(steps / el, 1),
        "springs_per_sec": round(big._store.n_springs * steps / el),
        "compile_s": round(compile_s, 1)}), flush=True)
