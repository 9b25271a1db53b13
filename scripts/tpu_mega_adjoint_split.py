#!/usr/bin/env python
"""Decompose the 100^3 mega-adjoint segment cost on hardware: forward
chunk vs megatrace replay vs the reverse-sweep backward call vs the
XLA assemble glue.  Directs further optimization (round 5)."""
import dataclasses
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
from titan_tpu.ops import adjoint_tiled, pallas_tiled


def build(n=100):
    sim = Simulation(SimConfig(velocity_clamp=False,
                               host_store_dtype="float32"))
    sim.createLattice(Vec(0, 0, 1), Vec(4, 4, 4), n, n, n)
    sim.setAllSpringConstantValues(800.0)
    sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    st = sim._store
    st.rest[: st.n_springs] *= 1.03
    st.damping[: st.n_springs] = 12.0
    sim._T = 0.0
    sim._marshal()
    return sim


sim = build()
shape, state = sim._shape, sim._state
seg = 32
offs, ni = adjoint_tiled._inv_plan(shape)
print(json.dumps({"seg": seg, "ni_invariant_planes": ni,
                  "geom": adjoint_tiled._geom(shape)}), flush=True)

fwd = pallas_tiled.build_tiled_chunk(shape)
trace_run = jax.jit(adjoint_tiled.build_tiled_trace(shape, seg))
bwd_run = jax.jit(adjoint_tiled.build_tiled_bwd(shape, seg))

n = shape.n_masses


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


# forward chunk
out = fwd(state, jnp.int32(seg))
sync(out.masses.pos)
t0 = time.perf_counter()
out = fwd(state, jnp.int32(seg))
sync(out.masses.pos)
t_fwd = time.perf_counter() - t0

# megatrace replay
T, rt = trace_run(state)
sync(T)
t0 = time.perf_counter()
T, rt = trace_run(state)
sync(T)
t_trace = time.perf_counter() - t0

# reverse sweep
gp = jnp.ones((3, n), jnp.float32)
gv = jnp.zeros((3, n), jnp.float32)
ga = jnp.zeros((3, n), jnp.float32)
g = bwd_run(state, T, rt, gp, gv, ga)
sync(g["pos"])
t0 = time.perf_counter()
g = bwd_run(state, T, rt, gp, gv, ga)
sync(g["pos"])
t_bwd = time.perf_counter() - t0

print(json.dumps({
    "per_seg_ms": {"fwd_chunk": round(t_fwd * 1e3, 1),
                   "megatrace": round(t_trace * 1e3, 1),
                   "megabwd": round(t_bwd * 1e3, 1)},
    "per_step_ms": {"fwd_chunk": round(t_fwd / seg * 1e3, 3),
                    "megatrace": round(t_trace / seg * 1e3, 3),
                    "megabwd": round(t_bwd / seg * 1e3, 3)},
    "sum_steps_per_s": round(seg / (t_fwd + t_trace + t_bwd), 1),
}), flush=True)
