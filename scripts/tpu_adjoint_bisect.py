#!/usr/bin/env python
"""Bisect the adjoint-kernel TPU fault: run each piece alone.

Phases (TITAN_PHASE):
  1 = trace kernel alone (forward replay + HBM trace writes)
  2 = backward kernel alone (trace from phase-1 output, dummy cotangents)
  3 = trace kernel vs plain fused chunk: trajectory equivalence
  4 = XLA-grad reference alone (no new kernels)
"""
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

from titan_tpu import Simulation, SimConfig, Vec, diff
from titan_tpu.ops import adjoint
from titan_tpu.ops.pallas_step import build_pallas_chunk
from titan_tpu.state import xla_only_shape

PHASE = int(os.environ.get("TITAN_PHASE", "1"))
SEG = int(os.environ.get("TITAN_SEG", "20"))


def build(nx):
    sim = Simulation(SimConfig(velocity_clamp=True,
                               host_store_dtype="float32"))
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


sim = build(20)
shape, state = sim._shape, sim._state

rows = shape.n_masses // 128

if PHASE == 1:
    run = jax.jit(adjoint.build_trace_run(shape, SEG))
    tr = run(state)
    v = np.asarray(tr)[:, :, :rows]
    print(json.dumps({"phase": 1, "trace_shape": list(v.shape),
                      "finite": bool(np.isfinite(v).all()),
                      "step0_pos_match": bool(np.allclose(
                          v[0, 0:3].reshape(3, -1),
                          np.asarray(state.masses.pos)))}), flush=True)
elif PHASE == 2:
    run = jax.jit(adjoint.build_trace_run(shape, SEG))
    tr = run(state)
    jax.device_get(tr[0, 0, 0, 0])
    print(json.dumps({"phase": 2, "trace": "ok"}), flush=True)
    bwd = adjoint.build_bwd_run(shape, SEG)
    gpos = jnp.ones_like(state.masses.pos)
    gvel = jnp.zeros_like(state.masses.vel)
    gacc = jnp.zeros_like(state.masses.acc)
    g = jax.jit(bwd)(state, tr, gpos, gvel, gacc)
    out = {k: bool(np.isfinite(np.asarray(v)).all())
           for k, v in g.items() if k != "pair_ok"}
    print(json.dumps({"phase": 2, "finite": out}), flush=True)
elif PHASE == 3:
    run = jax.jit(adjoint.build_trace_run(shape, SEG))
    tr = run(state)
    chunk = build_pallas_chunk(shape)
    # trace[t] holds step-t INPUTS; compare trace[SEG-1] to chunk(SEG-1)
    ref = chunk(state, jnp.int32(SEG - 1))
    tp = np.asarray(tr[SEG - 1, 0:3, :rows]).reshape(3, -1)
    tv = np.asarray(tr[SEG - 1, 3:6, :rows]).reshape(3, -1)
    perr = float(np.max(np.abs(tp - np.asarray(ref.masses.pos))))
    verr = float(np.max(np.abs(tv - np.asarray(ref.masses.vel))))
    print(json.dumps({"phase": 3, "pos_err": perr, "vel_err": verr}),
          flush=True)
    assert perr == 0.0 and verr == 0.0
elif PHASE == 4:
    def f(pos0):
        st = dataclasses.replace(
            state, masses=dataclasses.replace(state.masses, pos=pos0))
        out = diff.rollout(xla_only_shape(shape), st, SEG)
        return jnp.sum(out.masses.pos)
    g = jax.jit(jax.grad(f))(state.masses.pos)
    print(json.dumps({"phase": 4,
                      "finite": bool(np.isfinite(np.asarray(g)).all())}),
          flush=True)
