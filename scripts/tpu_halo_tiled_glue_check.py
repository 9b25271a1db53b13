#!/usr/bin/env python
"""TPU hardware check of the distributed tiled path's magnet/remainder
GLUE (parallel/halo_tiled round-3 continuation).

tests/test_halo_tiled.py pins the glue variants against the single-device
tiled chunk on the 8-device CPU mesh in interpret mode; this validates the
same composed program -- shard_map + ppermute halos + the tiled Pallas
kernel + the per-step XLA glue (gathered remainder eval, binned magnet
pass with receiver compaction) -- Mosaic-lowers and runs on a real chip
over a 1-device mesh, trajectory matching the single-device tiled chunk.

Tolerance (not bitwise): the glue's D-way dropping-scatter accumulation
orders remainder force terms differently from the single-device chunk's
constant-force path.
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

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.ops import pallas_tiled
from titan_tpu.parallel.halo import place
from titan_tpu.parallel.halo_tiled import (build_halo_tiled_chunk,
                                           halo_tiled_reject_reason)


def build(integrator=None):
    cfg = {"host_store_dtype": "float32",
           "magnet_cutoff": 0.6, "magnet_binned_threshold": 2,
           "magnet_cell_cap": 64}
    if integrator:
        from titan_tpu import Integrator
        cfg["integrator"] = Integrator(integrator)
    sim = Simulation(SimConfig(**cfg))
    sim.createLattice(Vec(0, 0, 3), Vec(4, 1, 1), 40, 6, 6)
    sim.setAllSpringConstantValues(800.0)
    st = sim._store
    st.damping[: st.n_springs] = 0.3
    sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    # attract-mode magnets (rad = 0 -> receiver compaction glue)
    for i in (3, 7, 19, 63, 79, 200, 204):
        st.mag_maxf[i] = 1.0
        st.mag_scale[i] = 1.0
    # remainder springs incl. spans wider than a device block
    for base, d in ((10, 23), (70, 29), (200, 31), (5, 449), (100, 307)):
        sp = sim.createSpring(sim.masses[base], sim.masses[base + d])
        sp._k = 800.0
        sp.defaultLength()
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim._T = 0.0
    sim._marshal()
    assert sim._shape.has_magnets and sim._shape.magnet_binned
    assert sim._shape.has_remainder
    return sim


mesh = Mesh(np.asarray(jax.devices()[:1]), ("shard",))

for integ in (None, "rk2"):
    sim = build(integ)
    reason = halo_tiled_reject_reason(sim._shape, 1)
    assert reason is None, reason
    t0 = time.perf_counter()
    out_d = build_halo_tiled_chunk(sim._shape, mesh)(
        place(sim._state, mesh), jnp.int32(50))
    out_s = pallas_tiled.build_tiled_chunk(sim._shape)(
        sim._state, jnp.int32(50))
    n = sim._store.n_masses
    pd = np.asarray(out_d.masses.pos)[:, :n]
    ps = np.asarray(out_s.masses.pos)[:, :n]
    vd = np.asarray(out_d.masses.vel)[:, :n]
    vs = np.asarray(out_s.masses.vel)[:, :n]
    rd = np.asarray(out_d.springs.rest)
    rs = np.asarray(out_s.springs.rest)
    res = {"check": f"halo_tiled_glue_1dev_vs_single_50_steps"
                    f"[{integ or 'euler'}]",
           "pos_maxabs_err": float(np.max(np.abs(pd - ps))),
           "vel_maxabs_err": float(np.max(np.abs(vd - vs))),
           "rest_maxabs_err": float(np.max(np.abs(rd - rs))),
           "wall_s": round(time.perf_counter() - t0, 1)}
    print(json.dumps(res), flush=True)
    assert res["pos_maxabs_err"] < 1e-5, res
    assert res["vel_maxabs_err"] < 1e-5, res
    assert res["rest_maxabs_err"] < 1e-6, res
print(json.dumps({"result": "ok"}), flush=True)
