#!/usr/bin/env python
"""Bisect the features-A/B worker crash: which magnet path at 100^3 + 10k
magnetic masses kills the TPU worker?  Phases, each synced with a forced
device_get so the lazy UNAVAILABLE error localizes:

  1. magnet_pass alone (grid kernel engaged, runtime overflow -> binned)
  2. binned path alone (grid disabled via threshold)
  3. XLA chunk 1 step with magnets (the A/B's crash site)

Run phases selectively: TITAN_BISECT=1,2,3 (default all).
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

phases = set(os.environ.get("TITAN_BISECT", "1,2,3").split(","))
nx = int(os.environ.get("TITAN_BENCH_NX", "100"))
n_mag = int(os.environ.get("TITAN_AB_MAGNETS", "10000"))


def build(magnets=True, remainder=0, attractors_only=False, **cfg):
    t0 = time.perf_counter()
    sim = Simulation(SimConfig(host_store_dtype="float32", **cfg))
    sim.createLattice(Vec(0, 0, 5), Vec(4, 4, 4), nx, nx, nx)
    sim.setAllSpringConstantValues(1000.0)
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.defaultRestLengths()
    sim.createPlane(Vec(0, 0, 1), 0)
    st = sim._store
    n = st.n_masses
    if magnets:
        idx = np.linspace(0, n - 1, n_mag).astype(np.int64)
        if not attractors_only:
            st.mag_rad[idx] = 0.01
            st.mag_stiffness[idx] = 100.0
        st.mag_maxf[idx] = 1e-5
        st.mag_scale[idx] = 1.0
    if remainder:
        rng = np.random.RandomState(0)
        a = rng.randint(0, n, remainder)
        b = rng.randint(0, n, remainder)
        keep = a != b
        for ai, bi in zip(a[keep], b[keep]):
            d = st.pos[bi] - st.pos[ai]
            st.add_spring(int(ai), int(bi), k=50.0,
                          rest=float(np.sqrt(np.dot(d, d))))
    sim._T = 0.0
    sim._marshal()
    print(f"built (grid={sim._shape.magnet_grid} "
          f"rem={sim._shape.has_remainder}) "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    return sim


def run_pass(tag, sim):
    from titan_tpu.ops.step import magnet_pass
    shape = sim._shape
    m = sim._state.masses
    f = jax.jit(lambda mm: magnet_pass(mm, shape))
    t0 = time.perf_counter()
    out = f(m)
    s = float(jax.device_get(jnp.sum(out)))
    print(f"{tag}: magnet_pass ok sum={s:.3e} "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = f(m)
    float(jax.device_get(jnp.sum(out)))
    print(f"{tag}: warm pass {time.perf_counter()-t0*1:.2f}s... ", flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(m)
    float(jax.device_get(jnp.sum(out)))
    print(f"{tag}: 5 warm passes {time.perf_counter()-t0:.2f}s", flush=True)


if "1" in phases:
    sim = build()
    assert sim._shape.magnet_grid
    run_pass("phase1 grid", sim)

if "2" in phases:
    sim2 = build(magnet_grid_threshold=1 << 30)
    assert not sim2._shape.magnet_grid and sim2._shape.magnet_binned
    run_pass("phase2 binned", sim2)

def run_chunk(tag, sim):
    from titan_tpu.ops.step import build_step_fn
    step = build_step_fn(sim._shape)
    chunk = jax.jit(lambda s, k: jax.lax.fori_loop(
        0, k, lambda i, ss: step(ss), s))
    t0 = time.perf_counter()
    state = chunk(sim._state, jnp.int32(1))
    float(jax.device_get(state.t))
    print(f"{tag}: XLA 1 step ok {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    state = chunk(state, jnp.int32(20))
    float(jax.device_get(state.t))
    print(f"{tag}: XLA 20 more steps ok {time.perf_counter()-t0:.1f}s",
          flush=True)


if "3" in phases:
    run_chunk("phase3 magnets", build())

if "4" in phases:
    run_chunk("phase4 magnets+remainder", build(remainder=1024))

if "5" in phases:
    run_chunk("phase5 remainder", build(magnets=False, remainder=1024))

if "6" in phases:
    # receiver compaction A/B: the same 10k attractors (rad=0) evaluated
    # receiver-dense vs compacted, one process
    from titan_tpu.ops.magnets import binned_magnet_forces
    sim6 = build(attractors_only=True)
    shape = sim6._shape
    assert shape.magnet_receivers, "compaction should engage (rad==0)"
    m = sim6._state.masses
    a_cells, cap = shape.magnet_binned
    cutoff = sim6.config.magnet_cutoff
    for tag, recv in (("dense", 0), ("compact", shape.magnet_receivers),
                      ("dense2", 0)):
        f = jax.jit(lambda mm, r=recv: binned_magnet_forces(
            mm, cutoff, a_cells, cap, receivers=r))
        t0 = time.perf_counter()
        out = f(m)
        s = float(jax.device_get(jnp.sum(out)))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3 if recv == 0 else 30
        for _ in range(reps):
            out = f(m)
        float(jax.device_get(jnp.sum(out)))
        el = (time.perf_counter() - t0) / reps
        print(json.dumps({"phase6": tag, "ms_per_pass": round(el * 1e3, 2),
                          "sum": s, "compile_s": round(compile_s, 1)}),
              flush=True)

if "7" in phases:
    # breakdown of the compact pass: where do the ~170 ms go?
    from titan_tpu.ops.magnets import (build_source_bins, cell_ids,
                                       magnet_receiver_idx)
    sim7 = build(attractors_only=True)
    shape = sim7._shape
    m = sim7._state.masses
    a_cells, cap = shape.magnet_binned
    cutoff = sim7.config.magnet_cutoff
    parts = {
        "top_k": jax.jit(lambda mm: magnet_receiver_idx(
            mm, shape.magnet_receivers)),
        "cell_ids": jax.jit(lambda mm: cell_ids(mm.pos, mm.valid, cutoff)),
        "argsort": jax.jit(lambda mm: jnp.argsort(
            cell_ids(mm.pos, mm.valid, cutoff))),
        "bins_full": jax.jit(lambda mm: build_source_bins(
            mm.pos, mm.valid, mm.mag_rad, mm.mag_scale, cutoff,
            a_cells, cap)[0]),
    }
    for tag, f in parts.items():
        out = f(m)
        jax.device_get(jnp.sum(out) if out.dtype != jnp.int32
                       else jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            out = f(m)
        jax.device_get(jnp.sum(out) if out.dtype != jnp.int32
                       else jnp.sum(out.astype(jnp.float32)))
        el = (time.perf_counter() - t0) / reps
        print(json.dumps({"phase7": tag,
                          "ms": round(el * 1e3, 2)}), flush=True)
