#!/usr/bin/env python
"""Can mega pay for GLUE scenes? (round-5 VERDICT item 5)

Magnet / remainder forces are per-step XLA glue through the tiled
kernel's constant-force input, so those scenes run per-step launches and
never ride the resident-grid (mega) kernel.  This measures, in ONE
process at 100^3, what a mega-for-glue design could actually save:

  r_glue      : the shipped per-step tiled path WITH glue
                (cross-links or magnets);
  r_perstep   : the same lattice, no glue, per-step launches
                (TITAN_MEGA=0) -- so 1/r_perstep - 1/r_glue = the glue's
                own per-step cost (XLA glue + extra cf plumbing);
  r_mega      : the same lattice, no glue, mega -- so
                1/r_perstep - 1/r_mega = the amortizable fixed cost.

The best any exact mega-glue hybrid can do is remove the amortizable
fixed cost while KEEPING the per-step glue (it must evaluate at every
step's positions): bound = 1 / (1/r_glue - (1/r_perstep - 1/r_mega)).
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


def build(nx=100, cross=0, magnets=0):
    sim = Simulation(SimConfig(host_store_dtype="float32"))
    sim.createLattice(Vec(0, 0, 5), Vec(4, 4, 4), nx, nx, nx)
    sim.setAllSpringConstantValues(1000.0)
    st = sim._store
    n = st.n_masses
    if cross:
        # the multi-agent pattern: stiff irregular links at many spans
        rng = np.random.RandomState(0)
        a = rng.randint(0, n // 2, cross)
        b = n // 2 + rng.randint(0, n // 2, cross)
        for ai, bi in zip(a, b):
            sp = sim.createSpring(sim.masses[int(ai)],
                                  sim.masses[int(bi)])
            sp._k = 500.0
            sp.defaultLength()
        st = sim._store
    if magnets:
        rng = np.random.RandomState(1)
        idx = rng.choice(n, magnets, replace=False)
        st.mag_maxf[idx] = 0.5
        st.mag_scale[idx] = 1.0
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.defaultRestLengths()
    sim.createPlane(Vec(0, 0, 1), 0)
    sim._T = 0.0
    sim._marshal()
    return sim


def rate(sim, steps=3000):
    chunk = pallas_tiled.build_tiled_chunk(sim._shape)
    state = sim._state
    state = chunk(state, jnp.int32(1))
    sync(state)
    # probe, then chunk every dispatch under the ~30 s tunnel kill
    # (the magnet glue at 1M masses runs ~10 steps/s; a single 3000-step
    # dispatch crashed the worker on the first cut of this script)
    t0 = time.perf_counter()
    state = chunk(state, jnp.int32(20))
    sync(state)
    probe = 20 / (time.perf_counter() - t0)
    per_disp = max(1, min(steps, int(probe * 15)))
    n_disp = max(1, min(steps // per_disp, 40))
    state = chunk(state, jnp.int32(per_disp))     # warm
    sync(state)
    t0 = time.perf_counter()
    for _ in range(n_disp):
        state = chunk(state, jnp.int32(per_disp))
    sync(state)
    return (n_disp * per_disp) / (time.perf_counter() - t0)


def main():
    res = {}
    os.environ["TITAN_MEGA"] = "0"
    res["r_perstep"] = round(rate(build()), 1)
    res["r_glue_cross512"] = round(rate(build(cross=512)), 1)
    res["r_glue_mag4096"] = round(rate(build(magnets=4096)), 1)
    os.environ["TITAN_MEGA"] = "1"
    res["r_mega"] = round(rate(build()), 1)
    os.environ.pop("TITAN_MEGA", None)

    amort = 1.0 / res["r_perstep"] - 1.0 / res["r_mega"]
    for tag in ("r_glue_cross512", "r_glue_mag4096"):
        t_glue = 1.0 / res[tag]
        res[f"bound_{tag}"] = round(1.0 / (t_glue - amort), 1)
        res[f"max_speedup_{tag}"] = round(
            (1.0 / (t_glue - amort)) / res[tag], 3)
        res[f"glue_cost_ms_{tag}"] = round(
            (t_glue - 1.0 / res["r_perstep"]) * 1e3, 3)
    res["amortizable_fixed_ms"] = round(amort * 1e3, 3)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
