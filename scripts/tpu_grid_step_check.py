"""TPU end-to-end check of the integrated dense-grid magnet step path:
marshal a large magnetic scene through Simulation (flag selection included),
run real steps, and compare the trajectory against the same scene forced
onto the XLA binned path.  One process; CLAUDE.md timing rules."""

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


def build(n, grid_threshold):
    from titan_tpu import Simulation, SimConfig
    rng = np.random.RandomState(0)
    spread = 0.5 * 0.14 * (n / 4.0) ** 0.5
    sim = Simulation(SimConfig(magnet_grid_threshold=grid_threshold))
    st = sim._store
    st.reserve_masses(n)
    st.pos[:n] = rng.uniform(-spread, spread, (n, 3))
    st.pos[:, 2] += spread + 1.0
    st.valid[:n] = True
    st.n_masses = n
    st.m[:n] = 0.1        # direct store fill skips add_mass's default
    st.mag_rad[:n] = rng.uniform(0.01, 0.05, n)
    st.mag_stiffness[:n] = rng.uniform(10, 50, n)
    # keep attract forces bounded: maxf/dist^2 explodes for near-coincident
    # random masses, and a NaN blowup clips every cell id to the grid edge,
    # overflowing cells and silently flipping the lax.cond to binned
    st.mag_maxf[:n] = rng.uniform(0.0, 1e-4, n)
    st.mag_scale[:n] = rng.choice([0.0, 1.0], n)
    st.drag[:n] = 0.5
    sim.setTimeStep(1e-5)
    sim.setGlobalAcceleration((0.0, 0.0, -9.81))
    sim._T = 0.0
    sim._marshal()
    return sim


def run(sim, n_steps, reps):
    from titan_tpu.ops.step import build_chunk_fn
    chunk = build_chunk_fn(sim._shape)
    t0 = time.perf_counter()
    s = chunk(sim._state, n_steps)
    jax.device_get(s.t)
    print(f"  compile+1st: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        s = chunk(sim._state, n_steps)
    jax.device_get(s.t)
    dt = (time.perf_counter() - t0) / (reps * n_steps)
    return s, 1.0 / dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    reps = 3

    sim_g = build(n, grid_threshold=8192)
    assert sim_g._shape.magnet_grid, "grid flag should be set"
    print("grid path:", flush=True)
    sg, rate_g = run(sim_g, n_steps, reps)
    print(f"  {rate_g:9.1f} steps/s", flush=True)

    sim_b = build(n, grid_threshold=10**9)
    assert not sim_b._shape.magnet_grid
    print("binned path:", flush=True)
    sb, rate_b = run(sim_b, n_steps, reps)
    print(f"  {rate_b:9.1f} steps/s", flush=True)

    pg = np.asarray(jax.device_get(sg.masses.pos))
    pb = np.asarray(jax.device_get(sb.masses.pos))
    err = np.abs(pg - pb).max()
    print(f"n={n}  steps={n_steps}  grid={rate_g:.1f}/s  "
          f"binned={rate_b:.1f}/s  speedup={rate_g/rate_b:.2f}x  "
          f"traj_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
