"""A/B: cell-binned magnet neighbors vs masked O(N^2) pairwise, one process
on the real TPU (CLAUDE.md: perf conclusions need single-process A/B).

Usage: python scripts/tpu_magnet_ab.py [n_magnetic]
"""

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


def main():
    from titan_tpu import Simulation, SimConfig, Vec
    from titan_tpu.ops import forces as F
    from titan_tpu.ops.magnets import binned_magnet_forces
    from titan_tpu.state import pad_to

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    rng = np.random.RandomState(0)
    # ~4 magnetic masses per 0.14m cell on average
    spread = 0.5 * 0.14 * (n / 4.0) ** 0.5
    sim = Simulation(SimConfig())
    st = sim._store
    st.reserve_masses(n)
    st.pos[:n] = rng.uniform(-spread, spread, (n, 3))
    st.valid[:n] = True   # reserve_masses only grows capacity
    st.n_masses = n
    st.mag_rad[:n] = rng.uniform(0.01, 0.05, n)
    st.mag_stiffness[:n] = rng.uniform(100, 500, n)
    st.mag_maxf[:n] = rng.uniform(0.0, 2.0, n)
    st.mag_scale[:n] = rng.choice([0.0, 1.0], n)
    sim.setTimeStep(1e-4)
    sim._T = 0.0
    sim._marshal()
    m = sim._state.masses
    cutoff = sim.config.magnet_cutoff

    def sync(x):
        return float(jax.device_get(jnp.sum(x[:, 0])))

    reps = 20

    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    binned = jax.jit(lambda mm: binned_magnet_forces(
        mm, cutoff, n_cells=pad_to(n, 8), cell_cap=cap))
    t0 = time.perf_counter()
    fb = binned(m)
    sync(fb)
    print(f"binned   compile+1st: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        fb = binned(m)
    sync(fb)
    t_binned = (time.perf_counter() - t0) / reps
    print(f"binned   {t_binned*1e3:8.2f} ms/step", flush=True)

    from titan_tpu.ops.magnets_grid import grid_magnet_forces
    grid = jax.jit(lambda mm: grid_magnet_forces(
        mm, cutoff, pad_to(n, 8), cap))
    t0 = time.perf_counter()
    fg = grid(m)
    sync(fg)
    print(f"grid     compile+1st: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        fg = grid(m)
    sync(fg)
    t_grid = (time.perf_counter() - t0) / reps
    print(f"grid     {t_grid*1e3:8.2f} ms/step "
          f"({t_binned/t_grid:.1f}x binned)", flush=True)

    pairwise = jax.jit(lambda mm: F.magnet_forces(mm, cutoff))
    t0 = time.perf_counter()
    fp = pairwise(m)
    sync(fp)
    print(f"pairwise compile+1st: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        fp = pairwise(m)
    sync(fp)
    t_pair = (time.perf_counter() - t0) / 3
    print(f"pairwise {t_pair*1e3:8.2f} ms/step", flush=True)

    fbn, fpn = np.asarray(jax.device_get(fb)), np.asarray(jax.device_get(fp))
    fgn = np.asarray(jax.device_get(fg))
    scale = max(np.abs(fpn).max(), 1.0)
    err = np.abs(fbn - fpn).max() / scale
    err_g = np.abs(fgn - fpn).max() / scale
    print(f"n={n}  binned={t_pair/t_binned:.1f}x pairwise (rel_err={err:.2e})"
          f"  grid={t_binned/t_grid:.1f}x binned (rel_err={err_g:.2e})",
          flush=True)


if __name__ == "__main__":
    main()
