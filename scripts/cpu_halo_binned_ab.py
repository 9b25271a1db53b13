"""A/B: cell-binned magnet scene on the halo path vs the automatic SPMD
partitioner, 8-device virtual CPU mesh, one process (same protocol as the
docs/PERFORMANCE.md multi-chip table).  Absolute CPU numbers don't transfer
to TPU ICI; the collective-pattern ratio is the point."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from titan_tpu import Simulation, SimConfig, Vec
    from titan_tpu.ops.step import build_chunk_fn
    from titan_tpu.parallel import make_mesh
    from titan_tpu.parallel.halo import (build_halo_chunk, halo_supported,
                                         place)
    from titan_tpu.parallel.sharded import build_sharded_chunk, shard_state

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    # long-x lattice (same family as the multi-chip table scene), every
    # mass magnetic -> the cell-binned structure is the real path choice
    sim = Simulation(SimConfig(velocity_clamp=False, magnet_cutoff=0.6,
                               magnet_binned_threshold=4096,
                               magnet_cell_cap=64))
    sim.createLattice(Vec(0, 0, 3), Vec(128, 1, 1), 512, 4, 4)
    st = sim._store
    n = st.n_masses
    st.mag_rad[:n] = 0.05
    st.mag_stiffness[:n] = 200.0
    st.mag_maxf[:n] = 1e-3
    st.mag_scale[:n] = 1.0
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(1e-4)
    sim._T = 0.0
    sim._marshal()
    shape, state = sim._shape, sim._state
    assert shape.magnet_binned, "scene must be cell-binned"
    mesh = make_mesh(("shard",))
    assert halo_supported(shape, 8)

    def timeit(name, chunk, s0):
        out = chunk(s0, jnp.int32(steps))
        jax.device_get(out.t)
        t0 = time.perf_counter()
        out = chunk(s0, jnp.int32(steps))
        jax.device_get(out.t)
        dt = time.perf_counter() - t0
        print(f"{name:12s} {steps / dt:8.1f} steps/s", flush=True)
        return out, steps / dt

    s_single, r_single = timeit("single", build_chunk_fn(shape), state)

    sh = place(state, mesh)
    out_h, r_halo = timeit("halo", build_halo_chunk(shape, mesh)(sh), sh)

    ss = shard_state(state, mesh)
    out_s, r_spmd = timeit("auto-SPMD", build_sharded_chunk(shape, mesh), ss)

    ph = np.asarray(jax.device_get(out_h.masses.pos))[:, :n]
    ps = np.asarray(jax.device_get(out_s.masses.pos))[:, :n]
    p1 = np.asarray(jax.device_get(s_single.masses.pos))[:, :n]
    print(f"n={n}  halo/auto-SPMD = {r_halo / r_spmd:.2f}x  "
          f"halo/single = {r_halo / r_single:.2f}x  "
          f"max|halo-single| = {np.abs(ph - p1).max():.2e}  "
          f"max|spmd-single| = {np.abs(ps - p1).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
