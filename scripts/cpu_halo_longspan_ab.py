"""A/B: remainder spans > device block on the halo path (gathered
remainder evaluation, round 3) vs the automatic SPMD partitioner,
8-device virtual CPU mesh, one process (same protocol as
docs/PERFORMANCE.md's multi-chip table)."""

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
    rng = np.random.RandomState(0)

    # the multi-chip table scene + 512 irregular long-range springs whose
    # spans exceed the 1024-mass device block
    sim = Simulation(SimConfig(velocity_clamp=False))
    sim.createLattice(Vec(0, 0, 3), Vec(128, 1, 1), 512, 4, 4)
    n = sim._store.n_masses
    made = set()
    while len(made) < 512:
        a = int(rng.randint(0, n - 2000))
        d = int(rng.randint(1100, 2000))
        if (a, d) in made:
            continue
        made.add((a, d))
        sp = sim.createSpring(sim.masses[a], sim.masses[a + d])
        sp._k = 50.0
        sp.defaultLength()
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(1e-4)
    sim._T = 0.0
    sim._marshal()
    shape, state = sim._shape, sim._state
    assert shape.has_remainder and shape.remainder_span > shape.n_masses // 8
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
    print(f"n={n} S={len(made)} span>{shape.n_masses // 8}  "
          f"halo/auto-SPMD = {r_halo / r_spmd:.2f}x  "
          f"halo/single = {r_halo / r_single:.2f}x  "
          f"max|halo-single| = {np.abs(ph - p1).max():.2e}  "
          f"max|spmd-single| = {np.abs(ps - p1).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
