"""Component breakdown of the dense-grid magnet path on TPU: setup
(argsort+rank), table build (scatter+transpose), kernel, readback
(gather+unsort).  One process; CLAUDE.md timing rules."""

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
    from titan_tpu.ops.magnets import GRID_DIM, binned_magnet_forces
    from titan_tpu.state import pad_to

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rng = np.random.RandomState(0)
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
    G, C = GRID_DIM, cap

    def sync(x):
        return float(jax.device_get(jnp.sum(jax.tree_util.tree_leaves(x)[0])))

    def timeit(name, fn, *args, reps=30):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:20s} {dt*1e3:8.2f} ms", flush=True)
        return out

    @jax.jit
    def setup(masses):
        pos = masses.pos
        nn = pos.shape[1]
        sentinel = jnp.int32(G * G + 7)
        cx = jnp.clip(jnp.floor(pos[0] / cutoff).astype(jnp.int32) + G // 2,
                      0, G - 1)
        cy = jnp.clip(jnp.floor(pos[1] / cutoff).astype(jnp.int32) + G // 2,
                      0, G - 1)
        cell = jnp.where(masses.valid, cx * G + cy, sentinel)
        order = jnp.argsort(cell)
        csort = cell[order]
        iota = jnp.arange(nn, dtype=jnp.int32)
        first = jnp.concatenate([jnp.ones(1, bool), csort[1:] != csort[:-1]])
        seg_start = jax.lax.cummax(jnp.where(first, iota, 0))
        rank = iota - seg_start
        return order, csort, rank

    from titan_tpu.ops.magnets_grid import _grid_kernel, _BX

    @jax.jit
    def build(masses, order, csort, rank):
        pos = masses.pos
        msort = csort != jnp.int32(G * G + 7)
        in_grid = msort & (rank < C)
        slot_sorted = jnp.where(in_grid, csort * C + rank, G * G * C)
        slot = (jnp.zeros(pos.shape[1], jnp.int32)
                .at[order].set(slot_sorted, unique_indices=True))
        fields = jnp.stack([pos[0], pos[1], pos[2], masses.mag_rad,
                            masses.mag_scale, masses.mag_stiffness,
                            masses.mag_maxf, jnp.ones_like(masses.mag_rad)])
        cell_of = slot // C
        rank_of = slot % C
        base = jnp.where(slot < G * G * C,
                         rank_of * (8 * G * G) + cell_of, C * 8 * G * G)
        idx = base[:, None] + jnp.arange(8, dtype=jnp.int32)[None] * (G * G)
        flat = (jnp.zeros(C * 8 * G * G, pos.dtype)
                .at[idx.reshape(-1)].set(fields.T.reshape(-1),
                                         mode="drop",
                                         unique_indices=True))
        ktab = flat.reshape(C, 8, G, G)
        nx = G // _BX
        blk = jnp.where(in_grid, csort // (G * _BX), nx)
        occ = jnp.zeros(nx + 1, jnp.int32).at[blk].max(rank + 1)[:nx]
        occ3 = jnp.maximum(occ, jnp.maximum(
            jnp.concatenate([occ[:1], occ[:-1]]),
            jnp.concatenate([occ[1:], occ[-1:]])))
        return ktab, occ, occ3, slot

    @jax.jit
    def kernel_only(ktab, occ, occ3):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        nx = G // _BX
        spec = lambda f: pl.BlockSpec((C, 8, _BX, G),
                                      lambda i, a, b: (0, 0, f(i), 0))
        return pl.pallas_call(
            _grid_kernel(C, cutoff),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=(nx,),
                in_specs=[spec(lambda i: jnp.maximum(i - 1, 0)),
                          spec(lambda i: i),
                          spec(lambda i: jnp.minimum(i + 1, nx - 1))],
                out_specs=pl.BlockSpec((C, 3, _BX, G),
                                       lambda i, a, b: (0, 0, i, 0)),
                scratch_shapes=[pltpu.VMEM((C, 8, _BX, G), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((C, 3, G, G), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=4 * _BX * G * C * (8 * 7 + 3 * 2) * 4
                + 24 * 1024 * 1024),
        )(occ, occ3, ktab, ktab, ktab)

    @jax.jit
    def readback(out, slot):
        fbase = jnp.where(slot < G * G * C,
                          (slot % C) * (3 * G * G) + slot // C, C * 3 * G * G)
        fidx = fbase[None, :] + jnp.arange(
            3, dtype=jnp.int32)[:, None] * (G * G)
        fflat = jnp.concatenate([out.reshape(-1),
                                 jnp.zeros((1,), jnp.float32)])
        return fflat[fidx]

    print(f"n={n} cap={C}", flush=True)
    order, csort, rank = timeit("setup(argsort+rank)", setup, m)
    real_occ = int(jax.device_get(
        jnp.max(jnp.where(csort != G * G + 7, rank, 0)))) + 1
    print(f"  max real occupancy = {real_occ}", flush=True)
    ktab, occ, occ3, slot = timeit("table build", build, m, order, csort,
                                   rank)
    out = timeit("kernel", kernel_only, ktab, occ, occ3)
    timeit("readback", readback, out, slot)

    binned = jax.jit(lambda mm: binned_magnet_forces(
        mm, cutoff, n_cells=pad_to(n, 8), cell_cap=C))
    timeit("binned (same cap)", binned, m, reps=20)


if __name__ == "__main__":
    main()
