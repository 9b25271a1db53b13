"""A/B on the real TPU: full RobotLink scene (magnets + actuated springs)
through the extended VMEM Pallas kernel vs the XLA path, one process."""

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


def build(n_links=64):
    from titan_tpu import Simulation, SimConfig, Vec
    rng = np.random.RandomState(0)
    sim = Simulation(SimConfig())
    links = []
    for i in range(n_links):
        p = rng.uniform(-1, 1, 3) + [0, 0, 1.2]
        links.append(sim.createRobotLink(
            Vec(*p), Vec(*(p + [0.06, 0, 0])), 0.1, 0.08, 0.04, 0.02,
            5000.0, 1.0))
    for i, l in enumerate(links):
        (l.expand if i % 2 else l.contract)()
    sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(1e-5)
    sim._T = 0.0
    sim._marshal()
    return sim


def main():
    from titan_tpu.ops import pallas_step
    from titan_tpu.ops.step import build_step_fn

    sim = build()
    shape = sim._shape
    print(f"scene: {sim._store.n_masses} masses, {sim._store.n_springs} "
          f"springs, families={len(shape.stencil_deltas)}, "
          f"remainder={shape.has_remainder}, magnets={shape.has_magnets}, "
          f"actuated={shape.has_actuated}", flush=True)
    assert pallas_step.pallas_supported(shape), "RobotLink scene rejected!"

    chunk_p = pallas_step.build_pallas_chunk(shape)
    step = build_step_fn(shape)
    chunk_x = jax.jit(lambda st, k: jax.lax.fori_loop(
        0, k, lambda i, x: step(x), st))

    def sync(st):
        return float(jax.device_get(st.t))

    steps = 20000
    out = chunk_p(sim._state, jnp.int32(100)); sync(out)
    t0 = time.perf_counter()
    out_p = chunk_p(sim._state, jnp.int32(steps)); sync(out_p)
    tp = time.perf_counter() - t0
    print(f"pallas: {steps/tp:9.0f} steps/s", flush=True)

    out = chunk_x(sim._state, jnp.int32(100)); sync(out)
    t0 = time.perf_counter()
    out_x = chunk_x(sim._state, jnp.int32(steps)); sync(out_x)
    tx = time.perf_counter() - t0
    print(f"xla:    {steps/tx:9.0f} steps/s", flush=True)

    n = sim._store.n_masses
    pp, px = jax.device_get((out_p.masses.pos, out_x.masses.pos))
    err = np.abs(np.asarray(pp)[:, :n] - np.asarray(px)[:, :n]).max()
    rp, rx = jax.device_get((out_p.stencil.rest, out_x.stencil.rest))
    rerr = np.abs(np.asarray(rp) - np.asarray(rx)).max()
    moved = np.abs(np.asarray(rp) - np.asarray(
        jax.device_get(sim._state.stencil.rest))).max()
    print(f"speedup {tx/tp:.1f}x  max|dpos| {err:.2e}  max|drest| {rerr:.2e}"
          f"  actuation moved rest by {moved:.4f}", flush=True)


if __name__ == "__main__":
    main()
