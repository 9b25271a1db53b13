#!/usr/bin/env python
"""Round-3 single-process TPU A/Bs.

Modes (arg 1):
  fmath      -- shared-subexpression force form vs legacy mag*inv form,
                interleaved A/B at the 43^3 bench config (VMEM kernel)
  multiagent -- the reference multi-agent config (100 x 5^3 + 648 cross
                links) on the fused VMEM kernel vs the XLA step path
  remainder  -- 16^3 lattice + 600 random irregular springs: fused kernel
                (factorized selectors) vs the XLA gather path
  actuated   -- 100^3 actuated-gait scene on the grid-tiled kernel
                (round-3 envelope) vs its round-2 XLA fallback
Each prints one JSON line per measurement.  Interleaved repeats absorb the
~20% run-to-run drift of the shared chip.
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


def sync(st):
    return float(jax.device_get(st.t))


def measure(chunk, state, steps, warm=50):
    state = chunk(state, jnp.int32(warm))
    sync(state)
    t0 = time.perf_counter()
    state = chunk(state, jnp.int32(steps))
    sync(state)
    return steps / (time.perf_counter() - t0), state


def bench_scene(nx=43):
    sim = Simulation(SimConfig(host_store_dtype="float32"))
    sim.createLattice(Vec(0, 0, 5), Vec(4, 4, 4), nx, nx, nx)
    sim.setAllSpringConstantValues(1000.0)
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.defaultRestLengths()
    sim.createPlane(Vec(0, 0, 1), 0)
    sim._T = 0.0
    sim._marshal()
    return sim


def mode_fmath():
    from titan_tpu.ops import pallas_step
    sim = bench_scene()
    chunks = {}
    for name, envv in (("legacy", "legacy"), ("shared", "")):
        os.environ["TITAN_FMATH"] = envv
        chunks[name] = pallas_step.build_pallas_chunk(sim._shape)
        r, _ = measure(chunks[name], sim._state, 2000)   # compile+warm
    # physics cross-check: both forms from the same state, 200 steps
    o1 = chunks["legacy"](sim._state, jnp.int32(200))
    o2 = chunks["shared"](sim._state, jnp.int32(200))
    dmax = float(jnp.max(jnp.abs(o1.masses.pos - o2.masses.pos)))
    print(json.dumps({"mode": "fmath_xcheck", "pos_maxdiff_200": dmax}),
          flush=True)
    assert dmax < 1e-3, dmax
    results = {n: [] for n in chunks}
    for rep in range(4):
        for name, chunk in chunks.items():
            r, _ = measure(chunk, sim._state, 20000, warm=2000)
            results[name].append(round(r, 1))
    s = sim._store.n_springs
    for name, rs in results.items():
        best = max(rs)
        print(json.dumps({"mode": f"fmath_{name}", "steps_per_sec": rs,
                          "best": best,
                          "springs_per_sec": round(best * s)}), flush=True)


def multiagent_scene():
    SIZE, SPACE, NX, NY, D = 5.0, 3.0, 10, 10, 5
    sim = Simulation(SimConfig(velocity_clamp=False))
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    grid = [[None] * NX for _ in range(NY)]
    for i in range(NY):
        for j in range(NX):
            grid[i][j] = sim.createLattice(
                Vec((SIZE + SPACE) * j + SIZE / 2,
                    (SIZE + SPACE) * i + SIZE / 2, SIZE / 2),
                Vec(SIZE, SIZE, SIZE), D, D, D)
    right = [(100, 0), (120, 20), (104, 4), (124, 24)]
    up = [(20, 0), (120, 100), (124, 104), (24, 4)]
    for i in range(NY - 1):
        for j in range(NX - 1):
            for a, b in right:
                s1 = sim.createSpring(grid[i][j].masses[a],
                                      grid[i][j + 1].masses[b])
                s1._k = 0.01
                s1.defaultLength()
            for a, b in up:
                s1 = sim.createSpring(grid[i][j].masses[a],
                                      grid[i + 1][j].masses[b])
                s1._k = 0.01
                s1.defaultLength()
    sim.defaultRestLengths()
    sim.setTimeStep(1e-4)
    sim._T = 0.0
    sim._marshal()
    return sim


def _fused_vs_xla(sim, steps, tag):
    from titan_tpu.ops.pallas_step import build_pallas_chunk, \
        pallas_reject_reason
    from titan_tpu.ops.step import build_step_fn
    assert pallas_reject_reason(sim._shape) is None, \
        pallas_reject_reason(sim._shape)
    fused = build_pallas_chunk(sim._shape)
    step = build_step_fn(sim._shape)
    xla = jax.jit(lambda s, n: jax.lax.fori_loop(
        0, n, lambda i, st: step(st), s))
    results = {"fused": [], "xla": []}
    for chunk in (fused, xla):   # compile both first
        measure(chunk, sim._state, 200, warm=50)
    for rep in range(3):
        for name, chunk in (("fused", fused), ("xla", xla)):
            r, _ = measure(chunk, sim._state, steps, warm=steps // 10)
            results[name].append(round(r, 1))
    s = sim._store.n_springs
    for name, rs in results.items():
        print(json.dumps({"mode": f"{tag}_{name}", "steps_per_sec": rs,
                          "best": max(rs),
                          "springs_per_sec": round(max(rs) * s)}),
              flush=True)
    print(json.dumps({"mode": f"{tag}_speedup",
                      "x": round(max(results["fused"])
                                 / max(results["xla"]), 2)}), flush=True)


def mode_multiagent():
    _fused_vs_xla(multiagent_scene(), 5000, "multiagent")


def mode_remainder():
    rng = np.random.RandomState(7)
    sim = Simulation(SimConfig(velocity_clamp=False))
    sim.createLattice(Vec(0, 0, 3), Vec(2, 2, 2), 16, 16, 16)
    sim.setAllSpringConstantValues(800.0)
    n = len(sim.masses)
    made = set()
    while len(made) < 600:
        a, b = int(rng.randint(n)), int(rng.randint(n))
        if a == b or (a, b) in made or (b, a) in made:
            continue
        made.add((a, b))
        sp = sim.createSpring(sim.masses[a], sim.masses[b])
        sp._k = float(rng.uniform(50, 300))
        sp.defaultLength()
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(1e-4)
    sim._T = 0.0
    sim._marshal()
    assert sim._shape.has_remainder
    print(json.dumps({"mode": "remainder_scene",
                      "irregular": int(np.count_nonzero(
                          np.asarray(sim._state.springs.valid))),
                      "n_masses": sim._store.n_masses}), flush=True)
    _fused_vs_xla(sim, 5000, "remainder")


def mode_actuated():
    from titan_tpu import ACTUATED_EXPAND
    from titan_tpu.ops import pallas_tiled
    from titan_tpu.ops.step import build_step_fn
    nx = int(os.environ.get("TITAN_BENCH_NX", "100"))
    t0 = time.perf_counter()
    sim = Simulation(SimConfig(host_store_dtype="float32"))
    sim.createLattice(Vec(0, 0, 5), Vec(4, 4, 4), nx, nx, nx)
    sim.setAllSpringConstantValues(1000.0)
    st = sim._store
    s = st.n_springs
    st.s_type[: s // 4] = ACTUATED_EXPAND
    st.l_max[: s // 4] = st.rest[: s // 4] * 1.15
    st.rate[: s // 4] = 0.3
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.createPlane(Vec(0, 0, 1), 0)
    sim._T = 0.0
    sim._marshal()
    print(f"setup {time.perf_counter()-t0:.1f}s springs={s}", flush=True)
    assert pallas_tiled.tiled_supported(sim._shape), \
        pallas_tiled.tiled_reject_reason(sim._shape)
    tiled = pallas_tiled.build_tiled_chunk(sim._shape)
    r, _ = measure(tiled, sim._state, 300, warm=50)
    print(json.dumps({"mode": "actuated_tiled",
                      "steps_per_sec": round(r, 1),
                      "springs_per_sec": round(r * s)}), flush=True)
    if os.environ.get("TITAN_AB_XLA", "1") == "1":
        step = build_step_fn(sim._shape)
        xla = jax.jit(lambda st_, n_: jax.lax.fori_loop(
            0, n_, lambda i, x: step(x), st_))
        r2, _ = measure(xla, sim._state, 100, warm=20)
        print(json.dumps({"mode": "actuated_xla",
                          "steps_per_sec": round(r2, 1),
                          "speedup": round(r / r2, 2)}), flush=True)

def mode_magthresh():
    """Where should magnet scenes switch paths?  Step-rate of the three
    magnet formulations -- in-VMEM Pallas pairwise, chunked XLA pairwise,
    cell-binned -- on RobotLink-like random clouds at 2k-32k magnetic
    masses (full step including spring/contact physics, via SimConfig
    knobs), to re-derive magnet_pallas_max / magnet_binned_threshold."""
    import numpy as _np

    def scene(n, pallas_max, binned_thr):
        rng = _np.random.RandomState(0)
        side = 0.14 * (n / 4.0) ** 0.5
        sim = Simulation(SimConfig(velocity_clamp=False,
                                   magnet_pallas_max=pallas_max,
                                   magnet_binned_threshold=binned_thr))
        for i in range(n):
            sim.createMass(Vec(*rng.uniform(-side / 2, side / 2, 3)))
        st = sim._store
        st.mag_rad[:n] = rng.uniform(0.01, 0.05, n)
        st.mag_stiffness[:n] = rng.uniform(100, 500, n)
        st.mag_maxf[:n] = rng.uniform(0, 2, n)
        st.mag_scale[:n] = rng.choice([0.0, 1.0], n)
        # a few springs so the scene has stencil families (kernel envelope)
        for i in range(0, n - 1, 2):
            sp = sim.createSpring(sim.masses[i], sim.masses[i + 1])
            sp._k = 50.0
            sp.defaultLength()
        sim.setGlobalAcceleration(Vec(0, 0, -9.8))
        sim.setTimeStep(1e-4)
        sim._T = 0.0
        sim._marshal()
        return sim

    from titan_tpu.ops.step import build_chunk_fn
    from titan_tpu.ops.pallas_step import pallas_supported
    for n in (2048, 4096, 8192, 16384, 32768):
        out = {"mode": f"magthresh_{n}"}
        for name, pmax, bthr in (("pallas", 10**6, 10**9),
                                 ("xla_pairwise", 0, 10**9),
                                 ("binned", 0, 1)):
            sim = scene(n, pmax, bthr)
            if name == "pallas" and not pallas_supported(sim._shape):
                out[name] = "envelope-reject"
                continue
            chunk = build_chunk_fn(sim._shape)
            steps = 500 if n <= 8192 else 200
            r, _ = measure(chunk, sim._state, steps, warm=steps // 5)
            r2, _ = measure(chunk, sim._state, steps, warm=steps // 5)
            out[name] = round(max(r, r2), 1)
        print(json.dumps(out), flush=True)


def mode_grad():
    """Gradient-path cost at the 1M-spring bench: forward chunk vs
    diff.rollout vs diff.fast_rollout fwd+bwd (measured statement for the
    differentiable-simulation docs)."""
    from titan_tpu import diff
    sim = bench_scene()
    shape, state = sim._shape, sim._state
    n_steps, seg = 200, 50

    import dataclasses as _dc

    def with_pos(p):
        return _dc.replace(state, masses=_dc.replace(state.masses, pos=p))

    fwd = jax.jit(lambda p: diff.fast_rollout(
        shape, with_pos(p), n_steps, seg).masses.pos)

    def loss_fast(p):
        return jnp.sum(diff.fast_rollout(shape, with_pos(p), n_steps,
                                         seg).masses.pos ** 2)

    def loss_xla(p):
        return jnp.sum(diff.rollout(shape, with_pos(p), n_steps,
                                    checkpoint_every=seg).masses.pos ** 2)

    gfast = jax.jit(jax.grad(loss_fast))
    gxla = jax.jit(jax.grad(loss_xla))
    p0 = state.masses.pos
    res = {}
    for name, fn in (("forward_fast", fwd),
                     ("grad_fast_primal", gfast),
                     ("grad_xla", gxla)):
        jax.device_get(fn(p0)[:, :1])              # compile
        best = 0.0
        for rep in range(3):
            t0 = time.perf_counter()
            jax.device_get(fn(p0)[:, :1])
            best = max(best, n_steps / (time.perf_counter() - t0))
        res[name] = round(best, 1)
    res["mode"] = "gradpath_200steps"
    print(json.dumps(res), flush=True)



if __name__ == "__main__":
    {"fmath": mode_fmath, "multiagent": mode_multiagent,
     "remainder": mode_remainder, "actuated": mode_actuated,
     "magthresh": mode_magthresh, "grad": mode_grad}[sys.argv[1]]()
