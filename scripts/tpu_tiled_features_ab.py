#!/usr/bin/env python
"""Single-process TPU A/B: the tiled kernel's magnet/remainder per-step glue
vs the XLA fallback those scenes used to land on (late round 3).

Scene: 100^3 lattice (12.7M springs) + 10,000 magnetic ATTRACTORS
(mag_rad = 0, so the binned pass runs with compacted receivers --
SceneShape.magnet_receivers) + 1,024 irregular long-range springs
(remainder path).  Before the glue, has_magnets/has_remainder each
rejected the scene from the tiled kernel and it fell to the XLA step
path (~224 steps/s at 100^3).

HISTORY: the first version of this scene gave the magnets shell radii,
which forces the RECEIVER-DENSE binned pass (exactness: shell contact can
reach any mass inside a fat source's radius) -- ~0.95 s/step at 1M
receivers (receiver-gather bound), which made the warm dispatch a ~50 s
single dispatch and the TUNNEL killed the worker ("TPU worker crashed",
the known >1 min dispatch kill, CLAUDE.md).  Receiver compaction is the
fix for attractor scenes; receiver-dense scenes must keep dispatches
short (max_dispatch below guards this A/B either way).
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
from titan_tpu.ops.step import build_step_fn


def sync(st):
    return float(jax.device_get(st.t))


nx = int(os.environ.get("TITAN_BENCH_NX", "100"))
n_mag = int(os.environ.get("TITAN_AB_MAGNETS", "10000"))
n_rem = int(os.environ.get("TITAN_AB_REMAINDER", "1024"))

t0 = time.perf_counter()
sim = Simulation(SimConfig(host_store_dtype="float32"))
sim.createLattice(Vec(0, 0, 5), Vec(4, 4, 4), nx, nx, nx)
sim.setAllSpringConstantValues(1000.0)
sim.setTimeStep(0.0001)
sim.setGlobalAcceleration(Vec(0, 0, -9.8))
sim.defaultRestLengths()
sim.createPlane(Vec(0, 0, 1), 0)

st = sim._store
n = st.n_masses
if n_mag:
    # gentle pure attractors (rad = 0 -> receiver compaction; maxf small
    # enough not to blow up the lattice)
    idx = np.linspace(0, n - 1, n_mag).astype(np.int64)
    st.mag_maxf[idx] = 1e-5
    st.mag_scale[idx] = 1.0
if n_rem:
    rng = np.random.RandomState(0)
    a = rng.randint(0, n, n_rem)
    b = rng.randint(0, n, n_rem)
    keep = a != b
    for ai, bi in zip(a[keep], b[keep]):
        d = st.pos[bi] - st.pos[ai]
        st_i = st.add_spring(int(ai), int(bi), k=50.0,
                             rest=float(np.sqrt(np.dot(d, d))))

sim._T = 0.0
sim._marshal()
shape = sim._shape
assert shape.has_magnets and shape.has_remainder
assert shape.magnet_receivers, "expected compacted magnet receivers"
reason = pallas_tiled.tiled_reject_reason(shape)
assert reason is None, reason
print(f"setup {time.perf_counter()-t0:.1f}s  springs={st.n_springs} "
      f"(remainder={int(np.sum(sim._sp_family < 0))}) magnets={n_mag}",
      flush=True)

step = build_step_fn(shape)
xla_chunk = jax.jit(lambda s, k: jax.lax.fori_loop(
    0, k, lambda i, ss: step(ss), s))

# the tunnel kills single dispatches past ~1 min (CLAUDE.md); run every
# window as repeated bounded dispatches
MAX_DISPATCH = int(os.environ.get("TITAN_MAX_DISPATCH", "100"))


def run(chunk, state, steps):
    """Bounded dispatches, queued WITHOUT intermediate syncs (a sync per
    dispatch would re-add the ~25 ms tunnel readback the round-3 bench
    window fix removed); the caller syncs once at the end."""
    left = steps
    while left > 0:
        k = min(left, MAX_DISPATCH)
        state = chunk(state, jnp.int32(k))
        left -= k
    return state


for name, chunk in (("xla", xla_chunk),
                    ("tiled+glue", pallas_tiled.build_tiled_chunk(shape))):
    state = sim._state
    t0 = time.perf_counter()
    state = run(chunk, state, 1)
    sync(state)
    compile_s = time.perf_counter() - t0
    warm = 50 if name == "xla" else 200
    state = run(chunk, state, warm)
    sync(state)
    steps = int(os.environ.get("TITAN_AB_STEPS", "300" if name == "xla"
                               else "1200"))
    t0 = time.perf_counter()
    state = run(chunk, state, steps)
    sync(state)
    el = time.perf_counter() - t0
    print(json.dumps({
        "path": name, "steps_per_sec": round(steps / el, 1),
        "springs_per_sec": round(st.n_springs * steps / el),
        "compile_s": round(compile_s, 1)}), flush=True)
