#!/usr/bin/env python
"""TPU integration soak: the full public API surface on real hardware.

Drives one process through the flows a reference user would hit: lattice
bounce with breakpoints, live get/rotate/set, a mid-run feature flip
(damping push -> re-marshal), create/delete churn past the compaction
threshold, checkpoint save/load/continue, and a RobotLink gait.  Asserts
physical sanity (finite state, monotonic time, ground contact respected)
rather than exact trajectories -- the CPU suite pins those.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from titan_tpu import Simulation, SimConfig, Vec

t_start = time.perf_counter()
ok = []


def check(name, cond):
    ok.append((name, bool(cond)))
    print(f"  {'PASS' if cond else 'FAIL'}  {name}  "
          f"[{time.perf_counter()-t_start:.0f}s]", flush=True)


# --- 1. lattice bounce + breakpoints + live rotate ---
sim = Simulation(SimConfig(host_store_dtype="float32"))
lat = sim.createLattice(Vec(0, 0, 3), Vec(1, 1, 1), 10, 10, 10)
sim.setAllSpringConstantValues(5000.0)
sim.defaultRestLengths()
sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
sim.setTimeStep(1e-4)
sim.setGlobalAcceleration(Vec(0, 0, -9.8))
sim.start()
for k in range(3):
    sim.pause(sim.time() + 0.2)
    sim.get(lat)
    lat.rotate(Vec(0, 0, 1), 0.2)
    sim.set(lat)
    sim.resume()
sim.wait(0.1)
sim.pause(sim.time())
sim.getAll()
pos = np.array([[m.pos[0], m.pos[1], m.pos[2]] for m in sim.masses])
check("bounce+rotate finite", np.isfinite(pos).all())
check("above ground (contact)", (pos[:, 2] > -0.1).all())
check("time advanced", sim.time() > 0.69)

# --- 2. mid-run feature flip: damping push forces re-marshal ---
for s in sim.springs[:200]:
    s.addDamping(0.3)
    sim.set(s)
sim.resume()
sim.wait(0.1)
sim.pause(sim.time())
sim.getAll()
pos2 = np.array([[m.pos[0], m.pos[1], m.pos[2]] for m in sim.masses])
check("damping-flip finite", np.isfinite(pos2).all())

# --- 3. churn: create/delete past the compaction threshold ---
n0 = sim._store.n_masses
for r in range(6):
    ms = [sim.createMass(Vec(2 + 0.01 * i, 0.01 * r, 2)) for i in range(40)]
    sps = [sim.createSpring(ms[i], ms[i + 1]) for i in range(39)]
    for sp in sps:
        sp._k = 100.0
        sp.defaultLength()
    for m in ms[::2]:
        sim.deleteMass(m)
    sim.resume()
    sim.wait(0.02)
    sim.pause(sim.time())
check("churn survives", np.isfinite(
    np.array([sim.masses[0].pos[i] for i in range(3)])).all())
check("store stays bounded", sim._store.n_masses < n0 + 6 * 40 + 1)

# --- 4. checkpoint save / load / continue ---
from titan_tpu.runtime.checkpoint import save, load
path = "/tmp/titan_soak_ckpt.npz"
save(sim, path)
t_saved = sim.time()
sim2 = load(path)
sim2.resume()
sim2.wait(0.05)
sim2.pause(sim2.time())
check("checkpoint resumes", sim2.time() > t_saved + 0.049)
sim2.stop()
sim.stop()

# --- 5. RobotLink gait (magnets + actuation on the VMEM kernel) ---
sim3 = Simulation(SimConfig(host_store_dtype="float32"))
links = [sim3.createRobotLink(Vec(0.1 * i, 0, 0.1), Vec(0.1 * i + 0.1, 0, 0.1),
                              0.1, 0.15, 0.05, 0.5, 1000.0, 1.0)
         for i in range(8)]
sim3.createPlane(Vec(0, 0, 1), 0, 0.5, 0.7)
sim3.setTimeStep(1e-4)
sim3.setGlobalAcceleration(Vec(0, 0, -9.8))
sim3.start()
for k in range(4):
    sim3.pause(sim3.time())
    for i, ln in enumerate(links):
        (ln.expand if (k + i) % 2 else ln.contract)()
        sim3.set(ln)
    sim3.resume()
    sim3.wait(0.25)
sim3.pause(sim3.time())
sim3.getAll()
p3 = np.array([[m.pos[i] for i in range(3)] for m in sim3.masses])
check("gait finite", np.isfinite(p3).all())
check("gait grounded", (p3[:, 2] > -0.05).all())
sim3.stop()

# --- 6. beyond-VMEM scene with magnets + remainder springs (tiled glue) ---
sim4 = Simulation(SimConfig(host_store_dtype="float32"))
sim4.createLattice(Vec(0, 0, 4), Vec(3, 3, 3), 64, 64, 64)
sim4.setAllSpringConstantValues(1000.0)
sim4.defaultRestLengths()
st4 = sim4._store
n4 = st4.n_masses
midx = np.linspace(0, n4 - 1, 10_000).astype(np.int64)  # grid-kernel scale
st4.mag_rad[midx] = 0.01
st4.mag_stiffness[midx] = 100.0
st4.mag_maxf[midx] = 1e-5
st4.mag_scale[midx] = 1.0
rng4 = np.random.RandomState(3)
for a, b in zip(rng4.randint(0, n4, 50), rng4.randint(0, n4, 50)):
    if a != b:
        sim4.createSpring(sim4.masses[int(a)], sim4.masses[int(b)])
sim4.createPlane(Vec(0, 0, 1), 0)
sim4.setTimeStep(1e-4)
sim4.setGlobalAcceleration(Vec(0, 0, -9.8))
sim4._T = 0.0
sim4._marshal()
from titan_tpu.ops.pallas_step import pallas_reject_reason
from titan_tpu.ops.pallas_tiled import tiled_reject_reason
check("64^3+features picks the tiled path",
      pallas_reject_reason(sim4._shape) is not None
      and tiled_reject_reason(sim4._shape) is None
      and sim4._shape.has_magnets and sim4._shape.has_remainder)
sim4.start()
sim4.wait(0.05)
sim4.pause(sim4.time())
sim4.getAll()
p4 = np.array([[m.pos[i] for i in range(3)] for m in sim4.masses[:2000]])
check("tiled-glue finite", np.isfinite(p4).all())
sim4.stop()

fails = [n for n, c in ok if not c]
print(f"\nSOAK: {len(ok) - len(fails)}/{len(ok)} passed"
      + (f"  FAILURES: {fails}" if fails else ""), flush=True)
sys.exit(1 if fails else 0)
