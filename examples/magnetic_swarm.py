"""A 50,000-particle magnetic swarm: shell-contact spheres with long-range
attraction settling onto a plane under gravity.

This scale is far beyond the reference's own magnet usage (RobotLink
trusses of tens of masses, occupancy grid capped at 256x256 cells,
sim.cu:822-932).  Here the scene rides the cell-binned magnet structure,
served on TPU by the gather-free dense-grid Pallas kernel
(titan_tpu/ops/magnets_grid.py, ~180 steps/s at this size on one v5e --
7x the XLA binned pass); on CPU the same script runs the XLA binned path
unchanged.  Usage:

    python examples/magnetic_swarm.py [n_particles] [seconds]
"""

import sys

import numpy as np

import titan_tpu as titan

n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 0.02

rng = np.random.RandomState(0)
sim = titan.Simulation(titan.SimConfig(host_store_dtype="float32"))

# bulk-fill the host store (createMass in a 50k loop works but is slower)
spread = 0.5 * 0.14 * (n / 4.0) ** 0.5          # ~4 particles per grid cell
st = sim._store
st.reserve_masses(n)
st.pos[:n] = rng.uniform(-spread, spread, (n, 3))
st.pos[:, 2] += spread + 0.5                     # drop from above the plane
st.valid[:n] = True
st.n_masses = n
st.m[:n] = 0.1
st.mag_rad[:n] = rng.uniform(0.01, 0.04, n)      # shell-contact radius
st.mag_stiffness[:n] = rng.uniform(50, 200, n)   # shell stiffness
st.mag_maxf[:n] = 1e-4                           # long-range attraction
st.mag_scale[:n] = 1.0
st.drag[:n] = 0.5                                # settle instead of ringing

sim.createPlane(titan.Vec(0, 0, 1), 0)
sim.setGlobalAcceleration(titan.Vec(0, 0, -9.8))
sim.setTimeStep(1e-5)

sim.start()
for k in range(4):
    sim.wait(seconds / 4)
    sim.getAll()
    z = st.pos[:n, 2]
    print(f"t={sim.time():.4f}s  mean z={z.mean():.3f}  min z={z.min():.3f}",
          flush=True)
    sim.resume()
sim.stop()
from titan_tpu.ops.step import _on_tpu
print("done:", "dense-grid Pallas kernel"
      if sim._shape.magnet_grid and _on_tpu() else "XLA binned path")
