"""Full control-plane smoke test on the real TPU (the pytest suite runs on
CPU; this exercises the same paths against actual hardware + the Pallas
kernels).  Run: python scripts/tpu_smoke.py"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import titan_tpu as titan
    from titan_tpu import SimConfig, Vec
    from titan_tpu.ops.pallas_step import pallas_supported
    from titan_tpu.testutil import energy

    print("device:", jax.devices()[0])

    # 1. lattice on friction plane through the full Simulation API
    sim = titan.Simulation(SimConfig(velocity_clamp=False))
    lat = sim.createLattice(Vec(0, 0, 5), Vec(4, 4, 4), 20, 20, 20)
    sim.setAllSpringConstantValues(1000.0)
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.defaultRestLengths()
    sim.createPlane(Vec(0, 0, 1), 0)
    sim._T = 0.0
    sim._marshal()
    print("pallas path:", pallas_supported(sim._shape))

    sim.start()
    e0 = energy(sim)
    t0 = time.perf_counter()
    checks = 0
    while sim.time() < 2.0:
        sim.wait(0.25)
        e = energy(sim)
        drift = abs(e - e0) / e0
        pos = sim._store.pos[: sim._store.n_masses]
        assert np.all(np.isfinite(pos)), "NaN state!"
        in_contact = pos[:, 2].min() < 0
        print(f"  t={sim.time():.2f}  energy drift={drift:.4f}"
              f"{' (contact)' if in_contact else ''}")
        if not in_contact:
            assert drift < 0.02, f"energy drift {drift}"
            checks += 1
        sim.resume()
    wall = time.perf_counter() - t0
    print(f"2 sim-s (20k steps, 93.5k springs) in {wall:.1f}s wall "
          f"-> {20000 / wall:,.0f} steps/s through the control plane")
    assert checks >= 2

    # 2. live mutation at a breakpoint
    sim.pause(sim.time() + 0.05)
    sim.get(lat)
    lat.rotate(Vec(0, 0, 1), 0.3)
    sim.set(lat)
    sim.resume()
    sim.pause(2.5)
    sim.getAll()
    assert np.all(np.isfinite(sim._store.pos[: sim._store.n_masses]))
    sim.stop()
    print("live rotate + resume OK")

    # 3. gait robot (breathing springs -> XLA path) on TPU
    sim2 = titan.Simulation(SimConfig())
    robot = sim2.createLattice(Vec(0, 0, 0.55), Vec(1, 1, 1), 4, 4, 4)
    sim2.setAllSpringConstantValues(3000.0)
    for s in robot.springs:
        mid = 0.5 * (s._left.pos[0] + s._right.pos[0])
        s.changeType(titan.ACTIVE_CONTRACT_THEN_EXPAND if mid < 0
                     else titan.ACTIVE_EXPAND_THEN_CONTRACT, 6.0)
    sim2.createPlane(Vec(0, 0, 1), 0, 0.5, 0.7)
    sim2.setTimeStep(0.0001)
    sim2.start()
    sim2.pause(1.0)
    sim2.getAll()
    pos = sim2._store.pos[: sim2._store.n_masses]
    assert np.all(np.isfinite(pos))
    sim2.stop()
    print("breathing-gait robot on TPU OK")
    print("TPU smoke: ALL OK")


if __name__ == "__main__":
    main()
