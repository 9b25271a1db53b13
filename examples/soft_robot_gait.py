"""Soft-robot locomotion via breathing-spring actuation on a friction plane
(BASELINE.json config 4: "time-varying spring rest-length actuation
(breathing gait) on friction plane").

Half of the robot's springs contract-then-expand (reference scale
1 - 0.2 sin(omega t), sim.cu:1169-1172); the phase asymmetry against ground
friction produces net locomotion.  Exports an interactive HTML viewer.
"""

import numpy as np

import titan_tpu as titan
from titan_tpu import ACTIVE_CONTRACT_THEN_EXPAND, ACTIVE_EXPAND_THEN_CONTRACT


def build_robot(sim, omega=6.0):
    robot = sim.createLattice(titan.Vec(0, 0, 0.55), titan.Vec(1, 1, 1),
                              4, 4, 4)
    sim.setAllSpringConstantValues(3000.0)
    st = sim._store
    # actuate springs by which half of the body they sit in (x-asymmetric
    # gait): front half contracts first, back half expands first
    for s in robot.springs:
        mid_x = 0.5 * (s._left.pos[0] + s._right.pos[0])
        if mid_x < 0:
            s.changeType(ACTIVE_CONTRACT_THEN_EXPAND, omega)
        else:
            s.changeType(ACTIVE_EXPAND_THEN_CONTRACT, omega)
    return robot


def main():
    sim = titan.Simulation()
    robot = build_robot(sim)
    sim.createPlane(titan.Vec(0, 0, 1), 0, 0.5, 0.7)  # friction ground
    sim.setGlobalAcceleration(titan.Vec(0, 0, -9.8))
    sim.setTimeStep(0.0001)

    from titan_tpu.runtime.viewer import Recorder
    rec = Recorder(sim, cadence=0.02)

    sim.start()
    start_com = None
    for second in range(5):
        rec.run_until(sim.time() + 1.0)
        sim.getAll()
        pos = sim._store.pos[: sim._store.n_masses]
        com = pos.mean(axis=0)
        if start_com is None:
            start_com = com.copy()
        print(f"t={sim.time():.1f}s  COM={np.round(com, 3)}  "
              f"travel={np.linalg.norm((com - start_com)[:2]):.3f} m")
        sim.resume() if sim.time() < 4.99 else None
    sim.stop()
    rec.export_html("soft_robot_gait.html")
    print("wrote soft_robot_gait.html")


if __name__ == "__main__":
    main()
