"""Soft-robot breathing-gait locomotion on a friction plane (BASELINE.json
config 4) -- the actuation + friction stack working together."""

import numpy as np

from titan_tpu import (ACTIVE_CONTRACT_THEN_EXPAND,
                       ACTIVE_EXPAND_THEN_CONTRACT, Simulation, SimConfig,
                       Vec)


def test_breathing_gait_locomotes():
    sim = Simulation(SimConfig())  # default semantics incl. velocity clamp
    robot = sim.createLattice(Vec(0, 0, 0.55), Vec(1, 1, 1), 4, 4, 4)
    sim.setAllSpringConstantValues(3000.0)
    for s in robot.springs:
        mid_x = 0.5 * (s._left.pos[0] + s._right.pos[0])
        if mid_x < 0:
            s.changeType(ACTIVE_CONTRACT_THEN_EXPAND, 6.0)
        else:
            s.changeType(ACTIVE_EXPAND_THEN_CONTRACT, 6.0)
    sim.createPlane(Vec(0, 0, 1), 0, 0.5, 0.7)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(0.0001)

    sim.start()
    sim.pause(0.3)
    sim.getAll()
    pos = sim._store.pos[: sim._store.n_masses]
    com0 = pos.mean(axis=0)
    sim.resume()
    sim.pause(3.0)
    sim.getAll()
    pos = sim._store.pos[: sim._store.n_masses]
    com1 = pos.mean(axis=0)
    sim.stop()

    assert np.all(np.isfinite(pos))
    # body held together (max extent bounded)
    assert np.ptp(pos, axis=0).max() < 3.0
    # asymmetric actuation against friction produced net travel
    travel = np.linalg.norm((com1 - com0)[:2])
    assert travel > 0.05, f"robot only travelled {travel:.4f} m"
    # still resting on (not through) the ground
    assert pos[:, 2].min() > -0.1
