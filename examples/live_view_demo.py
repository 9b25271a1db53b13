"""Watch a soft robot run LIVE in the browser (reference GRAPHICS mode,
decoupled): LiveViewer serves chunk-boundary snapshots over local HTTP
while the simulation steps at full speed."""

import time

import titan_tpu as titan
from titan_tpu import ACTIVE_CONTRACT_THEN_EXPAND, ACTIVE_EXPAND_THEN_CONTRACT
from titan_tpu.runtime.live import LiveViewer


def main():
    sim = titan.Simulation()
    robot = sim.createLattice(titan.Vec(0, 0, 0.55), titan.Vec(1, 1, 1),
                              4, 4, 4)
    sim.setAllSpringConstantValues(3000.0)
    for s in robot.springs:
        mid_x = 0.5 * (s._left.pos[0] + s._right.pos[0])
        s.changeType(ACTIVE_CONTRACT_THEN_EXPAND if mid_x < 0
                     else ACTIVE_EXPAND_THEN_CONTRACT, 6.0)
    sim.createPlane(titan.Vec(0, 0, 1), 0, 0.5, 0.7)
    sim.setGlobalAcceleration(titan.Vec(0, 0, -9.8))
    sim.setViewport(titan.Vec(3, -3, 1.5), titan.Vec(0, 0, 0.4),
                    titan.Vec(0, 0, 1))
    sim.setTimeStep(0.0001)

    sim.start()
    lv = LiveViewer(sim, cadence=0.03)
    lv.start()
    print(f"open {lv.url} in a browser (drag = rotate, wheel = zoom)")
    try:
        sim.setBreakpoint(30.0)     # ~30 sim-seconds of gait
        while sim.running() or sim.time() < 30.0 - 1e-9:
            time.sleep(0.5)
    except KeyboardInterrupt:
        pass
    finally:
        lv.stop()
        sim.stop()


if __name__ == "__main__":
    main()
