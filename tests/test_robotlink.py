"""RobotLink magnet-truss actuator: expansion/contraction, attach/detach,
magnet pull between separate links (reference object.cu:368-464,
computeExternalMagnetForce sim.cu:1223-1241)."""

import numpy as np
import pytest

from titan_tpu import (ACTUATED_EXPAND, PASSIVE_SOFT, Simulation, SimConfig,
                       Vec)


def _link_sim():
    sim = Simulation(SimConfig(velocity_clamp=False))
    # lengths chosen exactly representable in float32 so host-side
    # expand()/contract() completion checks agree with the f32 device state
    link = sim.createRobotLink(Vec(0, 0, 0), Vec(0.125, 0, 0),
                               mass=0.1, max_exp_length=0.25,
                               min_exp_length=0.125, expansion_rate=0.05,
                               k=1000.0, magnetic_force=0.0)
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    sim.setTimeStep(0.0001)
    return sim, link


def test_expand_contract():
    sim, link = _link_sim()
    assert link.expand() is True
    assert link.s._type == ACTUATED_EXPAND
    sim.start()
    sim.pause(1.0)
    sim.getAll()
    # rest grows at rate = 0.05 m/s: 0.125 + 0.05 * 1s = 0.175
    assert link.s._rest == pytest.approx(0.175, abs=5e-3)
    sim.resume()
    sim.pause(3.0)  # by t=2.5 rest hits l_max = 0.25 and stops growing
    sim.getAll()
    assert link.s._rest == pytest.approx(0.25, abs=5e-3)
    d = np.array(list(link.mr.pos)) - np.array(list(link.ml.pos))
    assert np.linalg.norm(d) == pytest.approx(0.25, abs=2e-2)
    # now contract back (0.25 -> 0.125 takes 2.5 s)
    link.contract()
    sim.set(link.s)
    sim.resume()
    sim.pause(6.0)
    sim.getAll()
    assert link.s._rest == pytest.approx(0.125, abs=5e-3)
    assert link.contract() is False          # fully contracted
    assert link.s._type == PASSIVE_SOFT
    sim.stop()


def test_magnet_attraction_between_links():
    sim = Simulation(SimConfig(velocity_clamp=False))
    l1 = sim.createRobotLink(Vec(0, 0, 0), Vec(0.05, 0, 0), 0.1,
                             0.2, 0.05, 0.01, 1000.0, magnetic_force=0.5)
    l2 = sim.createRobotLink(Vec(0.13, 0, 0), Vec(0.18, 0, 0), 0.1,
                             0.2, 0.05, 0.01, 1000.0, magnetic_force=0.5)
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(0.05)
    sim.getAll()
    # facing magnet tips (0.05 and 0.13, gap 0.08 < 0.14 cutoff) attract
    gap = l2.ml.pos[0] - l1.mr.pos[0]
    assert gap < 0.08
    sim.stop()


def test_detach_removes_magnetism():
    sim, link = _link_sim()
    link.max_mag_force = 0.5
    link.attach()
    assert link.ml.isMagnetic()
    # detach only completes once contracted to min length; rest == min here
    assert link.detach() is True
    assert not link.ml.isMagnetic()
    assert not link.mr.isMagnetic()
