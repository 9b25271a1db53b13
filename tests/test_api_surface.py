"""Every public method of the reference sim.h surface, driven once.

A breadth guard for the name-for-name parity claim (COMPONENT_MAP.md):
each `titan::Simulation` public method (sim.h:41-127) plus the handle
surfaces must exist, accept the reference's argument shapes, and not
blow up in a realistic call sequence.  Depth is covered by the dedicated
suites; this test exists so removing or breaking any single method fails
loudly.
"""

import io
import contextlib

import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec


def test_every_reference_method_drivable(tmp_path):
    sim = Simulation(SimConfig())

    # builders (sim.h:71-80)
    cube = sim.createCube(Vec(3, 3, 1), 0.5)
    lat = sim.createLattice(Vec(0, 0, 2), Vec(1, 1, 1), 3, 3, 3)
    beam = sim.createBeam(Vec(-3, 0, 2), Vec(1, 1, 1), 3, 3, 3)
    link = sim.createRobotLink(Vec(5, 0, 0.1), Vec(5.2, 0, 0.1),
                               0.1, 0.3, 0.1, 0.5, 1000.0, 1.0)
    cont = sim.createContainer()
    m_free = sim.createMass(Vec(0, 5, 1))
    m_free2 = sim.createMass(Vec(0, 5.5, 1))
    sp_free = sim.createSpring(m_free, m_free2)
    sp_free.defaultLength()
    cont.add(m_free)

    # globals (sim.h:63-68, 83-89)
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.createPlane(Vec(0, 0, 1), -1, 0.4, 0.6)
    sim.createBall(Vec(0, -5, 1), 0.3)
    sim.setAllSpringConstantValues(2000.0)
    sim.setAllMassValues(0.05)           # reference: ADDS m
    sim.setTimeStep(1e-4)
    assert sim.getTimeStep() == pytest.approx(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.defaultRestLengths()

    # index accessors + public vectors (sim.h:116-122); handles are
    # flyweights, so compare the row they address, not identity
    assert sim.getMassByIndex(0).index == sim.masses[0].index
    assert sim.getSpringByIndex(0)._i == sim.springs[0]._i
    assert sim.getContainerByIndex(0) is sim.containers[0]

    # viewport + debug prints (sim.h:111, 126-127, 138)
    sim.setViewport(Vec(5, 5, 3), Vec(0, 0, 1), Vec(0, 0, 1))
    sim.moveViewport(Vec(0.5, 0, 0))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sim.printPositions()
        sim.printSprings()
    assert len(buf.getvalue().splitlines()) >= sim._store.n_masses

    # run control (sim.h:92-109)
    sim.start()
    assert sim.running()
    sim.setBreakpoint(0.05)
    sim.waitForEvent()
    assert sim.time() == pytest.approx(0.05, abs=1e-6)
    sim.resume()
    sim.wait(0.01)
    sim.resume()
    sim.waitUntil(0.08)
    sim.resume()
    sim.pause(0.1)
    assert sim.time() == pytest.approx(0.1, abs=1e-6)

    # get/set at a pause (sim.h:51-60)
    sim.get(sim.masses[0])
    sim.get(sim.springs[0])
    sim.get(lat)
    sim.getAll()
    lat.rotate(Vec(0, 0, 1), 0.1)
    lat.translate(Vec(0.05, 0, 0))
    lat.setMassValues(0.01)              # reference: ADDS
    lat.setSpringConstants(1500.0)
    lat.setRestLengths(0.4)
    lat.defaultRestLengths()
    beam.fix()
    link.expand()
    sim.set(sim.masses[0])
    sim.set(sim.springs[0])
    sim.set(lat)
    sim.set(link)
    sim.setAll()

    # dynamic topology (sim.h:41-49, 72)
    m_new = sim.createMass(Vec(0, 6, 1))
    sp_new = sim.createSpring(m_new, m_free)
    sp_new._k = 50.0
    sp_new.defaultLength()
    sim.deleteSpring(sp_new)
    sim.deleteMass(m_new)
    sim.deleteContainer(cube)

    sim.resume()
    sim.wait(0.02)
    assert sim.fps() == -1.0             # no recorder attached (reference
                                         # returns -1 with no frames)
    sim.clearConstraints()               # global constraints only

    # stop(t) overload parks at t, then stop() frees (sim.h:94-95)
    sim.stop(0.15)
    sim.getAll()
    pos = np.array([[m.pos[i] for i in range(3)] for m in sim.masses])
    assert np.isfinite(pos).all()
    sim.stop()
    with pytest.raises(RuntimeError):
        sim.printPositions()             # reference throws after stop

    # reset allows a fresh start in the same process
    sim2 = Simulation(SimConfig())
    sim2.createCube(Vec(0, 0, 1), 0.5)
    sim2.setTimeStep(1e-4)
    sim2.start()
    sim2.pause(0.01)
    sim2.reset()
    sim2.stop()
