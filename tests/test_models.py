"""Model archetypes: cloth, rope, walker, magnet truss."""

import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu import models


def test_cloth_hangs_from_top_edge():
    sim = Simulation(SimConfig(velocity_clamp=False))
    sheet = models.cloth(sim, Vec(0, 0, 2), size=1.0, n=8, fix_edge="top")
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(1.0)
    sim.getAll()
    st = sim._store
    idx = sheet._mass_idx.reshape(8, 8)
    top_z = st.pos[idx[:, -1], 2]
    bottom_z = st.pos[idx[:, 0], 2]
    np.testing.assert_allclose(top_z, 2.5, atol=1e-6)   # pinned
    assert bottom_z.mean() < 1.5                        # drooped
    assert np.all(np.isfinite(st.pos[: st.n_masses]))
    sim.stop()


def test_rope_hangs():
    sim = Simulation(SimConfig(velocity_clamp=False))
    r = models.rope(sim, Vec(0, 0, 2), Vec(1, 0, 2), n=10)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(1.5)
    sim.getAll()
    st = sim._store
    z = st.pos[r._mass_idx, 2]
    assert z[0] == pytest.approx(2.0, abs=1e-6)  # anchored
    assert z[-1] < 1.8                           # free end swung down
    assert np.all(np.isfinite(z))
    sim.stop()


def test_tensegrity_holds_shape():
    """The six-strut tensegrity is self-stressed: dropped onto a plane with
    no fixed masses, it settles without collapsing or flying apart."""
    sim = Simulation(SimConfig(velocity_clamp=False))
    t = models.tensegrity(sim, Vec(0, 0, 1.0), radius=0.5)
    sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(0.0001)
    st = sim._store
    k = st.k[t._spring_idx]
    assert t._mass_idx.shape[0] == 12 and t._spring_idx.shape[0] == 30
    assert int((k > 10000).sum()) == 6          # struts
    assert int((k < 10000).sum()) == 24         # cables
    d0 = st.pos[t._mass_idx]
    r0 = np.linalg.norm(d0 - d0.mean(0), axis=1).max()
    sim.start()
    sim.pause(1.0)
    sim.getAll()
    p = st.pos[t._mass_idx]
    assert np.all(np.isfinite(p))
    assert p[:, 2].min() > -0.05                # resting on the plane
    r = np.linalg.norm(p - p.mean(0), axis=1)
    assert r.max() < 2.0 * r0                   # didn't explode
    assert r.min() > 0.25 * r0                  # didn't collapse
    # struts stay rigid: length within 2% of rest
    li = st.left[t._spring_idx]
    ri = st.right[t._spring_idx]
    lens = np.linalg.norm(st.pos[ri] - st.pos[li], axis=1)
    strut = st.k[t._spring_idx] > 10000
    np.testing.assert_allclose(lens[strut], st.rest[t._spring_idx][strut],
                               rtol=0.02)
    sim.stop()


def test_walker_walks():
    sim = Simulation(SimConfig())
    body = models.walker(sim, n=4)
    sim.createPlane(Vec(0, 0, 1), 0, 0.5, 0.7)
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(0.3)
    sim.getAll()
    com0 = sim._store.pos[body._mass_idx].mean(axis=0)
    sim.resume()
    sim.pause(2.5)
    sim.getAll()
    com1 = sim._store.pos[body._mass_idx].mean(axis=0)
    sim.stop()
    assert np.linalg.norm((com1 - com0)[:2]) > 0.03


def test_truss_tetrahedron_expands():
    sim = Simulation(SimConfig(velocity_clamp=False))
    links = models.truss_tetrahedron(sim, Vec(0, 0, 1), mag_force=0.3)
    assert len(links) == 6
    for link in links:
        assert link.expand()
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(2.0)
    sim.getAll()
    # all actuated rest lengths grew
    for link in links:
        assert link.s._rest > link.min_length * 1.01
    pos = sim._store.pos[: sim._store.n_masses]
    assert np.all(np.isfinite(pos))
    sim.stop()


def test_quadruped_trots():
    sim = Simulation(SimConfig())
    q = models.quadruped(sim)
    sim.createPlane(Vec(0, 0, 1), 0, 0.5, 0.7)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(0.3)
    sim.getAll()
    com0 = sim._store.pos[q["body"]._mass_idx].mean(axis=0)
    sim.resume()
    sim.pause(2.5)
    sim.getAll()
    pos = sim._store.pos[: sim._store.n_masses]
    com1 = sim._store.pos[q["body"]._mass_idx].mean(axis=0)
    sim.stop()
    assert np.isfinite(pos).all()
    # body + legs stayed assembled and upright on the plane
    assert np.ptp(pos, axis=0).max() < 2.0
    assert pos[:, 2].min() > -0.05
    assert com1[2] > 0.3
    # the trot produced net travel against friction
    assert np.linalg.norm((com1 - com0)[:2]) > 0.02
