"""Entity compaction (reference invalidate + thrust::remove,
sim.cu:343-414): create/delete churn must not grow the padded scene, and
surviving user handles must keep working across compactions."""

import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec


def test_churn_keeps_n_bounded():
    """A long create/delete loop: without compaction the store grows
    monotonically and every re-marshal pads more dead rows."""
    sim = Simulation(SimConfig(velocity_clamp=False))
    anchor = sim.createMass(Vec(0, 0, 0))
    anchor.fix()
    sim.setGlobalAcceleration(Vec(0, 0, -1.0))
    sim.setTimeStep(0.0001)
    sim.start()
    t = 0.0
    for round_ in range(6):
        t += 0.02
        sim.pause(t)
        ms = [sim.createMass(Vec(0.1 * j, 0, 1)) for j in range(40)]
        sim.resume()
        t += 0.02
        sim.pause(t)
        for m in ms:
            sim.deleteMass(m)
        sim.resume()
    sim.pause(t + 0.02)
    n = sim._store.n_masses
    sim.stop()
    # 6 rounds x 40 churned masses; bounded means far below 1 + 240
    assert n <= 1 + 80, f"store grew to {n} masses despite compaction"


def test_handles_survive_compaction():
    sim = Simulation(SimConfig(velocity_clamp=False))
    keep = sim.createMass(Vec(1, 2, 3))
    doomed = [sim.createMass(Vec(j, 0, 0)) for j in range(30)]
    keep2 = sim.createMass(Vec(4, 5, 6))
    for m in doomed:
        sim.deleteMass(m)
    sim.compact()
    # surviving handles re-translate to their new rows
    assert list(keep.pos) == [1, 2, 3]
    assert list(keep2.pos) == [4, 5, 6]
    assert keep.index == 0 and keep2.index == 1
    assert sim._store.n_masses == 2
    # compacted-away handles raise
    with pytest.raises(RuntimeError, match="compacted away"):
        doomed[3].pos


def test_springs_and_containers_remap():
    sim = Simulation(SimConfig(velocity_clamp=False))
    cube = sim.createCube(Vec(0, 0, 2), 1.0)       # 8 masses / 28 springs
    extra = [sim.createMass(Vec(10 + j, 0, 0)) for j in range(20)]
    m1 = sim.createMass(Vec(20, 0, 0))
    m2 = sim.createMass(Vec(21, 0, 0))
    s = sim.createSpring(m1, m2)
    for m in extra:
        sim.deleteMass(m)
    sim.compact()
    # cube container indices survived (they were below the deleted block)
    assert len(cube._mass_idx) == 8 and len(cube._spring_idx) == 28
    # spring handle re-translates; its endpoints moved down by 20 rows
    assert s._left.index == m1.index
    assert s._rest == pytest.approx(1.0)
    st = sim._store
    assert st.n_masses == 8 + 2
    assert st.n_springs == 29
    assert np.all(st.left[:29] >= 0) and np.all(st.right[:29] >= 0)


def test_deleting_mass_drops_its_springs_on_compact():
    sim = Simulation(SimConfig(velocity_clamp=False))
    a = sim.createMass(Vec(0, 0, 0))
    b = sim.createMass(Vec(1, 0, 0))
    c = sim.createMass(Vec(2, 0, 0))
    s_ab = sim.createSpring(a, b)
    s_bc = sim.createSpring(b, c)
    sim.deleteMass(c)
    sim.compact()
    assert sim._store.n_springs == 1          # s_bc went with c
    assert s_ab._left.index == 0 and s_ab._right.index == 1
    with pytest.raises(RuntimeError, match="compacted away"):
        s_bc._k


def test_local_constraints_remap():
    from titan_tpu import CONTACT_PLANE
    sim = Simulation(SimConfig(velocity_clamp=False))
    doomed = sim.createMass(Vec(0, 0, 0))
    kept = sim.createMass(Vec(1, 0, 1))
    kept.addConstraint(CONTACT_PLANE, Vec(0, 0, 1), 0.0)
    sim.deleteMass(doomed)
    sim.compact()
    assert list(sim._store.local.keys()) == [kept.index] == [0]


def test_trajectory_identical_after_midrun_compaction():
    """Physics must not change when dead rows are dropped mid-run."""
    def run(threshold):
        sim = Simulation(SimConfig(velocity_clamp=False,
                                   compact_threshold=threshold))
        sim.createLattice(Vec(0, 0, 2), Vec(1, 1, 1), 3, 3, 3)
        sim.createPlane(Vec(0, 0, 1), 0)
        dead = [sim.createMass(Vec(50 + j, 0, 0)) for j in range(30)]
        sim.setGlobalAcceleration(Vec(0, 0, -9.8))
        sim.setTimeStep(0.0001)
        sim.start()
        sim.pause(0.1)
        for m in dead:
            sim.deleteMass(m)
        sim.resume()         # re-marshal; compacts iff threshold allows
        sim.pause(0.4)
        sim.getAll()
        out = sim._store.pos[:27].copy()
        n = sim._store.n_masses
        sim.stop()
        return out, n

    pos_c, n_c = run(0.25)
    pos_n, n_n = run(0.0)    # compaction disabled
    assert n_c == 27 and n_n == 57
    np.testing.assert_allclose(pos_c, pos_n, atol=1e-6)
