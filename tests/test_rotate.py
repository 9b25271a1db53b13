"""Port of test/physics/rotate_unittest.cpp:12-41: a 10^3 lattice dropped on
a friction plane, live-rotated through the pause -> get -> rotate -> set ->
resume path every sim-second."""

from titan_tpu import Simulation, SimConfig, Vec


def test_live_rotate_on_friction_plane():
    sim = Simulation(SimConfig(velocity_clamp=False))
    l2 = sim.createLattice(Vec(0, 0, 10), Vec(5, 5, 5), 10, 10, 10)

    sim.setAllSpringConstantValues(1e5)
    l2.rotate(Vec(0, 0, 1), -0.78)

    assert len(sim.masses) == 1000
    assert len(sim.springs) == 10476

    sim.createPlane(Vec(0, 0, 1), 0, 10, 10)  # kinetic+static friction
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))

    sim.start()

    rotations = 0
    while True:
        sim.pause(sim.time() + 1)
        sim.get(l2)
        l2.rotate(Vec(0, 0, 1), 0.5)
        sim.set(l2)
        rotations += 1

        if sim.time() > 5.0:
            sim.stop()
            break
        sim.resume()

    assert rotations >= 5
    # lattice should have settled near the plane, not exploded
    sim_z = sim._store.pos[: sim._store.n_masses, 2]
    assert sim_z.min() > -1.0
    assert sim_z.max() < 20.0
