"""Port of test/physics/multiagent_unittest.cpp:22-71: a 10x10 grid of 5^3
lattices (12,500 masses) cross-linked by weak springs between specific mass
indices, smoke-run for 1 s then read back."""

import numpy as np

from titan_tpu import Simulation, SimConfig, Vec

SIZE = 5.0
SPACE = 3.0
NUM_X = 10
NUM_Y = 10
DENSITY = 5


def test_multiagent_grid():
    sim = Simulation(SimConfig(velocity_clamp=False))
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))

    grid = [[None] * NUM_X for _ in range(NUM_Y)]
    for i in range(NUM_Y):
        for j in range(NUM_X):
            grid[i][j] = sim.createLattice(
                Vec((SIZE + SPACE) * j + SIZE / 2,
                    (SIZE + SPACE) * i + SIZE / 2, SIZE / 2),
                Vec(SIZE, SIZE, SIZE), DENSITY, DENSITY, DENSITY)

    right = [(100, 0), (120, 20), (104, 4), (124, 24)]
    up = [(20, 0), (120, 100), (124, 104), (24, 4)]

    links = 0
    for i in range(NUM_Y - 1):
        for j in range(NUM_X - 1):
            for a, b in right:
                s1 = sim.createSpring(grid[i][j].masses[a],
                                      grid[i][j + 1].masses[b])
                s1._k = 0.01
                s1.defaultLength()
                links += 1
            for a, b in up:
                s1 = sim.createSpring(grid[i][j].masses[a],
                                      grid[i + 1][j].masses[b])
                s1._k = 0.01
                s1.defaultLength()
                links += 1

    assert len(sim.masses) == NUM_X * NUM_Y * DENSITY ** 3
    sim.defaultRestLengths()
    sim.start()
    # the cross-agent links all share two index deltas (25 right, 1230 up),
    # so delta-bucketing absorbs them as stencil families: the reference's
    # own multi-agent config rides the fused VMEM kernel with ZERO
    # remainder springs
    from titan_tpu.ops.pallas_step import pallas_supported
    assert not sim._shape.has_remainder
    assert 1230 in sim._shape.stencil_deltas
    assert pallas_supported(sim._shape)
    sim.pause(1.0)

    sim.getAll()
    sim.stop()

    pos = sim._store.pos[: sim._store.n_masses]
    assert np.all(np.isfinite(pos))
    # all lattices have been falling freely for 1 s: dz = -0.5*9.8*1^2 = -4.9
    z0 = SIZE / 2
    assert abs(pos[:, 2].mean() - (z0 - 4.9)) < 0.1
