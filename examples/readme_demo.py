"""The reference README demo (README.md:9-21): a 5x5x5 lattice bouncing on a
plane, run for 10 seconds."""

import titan_tpu as titan

sim = titan.Simulation()
sim.createLattice(titan.Vec(0, 0, 10), titan.Vec(5, 5, 5), 5, 5, 5)
sim.createPlane(titan.Vec(0, 0, 1), 0)  # half-space z > 0
sim.setGlobalAcceleration(titan.Vec(0, 0, -9.8))

sim.start()

while sim.time() < 10:
    sim.wait(1.0)
    sim.getAll()
    print(f"t={sim.time():.2f}s  mass[0] at {sim.masses[0].pos}")
    sim.resume()

sim.stop()
