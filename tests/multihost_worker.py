"""Worker for the 2-process multi-host smoke test (test_multihost.py).

Each process owns 4 virtual CPU devices; together they form one 8-device
global mesh.  Both build the SAME scene (replicated control plane), place
the state over the global mesh, run the halo-exchange chunk, and print a
trajectory checksum.  The parent asserts both processes agree with each
other and with a single-process 8-device run.

Run:  python multihost_worker.py <coordinator> <n_procs> <proc_id>
"""

import sys


def main(coordinator: str, n_procs: int, proc_id: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from titan_tpu.parallel import multihost
    multihost.initialize(coordinator_address=coordinator,
                         num_processes=n_procs, process_id=proc_id)
    assert jax.process_count() == n_procs
    assert len(jax.devices()) == n_procs * 4

    import jax.numpy as jnp
    import numpy as np
    from titan_tpu import Simulation, SimConfig, Vec
    from titan_tpu.parallel.halo import build_halo_chunk, halo_supported, \
        place

    sim = Simulation(SimConfig(velocity_clamp=False))
    sim.createLattice(Vec(0, 0, 3), Vec(8, 1, 1), 32, 4, 4)
    sim.setAllSpringConstantValues(500.0)
    sim.createPlane(Vec(0, 0, 1), 0, 0.2, 0.3)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(1e-4)
    sim._T = 0.0
    sim._marshal()

    mesh = multihost.make_global_mesh(("shard",))
    assert halo_supported(sim._shape, mesh.shape["shard"])
    sharded = place(sim._state, mesh)
    chunk = build_halo_chunk(sim._shape, mesh)(sharded)
    out = chunk(sharded, jnp.int32(100))

    pos = multihost.host_gather(out.masses.pos)
    n = sim._store.n_masses
    checksum = float(np.asarray(pos, np.float64)[:, :n].sum())
    multihost.assert_replicated_control_plane(checksum, "trajectory sum")
    print(f"CHECKSUM {proc_id} {checksum:.6f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
