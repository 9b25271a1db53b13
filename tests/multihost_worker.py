"""Worker for the 2-process multi-host smoke tests (test_multihost.py).

Each process owns 4 virtual CPU devices; together they form one 8-device
global mesh.  Both build the SAME scene (replicated control plane), place
the state over the global mesh, run the halo-exchange chunk, and print a
trajectory checksum.  The parent asserts both processes agree with each
other and with a single-process 8-device run.

In "grad" mode the worker instead differentiates a rollout through the
DISTRIBUTED adjoint (parallel/halo_adjoint.py) over the same
process-spanning mesh -- gradients across HOSTS: the backward tile
kernel's ppermuted cotangent halo exchanges cross the process boundary
over what would be DCN on real hardware (docs/MULTIHOST.md).

Run:  python multihost_worker.py <coordinator> <n_procs> <proc_id> [grad]
"""

import sys


def run_grad(proc_id, multihost):
    """Distributed-adjoint leg: interpret-mode tiled kernels with a
    2048-row tile so the 10,700-mass lattice's real rows span blocks
    0-5 of the 8-device mesh -- the shard 3/4 block edge IS the process
    boundary, so cotangent halo flow crosses hosts."""
    import dataclasses

    import jax
    import jax.experimental.pallas as pl
    import jax.numpy as jnp
    import numpy as np

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    import titan_tpu.ops.adjoint_tiled as adt
    import titan_tpu.ops.pallas_tiled as pt
    import titan_tpu.parallel.halo_tiled as ht
    pt.pl.pallas_call = interp
    adt.pl.pallas_call = interp
    tl = lambda h, shape=None: max(h, 2048)
    pt._tile_size = tl
    ht._tile_size = tl

    from jax.sharding import NamedSharding, PartitionSpec as P

    from titan_tpu import Simulation, SimConfig, Vec
    from titan_tpu.parallel import halo_adjoint

    sim = Simulation(SimConfig(velocity_clamp=False,
                               host_store_dtype="float32"))
    sim.createLattice(Vec(0, 0, 3), Vec(8, 1, 1), 107, 10, 10)
    sim.setAllSpringConstantValues(500.0)
    sim.createPlane(Vec(0, 0, 1), 0, 0.2, 0.3)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(1e-4)
    st = sim._store
    st.damping[: st.n_springs] = 10.0
    sim._T = 0.0
    sim._marshal()
    shape, state = sim._shape, sim._state

    mesh = multihost.make_global_mesh(("shard",))
    n_dev = mesh.shape["shard"]
    r = halo_adjoint.halo_adjoint_reject_reason(shape, n_dev)
    assert r is None, r
    _, _, b, _, _ = halo_adjoint._geom_dist(shape, n_dev)
    n = sim._store.n_masses
    assert n > 4 * b, (n, b)   # real rows cross the process boundary

    npad = state.masses.pos.shape[1]
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.normal(0, 1, (3, npad)),
                    jnp.float32).at[:, n:].set(0.0)

    def loss(pos0):
        s = dataclasses.replace(
            state, masses=dataclasses.replace(state.masses, pos=pos0))
        out = halo_adjoint.halo_adjoint_rollout(shape, s, mesh, 2,
                                                segment=2)
        return jnp.sum(out.masses.pos * w)

    rep = NamedSharding(mesh, P())
    pos_g = jax.device_put(state.masses.pos, rep)
    g = jax.jit(jax.grad(loss), out_shardings=rep)(pos_g)
    g_local = np.asarray(g.addressable_shards[0].data)
    checksum = float(np.abs(np.asarray(g_local, np.float64)[:, :n]).sum())
    multihost.assert_replicated_control_plane(checksum, "gradient sum")
    print(f"GRADSUM {proc_id} {checksum:.6f}", flush=True)


def _interpret_tiled_patches():
    """Force interpret-mode pallas + a small tile so the test scene's
    real rows span several mesh blocks (same config as run_grad)."""
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    import titan_tpu.ops.pallas_tiled as pt
    import titan_tpu.parallel.halo_tiled as ht
    pt.pl.pallas_call = interp
    tl = lambda h, shape=None: max(h, 2048)
    pt._tile_size = tl
    ht._tile_size = tl


def build_tiled_scene():
    """Scene for the distributed-tiled multihost leg: stencil lattice +
    binned magnets + long-span remainder cross links, so BOTH glue paths
    (magnet + remainder) run through the per-shard tiled kernel across
    the process boundary.  Shared by the worker and the parent test's
    single-process reference -- the builds must match exactly."""
    import numpy as np
    from titan_tpu import Simulation, SimConfig, Vec

    sim = Simulation(SimConfig(velocity_clamp=False,
                               magnet_cutoff=0.6,
                               magnet_binned_threshold=2,
                               magnet_cell_cap=64))
    sim.createLattice(Vec(0, 0, 3), Vec(4, 1, 1), 40, 6, 6)
    sim.setAllSpringConstantValues(800.0)
    st = sim._store
    st.damping[: st.n_springs] = 5.0
    # magnetic masses sprinkled across the whole index range (several
    # mesh blocks); binned structure forced by the tiny threshold
    rng = np.random.RandomState(3)
    mag = rng.choice(st.n_masses, 24, replace=False)
    st.mag_maxf[mag] = 1.5
    st.mag_scale[mag] = 1.0
    st.mag_stiffness[mag] = 200.0
    # long-span irregular springs (remainder glue) crossing blocks
    for a, b in [(3, 1380), (200, 1200), (77, 950), (431, 1439),
                 (10, 700), (555, 1111)]:
        s = sim.createSpring(sim.masses[a], sim.masses[b])
        s._k = 60.0
    sim.createPlane(Vec(0, 0, 1), 0, 0.2, 0.3)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(1e-4)
    sim._T = 0.0
    sim._marshal()
    return sim


def run_tiled(proc_id, multihost):
    """Distributed TILED tier across processes (VERDICT r3 missing #3):
    the per-shard tiled Pallas kernel + its magnet/remainder glue run
    over a process-spanning mesh; the halo ppermutes between the middle
    blocks cross what would be DCN on real hardware."""
    import jax.numpy as jnp
    import numpy as np

    _interpret_tiled_patches()
    from titan_tpu.parallel.halo import place
    from titan_tpu.parallel.halo_tiled import (build_halo_tiled_chunk,
                                               halo_tiled_reject_reason)

    sim = build_tiled_scene()
    shape, state = sim._shape, sim._state
    assert shape.has_magnets and shape.magnet_binned
    assert shape.has_remainder

    mesh = multihost.make_global_mesh(("shard",))
    r = halo_tiled_reject_reason(shape, mesh.shape["shard"])
    assert r is None, r
    sharded = place(state, mesh)
    out = build_halo_tiled_chunk(shape, mesh)(sharded, jnp.int32(30))

    pos = multihost.host_gather(out.masses.pos)
    n = sim._store.n_masses
    checksum = float(np.asarray(pos, np.float64)[:, :n].sum())
    multihost.assert_replicated_control_plane(checksum, "tiled trajectory")
    print(f"TILEDSUM {proc_id} {checksum:.9f}", flush=True)


def main(coordinator: str, n_procs: int, proc_id: int,
         mode: str = "fwd"):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from titan_tpu.parallel import multihost
    multihost.initialize(coordinator_address=coordinator,
                         num_processes=n_procs, process_id=proc_id)
    assert jax.process_count() == n_procs
    assert len(jax.devices()) == n_procs * 4
    if mode == "grad":
        run_grad(proc_id, multihost)
        return
    if mode == "tiled":
        run_tiled(proc_id, multihost)
        return

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
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
         sys.argv[4] if len(sys.argv) > 4 else "fwd")
