"""Multi-device tests on the 8-device virtual CPU mesh: vmap-batched envs
sharded over 'dp', and one spatially sharded scene over 'shard'."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.parallel import (BatchedScenes, build_sharded_chunk, make_mesh,
                                shard_state)


def _scene(nx=5):
    sim = Simulation(SimConfig(velocity_clamp=False))
    sim.createLattice(Vec(0, 0, 10), Vec(2, 2, 2), nx, nx, nx)
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(0.0001)
    return sim


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_batched_envs_match_single():
    mesh = make_mesh(("dp",))
    sim = _scene()
    envs = BatchedScenes.from_simulation(sim, n_envs=16, mesh=mesh)
    envs.run(200)
    pos = np.asarray(envs.positions())
    assert pos.shape[0] == 16
    # identical envs -> identical trajectories (determinism across the batch)
    for e in range(1, 16):
        np.testing.assert_allclose(pos[e], pos[0], atol=0)

    # and they match the unbatched runtime after the same number of steps
    sim2 = _scene()
    sim2.start()
    sim2.pause(0.02)  # 200 steps at dt=1e-4
    sim2.getAll()
    n = sim2._store.n_masses
    np.testing.assert_allclose(
        pos[0][:, :n].T, sim2._store.pos[:n], atol=1e-5)
    sim2.stop()


def test_batched_per_env_params():
    mesh = make_mesh(("dp",))
    sim = Simulation(SimConfig(velocity_clamp=False))
    sim.createMass(Vec(0, 0, 0))
    sim.setGlobalAcceleration(Vec(0, 0, -1.0))
    sim.setTimeStep(0.001)
    envs = BatchedScenes.from_simulation(sim, n_envs=8, mesh=mesh)
    # per-env gravity sweep: env e gets g_z = -(e+1)
    import dataclasses
    g = -jnp.arange(1, 9, dtype=envs.state.g.dtype)
    envs.state = dataclasses.replace(
        envs.state, g=envs.state.g.at[:, 2].set(g))
    envs.run(1000)  # 1 s
    z = np.asarray(envs.positions())[:, 2, 0]
    np.testing.assert_allclose(z, -0.5 * np.arange(1, 9), rtol=2e-3)


def test_sharded_scene_matches_single_device():
    mesh = make_mesh(("shard",))
    sim = _scene(8)  # 512 masses -> 64/shard
    sim._T = 0.0
    sim._marshal()
    shape, state0 = sim._shape, sim._state

    chunk = build_sharded_chunk(shape, mesh)
    sharded = shard_state(state0, mesh)
    out_sharded = chunk(sharded, jnp.int32(100))

    from titan_tpu.ops import build_chunk_fn
    out_single = build_chunk_fn(shape)(state0, jnp.int32(100))

    np.testing.assert_allclose(np.asarray(out_sharded.masses.pos),
                               np.asarray(out_single.masses.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sharded.masses.vel),
                               np.asarray(out_single.masses.vel), atol=1e-5)
    # state really is distributed
    assert len(out_sharded.masses.pos.sharding.device_set) == 8
