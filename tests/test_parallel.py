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


def test_flat_replicated_envs_match_single():
    """Flat-packed batch: every env reproduces the single-scene trajectory."""
    from titan_tpu.parallel import replicate_scene

    def build():
        s = Simulation(SimConfig(velocity_clamp=False))
        s.createLattice(Vec(0, 0, 2), Vec(1, 1, 1), 3, 3, 3)
        s.createPlane(Vec(0, 0, 1), 0)
        s.setGlobalAcceleration(Vec(0, 0, -9.8))
        s.setTimeStep(0.0001)
        return s

    src = build()
    big, envs = replicate_scene(src, n_envs=16, spacing=Vec(5, 0, 0))
    assert len(big.masses) == 16 * 27
    big.start()
    big.pause(0.5)
    big.getAll()

    single = build()
    single.start()
    single.pause(0.5)
    single.getAll()
    want = single._store.pos[:27].copy()
    single.stop()

    st = big._store
    for e, env in enumerate(envs):
        got = st.pos[env._mass_idx] - np.array([5.0 * e, 0, 0])
        np.testing.assert_allclose(got, want, atol=1e-4)
    big.stop()


def test_flat_per_env_param_sweep():
    from titan_tpu.parallel import replicate_scene
    src = Simulation(SimConfig(velocity_clamp=False))
    m1 = src.createMass(Vec(0, 0, 0))
    m1.fix()
    m2 = src.createMass(Vec(1.5, 0, 0))
    s = src.createSpring(m1, m2)
    s._rest = 1.0
    s._k = 10.0
    s._damping = 3.0
    src.setGlobalAcceleration(Vec(0, 0, 0))
    src.setTimeStep(0.0001)
    big, envs = replicate_scene(src, n_envs=4, spacing=Vec(10, 0, 0))
    # per-env stiffness sweep -> different settle speeds
    for e, env in enumerate(envs):
        env.setSpringConstants(10.0 * (e + 1))
    big.start()
    big.pause(1.0)
    big.getAll()
    st = big._store
    seps = [st.pos[env._mass_idx[1], 0] - st.pos[env._mass_idx[0], 0]
            for env in envs]
    big.stop()
    # stiffer springs pull closer to rest length by t=1
    errs = [abs(sep - 1.0) for sep in seps]
    assert errs[0] > errs[3]


def test_flat_per_env_plane_sweep():
    """Per-env contact-plane offsets on the flat-packed fast path: each
    env's floor height rides a per-mass local contact-plane slot, so the
    batch stays one stencil scene (Pallas-eligible), no vmap."""
    from titan_tpu.ops.pallas_step import pallas_supported
    from titan_tpu.parallel import replicate_scene, set_env_plane

    src = Simulation(SimConfig(velocity_clamp=False))
    src.createCube(Vec(0, 0, 1.6), 1.0)
    src.setAllSpringConstantValues(5000.0)
    for m in src.masses:
        m.setDrag(0.5)           # dissipate the bounce so the cubes settle
    src.setGlobalAcceleration(Vec(0, 0, -9.8))
    src.setTimeStep(0.0001)
    big, envs = replicate_scene(src, n_envs=4, spacing=Vec(20, 0, 0))
    floors = [0.0, 0.3, 0.6, 0.9]
    set_env_plane(big, envs, Vec(0, 0, 1), floors)
    # re-issuing must replace the tracked slot, not stack a second plane
    set_env_plane(big, envs, Vec(0, 0, 1), floors)
    big._T = 0.0
    big._marshal()
    assert big._shape.cap_cp == 1, "re-issue stacked a second slot"
    assert pallas_supported(big._shape), "left the fast-path envelope"

    big.start()
    big.pause(2.0)
    big.getAll()
    st = big._store
    for env, floor in zip(envs, floors):
        lo = st.pos[env._mass_idx, 2].min()
        # each cube rests ON ITS OWN floor (penalty penetration ~1e-3)
        assert abs(lo - floor) < 0.02, (lo, floor)
    big.stop()


def test_flat_per_env_gravity_sweep():
    """BASELINE config 5: per-env scene globals (gravity) on the flat-packed
    fast path -- folded into the persistent external force, so the batch
    stays one stencil scene (Pallas-eligible), no vmap."""
    from titan_tpu.ops.pallas_step import pallas_supported
    from titan_tpu.parallel import replicate_scene
    from titan_tpu.parallel.flat import set_env_gravity

    src = Simulation(SimConfig(velocity_clamp=False))
    src.createLattice(Vec(0, 0, 0), Vec(1, 1, 1), 3, 3, 3)
    src.setAllSpringConstantValues(50.0)
    src.setGlobalAcceleration(Vec(0, 0, -9.8))
    src.setTimeStep(0.0001)
    big, envs = replicate_scene(src, n_envs=4, spacing=Vec(100, 0, 0))
    gs = [Vec(0, 0, -9.8 * (e + 1)) for e in range(4)]
    set_env_gravity(big, envs, gs)
    # calling it again must replace (not stack) the gravity component
    set_env_gravity(big, envs, gs)
    big._T = 0.0
    big._marshal()
    assert pallas_supported(big._shape), "left the fast-path envelope"

    big.start()
    big.pause(0.5)
    big.getAll()
    st = big._store
    for e, env in enumerate(envs):
        com_z = st.pos[env._mass_idx, 2].mean()
        want = -0.5 * 9.8 * (e + 1) * 0.25   # z = -g t^2 / 2 at t = 0.5
        np.testing.assert_allclose(com_z, want, atol=5e-3)
    big.stop()
