"""Vectorized RL environment API (titan_tpu.rl) over flat-packed batches."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titan_tpu import rl
from titan_tpu.ops import pallas_step


@pytest.fixture(scope="module")
def env():
    return rl.walker_env(n_envs=8, control_dt=0.05)


def test_reset_shapes_and_fast_path(env):
    state, obs = env.reset()
    assert obs.shape == (8, 6)
    assert env.steps_per_control == 500
    # the packed batch rides the VMEM Pallas fast path
    assert pallas_step.pallas_supported(env.shape)


def test_step_is_pure_and_jittable(env):
    state, _ = env.reset()
    step = jax.jit(env.step)
    a = jnp.ones(8, jnp.float32)
    s1, o1, r1 = step(state, a)
    s2, o2, r2 = step(state, a)          # same inputs -> same outputs
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    assert float(s1.t) == pytest.approx(0.05, abs=1e-6)


def test_actions_have_signal(env):
    """Different gait frequencies produce different trajectories/rewards."""
    state, _ = env.reset()
    step = jax.jit(env.step)
    a = jnp.asarray(np.linspace(0.5, 2.0, 8), jnp.float32)
    total = np.zeros(8)
    for _ in range(6):
        state, obs, rew = step(state, a)
        total += np.asarray(rew)
    assert np.isfinite(total).all()
    assert np.unique(total.round(6)).size > 4   # envs diverged by action


def test_identity_action_matches_raw_chunk(env):
    """scale=1 actions leave omega at the template value, so the env step
    is EXACTLY the raw physics chunk."""
    from titan_tpu.ops.step import build_chunk_fn
    state, _ = env.reset()
    s_env, _, _ = env.step(state, jnp.ones(8, jnp.float32))
    chunk = build_chunk_fn(env.shape)
    s_raw = chunk(state, jnp.int32(env.steps_per_control))
    np.testing.assert_array_equal(np.asarray(s_env.masses.pos),
                                  np.asarray(s_raw.masses.pos))


def test_scan_rollout(env):
    """The whole rollout compiles as one lax.scan -- the shape an RL
    training loop needs."""
    state, _ = env.reset()
    a = jnp.full((5, 8), 1.2, jnp.float32)   # [T, n_envs]

    @jax.jit
    def rollout(state, actions):
        def body(s, act):
            s, obs, rew = env.step(s, act)
            return s, (obs, rew)
        return jax.lax.scan(body, state, actions)

    final, (obs_t, rew_t) = rollout(state, a)
    assert obs_t.shape == (5, 8, 6)
    assert rew_t.shape == (5, 8)
    assert float(final.t) == pytest.approx(5 * env.control_dt, abs=1e-5)
    assert np.isfinite(np.asarray(obs_t)).all()


def test_pusher_env_force_actions():
    """The second action mechanism: per-mass persistent external force.
    Envs pushed toward +x move there; pushed away move away; rewards
    order accordingly."""
    penv = rl.pusher_env(n_envs=4, control_dt=0.05)
    state, _ = penv.reset()
    step = jax.jit(penv.step)
    a = jnp.asarray([[1.0, 0], [0.5, 0], [-1.0, 0], [0, 0]], jnp.float32)
    for _ in range(8):
        state, obs, rew = step(state, a)
    assert obs[0, 0] > obs[3, 0] > obs[2, 0]
    assert rew[0] > rew[3] > rew[2]
    assert np.isfinite(np.asarray(obs)).all()
