"""PPO with an MLP policy on the batched walker env, entirely on-device.

The round-2 example (train_walker.py) was population search over a scalar
action; this is the real thing: an actor-critic MLP (pure jax + optax)
trained with clipped PPO + GAE on `rl.walker_env` in episodic mode (seeded
reset velocity noise, truncation at `episode_length`, per-env auto-reset).
One `iteration` call -- rollout scan through the fused Pallas kernel plus
all minibatch updates -- is a single jitted function, so the entire
training loop runs on the accelerator; the host only prints progress.

Action: per-env gait-frequency multiplier (the walker's breathing omega
scale, clipped to [0.25, 4] by the env).  Reward: COM progress in the
WALKING direction (-x for this gait), so positive mean reward = walking.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from titan_tpu import rl


# ---------------------------------------------------------------- networks
def _init_mlp(key, sizes):
    params = []
    for k, (a, b) in zip(jax.random.split(key, len(sizes) - 1),
                         zip(sizes[:-1], sizes[1:])):
        w = jax.random.normal(k, (a, b)) * jnp.sqrt(2.0 / a)
        params.append((w, jnp.zeros(b)))
    return params


def _mlp(params, x):
    for w, b in params[:-1]:
        x = jnp.tanh(x @ w + b)
    w, b = params[-1]
    return x @ w + b


def init_agent(key, obs_dim):
    kp, kv = jax.random.split(key)
    return {
        "pi": _init_mlp(kp, (obs_dim, 64, 64, 1)),
        "v": _init_mlp(kv, (obs_dim, 64, 64, 1)),
        # start the gait multiplier near 1 with a wide exploration band
        "mu_bias": jnp.asarray(1.0),
        "log_std": jnp.asarray(-0.5),
    }


def policy(params, obs):
    mu = _mlp(params["pi"], obs)[..., 0] + params["mu_bias"]
    return mu, jnp.exp(params["log_std"])


def value(params, obs):
    return _mlp(params["v"], obs)[..., 0]


def _logp(mu, std, a):
    return (-0.5 * ((a - mu) / std) ** 2
            - jnp.log(std) - 0.5 * jnp.log(2.0 * jnp.pi))


# ---------------------------------------------------------------- training
def make_iteration(env, rollout_len=16, n_epochs=4, n_minibatches=4,
                   gamma=0.99, lam=0.95, clip=0.2, ent_coef=1e-3,
                   vf_coef=0.5, lr=3e-4):
    opt = optax.adam(lr)

    def rollout(params, es, obs, key):
        def step_fn(carry, _):
            es, obs, key = carry
            key, ka = jax.random.split(key)
            mu, std = policy(params, obs)
            a = mu + std * jax.random.normal(ka, mu.shape)
            lp = _logp(mu, std, a)
            v = value(params, obs)
            es2, obs2, rew_x, done, _info = env.step(es, a)
            rew = -rew_x          # walking direction is -x: reward progress
            return (es2, obs2, key), (obs, a, lp, v, rew, done)

        (es, obs, key), traj = jax.lax.scan(
            step_fn, (es, obs, key), None, length=rollout_len)
        last_v = value(params, obs)
        return es, obs, key, traj, last_v

    def gae(v, rew, done, last_v):
        not_done = 1.0 - done.astype(jnp.float32)

        def back(carry, xs):
            adv_next, v_next = carry
            v_t, r_t, nd_t = xs
            delta = r_t + gamma * v_next * nd_t - v_t
            adv = delta + gamma * lam * nd_t * adv_next
            return (adv, v_t), adv

        (_, _), advs = jax.lax.scan(
            back, (jnp.zeros_like(last_v), last_v),
            (v, rew, not_done), reverse=True)
        return advs, advs + v

    def loss_fn(params, obs, a, lp_old, adv, ret):
        mu, std = policy(params, obs)
        lp = _logp(mu, std, a)
        ratio = jnp.exp(lp - lp_old)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = -jnp.minimum(ratio * adv_n,
                          jnp.clip(ratio, 1 - clip, 1 + clip) * adv_n).mean()
        vf = ((value(params, obs) - ret) ** 2).mean()
        ent = (jnp.log(std) + 0.5 * jnp.log(2 * jnp.pi * jnp.e)).mean()
        return pg + vf_coef * vf - ent_coef * ent

    @functools.partial(jax.jit, donate_argnums=(1,))
    def iteration(params, opt_state, es, obs, key):
        es, obs, key, traj, last_v = rollout(params, es, obs, key)
        t_obs, t_a, t_lp, t_v, t_rew, t_done = traj
        adv, ret = gae(t_v, t_rew, t_done, last_v)
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        batch = tuple(map(flat, (t_obs, t_a, t_lp, adv, ret)))
        n = batch[0].shape[0]
        mb = n // n_minibatches

        def epoch(carry, k):
            params, opt_state = carry
            perm = jax.random.permutation(k, n)

            def minibatch(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                mb_data = tuple(x[idx] for x in batch)
                g = jax.grad(loss_fn)(params, *mb_data)
                updates, opt_state = opt.update(g, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state), 0

            (params, opt_state), _ = jax.lax.scan(
                minibatch, (params, opt_state),
                jnp.arange(n_minibatches))
            return (params, opt_state), 0

        key, ke = jax.random.split(key)
        (params, opt_state), _ = jax.lax.scan(
            epoch, (params, opt_state),
            jax.random.split(ke, n_epochs))
        return params, opt_state, es, obs, key, t_rew.sum(0).mean()

    return opt, iteration


def stationary_obs(state, env):
    """COM height + velocity (4 features): drops the unbounded absolute
    x/y so the policy input is stationary while the walker travels."""
    pos = env.env_means(state.masses.pos)
    vel = env.env_means(state.masses.vel)
    return jnp.concatenate([pos[2:3], vel], axis=0).T      # [n_envs, 4]


def main(n_envs=256, iterations=60, rollout_len=16, seed=0):
    env = rl.walker_env(n_envs=n_envs, control_dt=0.05,
                        episode_length=20, reset_noise=0.02,
                        observe=stationary_obs)
    key = jax.random.key(seed)
    key, ki = jax.random.split(key)
    params = init_agent(ki, obs_dim=4)
    opt, iteration = make_iteration(env, rollout_len=rollout_len)
    opt_state = opt.init(params)
    es, obs = env.reset(key)
    for it in range(iterations):
        params, opt_state, es, obs, key, mean_ret = iteration(
            params, opt_state, es, obs, key)
        if it % 5 == 0 or it == iterations - 1:
            mu, std = policy(params, obs)
            print(f"iter {it:3d}: mean rollout return {float(mean_ret):+.4f}"
                  f" m  (action mu {float(mu.mean()):.3f}"
                  f" +- {float(std):.3f})", flush=True)
    return params, float(mean_ret)


if __name__ == "__main__":
    if jax.default_backend() == "cpu":
        main(n_envs=16, iterations=6, rollout_len=4)
    else:
        main()
