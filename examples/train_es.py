"""Evolution strategies (OpenAI-ES) with an MLP policy, fully on-device.

The third training paradigm shipped on the `titan_tpu.rl` environments
(population search: train_walker.py; policy gradient: train_ppo.py).
ES is the natural fit for a massively batched simulator: every
generation evaluates the WHOLE antithetic population in one flat-packed
rollout -- population member m drives its own block of envs, so one
`generation` call (sampling, rollout scan through the fused kernel,
rank-normalized update) is a single jitted function and the host only
prints numbers.

Task: rl.pusher_env (push a soft cube to a target; reward = -distance).
A deterministic tanh-squashed MLP improves from the random-init return
within the first few generations.

Usage: python examples/train_es.py [generations] [pairs] [envs_per_member]
"""

import sys

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from titan_tpu import rl

F_MAX = 1.5
EPISODE = 24          # control steps per generation (one episode)
SIGMA = 0.05
LR = 0.03


def _init_mlp(key, sizes):
    params = []
    for k, (a, b) in zip(jax.random.split(key, len(sizes) - 1),
                         zip(sizes[:-1], sizes[1:])):
        params.append((jax.random.normal(k, (a, b)) * jnp.sqrt(2.0 / a),
                       jnp.zeros(b)))
    return params


def _mlp(params, x):
    for w, b in params[:-1]:
        x = jnp.tanh(x @ w + b)
    w, b = params[-1]
    return x @ w + b


def main(generations=40, pairs=16, envs_per_member=4, seed=0):
    pop = 2 * pairs                       # antithetic
    n_envs = pop * envs_per_member
    env = rl.pusher_env(n_envs=n_envs, control_dt=0.05, f_max=F_MAX,
                        episode_length=EPISODE, reset_noise=0.02)

    key = jax.random.key(seed)
    key, ki = jax.random.split(key)
    theta0, unravel = ravel_pytree(_init_mlp(ki, (6, 32, 32, 2)))
    dim = theta0.shape[0]

    def act(flat_params, obs_m):
        """Policy of ONE member over its envs' observations [E, 6]."""
        return F_MAX * jnp.tanh(_mlp(unravel(flat_params), obs_m))

    @jax.jit
    def generation(theta, key):
        key, ke, kr = jax.random.split(key, 3)
        eps = jax.random.normal(ke, (pairs, dim))
        thetas = jnp.concatenate([theta + SIGMA * eps,
                                  theta - SIGMA * eps])        # [pop, dim]
        es, obs = env.reset(kr)

        def control_step(carry, _):
            es, obs = carry
            a = jax.vmap(act)(thetas,
                              obs.reshape(pop, envs_per_member, -1))
            es, obs, rew, _done, _info = env.step(
                es, a.reshape(n_envs, -1))
            return (es, obs), rew

        (_, _), rews = jax.lax.scan(control_step, (es, obs), None,
                                    length=EPISODE)
        fitness = rews.sum(0).reshape(pop, envs_per_member).mean(1)  # [pop]
        # rank normalization (standard OpenAI-ES): robust to reward scale
        ranks = jnp.argsort(jnp.argsort(fitness)).astype(jnp.float32)
        w = ranks / (pop - 1) - 0.5
        grad = (w[:pairs] - w[pairs:]) @ eps / (pairs * SIGMA)
        return theta + LR * grad, key, fitness.mean()

    theta, first = theta0, None
    for g in range(generations):
        theta, key, mean_fit = generation(theta, key)
        if first is None:
            first = float(mean_fit)
        if g % 5 == 0 or g == generations - 1:
            print(f"gen {g:3d}: mean population return "
                  f"{float(mean_fit):+.3f}", flush=True)
    print(f"ES improved {first:+.3f} -> {float(mean_fit):+.3f}", flush=True)
    return theta, float(mean_fit) - first


if __name__ == "__main__":
    a = sys.argv[1:]
    main(generations=int(a[0]) if a else 40,
         pairs=int(a[1]) if len(a) > 1 else 16,
         envs_per_member=int(a[2]) if len(a) > 2 else 4)
