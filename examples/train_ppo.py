"""Clipped PPO with an MLP actor-critic on the batched envs, on-device.

The round-2 example (train_walker.py) was population search over a scalar
action; this is the real thing: an actor-critic MLP (pure jax + optax)
trained with PPO + GAE on an episodic `titan_tpu.rl` environment (seeded
reset noise, truncation, per-env auto-reset).  One `iteration` call --
the rollout scan through the fused Pallas kernel plus all minibatch
updates -- is a single jitted function, so the entire training loop runs
on the accelerator; the host only prints progress.

Tasks (`python train_ppo.py [pusher|walker]`):

- pusher (default): push a soft cube toward a target point with a 2-D
  horizontal force; dense reward = -distance to target.  A smooth,
  classic-control-shaped problem -- mean return climbs steadily from the
  first iterations and the policy closes most of the initial distance
  within ~100 iterations (minutes on one TPU chip).
- walker: per-env gait-frequency multiplier on the breathing walker,
  reward = COM progress in the walking direction.  A much harder RL
  problem than it looks: the return landscape over the 1-D action is
  nearly flat around the natural frequency, peaks sharply at the low
  clip boundary, and drifts with the walker's internal state, so policy
  gradient ascends it slowly and noisily (the population-search example
  covers this task better -- measured, kept here as the stress case).

Actions are tanh-squashed into the env's bounds (SAC-style change of
variables in the log-prob): an unbounded Gaussian mean can never leave
the support, which removes the clipped-Gaussian collapse a first version
of this example exhibited on the walker.
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from titan_tpu import rl


# ---------------------------------------------------------------- networks
def _init_mlp(key, sizes, zero_last=True):
    params = []
    n_layers = len(sizes) - 1
    for i, (k, (a, b)) in enumerate(zip(jax.random.split(key, n_layers),
                                        zip(sizes[:-1], sizes[1:]))):
        # zero-init the output head (standard PPO practice): the policy
        # starts exactly at the action-space center and the value at 0
        scale = 0.0 if (zero_last and i == n_layers - 1) \
            else jnp.sqrt(2.0 / a)
        w = jax.random.normal(k, (a, b)) * scale
        params.append((w, jnp.zeros(b)))
    return params


def _mlp(params, x):
    for w, b in params[:-1]:
        x = jnp.tanh(x @ w + b)
    w, b = params[-1]
    return x @ w + b


class Agent:
    """Tanh-squashed Gaussian policy + value head over a BatchedEnv task."""

    def __init__(self, obs_dim, act_dim, a_mid, a_half, log_std=-0.5):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.a_mid = jnp.asarray(a_mid, jnp.float32)
        self.a_half = jnp.asarray(a_half, jnp.float32)
        self.log_std0 = log_std

    def init(self, key):
        kp, kv = jax.random.split(key)
        return {
            "pi": _init_mlp(kp, (self.obs_dim, 64, 64, self.act_dim)),
            "v": _init_mlp(kv, (self.obs_dim, 64, 64, 1)),
            "log_std": jnp.full(self.act_dim, self.log_std0),
        }

    def policy(self, params, obs):
        return _mlp(params["pi"], obs), jnp.exp(params["log_std"])

    def squash(self, u):
        return self.a_mid + self.a_half * jnp.tanh(u)

    def value(self, params, obs):
        return _mlp(params["v"], obs)[..., 0]

    def logp(self, mu, std, u):
        base = (-0.5 * ((u - mu) / std) ** 2
                - jnp.log(std) - 0.5 * jnp.log(2.0 * jnp.pi))
        log_det = jnp.log(self.a_half * (1.0 - jnp.tanh(u) ** 2) + 1e-6)
        return jnp.sum(base - log_det, axis=-1)


# ---------------------------------------------------------------- training
def make_iteration(env, agent, reward_sign=1.0, rollout_len=16, n_epochs=4,
                   n_minibatches=4, gamma=0.99, lam=0.95, clip=0.2,
                   ent_coef=1e-3, vf_coef=0.5, lr=1e-3):
    opt = optax.adam(lr)

    def rollout(params, es, obs, key):
        def step_fn(carry, _):
            es, obs, key = carry
            key, ka = jax.random.split(key)
            mu, std = agent.policy(params, obs)
            u = mu + std * jax.random.normal(ka, mu.shape)
            lp = agent.logp(mu, std, u)
            v = agent.value(params, obs)
            es2, obs2, rew, done, _info = env.step(es, agent.squash(u))
            return (es2, obs2, key), (obs, u, lp, v,
                                      reward_sign * rew, done)

        (es, obs, key), traj = jax.lax.scan(
            step_fn, (es, obs, key), None, length=rollout_len)
        return es, obs, key, traj, agent.value(params, obs)

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

    def loss_fn(params, obs, u, lp_old, adv, ret):
        mu, std = agent.policy(params, obs)
        lp = agent.logp(mu, std, u)
        ratio = jnp.exp(lp - lp_old)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = -jnp.minimum(ratio * adv_n,
                          jnp.clip(ratio, 1 - clip, 1 + clip) * adv_n).mean()
        vf = ((agent.value(params, obs) - ret) ** 2).mean()
        ent = jnp.sum(jnp.log(std)) + 0.5 * agent.act_dim
        return pg + vf_coef * vf - ent_coef * ent

    @functools.partial(jax.jit, donate_argnums=(1,))
    def iteration(params, opt_state, es, obs, key):
        es, obs, key, traj, last_v = rollout(params, es, obs, key)
        t_obs, t_u, t_lp, t_v, t_rew, t_done = traj
        adv, ret = gae(t_v, t_rew, t_done, last_v)
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        batch = tuple(map(flat, (t_obs, t_u, t_lp, adv, ret)))
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


# ---------------------------------------------------------------- tasks
def stationary_obs(state, env):
    """COM height + velocity (4 features): drops the unbounded absolute
    x/y so the walker policy input is stationary while it travels."""
    pos = env.env_means(state.masses.pos)
    vel = env.env_means(state.masses.vel)
    return jnp.concatenate([pos[2:3], vel], axis=0).T


def make_task(name, n_envs):
    if name == "pusher":
        f_max = 1.5
        env = rl.pusher_env(n_envs=n_envs, control_dt=0.05, f_max=f_max,
                            episode_length=24, reset_noise=0.02)
        agent = Agent(obs_dim=6, act_dim=2, a_mid=0.0, a_half=f_max)
        # pusher reward is -distance (already "higher is better")
        return env, agent, 1.0
    if name == "pusher2":
        # the multi-dim-action benchmark: two cubes per env, 4-D force
        # action, 8-D observation (per-cube COM error + velocity)
        f_max = 1.5
        env = rl.pusher2_env(n_envs=n_envs, control_dt=0.05, f_max=f_max,
                             episode_length=24, reset_noise=0.02)
        agent = Agent(obs_dim=8, act_dim=4, a_mid=0.0, a_half=f_max)
        return env, agent, 1.0
    if name == "walker":
        # log-scale actions (see rl.walker_env): the zero-mean initial
        # policy starts at frequency multiplier 1.0, inside the graded
        # part of the measured reward landscape -- the linear [0.25, 4]
        # squash started at ~2.1, a plateau, and PPO never moved
        env = rl.walker_env(n_envs=n_envs, control_dt=0.05,
                            episode_length=20, reset_noise=0.02,
                            observe=stationary_obs, log_actions=True)
        import numpy as _np
        lg4 = float(_np.log(4.0))
        # tight initial std: the gait reward needs TEMPORALLY COHERENT
        # frequencies (a constant scale-1.0 action returns 20x more
        # |signal| than iid per-step draws at the default std, measured
        # on hardware) -- exploration must be mostly in the MEAN
        agent = Agent(obs_dim=4, act_dim=1, a_mid=0.0, a_half=lg4,
                      log_std=-2.0)
        # walker reward is +x progress; walking direction is -x
        return env, agent, -1.0
    raise SystemExit(f"unknown task {name!r}")


def main(task="pusher", n_envs=256, iterations=120, rollout_len=16, seed=0):
    env, agent, sign = make_task(task, n_envs)
    key = jax.random.key(seed)
    key, ki = jax.random.split(key)
    params = agent.init(ki)
    opt, iteration = make_iteration(env, agent, reward_sign=sign,
                                    rollout_len=rollout_len)
    opt_state = opt.init(params)
    es, obs = env.reset(key)
    first_ret = None
    for it in range(iterations):
        params, opt_state, es, obs, key, mean_ret = iteration(
            params, opt_state, es, obs, key)
        if first_ret is None:
            first_ret = float(mean_ret)
        if it % 5 == 0 or it == iterations - 1:
            print(f"iter {it:3d}: mean rollout return {float(mean_ret):+.3f}"
                  f"  (std {float(jnp.exp(params['log_std']).mean()):.3f})",
                  flush=True)
    print(f"return improved {first_ret:+.3f} -> {float(mean_ret):+.3f}",
          flush=True)
    return params, float(mean_ret) - first_ret


if __name__ == "__main__":
    task = sys.argv[1] if len(sys.argv) > 1 else "pusher"
    if jax.default_backend() == "cpu":
        main(task, n_envs=16, iterations=6, rollout_len=4)
    else:
        main(task)
