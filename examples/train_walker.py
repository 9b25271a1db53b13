"""Train a walker gait with population search, entirely on-device.

Each of the batch's environments evaluates one candidate gait frequency
(a constant action), so a whole generation is ONE vectorized rollout
through the fused Pallas kernel; the population then resamples around the
best candidate.  Derivative-free on purpose: BPTT through thousands of
stiff-contact steps explodes (docs/GUIDE.md, Differentiable simulation),
while population search only needs the forward physics the TPU is fast at.
"""

import numpy as np
import jax
import jax.numpy as jnp

from titan_tpu import rl


def main(n_envs=64, generations=6, horizon=20):
    env = rl.walker_env(n_envs=n_envs, control_dt=0.05)

    @jax.jit
    def evaluate(state, actions):
        """One generation: rollout `horizon` control steps, return the
        cumulative reward (COM x-progress) per env."""
        def body(s, _):
            s, _obs, rew = env.step(s, actions)
            return s, rew
        _, rews = jax.lax.scan(body, state, None, length=horizon)
        return rews.sum(axis=0)

    rng = np.random.default_rng(0)
    center, spread = 1.0, 0.6
    state0, _ = env.reset()
    best, best_ret = center, -np.inf
    for gen in range(generations):
        pop = np.clip(center + spread * rng.standard_normal(n_envs),
                      0.25, 4.0).astype(np.float32)
        pop[0] = best                       # elitism
        returns = np.asarray(evaluate(state0, jnp.asarray(pop)))
        # walking direction is -x for this gait: maximize -progress
        fitness = -returns
        order = np.argsort(fitness)[::-1]
        elite = pop[order[: max(2, n_envs // 8)]]
        center = float(elite.mean())
        spread = max(0.1, 0.5 * spread + 0.5 * float(elite.std()))
        if fitness[order[0]] > best_ret:
            best_ret, best = fitness[order[0]], float(pop[order[0]])
        print(f"gen {gen}: best omega-scale {best:.3f} "
              f"travel {best_ret:.4f} m  (center {center:.3f} "
              f"spread {spread:.3f})", flush=True)
    print(f"trained gait: omega scale {best:.3f}, "
          f"{best_ret:.3f} m per {horizon * env.control_dt:.1f} s")
    return best, best_ret


if __name__ == "__main__":
    import jax as _j
    if _j.default_backend() == "cpu":
        main(n_envs=16, generations=3, horizon=6)
    else:
        main()
