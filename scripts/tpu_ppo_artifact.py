#!/usr/bin/env python
"""Hardware RL learning artifact (round-4 VERDICT item 7): run the PPO
pusher task on the real TPU long enough to show a learning curve, and
record curve + final metric + env-steps/s for docs/PERFORMANCE.md.

The pusher task (examples/train_ppo.py): 256 envs push a soft cube
toward a target with a 2-D force; dense reward = -distance.  One
`iteration` = a 16-control-step rollout through the fused Pallas kernel
(each control step is 500 physics steps at dt=1e-4) + 4 PPO epochs of
minibatch updates, all one jitted call.
"""
import json
import os
import sys
import time

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, root)
sys.path.insert(0, os.path.join(root, "examples"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(root, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import train_ppo

# rollout_len == episode_length: each rollout covers exactly one
# episode, so the mean return is phase-aligned (a 16-step rollout over
# the 24-step episode cycle gave a period-3 oscillating curve that
# obscured the learning signal)
TASK = sys.argv[1] if len(sys.argv) > 1 else "pusher"
N_ENVS, ITERS = 256, 400
ROLLOUT = {"pusher": 24, "pusher2": 24, "walker": 20}[TASK]

env, agent, sign = train_ppo.make_task(TASK, N_ENVS)
key = jax.random.key(0)
key, ki = jax.random.split(key)
params = agent.init(ki)
opt, iteration = train_ppo.make_iteration(env, agent, reward_sign=sign,
                                          rollout_len=ROLLOUT)
opt_state = opt.init(params)
es, obs = env.reset(key)

curve = []
t_compile = time.perf_counter()
params, opt_state, es, obs, key, mean_ret = iteration(
    params, opt_state, es, obs, key)
curve.append(float(mean_ret))
print(json.dumps({"compile_s": round(time.perf_counter() - t_compile, 1),
                  "iter0_return": curve[0]}), flush=True)

t0 = time.perf_counter()
for it in range(1, ITERS):
    params, opt_state, es, obs, key, mean_ret = iteration(
        params, opt_state, es, obs, key)
    curve.append(float(mean_ret))
    if it % 10 == 0:
        print(f"iter {it:3d}: mean return {curve[-1]:+.3f}", flush=True)
wall = time.perf_counter() - t0

# env-steps/s: each iteration = rollout_len control steps x n_envs envs;
# each control step integrates steps_per_control physics steps per env
phys_per_ctrl = env.steps_per_control
ctrl_steps = (ITERS - 1) * ROLLOUT * N_ENVS
print(json.dumps({
    "task": TASK, "n_envs": N_ENVS, "iterations": ITERS,
    "curve_every5": [round(c, 3) for c in curve[::5]],
    "first_return": round(curve[0], 3),
    "best_return": round(max(curve), 3),
    "final_return": round(sum(curve[-5:]) / 5, 3),
    "wall_s": round(wall, 1),
    "ctrl_env_steps_per_sec": round(ctrl_steps / wall),
    "phys_env_steps_per_sec": round(ctrl_steps * phys_per_ctrl / wall),
    "device": str(jax.devices()[0]),
}), flush=True)
