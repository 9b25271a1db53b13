"""Vectorized RL environments over the flat-packed batch fast path.

The reference bills itself as a simulator "for soft robotics and
reinforcement learning" (CMakeLists.txt:2-5) but ships no environment
interface -- RL users get the raw library.  This module supplies the
TPU-native version of what they actually need: a gym-style vectorized
environment whose reset/step are PURE JITTABLE FUNCTIONS over the state
pytree, so whole training loops (rollout + learner) compile onto the
accelerator.

Design:
  - the batch is ONE flat-packed scene (parallel/flat.replicate_scene),
    stepped by the fused VMEM Pallas kernel -- the formulation measured
    ~3,000x faster than vmap-per-env on TPU (docs/PERFORMANCE.md);
  - a control step = `steps_per_control` physics sub-steps advanced by one
    on-device fori_loop chunk;
  - actions mutate continuous per-spring/per-mass STATE fields (never the
    trace), so one compiled step serves the whole training run;
  - observations/rewards are per-env reductions computed on device.

    env = rl.walker_env(n_envs=1024)
    state, obs = env.reset()
    step = jax.jit(env.step)
    state, obs, reward = step(state, actions)    # actions [n_envs]
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.step import build_chunk_fn


class BatchedEnv:
    """A vectorized environment over ``n_envs`` flat-packed copies of a
    template scene.

    Parameters
    ----------
    template_sim : an un-started Simulation holding ONE environment's scene
        (including its planes/gravity/dt).
    n_envs : number of packed copies.
    control_dt : sim-seconds advanced per ``step`` call (rounded to a whole
        number of physics steps).
    apply_action : (state, action, env) -> state.  Pure; writes continuous
        state fields (e.g. stencil omega/rest scales, extern forces).
    observe : (state, env) -> obs [n_envs, ...].  Default: per-env COM
        position and velocity, [n_envs, 6].
    reward : (prev_state, state, env) -> [n_envs].  Default: per-env COM
        x-displacement over the control step.
    spacing : optional Vec offset between env copies (keep None unless
        magnets are in play; see replicate_scene).
    """

    def __init__(self, template_sim, n_envs: int, control_dt: float = 0.02,
                 apply_action: Optional[Callable] = None,
                 observe: Optional[Callable] = None,
                 reward: Optional[Callable] = None,
                 spacing=None):
        from .parallel import replicate_scene

        big, _envs = replicate_scene(template_sim, n_envs, spacing=spacing)
        big._T = 0.0
        big._marshal()
        self.shape = big._shape
        self._state0 = big._state
        self.n_envs = n_envs
        self.n_per_env = template_sim._store.n_masses
        self.s_per_env = template_sim._store.n_springs
        dt = float(big._dt)
        self.steps_per_control = max(1, round(control_dt / dt))
        self.control_dt = self.steps_per_control * dt
        self._chunk = build_chunk_fn(self.shape)
        self._apply = apply_action or (lambda st, a, env: st)
        self._observe = observe or _com_obs
        self._reward = reward or _com_x_progress

    # -- pure functions (jit/scan-safe) -------------------------------------
    def reset(self):
        """-> (state, obs).  The same initial state every time (the physics
        is deterministic); randomize via apply_action or by editing the
        returned state pytree."""
        return self._state0, self._observe(self._state0, self)

    def step(self, state, action):
        """-> (state, obs, reward).  Pure: jit it, scan it, vmap the action
        search over it."""
        state = self._apply(state, action, self)
        prev = state
        state = self._chunk(state, jnp.int32(self.steps_per_control))
        return (state, self._observe(state, self),
                self._reward(prev, state, self))

    # -- helpers for action/observation authors ------------------------------
    def env_means(self, x):
        """Per-env mean over the mass axis: x [..., N_padded] -> [..., n_envs].

        Padding lanes beyond n_envs * n_per_env are dropped."""
        n, e = self.n_per_env, self.n_envs
        return x[..., : e * n].reshape(*x.shape[:-1], e, n).mean(axis=-1)

    def env_of_lane(self):
        """[N_padded] int32: which env each mass lane (= stencil lane)
        belongs to (lanes past the packed region map to env 0; they are
        masked anyway)."""
        N = self.shape.n_masses
        lane = np.arange(N, dtype=np.int64)
        env = np.minimum(lane // self.n_per_env, self.n_envs - 1)
        return jnp.asarray(env, jnp.int32)


def _com_obs(state, env):
    pos = env.env_means(state.masses.pos)      # [3, n_envs]
    vel = env.env_means(state.masses.vel)
    return jnp.concatenate([pos, vel], axis=0).T   # [n_envs, 6]


def _com_x_progress(prev, state, env):
    return (env.env_means(state.masses.pos)[0]
            - env.env_means(prev.masses.pos)[0])   # [n_envs]


def walker_env(n_envs: int = 256, control_dt: float = 0.05, n: int = 3,
               omega: float = 6.0, k: float = 2000.0,
               config=None) -> BatchedEnv:
    """The flagship locomotion benchmark: a batch of breathing-gait walkers
    on a friction plane (models.walker physics; BASELINE config 4/5).

    Action space: [n_envs] gait-frequency multipliers, clipped to
    [0.25, 4.0] and applied to every breathing spring's omega -- continuous,
    bounded, and directly controls the gait.  Reward: COM x-progress per
    control step (walking direction is -x for this actuation pattern, so
    learning to stand still is also visible as reward ~ 0).
    """
    from . import Simulation, SimConfig, Vec, models

    src = Simulation(config or SimConfig())
    models.walker(src, size=0.8, n=n, k=k, omega=omega)
    src.createPlane(Vec(0, 0, 1), 0, 0.5, 0.7)
    src.setGlobalAcceleration(Vec(0, 0, -9.8))
    src.setTimeStep(1e-4)

    def apply_action(state, action, env):
        import dataclasses
        scale = jnp.clip(jnp.asarray(action, state.stencil.omega.dtype),
                         0.25, 4.0)
        per_lane = scale[env.env_of_lane()]                # [N]
        base = env._state0.stencil.omega                   # [F, N] template
        st = dataclasses.replace(state.stencil,
                                 omega=base * per_lane[None, :])
        return dataclasses.replace(state, stencil=st)

    return BatchedEnv(src, n_envs, control_dt=control_dt,
                      apply_action=apply_action)


def pusher_env(n_envs: int = 256, control_dt: float = 0.05,
               target=(1.0, 0.0), f_max: float = 1.5,
               config=None) -> BatchedEnv:
    """Classic-control flavored: push a soft cube to a target point.

    Action [n_envs, 2]: a horizontal force (fx, fy), clipped to +-f_max,
    applied as the PERSISTENT EXTERNAL FORCE on every mass of the env's
    cube (the second action mechanism next to walker_env's per-spring
    omega: per-mass continuous state).  Reward: negative COM distance to
    ``target`` in the (x, y) plane, so returns increase as envs learn to
    push toward it.
    """
    import dataclasses

    from . import Simulation, SimConfig, Vec

    src = Simulation(config or SimConfig())
    cube = src.createCube(Vec(0, 0, 0.25), 0.4)
    cube.setSpringConstants(2000.0)
    src.createPlane(Vec(0, 0, 1), 0, 0.3, 0.4)
    src.setGlobalAcceleration(Vec(0, 0, -9.8))
    src.setTimeStep(1e-4)
    tgt = jnp.asarray(target, jnp.float32)

    def apply_action(state, action, env):
        a = jnp.clip(jnp.asarray(action, state.masses.pos.dtype),
                     -f_max, f_max)                     # [n_envs, 2]
        per_lane = a[env.env_of_lane()]                 # [N, 2]
        ef = jnp.concatenate(
            [per_lane.T, jnp.zeros((1, per_lane.shape[0]),
                                   per_lane.dtype)], axis=0)   # [3, N]
        return dataclasses.replace(
            state, masses=dataclasses.replace(state.masses,
                                              extern_force=ef))

    def reward(prev, state, env):
        com = env.env_means(state.masses.pos)           # [3, n_envs]
        return -jnp.linalg.norm(com[:2].T - tgt[None, :], axis=1)

    return BatchedEnv(src, n_envs, control_dt=control_dt,
                      apply_action=apply_action, reward=reward)
