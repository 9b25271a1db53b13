"""Batched multi-agent simulation: vmap over independent scenes, data-parallel
across the device mesh.

This module is the vmap formulation of the north-star RL configuration
(BASELINE.json config 5: "1024 vmapped independent robots with per-env
parameter sweeps"): independent scenes with fully per-env parameters
(including scene globals like gravity), sharded over the mesh with zero
collectives.

PERFORMANCE NOTE (measured): on TPU the vmapped stencil rolls lower
catastrophically (~1000x slower than they should be).  For identical scene
topologies prefer ``titan_tpu.parallel.replicate_scene`` (flat.py), which
packs the batch into ONE stencil scene, runs through the fused Pallas
kernel, and measured 61M env-steps/s for 1024 27-mass robots on one v5e
chip.  Use this vmap path on CPU, for small batches, or when you need
per-env scene globals.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.step import build_step_fn
from ..state import SceneShape, SimState, xla_only_shape


def make_batched_state(state: SimState, n_envs: int) -> SimState:
    """Tile one scene's state into a batch with a leading env axis.

    Per-env variation (initial conditions, spring constants, actuation
    phases...) is then a functional update of the batched leaves, e.g.
    ``state.springs.k.at[env].mul(...)`` or a vmap'd randomizer.
    """
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_envs,) + x.shape), state)


def build_batched_step(shape: SceneShape) -> Callable[[SimState], SimState]:
    """vmap of the single-scene step over the leading env axis."""
    return jax.vmap(build_step_fn(xla_only_shape(shape)))


def shard_batched_state(state: SimState, mesh: Mesh,
                        axis: str = "dp") -> SimState:
    """Shard the env axis across the mesh (pure data parallelism)."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, state)


@dataclasses.dataclass
class BatchedScenes:
    """Convenience wrapper: N independent copies of a scene, stepped together.

    Build a scene through the normal ``Simulation`` API (don't call start()),
    then wrap it:

        sim = titan.Simulation()
        sim.createLattice(...); sim.createPlane(...)
        envs = BatchedScenes.from_simulation(sim, n_envs=1024, mesh=mesh)
        envs.run(steps=1000)
        pos = envs.positions()        # [n_envs, 3, N]
    """

    shape: SceneShape
    state: SimState
    n_envs: int
    mesh: Optional[Mesh] = None
    _chunk: Callable = None

    @classmethod
    def from_simulation(cls, sim, n_envs: int, mesh: Optional[Mesh] = None,
                        axis: str = "dp") -> "BatchedScenes":
        sim._T = 0.0
        sim._marshal()
        shape = sim._shape
        state = make_batched_state(sim._state, n_envs)
        if mesh is not None:
            state = shard_batched_state(state, mesh, axis)
        step = build_step_fn(xla_only_shape(shape))

        @jax.jit
        def chunk(s, n_steps):
            body = jax.vmap(step)
            return jax.lax.fori_loop(0, n_steps, lambda i, x: body(x), s)

        return cls(shape=shape, state=state, n_envs=n_envs, mesh=mesh,
                   _chunk=chunk)

    def randomize(self, fn: Callable[[SimState, jax.Array], SimState],
                  key: jax.Array) -> None:
        """Apply a per-env randomizer: fn(single_env_state, key) -> state."""
        keys = jax.random.split(key, self.n_envs)
        self.state = jax.vmap(fn)(self.state, keys)

    def run(self, steps: int) -> None:
        self.state = self._chunk(self.state, jnp.int32(steps))

    def positions(self) -> jax.Array:
        return self.state.masses.pos

    def velocities(self) -> jax.Array:
        return self.state.masses.vel
