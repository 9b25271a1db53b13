"""Spatially sharded single-scene stepping: one giant scene split across the
device mesh.

The reference is single-GPU only (SURVEY.md section 5.8); this is new
TPU-native design.  v1 strategy: annotate the mass and spring axes with
NamedShardings and jit the unmodified step function -- XLA's SPMD partitioner
places the per-spring and per-mass compute on the owning shards and inserts
the collectives for the endpoint gathers and force accumulation over ICI.
The gathers are all-to-all-ish because spring endpoints can cross shards; a
halo-exchange shard_map variant for spatially-partitioned lattices (where
springs only cross adjacent shards) is the planned optimization.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.step import build_step_fn
from ..state import SceneShape, SimState, xla_only_shape


def _state_shardings(state: SimState, mesh: Mesh, axis: str) -> SimState:
    """PartitionSpec tree: mass arrays shard their N axis, spring arrays
    their S axis, small scene-level arrays replicate."""
    n = state.masses.valid.shape[-1]
    s = state.springs.valid.shape[-1]

    def spec_for(x):
        # shard the first axis whose length is N or S (mass/spring payloads:
        # vectors are [3, N], incidence [N, D], segment arrays [2S], ...)
        parts = [None] * x.ndim
        for d, size in enumerate(x.shape):
            if size in (n, s, 2 * s):
                parts[d] = axis
                break
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map(spec_for, state)


def shard_state(state: SimState, mesh: Mesh, axis: str = "shard") -> SimState:
    """Place a scene's state across the mesh (mass/spring axes sharded)."""
    shardings = _state_shardings(state, mesh, axis)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def build_sharded_chunk(shape: SceneShape, mesh: Mesh, axis: str = "shard"):
    """Jitted chunk over the sharded state; XLA SPMD inserts the collectives."""
    step = build_step_fn(xla_only_shape(shape))

    @jax.jit
    def chunk(state: SimState, n_steps) -> SimState:
        return jax.lax.fori_loop(0, n_steps, lambda i, s: step(s), state)

    return chunk
