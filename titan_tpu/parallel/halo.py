"""Explicit halo-exchange multi-chip stepping (shard_map + ppermute).

The automatic SPMD path (sharded.py) lets XLA partition the unmodified step;
this module is the hand-scheduled alternative for stencil scenes: masses are
block-sharded along N, each device steps its block locally, and the only
communication per step is

  1. two-sided halos of pos (+vel when springs are damped) of ``max|delta|``
     lanes pulled from the neighboring devices (ppermutes), and
  2. two "overflow" buffers of spring forces destined for the neighbors'
     edge masses (ppermutes),

a few hundred KB per step over ICI regardless of scene size -- the classic
halo pattern for a spatially decomposed lattice (lattice families have both
positive and one negative index offset).  The global wrap-around pairs are
masked (no real spring wraps; mass validity is folded into the stencil mask
at chunk entry, where a global roll is still cheap).

Envelope: stencil-only scenes; Euler (+clamp) or Verlet; breathing and
ACTUATED_* springs (rest mutation is local to the left endpoint's block);
axial damping (adds vel halos); drag; local constraints (per-mass, sharded
with the masses); soft-deleted masses; gravity, persistent external force,
fixed masses, global planes/balls.  Block size must exceed max|delta|.
Magnets (global pairwise) and remainder springs use sharded.py's automatic
partitioner instead.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import (ACTIVE_CONTRACT_THEN_EXPAND, ACTIVE_EXPAND_THEN_CONTRACT,
                      ACTUATED_CONTRACT, ACTUATED_EXPAND, Integrator)
from ..ops.integrators import euler, verlet
from ..ops.step import _mass_forces
from ..state import SceneShape, SimState


def halo_supported(shape: SceneShape, n_devices: int) -> bool:
    cfg = shape.config
    if cfg.integrator not in (Integrator.EULER, Integrator.VERLET):
        return False
    if not cfg.use_stencil or not shape.stencil_deltas:
        return False
    if shape.has_remainder or shape.has_magnets:
        return False
    if not cfg.persistent_extern_force:
        return False
    if shape.n_masses % n_devices != 0:
        return False
    block = shape.n_masses // n_devices
    return block > max(abs(d) for d in shape.stencil_deltas)


def build_halo_chunk(shape: SceneShape, mesh: Mesh, axis: str = "shard"):
    """Returns make(state) -> jitted chunk(state, n_steps) on ``mesh``."""
    deltas = shape.stencil_deltas
    halo = max(abs(d) for d in deltas)
    n_dev = mesh.shape[axis]
    cfg = shape.config
    is_verlet = cfg.integrator is Integrator.VERLET
    to_prev = [(i, (i - 1) % n_dev) for i in range(n_dev)]  # recv from next
    to_next = [(i, (i + 1) % n_dev) for i in range(n_dev)]  # recv from prev

    def halo_extend(x):
        """[3, B] -> [3, H + B + H] with both neighbors' edges."""
        head_from_next = jax.lax.ppermute(x[:, :halo], axis, to_prev)
        tail_from_prev = jax.lax.ppermute(x[:, -halo:], axis, to_next)
        return jnp.concatenate([tail_from_prev, x, head_from_next], axis=1)

    def local_step(state: SimState) -> SimState:
        m = state.masses
        st = state.stencil
        pos, vel = m.pos, m.vel                        # [3, B] per device
        b = pos.shape[1]
        pos_ext = halo_extend(pos)                     # [3, H + B + H]
        if shape.has_damping:
            vel_ext = halo_extend(vel)
        f_acc = jnp.zeros_like(pos)
        spill = jnp.zeros((3, 2 * halo), dtype=pos.dtype)  # [prev | next]
        new_rest = st.rest
        for fi, d in enumerate(deltas):
            pos_r = jax.lax.dynamic_slice_in_dim(pos_ext, halo + d, b, axis=1)
            diff = pos_r - pos
            length = jnp.sqrt(jnp.sum(diff * diff, axis=0))
            inv = jnp.where(length > 0,
                            1.0 / jnp.where(length > 0, length, 1.0), 0.0)
            pair_ok = st.mask[fi]   # validity folded in at chunk entry
            rest = st.rest[fi]
            if shape.has_breathing:
                styp = st.type[fi]
                sin_wt = jnp.sin(st.omega[fi] * state.t)
                scale = jnp.where(
                    styp == ACTIVE_CONTRACT_THEN_EXPAND, 1.0 - 0.2 * sin_wt,
                    jnp.where(styp == ACTIVE_EXPAND_THEN_CONTRACT,
                              1.0 + 0.2 * sin_wt, 1.0))
                # ACTUATED rest mutation is local: rest lives at the left
                # endpoint's block (reference sim.cu:1173-1181 + validity
                # early-return at 1163)
                rest = jnp.where(
                    pair_ok & (styp == ACTUATED_EXPAND)
                    & (rest < st.l_max[fi]),
                    rest + st.rate[fi] * state.dt,
                    jnp.where(
                        pair_ok & (styp == ACTUATED_CONTRACT)
                        & (rest > st.l_min[fi]),
                        rest - st.rate[fi] * state.dt, rest))
                new_rest = new_rest.at[fi].set(rest)
            else:
                scale = 1.0
            mag = st.k[fi] * (rest * scale - length)
            if shape.has_damping:
                vel_r = jax.lax.dynamic_slice_in_dim(vel_ext, halo + d, b,
                                                     axis=1)
                axial = jnp.sum((vel - vel_r) * (diff * inv), axis=0)
                mag = mag + axial * st.damping[fi]
            f = jnp.where(pair_ok, mag, 0.0) * (diff * inv)
            f_acc = f_acc - f
            # +f lands at n + d: local window plus spill into a neighbor
            c = jnp.pad(f, ((0, 0), (halo + d, halo - d)))  # [3, B + 2H]
            f_acc = f_acc + c[:, halo:halo + b]
            spill = spill + jnp.concatenate(
                [c[:, :halo], c[:, halo + b:]], axis=1)
        # deliver spills: my prev-spill to the previous device's tail,
        # my next-spill to the next device's head
        from_next = jax.lax.ppermute(spill[:, :halo], axis, to_prev)
        from_prev = jax.lax.ppermute(spill[:, halo:], axis, to_next)
        f_acc = f_acc.at[:, :halo].add(from_prev)
        f_acc = f_acc.at[:, -halo:].add(from_next)
        f_acc = jnp.where(m.fixed, 0.0, f_acc)
        # local mass pass: gravity, extern, global planes/balls, local
        # constraints, drag -- all per-mass, so the shared implementation
        # applies verbatim to each device's block (magnets excluded by the
        # envelope)
        f_acc, vel2 = _mass_forces(state, m, f_acc, shape)
        if is_verlet:
            pos2, vel3, acc = verlet(pos, vel2, m.acc, f_acc, m.m, state.dt)
        else:
            pos2, vel3, acc = euler(pos, vel2, f_acc, m.m, state.dt,
                                    cfg.velocity_clamp)
        move = m.valid & ~m.fixed
        new_m = dataclasses.replace(
            m,
            pos=jnp.where(move, pos2, pos),
            vel=jnp.where(move, vel3, m.vel),
            acc=jnp.where(move, acc, m.acc),
            T=m.T + jnp.where(move, state.dt, 0.0))
        new_state = dataclasses.replace(
            state, masses=new_m, t=state.t + state.dt)
        if shape.has_breathing:
            new_state = dataclasses.replace(
                new_state, stencil=dataclasses.replace(st, rest=new_rest))
        return new_state

    def chunk_body(state: SimState, n_steps) -> SimState:
        return jax.lax.fori_loop(0, n_steps, lambda i, s: local_step(s), state)

    n = shape.n_masses

    def spec_of(x):
        parts = [None] * x.ndim
        for dim, size in enumerate(x.shape):
            if size == n:
                parts[dim] = axis
                break
        return P(*parts)

    def make(state_proto: SimState):
        specs = jax.tree_util.tree_map(spec_of, state_proto)
        fn = jax.shard_map(chunk_body, mesh=mesh,
                           in_specs=(specs, P()), out_specs=specs)

        def chunk(state: SimState, n_steps) -> SimState:
            if not shape.all_valid:
                # fold endpoint validity into the stencil mask while the
                # arrays are still global (one cross-shard roll per chunk;
                # validity only changes at re-marshal boundaries)
                v = state.masses.valid
                mask_eff = jnp.stack([
                    state.stencil.mask[fi] & v & jnp.roll(v, -d)
                    for fi, d in enumerate(deltas)])
                state = dataclasses.replace(
                    state,
                    stencil=dataclasses.replace(state.stencil,
                                                mask=mask_eff))
            return fn(state, n_steps)

        return jax.jit(chunk)

    return make


def place(state: SimState, mesh: Mesh, axis: str = "shard") -> SimState:
    """Device-put a scene's state with the halo path's shardings."""
    n = state.masses.valid.shape[-1]

    def put(x):
        parts = [None] * x.ndim
        for dim, size in enumerate(x.shape):
            if size == n:
                parts[dim] = axis
                break
        return jax.device_put(x, NamedSharding(mesh, P(*parts)))

    return jax.tree_util.tree_map(put, state)
