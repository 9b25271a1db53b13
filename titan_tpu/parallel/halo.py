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
masked (no real spring wraps).

Envelope: stencil-only scenes, Euler (+clamp), gravity, persistent external
force, fixed masses, global planes/balls; block size must exceed max|delta|.
Scenes outside it use sharded.py's automatic partitioner.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Integrator
from ..ops import forces as F
from ..ops.integrators import euler
from ..state import SceneShape, SimState


def halo_supported(shape: SceneShape, n_devices: int) -> bool:
    cfg = shape.config
    if cfg.integrator is not Integrator.EULER:
        return False
    if not cfg.use_stencil or not shape.stencil_deltas:
        return False
    if shape.has_remainder or shape.has_breathing or shape.has_magnets:
        return False
    if shape.has_drag or not shape.all_valid:
        return False
    if any((shape.cap_cp, shape.cap_ball, shape.cap_pl, shape.cap_dir)):
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
    to_prev = [(i, (i - 1) % n_dev) for i in range(n_dev)]  # recv from next
    to_next = [(i, (i + 1) % n_dev) for i in range(n_dev)]  # recv from prev

    def halo_extend(x):
        """[3, B] -> [3, H + B + H] with both neighbors' edges."""
        head_from_next = jax.lax.ppermute(x[:, :halo], axis, to_prev)
        tail_from_prev = jax.lax.ppermute(x[:, -halo:], axis, to_next)
        return jnp.concatenate([tail_from_prev, x, head_from_next], axis=1)

    def local_step(state: SimState) -> SimState:
        m = state.masses
        pos, vel = m.pos, m.vel                        # [3, B] per device
        b = pos.shape[1]
        pos_ext = halo_extend(pos)                     # [3, H + B + H]
        if shape.has_damping:
            vel_ext = halo_extend(vel)
        f_acc = jnp.zeros_like(pos)
        spill = jnp.zeros((3, 2 * halo), dtype=pos.dtype)  # [prev | next]
        for fi, d in enumerate(deltas):
            pos_r = jax.lax.dynamic_slice_in_dim(pos_ext, halo + d, b, axis=1)
            diff = pos_r - pos
            length = jnp.sqrt(jnp.sum(diff * diff, axis=0))
            inv = jnp.where(length > 0,
                            1.0 / jnp.where(length > 0, length, 1.0), 0.0)
            mag = state.stencil.k[fi] * (state.stencil.rest[fi] - length)
            if shape.has_damping:
                vel_r = jax.lax.dynamic_slice_in_dim(vel_ext, halo + d, b,
                                                     axis=1)
                axial = jnp.sum((vel - vel_r) * (diff * inv), axis=0)
                mag = mag + axial * state.stencil.damping[fi]
            f = jnp.where(state.stencil.mask[fi], mag, 0.0) * (diff * inv)
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
        # local mass pass: gravity, extern, planes, balls
        f_acc = f_acc + m.m * state.g[:, None] + m.extern_force
        f_acc = F.apply_global_constraints(
            f_acc, m, state.gcon, shape.n_planes, shape.n_balls,
            cfg.normal_coeff, plane_friction=shape.plane_friction)
        pos2, vel2, acc = euler(pos, m.vel, f_acc, m.m, state.dt,
                                cfg.velocity_clamp)
        move = m.valid & ~m.fixed
        new_m = dataclasses.replace(
            m,
            pos=jnp.where(move, pos2, pos),
            vel=jnp.where(move, vel2, m.vel),
            acc=jnp.where(move, acc, m.acc),
            T=m.T + jnp.where(move, state.dt, 0.0))
        return dataclasses.replace(state, masses=new_m, t=state.t + state.dt)

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
        return jax.jit(fn)

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
