"""Explicit halo-exchange multi-chip stepping (shard_map + ppermute).

The automatic SPMD path (sharded.py) lets XLA partition the unmodified step;
this module is the hand-scheduled alternative for stencil scenes: masses are
block-sharded along N, each device steps its block locally, and the only
communication per step is

  1. two-sided halos of pos (+vel when springs are damped) of ``H`` lanes
     pulled from the neighboring devices (ppermutes), where H covers both the
     stencil family offsets and the remainder-spring index span,
  2. two "overflow" buffers of spring forces destined for the neighbors'
     edge masses (ppermutes), and
  3. for magnet scenes, one all_gather of pos per step (the magnet
     interaction is globally pairwise; params are gathered once per chunk),

a few hundred KB per step over ICI regardless of scene size -- the classic
halo pattern for a spatially decomposed lattice (lattice families have both
positive and one negative index offset).  The global wrap-around pairs are
masked (no real spring wraps; mass validity is folded into the stencil mask
and remainder valid flags at chunk entry, where a global roll is still cheap).

Envelope: stencil and/or remainder springs (remainder needs
``shape.remainder_span`` < block: each spring is owned by its left endpoint's
device and its right endpoint is then inside the halo window); Euler (+clamp),
Verlet, or RK2 (double force pass per dt with fresh halo exchanges,
sim.cu:1778-1799); breathing and ACTUATED_* springs (stencil rest mutation is local
to the left endpoint's block; remainder rest mutation depends only on
replicated spring arrays, so every device computes it identically); axial
damping (adds vel halos); drag; local constraints (per-mass, sharded with the
masses); soft-deleted masses; gravity, persistent external force, fixed
masses, global planes/balls; magnets in both forms -- exact pairwise
(per-step pos all_gather, O(N^2/D) compute per device) and cell-BINNED for
large N (the same all_gather; every device builds the identical global bin
structure and evaluates only its own receivers, so the gather-bound force
cost is D-way parallel and results are bitwise equal to the single-device
binned path; setup's argsort over N is replicated).  Block size must
exceed the max stencil |delta|; remainder springs fit the halo window when
their span allows and otherwise switch to a gathered path (replicated
evaluation of the small spring set over all-gathered pos, dropping
scatters into the local block), so no remainder span rejects the scene.
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


def halo_reject_reason(shape: SceneShape, n_devices: int):
    """None if the halo-exchange path accepts this scene on ``n_devices``,
    else a one-line reason naming the envelope condition that failed."""
    cfg = shape.config
    if cfg.integrator not in (Integrator.EULER, Integrator.VERLET,
                              Integrator.RK2):
        return (f"integrator {cfg.integrator.name} not supported by the "
                "halo path")
    if not cfg.use_stencil:
        return "use_stencil off"
    if not shape.stencil_deltas and not shape.has_remainder:
        return "no springs to exchange halos for"
    if not cfg.persistent_extern_force:
        return "strict per-step extern_force mode"
    if shape.n_masses % n_devices != 0:
        return (f"{shape.n_masses} masses not divisible by "
                f"{n_devices} devices")
    block = shape.n_masses // n_devices
    # remainder spans wider than the block don't reject the scene: those
    # springs switch to the gathered path (round 3)
    w = _halo_width(shape, _remainder_windowed(shape, n_devices))
    if block <= w:
        return (f"halo width {w} (max stencil index span) "
                f">= per-device block {block}")
    return None


def halo_supported(shape: SceneShape, n_devices: int) -> bool:
    return halo_reject_reason(shape, n_devices) is None


def _halo_width(shape: SceneShape, include_remainder: bool = True) -> int:
    spans = [abs(d) for d in shape.stencil_deltas]
    if shape.has_remainder and include_remainder:
        spans.append(shape.remainder_span)
    return max(spans + [1])


def _remainder_windowed(shape: SceneShape, n_devices: int) -> bool:
    """True if remainder springs fit the halo window (evaluated locally,
    spills ppermuted); False -> the gathered path (all_gather pos,
    replicated spring eval, dropping scatters into the local block)."""
    block = shape.n_masses // n_devices
    return shape.has_remainder and shape.remainder_span < block


def gathered_remainder_forces(sp, pos_all, vel_all, rem_rest, t_now, dt,
                              my0, b, has_breathing, has_damping):
    """Remainder-spring force on one device's block from ALL-GATHERED
    positions (round 3): spring arrays are replicated and S is small, so
    every device evaluates ALL remainder springs and applies, via dropping
    scatters, exactly the force components that land in its own block.
    The ACTUATED rest mutation reads only replicated arrays, so every
    device computes the identical new rest.  Shared by the halo-XLA path
    (spans wider than its window) and the distributed tiled path's
    per-step glue (all spans); the evaluator itself lives in
    ops/forces.compact_remainder_forces (also the single-device tiled
    glue at my0=0, b=n).  Returns (f_local [3, b], new_rem_rest).
    """
    from ..ops.forces import compact_remainder_forces
    return compact_remainder_forces(sp, pos_all, vel_all, rem_rest,
                                    t_now, dt, my0, b, has_breathing,
                                    has_damping)


def binned_magnet_block_forces(shape, pos_all, mag_src, pos_loc, valid_loc,
                               rad_loc, stiff_loc, maxf_loc, rid):
    """Cell-binned magnet force for one device's receivers, D-way parallel:
    every device builds the identical global bin structure from the
    gathered pos (setup replicated) and evaluates forces only for the
    receiver rows it owns -- where the cost lives (candidate slab
    gathers).  Per-receiver candidate order matches the single-device
    binned path exactly, so results are bitwise equal to it.  ``rid`` are
    the receivers' GLOBAL mass ids; receiver param arrays align with it.
    Shared by the halo-XLA path (receivers = the local block) and the
    distributed tiled glue (receivers = the block's attractors when
    compaction is on, else the block).  Returns [3, len(rid)].
    """
    from ..ops.magnets import (build_source_bins, cell_ids,
                               neighborhood_rows, receiver_forces)
    cfg = shape.config
    a_cells, cell_cap = shape.magnet_binned
    src_rad, src_scale, src_ok = mag_src
    bins, tbl, _ = build_source_bins(
        pos_all, src_ok, src_rad, src_scale, cfg.magnet_cutoff,
        a_cells, cell_cap)
    rcell = cell_ids(pos_loc, valid_loc, cfg.magnet_cutoff)
    rows9 = neighborhood_rows(tbl, rcell, a_cells)
    return receiver_forces(bins, rows9, cfg.magnet_cutoff,
                           shape.n_masses, pos_loc, rad_loc, stiff_loc,
                           maxf_loc, rid)


def build_halo_chunk(shape: SceneShape, mesh: Mesh, axis: str = "shard"):
    """Returns make(state) -> jitted chunk(state, n_steps) on ``mesh``."""
    deltas = shape.stencil_deltas
    n_dev = mesh.shape[axis]
    rem_windowed = _remainder_windowed(shape, n_dev)
    halo = _halo_width(shape, rem_windowed)
    cfg = shape.config
    is_verlet = cfg.integrator is Integrator.VERLET
    is_rk2 = cfg.integrator is Integrator.RK2
    to_prev = [(i, (i - 1) % n_dev) for i in range(n_dev)]  # recv from next
    to_next = [(i, (i + 1) % n_dev) for i in range(n_dev)]  # recv from prev
    # _mass_forces applies every per-mass force verbatim on the local block;
    # magnets are globally pairwise and handled here instead
    shape_local = dataclasses.replace(shape, has_magnets=False)

    def halo_extend(x):
        """[3, B] -> [3, H + B + H] with both neighbors' edges."""
        head_from_next = jax.lax.ppermute(x[:, :halo], axis, to_prev)
        tail_from_prev = jax.lax.ppermute(x[:, -halo:], axis, to_next)
        return jnp.concatenate([tail_from_prev, x, head_from_next], axis=1)

    def eval_forces(state: SimState, pos, vel, st_rest, rem_rest, t_now,
                    mag_src):
        """One full force evaluation at (pos, vel, t_now): springs over the
        halo'd window (fresh ppermutes), spill delivery, magnets, then the
        shared per-mass pass.  RK2 calls this twice per dt (reference
        sim.cu:1778-1799) with fresh halos each pass; ACTUATED rest
        advances on every call, matching the reference's double-pass rest
        mutation quirk.  Returns (f_acc, vel_out, new_st_rest,
        new_rem_rest)."""
        m = state.masses
        st = state.stencil
        b = pos.shape[1]
        # one [3, N] pos gather per force pass serves the gathered-remainder
        # AND magnet branches (a channel-id'd collective inside shard_map is
        # not CSE'd by XLA, so share it explicitly)
        rem_gathered = shape.has_remainder and not rem_windowed
        pos_all = (jax.lax.all_gather(pos, axis, axis=1, tiled=True)
                   if (rem_gathered or shape.has_magnets) else None)
        pos_ext = halo_extend(pos)                     # [3, H + B + H]
        if shape.has_damping:
            vel_ext = halo_extend(vel)
        f_acc = jnp.zeros_like(pos)
        spill = jnp.zeros((3, 2 * halo), dtype=pos.dtype)  # [prev | next]
        new_rest = st_rest
        for fi, d in enumerate(deltas):
            pos_r = jax.lax.dynamic_slice_in_dim(pos_ext, halo + d, b, axis=1)
            diff = pos_r - pos
            length = jnp.sqrt(jnp.sum(diff * diff, axis=0))
            inv = jnp.where(length > 0,
                            1.0 / jnp.where(length > 0, length, 1.0), 0.0)
            pair_ok = st.mask[fi]   # validity folded in at chunk entry
            rest = st_rest[fi]
            if shape.has_breathing:
                styp = st.type[fi]
                sin_wt = jnp.sin(st.omega[fi] * t_now)
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
        new_rem_rest = rem_rest
        if shape.has_remainder and not rem_windowed:
            # GATHERED remainder path (round 3): spans wider than the halo
            # window (> device block); one [3, N] collective per force
            # pass -- the same one magnet scenes pay (shared helper,
            # also the distributed tiled glue's remainder form)
            vel_all = (jax.lax.all_gather(vel, axis, axis=1, tiled=True)
                       if shape.has_damping else None)
            f_rem, new_rem_rest = gathered_remainder_forces(
                state.springs, pos_all, vel_all, rem_rest, t_now, state.dt,
                jax.lax.axis_index(axis) * b, b,
                shape.has_breathing, shape.has_damping)
            f_acc = f_acc + f_rem
        elif shape.has_remainder:
            # each remainder spring is owned by its LEFT endpoint's device;
            # |right - left| <= halo (envelope), so both endpoints are inside
            # the extended window.  Spring arrays are replicated; per-device
            # ownership is a mask, and the ACTUATED rest mutation below reads
            # only replicated arrays, so every device computes the identical
            # new rest (endpoint validity was folded into sp.valid at chunk
            # entry, mirroring the reference's early-return at sim.cu:1163).
            sp = state.springs
            dev = jax.lax.axis_index(axis)
            li = sp.left - dev * b
            owned = sp.valid & (li >= 0) & (li < b)
            lidx = jnp.clip(li, 0, b - 1) + halo           # [S] window index
            ridx = lidx + (sp.right - sp.left)
            pl = jnp.take(pos_ext, lidx, axis=1)           # [3, S]
            pr = jnp.take(pos_ext, ridx, axis=1)
            diff = pr - pl
            length = jnp.sqrt(jnp.sum(diff * diff, axis=0))
            inv = jnp.where(length > 0,
                            1.0 / jnp.where(length > 0, length, 1.0), 0.0)
            rest = rem_rest
            scale = 1.0
            if shape.has_breathing:
                styp = sp.type
                sin_wt = jnp.sin(sp.omega * t_now)
                scale = jnp.where(
                    styp == ACTIVE_CONTRACT_THEN_EXPAND, 1.0 - 0.2 * sin_wt,
                    jnp.where(styp == ACTIVE_EXPAND_THEN_CONTRACT,
                              1.0 + 0.2 * sin_wt, 1.0))
                rest = jnp.where(
                    sp.valid & (styp == ACTUATED_EXPAND)
                    & (rest < sp.l_max),
                    rest + sp.rate * state.dt,
                    jnp.where(
                        sp.valid & (styp == ACTUATED_CONTRACT)
                        & (rest > sp.l_min),
                        rest - sp.rate * state.dt, rest))
                new_rem_rest = rest
            mag = sp.k * (rest * scale - length)
            if shape.has_damping:
                vl = jnp.take(vel_ext, lidx, axis=1)
                vr = jnp.take(vel_ext, ridx, axis=1)
                axial = jnp.sum((vl - vr) * (diff * inv), axis=0)
                mag = mag + axial * sp.damping
            f = jnp.where(owned, mag, 0.0) * (diff * inv)  # [3, S]
            buf = jnp.zeros((3, b + 2 * halo), pos.dtype)
            buf = buf.at[:, lidx].add(-f).at[:, ridx].add(f)
            f_acc = f_acc + buf[:, halo:halo + b]
            spill = spill + jnp.concatenate(
                [buf[:, :halo], buf[:, halo + b:]], axis=1)
        # deliver spills: my prev-spill to the previous device's tail,
        # my next-spill to the next device's head
        from_next = jax.lax.ppermute(spill[:, :halo], axis, to_prev)
        from_prev = jax.lax.ppermute(spill[:, halo:], axis, to_next)
        f_acc = f_acc.at[:, :halo].add(from_prev)
        f_acc = f_acc.at[:, -halo:].add(from_next)
        f_acc = jnp.where(m.fixed, 0.0, f_acc)
        if shape.has_magnets and shape.magnet_binned:
            # cell-BINNED magnets, D-way parallel (shared helper, also
            # the distributed tiled glue's magnet form): replicated bin
            # build over the gathered pos, local receivers only -- no
            # collective beyond the pos all_gather the pairwise branch
            # already pays; bitwise equal to the single-device binned pass
            rid = (jax.lax.axis_index(axis) * b
                   + jnp.arange(b, dtype=jnp.int32))
            f_mag = binned_magnet_block_forces(
                shape, pos_all, mag_src, pos, m.valid, m.mag_rad,
                m.mag_stiffness, m.mag_maxf, rid)
            # fixed masses early-return before the magnet pass
            # (sim.cu:1292-1298); they still act as sources above
            f_acc = f_acc + jnp.where(m.fixed | ~m.valid, 0.0, f_mag)
        elif shape.has_magnets:
            # exact pairwise magnets, D-way parallel: local receivers vs the
            # all-gathered global source set (reference
            # computeExternalMagnetForce, sim.cu:1223-1241; force order --
            # magnets before gravity -- matches ops/step._mass_forces).
            # Source params (mag_src) were gathered once at chunk entry;
            # only pos moves between steps.
            src_pos = pos_all
            src_rad, src_scale, src_ok = mag_src
            my0 = jax.lax.axis_index(axis) * b
            diff = pos[:, :, None] - src_pos[:, None, :]     # [3, B, N]
            dist2 = jnp.sum(diff * diff, axis=0)
            dist = jnp.where(dist2 > 0,
                             jnp.sqrt(jnp.where(dist2 > 0, dist2, 1.0)), 0.0)
            ridx_g = my0 + jax.lax.broadcasted_iota(
                jnp.int32, dist.shape, 0)
            sidx_g = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
            pair_ok = ((dist < cfg.magnet_cutoff) & (ridx_g != sidx_g)
                       & m.valid[:, None] & src_ok[None, :])
            safe = jnp.where(dist > 0, dist, 1.0)
            inter = dist - (m.mag_rad[:, None] + src_rad[None, :])
            shell = jnp.where(
                inter < 0, jnp.abs(inter) * m.mag_stiffness[:, None], 0.0)
            attract = (src_scale[None, :] * m.mag_maxf[:, None]
                       / jnp.maximum(dist2, 1e-12))
            coeff = jnp.where(pair_ok, (shell - attract) / safe, 0.0)
            f_mag = jnp.sum(diff * coeff[None], axis=2)      # [3, B]
            # fixed masses early-return before the magnet pass
            # (sim.cu:1292-1298); they still act as sources above
            f_acc = f_acc + jnp.where(m.fixed, 0.0, f_mag)
        # local mass pass: gravity, extern, global planes/balls, local
        # constraints, drag -- all per-mass, so the shared implementation
        # applies verbatim to each device's block (magnets handled above)
        f_acc, vel_out = _mass_forces(
            state, dataclasses.replace(m, pos=pos, vel=vel), f_acc,
            shape_local)
        return f_acc, vel_out, new_rest, new_rem_rest

    def local_step(state: SimState, mag_src) -> SimState:
        m, st = state.masses, state.stencil
        pos, vel0 = m.pos, m.vel                       # [3, B] per device
        dt = state.dt
        move = m.valid & ~m.fixed
        if is_rk2:
            # reference RK2 (sim.cu:1778-1799 + 1336-1349): midpoint
            # predictor then corrector, forces (and halo exchanges)
            # evaluated twice per dt -- semantics mirror ops/step.py's RK2
            # branch exactly, including the frozen-mass handling
            f1, vel1, rest1, rrest1 = eval_forces(
                state, pos, vel0, st.rest, state.springs.rest, state.t,
                mag_src)
            acc1 = f1 / m.m
            pos_h = pos + 0.5 * vel1 * dt
            vel_h = vel1 + 0.5 * acc1 * dt
            pos_h = jnp.where(move, pos_h, pos)
            vel_h = jnp.where(move, vel_h, vel1)
            f2, vel2, rest2, rrest2 = eval_forces(
                state, pos_h, vel_h, rest1, rrest1, state.t + 0.5 * dt,
                mag_src)
            acc = f2 / m.m
            pos2 = pos + vel2 * dt
            vel3 = vel1 + acc * dt
            new_rest, new_rem_rest = rest2, rrest2
        else:
            f_acc, vel2, new_rest, new_rem_rest = eval_forces(
                state, pos, vel0, st.rest, state.springs.rest, state.t,
                mag_src)
            if is_verlet:
                pos2, vel3, acc = verlet(pos, vel2, m.acc, f_acc, m.m, dt)
            else:
                pos2, vel3, acc = euler(pos, vel2, f_acc, m.m, dt,
                                        cfg.velocity_clamp)
        new_m = dataclasses.replace(
            m,
            pos=jnp.where(move, pos2, pos),
            vel=jnp.where(move, vel3, m.vel),
            acc=jnp.where(move, acc, m.acc),
            T=m.T + jnp.where(move, dt, 0.0))
        new_state = dataclasses.replace(
            state, masses=new_m, t=state.t + dt)
        if shape.has_breathing:
            new_state = dataclasses.replace(
                new_state, stencil=dataclasses.replace(st, rest=new_rest),
                springs=dataclasses.replace(state.springs,
                                            rest=new_rem_rest))
        return new_state

    def chunk_body(state: SimState, n_steps) -> SimState:
        if shape.has_magnets:
            # magnet source params are chunk-invariant: gather once.  ALL
            # valid masses are sources, not just magnetic ones -- a plain
            # mass (rad=0, scale=0) still exerts shell contact force on a
            # magnetic receiver whose shell radius overlaps it, matching
            # ops/forces.magnet_forces (src_valid = masses.valid) and the
            # reference occupancy grid, which inserts every mass
            # (sim.cu:842).
            m = state.masses
            mag_src = tuple(
                jax.lax.all_gather(x, axis, axis=0, tiled=True)
                for x in (m.mag_rad, m.mag_scale, m.valid))
        else:
            mag_src = None
        return jax.lax.fori_loop(
            0, n_steps, lambda i, s: local_step(s, mag_src), state)

    n = shape.n_masses

    def _spec_tree(proto: SimState, of_n):
        """Shardings by FIELD ROLE, not by dimension size: mass-indexed
        arrays (masses, lcon, topo incidence, stencil dim 1) are
        block-sharded along N; spring-indexed and global arrays are
        replicated (a padded spring count can numerically equal N, so
        size-matching alone would mis-shard them)."""
        def shard_n(x):
            parts = [None] * x.ndim
            for dim, size in enumerate(x.shape):
                if size == n:
                    parts[dim] = of_n
                    break
            return P(*parts)

        rep = lambda x: P()
        tm = jax.tree_util.tree_map
        return dataclasses.replace(
            tm(rep, proto),
            masses=tm(shard_n, proto.masses),
            stencil=tm(shard_n, proto.stencil),
            lcon=tm(shard_n, proto.lcon),
            topo=tm(shard_n, proto.topo),
        )

    def make(state_proto: SimState):
        specs = _spec_tree(state_proto, axis)
        fn = jax.shard_map(chunk_body, mesh=mesh,
                           in_specs=(specs, P()), out_specs=specs)

        def chunk(state: SimState, n_steps) -> SimState:
            if not shape.all_valid:
                # fold endpoint validity into the stencil mask and remainder
                # valid flags while the arrays are still global (one
                # cross-shard roll/gather per chunk; validity only changes
                # at re-marshal boundaries)
                v = state.masses.valid
                mask_eff = jnp.stack([
                    state.stencil.mask[fi] & v & jnp.roll(v, -d)
                    for fi, d in enumerate(deltas)]) if deltas else \
                    state.stencil.mask
                sp = state.springs
                state = dataclasses.replace(
                    state,
                    stencil=dataclasses.replace(state.stencil,
                                                mask=mask_eff),
                    springs=dataclasses.replace(
                        sp, valid=sp.valid & v[sp.left] & v[sp.right]))
            return fn(state, n_steps)

        return jax.jit(chunk)

    return make


def place(state: SimState, mesh: Mesh, axis: str = "shard") -> SimState:
    """Device-put a scene's state with the halo path's shardings."""
    n = state.masses.valid.shape[-1]

    def put_n(x):
        parts = [None] * x.ndim
        for dim, size in enumerate(x.shape):
            if size == n:
                parts[dim] = axis
                break
        return jax.device_put(x, NamedSharding(mesh, P(*parts)))

    def put_rep(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    tm = jax.tree_util.tree_map
    return dataclasses.replace(
        tm(put_rep, state),
        masses=tm(put_n, state.masses),
        stencil=tm(put_n, state.stencil),
        lcon=tm(put_n, state.lcon),
        topo=tm(put_n, state.topo),
    )
