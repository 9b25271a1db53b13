"""Distributed beyond-VMEM stepping: the grid-tiled Pallas kernel per shard.

The halo-exchange path (halo.py) steps each device's block with XLA rolls
-- the right tool for small blocks, but a big distributed scene then pays
the same ~10x kernel-vs-XLA gap the single-device tiled kernel
(ops/pallas_tiled.py) was built to close (100^3: ~2,245 steps/s tiled vs
~224 XLA on one v5e).  This module runs THE SAME tiled kernel on every
device's contiguous block inside ``shard_map``.

Why the kernel composes with halos unchanged: the tiled kernel already
evaluates spring families over an H-row halo'd window and discards the
halo rows (only the center tile is extracted); window-edge roll wrap-around
corrupts only rows within max|delta| <= H of the window edge, i.e. only
discarded halo rows.  Single-device, the global array's (H, H) edge pads
are zeros and masks kill boundary pairs.  Distributed, each device's
(H, H) pads are filled with its neighbors' true edge rows instead:

  - per STEP: two ``ppermute``s move the [3, H] pos (+vel when damped)
    block edges between ring neighbors -- a few hundred KB over ICI,
    independent of scene size;
  - per CHUNK: the same exchange, once, for the spring-parameter planes
    and the packed family bitmask.  Spring params are chunk-constant BY
    CONSTRUCTION -- the closed-form ACTUATED rest (rest0 + min(s+1,
    s_stop)*rate*dt, see pallas_tiled.py) needs no rest writeback, so
    even actuated scenes exchange parameters once per chunk, and every
    device computes its halo springs' rests identically.

Forces on owned rows are then complete without any force spill exchange
(halo.py ppermutes spill buffers instead): springs owned by a neighbor's
edge masses are evaluated REDUNDANTLY on this device from the halo'd
window -- max|delta| <= H of redundant rows per side, <2% of a 100^3/8
block -- and the incomplete/garbage updates of the halo rows themselves
are overwritten by fresh neighbor data at the next step's exchange.
Per-device per-row arithmetic is identical (same kernel, same op order)
to the single-device tiled kernel, so trajectories match it bitwise;
tests pin that plus the XLA-path tolerance suite.

RK2 runs the reference's double force pass (sim.cu:1778-1799) as two
kernel launches with FRESH halo exchanges before each, mirroring
halo.py's RK2 and the single-device two-launch scheme.

Magnet and remainder-spring forces ride along as per-step glue through
the kernel's constant-force input (same structure as the single-device
tiled chunk), in halo.py's D-way-parallel forms: remainder springs at ANY
span via gathered replicated evaluation with dropping scatters
(`halo.gathered_remainder_forces`); binned magnets via the replicated bin
build with local receivers (`halo.binned_magnet_block_forces`), with
per-block attractor compaction when `SceneShape.magnet_receivers` is set.
One [3, N] pos all_gather per force pass serves both terms.

Envelope (`halo_tiled_reject_reason`): the tiled kernel's own envelope;
magnet scenes need the binned structure (exact-pairwise scenes below
magnet_binned_threshold stay on halo.py).  Blocks are padded up to a
tile multiple (inert rows: minv = 0, masks false), so any mass count
divides.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Integrator
from ..ops import pallas_tiled
from ..ops.pallas_tiled import (_round_up, _tile_size, make_mega_call,
                                make_mega_rk2_call, make_tiled_call,
                                prep_flat_inputs, tiled_reject_reason)
from ..state import SceneShape, SimState

#: Distributed mega (round 5) engagement gate: per-shard resident-grid
#: segments pay a redundant-compute tax of 2*KH/b (KH = the k-step halo,
#: rounded up to a tile) in exchange for the measured ~80% per-launch
#: fixed-cost amortization.  MEASURED on hardware (1-dev mesh, 100^3,
#: scripts/tpu_dist_mega_check.py): at b = 1M rows with this scene's
#: h = 10240 the tax is 32% and distributed mega is PARITY with the
#: per-step path (2,237 vs 2,268 steps/s) -- the launch win and the tax
#: cancel.  So the gate is TAX-BASED, not a flat row count: engage only
#: when 2*KH/b <= DIST_MEGA_MAX_TAX, which reproduces the round-4
#: design note's ~1M-rows/shard figure for h = 1024 topologies
#: (KH = 32768 -> b >= 0.8M) and correctly demands ~4M rows/shard for
#: 100^3-like topologies (h = 10240).  TITAN_DIST_MEGA=1 forces it on
#: (tests, A/B), =0 off.
DIST_MEGA_MAX_TAX = 0.08
#: kept for reference/tests: the h=1024 break-even block implied by the
#: tax gate
DIST_MEGA_MIN_BLOCK = 1 << 20


def _dist_mega_plan(shape: SceneShape, b: int, t_size: int, h: int):
    """(k_seg, KH): steps per distributed resident-grid launch and the
    tile-aligned k-step halo width, or (0, 0) to stay per-step.

    The per-shard mega kernel is the UNCHANGED single-device mega kernel
    run over the block extended by KH rows per side: neighbor halos are
    exchanged once per segment, the kernel advances k steps computing the
    halo region redundantly, and garbage creeps inward one force-reach
    per step (two under RK2's double pass) -- after k steps it has
    reached exactly KH, so the center block rows are exact (the same
    redundant-halo-compute trade the backward tile kernel makes,
    ops/adjoint_tiled.py)."""
    force = os.environ.get("TITAN_DIST_MEGA", "")
    if force == "0":
        return 0, 0
    if not pallas_tiled._mega_env_ok(shape):
        return 0, 0
    k = pallas_tiled._mega_seg(shape, t_size, h)
    if k == 0:
        return 0, 0
    h_step = 2 * h if shape.config.integrator is Integrator.RK2 else h
    KH = _round_up(k * h_step, t_size)
    if KH > b:
        return 0, 0        # halo exceeds the block (one-hop exchange)
    if force != "1" and 2 * KH > DIST_MEGA_MAX_TAX * b:
        return 0, 0        # redundant-compute tax would eat the win
    return k, KH


def _geometry(shape: SceneShape, n_devices: int):
    """(h, b, t_size): 1024-aligned halo width, per-device block, and the
    VMEM-fitting tile size.  The BLOCK is padded up to a tile multiple --
    not the tile shrunk to a block divisor: an unlucky block row count
    (e.g. 1e6/1024 = 977, prime) would otherwise collapse the tile to
    1024 rows and a 21x halo-window overhead (measured 3.5x wall-time on
    hardware, scripts/tpu_halo_tiled_check.py).  Global padding sits at
    the END of the mass array, so every device's block stays a contiguous
    global slice and stencil neighbors cross block boundaries intact."""
    h = _round_up(max(abs(d) for d in shape.stencil_deltas), 1024)
    t = _tile_size(h, shape)             # VMEM-fitted, multiple of 1024
    b = _round_up(-(-shape.n_masses // n_devices), t)
    return h, b, t


def halo_tiled_reject_reason(shape: SceneShape, n_devices: int):
    """None if the distributed tiled path accepts this scene on
    ``n_devices``, else a one-line reason naming the failed condition."""
    r = tiled_reject_reason(shape)
    if r is not None:
        return r
    if shape.has_magnets and not shape.magnet_binned:
        return ("exact-pairwise magnet scenes (below "
                "magnet_binned_threshold) stay on the halo-XLA path -- "
                "the distributed glue uses the D-way binned structure")
    if not shape.config.use_pallas:
        return "use_pallas off"
    # no geometry rejection: _tile_size's floor is the (1024-aligned) halo
    # width and blocks are padded up to a tile multiple, so b >= t >= h by
    # construction and the VMEM window fit was already checked by
    # tiled_reject_reason with the same (t, h); tiny scenes are simply
    # padded (inert rows) -- the _place_distributed gate keeps them on the
    # halo-XLA path anyway
    return None


def halo_tiled_supported(shape: SceneShape, n_devices: int) -> bool:
    return halo_tiled_reject_reason(shape, n_devices) is None


def magnet_recv_plan(shape: SceneShape, b: int, valid_loc, maxf_loc):
    """Chunk-constant receiver selection for the magnet glue on one
    shard: (ridx_loc, recv_mask).  Compacted attractors when
    ``SceneShape.magnet_receivers`` is set (exact: rad == 0 scene-wide,
    receivers are statically {valid & maxf != 0}; capacity = the global
    flagged count, since a single block can hold at most all of them),
    else the whole block.  Integer/bool only -- no gradient flows through
    the selection, so the distributed adjoint (parallel/halo_adjoint.py)
    reuses the same plan as a non-differentiable constant."""
    compact = shape.magnet_receivers
    if compact:
        flag_loc = valid_loc & (maxf_loc != 0.0)
        r_cap = min(compact, b)
        _, ridx_loc = jax.lax.top_k(flag_loc.astype(jnp.int32), r_cap)
        ridx_loc = ridx_loc.astype(jnp.int32)
        return ridx_loc, flag_loc[ridx_loc]
    return jnp.arange(b, dtype=jnp.int32), valid_loc


def dist_glue_force(shape: SceneShape, axis: str, b: int, my0, plan,
                    fixed1, valid_loc, pos_c, vel_c, t_i, dt32, rem_rest,
                    springs, mag4, mag_src=None):
    """The per-step magnet/remainder glue force for one shard, with every
    force-relevant input an EXPLICIT argument: the forward chunk closes
    over the chunk's fixed values, and the distributed adjoint
    (parallel/halo_adjoint.py) takes ``jax.vjp`` of this exact function so
    the collective transposes (all_gather -> psum_scatter) route
    cross-shard cotangents onto pos/vel and the glue parameters.

    ``plan`` = (ridx_loc, recv_mask) from :func:`magnet_recv_plan` (None
    unless magnets); ``mag4`` = stacked local [4, b] planes (rad,
    stiffness, maxf, scale); ``mag_src`` = the chunk-hoisted
    (rad_all, scale_all, valid_all) gather, or None to gather from
    ``mag4`` here (the adjoint needs the all_gather INSIDE so
    source-parameter cotangents ride its transpose -- values identical
    either way, the fields are chunk-constant).  Returns
    (extra [3, b] unblocked, new_rem_rest)."""
    from .halo import binned_magnet_block_forces, gathered_remainder_forces
    extra = jnp.zeros((3, b), pos_c.dtype)
    pos_all = jax.lax.all_gather(pos_c, axis, axis=1, tiled=True)
    if shape.has_remainder:
        vel_all = (jax.lax.all_gather(vel_c, axis, axis=1, tiled=True)
                   if shape.has_damping else None)
        f_rem, rem_rest = gathered_remainder_forces(
            springs, pos_all, vel_all, rem_rest, t_i, dt32,
            my0, b, shape.has_breathing, shape.has_damping)
        # spring forces never land on fixed masses (the same mask
        # the XLA step's scatter applies, sim.cu:1187-1193)
        extra = extra + jnp.where(fixed1 > 0.5, 0.0, f_rem)
    if shape.has_magnets:
        ridx_loc, recv_mask = plan
        if mag_src is None:
            mag_src = tuple(
                jax.lax.all_gather(x, axis, axis=0, tiled=True)
                for x in (mag4[0], mag4[3], valid_loc))
        rid = my0 + ridx_loc
        f_mag = binned_magnet_block_forces(
            shape, pos_all, mag_src, pos_c[:, ridx_loc],
            valid_loc[ridx_loc], mag4[0][ridx_loc], mag4[1][ridx_loc],
            mag4[2][ridx_loc], rid)
        # fixed masses receive nothing (sim.cu:1292-1298); top_k
        # padding picks unflagged rows -- masked like the
        # single-device compact path
        fixed_r = fixed1[0][ridx_loc] > 0.5
        f_mag = jnp.where(recv_mask & ~fixed_r, f_mag, 0.0)
        extra = extra.at[:, ridx_loc].add(f_mag)
    return extra, rem_rest


def build_halo_tiled_chunk(shape: SceneShape, mesh: Mesh,
                           axis: str = "shard"):
    """Jitted chunk(state, n_steps) stepping the scene with one tiled
    Pallas kernel launch per device per step (two under RK2)."""
    n = shape.n_masses
    n_dev = mesh.shape[axis]
    h, b, t_size = _geometry(shape, n_dev)
    n_dist = n_dev * b
    pad_n = n_dist - n
    n_tiles = b // t_size
    cfg = shape.config
    rk2 = cfg.integrator is Integrator.RK2
    verlet = cfg.integrator is Integrator.VERLET
    has_damping = shape.has_damping
    if rk2:
        call_a = make_tiled_call(shape, t_size, h, n_tiles, "rk2a")
        call_b = make_tiled_call(shape, t_size, h, n_tiles, "rk2b")
    else:
        step_call = make_tiled_call(shape, t_size, h, n_tiles, "single")
    # distributed mega (round 5): per-shard resident-grid segments over
    # the KH-extended block (see _dist_mega_plan); the kernel is the
    # UNCHANGED single-device mega kernel at n_t = b + 2*KH
    k_seg, KH = _dist_mega_plan(shape, b, t_size, h)
    if k_seg:
        n_tiles_ext = (b + 2 * KH) // t_size
        if rk2:
            mega_call = make_mega_rk2_call(shape, t_size, h, n_tiles_ext,
                                           k_seg)
        else:
            mega_call = make_mega_call(shape, t_size, h, n_tiles_ext,
                                       k_seg)
    to_prev = [(i, (i - 1) % n_dev) for i in range(n_dev)]  # recv from next
    to_next = [(i, (i + 1) % n_dev) for i in range(n_dev)]  # recv from prev

    has_glue = shape.has_remainder or shape.has_magnets

    def body_fn(inp):
        """Per-device: window the halo'd block and fori the kernel."""
        r3 = lambda x: x.reshape(x.shape[0], -1, 128)

        def ext_w(x, w):
            """[., B] -> [., W + B + W] with both ring neighbors' edges.
            The global array end is padded/masked, so the ring wrap
            contributes nothing (same masking that kills the global
            jnp.roll wrap in the XLA and single-device tiled paths)."""
            head_from_next = jax.lax.ppermute(x[:, :w], axis, to_prev)
            tail_from_prev = jax.lax.ppermute(x[:, -w:], axis, to_next)
            return jnp.concatenate([tail_from_prev, x, head_from_next],
                                   axis=1)

        ext = lambda x: ext_w(x, h)

        # chunk-constant windows: ONE parameter halo exchange per chunk
        param_hbm = r3(ext(inp["param"])) if "param" in inp else None
        mask_hbm = r3(ext(inp["bits"])) if "bits" in inp else None
        minv_t, fixed_t = r3(inp["minv"]), r3(inp["fixed"])
        cf = r3(inp["cf"])
        drag_t = r3(inp["drag"]) if "drag" in inp else None
        lc_t = r3(inp["lc"]) if "lc" in inp else None
        fparams, planes, balls = inp["fparams"], inp["planes"], inp["balls"]
        dt32, t032 = inp["scal0"][0], inp["scal0"][1]

        # --- magnet/remainder per-step glue (the tiled kernel's constant-
        # force input becomes per-pass), D-way parallel via the halo.py
        # helpers: gathered-replicated remainder eval with dropping
        # scatters, replicated bin build with local receivers for magnets
        # (shared with the distributed adjoint: dist_glue_force above)
        my0 = jax.lax.axis_index(axis) * b
        plan = valid_loc = mag4 = mag_src = None
        if shape.has_magnets:
            valid_loc = inp["valid"][0]                    # [b] bool
            mag4 = jnp.stack([inp["mag_rad"][0], inp["mag_stiffness"][0],
                              inp["mag_maxf"][0], inp["mag_scale"][0]])
            # chunk-constant source gather + receiver plan, hoisted out
            # of the step loop
            mag_src = tuple(
                jax.lax.all_gather(x, axis, axis=0, tiled=True)
                for x in (mag4[0], mag4[3], valid_loc))
            plan = magnet_recv_plan(shape, b, valid_loc, mag4[2])

        def glue(pos_c, vel_c, t_i, rem_rest):
            extra, rem_rest = dist_glue_force(
                shape, axis, b, my0, plan, inp["fixed"], valid_loc,
                pos_c, vel_c, t_i, dt32, rem_rest, inp.get("springs"),
                mag4, mag_src)
            return r3(extra), rem_rest

        def call_args(scal, pos_c, vel_c, acc_c=None, extra3=None,
                      cf_step=None):
            if has_damping:
                state_hbm = r3(jnp.concatenate([ext(pos_c), ext(vel_c)],
                                               axis=0))
            else:
                state_hbm = r3(ext(pos_c))
            args = [scal, planes, balls, fparams, state_hbm]
            if param_hbm is not None:
                args.append(param_hbm)
            if mask_hbm is not None:
                args.append(mask_hbm)
            if not has_damping:
                args.append(r3(vel_c))
            if acc_c is not None:
                args.append(r3(acc_c))
            args += [cf if cf_step is None else cf_step,
                     minv_t, fixed_t]
            if extra3 is not None:
                args += [r3(x) for x in extra3]
            if drag_t is not None:
                args.append(drag_t)
            if lc_t is not None:
                args.append(lc_t)
            return args

        flat = lambda x: x.reshape(3, b)

        def body(i, carry):
            pos, vel, acc, rem_rest = carry
            i32 = i.astype(jnp.float32)
            t_i = t032 + i32 * dt32
            cfs = None
            if has_glue:
                cfs, rem_rest = glue(pos, vel, t_i, rem_rest)
                cfs = cf + cfs
            if rk2:
                # two launches per dt, fresh halos per pass (the kernel's
                # rk2a/rk2b modes; scal[2] counts ACTUATED advances, two
                # per dt -- the reference's double-pass rest quirk); glue
                # re-evaluated at the midpoint state, advancing the
                # remainder rest each pass like the single-device chunk
                scal = jnp.stack([dt32, t_i, 2.0 * i32])
                ph, vh, v1 = call_a(*call_args(scal, pos, vel,
                                               cf_step=cfs))
                ph, vh, v1 = flat(ph), flat(vh), flat(v1)
                if has_glue:
                    cfs, rem_rest = glue(ph, vh, t_i + 0.5 * dt32,
                                         rem_rest)
                    cfs = cf + cfs
                scal2 = jnp.stack([dt32, t_i + 0.5 * dt32,
                                   2.0 * i32 + 1.0])
                p2, v2, a2 = call_b(*call_args(scal2, ph, vh,
                                               extra3=(pos, v1, vel),
                                               cf_step=cfs))
            else:
                scal = jnp.stack([dt32, t_i, i32])
                p2, v2, a2 = step_call(*call_args(
                    scal, pos, vel, acc_c=acc if verlet else None,
                    cf_step=cfs))
            return flat(p2), flat(v2), flat(a2), rem_rest

        carry0 = (inp["pos"], inp["vel"], inp["acc"])
        lower = jnp.int32(0)
        if k_seg:
            # distributed mega: fresh KH-wide state halos per SEGMENT, one
            # resident-grid launch per k_seg steps over the extended
            # block; chunk-constant planes extended once (params by KH
            # then the kernel's h window pad, per-mass planes by KH)
            n_ext = b + 2 * KH
            padh = lambda x: jnp.pad(x, ((0, 0), (h, h)))
            param_m = (r3(padh(ext_w(inp["param"], KH)))
                       if "param" in inp else None)
            mask_m = (r3(padh(ext_w(inp["bits"], KH)))
                      if "bits" in inp else None)
            cf_m = r3(ext_w(inp["cf"], KH))
            minv_m = r3(ext_w(inp["minv"], KH))
            fixed_m = r3(ext_w(inp["fixed"], KH))
            mtail = []
            if param_m is not None:
                mtail.append(param_m)
            if mask_m is not None:
                mtail.append(mask_m)
            mtail += [cf_m, minv_m, fixed_m]
            if "drag" in inp:
                mtail.append(r3(ext_w(inp["drag"], KH)))
            if "lc" in inp:
                mtail.append(r3(ext_w(inp["lc"], KH)))

            def seg_body(si, carry):
                pos, vel, acc = carry
                ext9 = jnp.concatenate(
                    [ext_w(pos, KH), ext_w(vel, KH), ext_w(acc, KH)],
                    axis=0)
                a0 = r3(padh(ext9))
                b0 = jnp.zeros_like(a0)
                bufs = (a0, b0, jnp.zeros_like(a0)) if rk2 else (a0, b0)
                base = (si * k_seg).astype(jnp.float32)
                scal = jnp.stack([dt32, t032 + base * dt32,
                                  2.0 * base if rk2 else base])
                out = mega_call(scal, planes, balls, fparams, *bufs,
                                *mtail)
                flat = out[0].reshape(9, -1)[:, h:h + n_ext]
                return (flat[0:3, KH:KH + b], flat[3:6, KH:KH + b],
                        flat[6:9, KH:KH + b])

            n_seg = inp["n_steps"] // k_seg
            carry0 = jax.lax.fori_loop(0, n_seg, seg_body, carry0)
            lower = n_seg * k_seg

        pos, vel, acc, rem_rest = jax.lax.fori_loop(
            lower, inp["n_steps"], body, carry0 + (inp["rem_rest"],))
        return pos, vel, acc, rem_rest

    def chunk(state: SimState, n_steps) -> SimState:
        m, stc = state.masses, state.stencil
        p = prep_flat_inputs(shape, state)
        move = p["move"]
        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad_n)))

        sh = P(None, axis)
        rep = P()
        inp = {"pos": padf(m.pos), "vel": padf(m.vel), "acc": padf(m.acc),
               "minv": padf(p["minv_flat"]), "fixed": padf(p["fixed_flat"]),
               "cf": padf(p["const_flat"]),
               "fparams": p["fparams"], "planes": p["planes"],
               "balls": p["balls"],
               "scal0": jnp.stack([state.dt.astype(jnp.float32),
                                   state.t.astype(jnp.float32)]),
               "n_steps": jnp.asarray(n_steps, jnp.int32)}
        specs = {"pos": sh, "vel": sh, "acc": sh, "minv": sh, "fixed": sh,
                 "cf": sh, "fparams": rep, "planes": rep, "balls": rep,
                 "scal0": rep, "n_steps": rep}
        if p["param_flat"] is not None:
            inp["param"] = padf(p["param_flat"])
            specs["param"] = sh
        if p["bits_flat"] is not None:
            inp["bits"] = padf(p["bits_flat"])
            specs["bits"] = sh
        if p["drag_flat"] is not None:
            inp["drag"] = padf(p["drag_flat"])
            specs["drag"] = sh
        if p["lc_flat"] is not None:
            inp["lc"] = padf(p["lc_flat"])
            specs["lc"] = sh
        pad1 = lambda x: jnp.pad(x[None, :], ((0, 0), (0, pad_n)))
        if shape.has_magnets:
            for name, arr in (("valid", pad1(m.valid)),
                              ("mag_rad", pad1(m.mag_rad)),
                              ("mag_stiffness", pad1(m.mag_stiffness)),
                              ("mag_maxf", pad1(m.mag_maxf)),
                              ("mag_scale", pad1(m.mag_scale))):
                inp[name] = arr
                specs[name] = sh
        springs = state.springs
        if shape.has_remainder and not shape.all_valid:
            # fold endpoint validity while the arrays are still global
            # (validity only changes at re-marshal boundaries), mirroring
            # halo.py's chunk entry
            v = m.valid
            springs = dataclasses.replace(
                springs,
                valid=springs.valid & v[springs.left] & v[springs.right])
        inp["springs"] = springs          # replicated pytree (S small)
        specs["springs"] = jax.tree_util.tree_map(lambda _: rep, springs)
        inp["rem_rest"] = springs.rest
        specs["rem_rest"] = rep

        # check_vma=False: pallas_call inside shard_map has no varying-
        # mesh-axes annotation on its out_shape structs
        pos, vel, acc, rem_rest = jax.shard_map(
            body_fn, mesh=mesh, in_specs=(specs,),
            out_specs=(sh, sh, sh, rep), check_vma=False)(inp)
        pos, vel, acc = pos[:, :n], vel[:, :n], acc[:, :n]
        # the kernel zeroes frozen masses' acc; the reference preserves it
        acc = jnp.where(move, acc, m.acc)

        dtn = jnp.asarray(n_steps, state.dt.dtype) * state.dt
        new_m = dataclasses.replace(
            m, pos=pos, vel=vel, acc=acc,
            T=m.T + jnp.where(move, dtn, 0.0))
        new_state = dataclasses.replace(state, masses=new_m,
                                        t=state.t + dtn)
        if shape.has_actuated:
            # end-of-chunk rest via the same closed form the kernel used
            n_adv = jnp.asarray(n_steps, jnp.float32) * (2.0 if rk2 else 1.0)
            advn = jnp.minimum(n_adv, p["sstop"])
            new_state = dataclasses.replace(
                new_state, stencil=dataclasses.replace(
                    stc, rest=stc.rest + advn * p["aratedt"]))
        if shape.has_remainder:
            # remainder rest advanced iteratively in the per-pass glue
            # (keep the ORIGINAL valid flags in state; the folded copy was
            # glue-local)
            new_state = dataclasses.replace(
                new_state, springs=dataclasses.replace(
                    state.springs, rest=rem_rest))
        return new_state

    return jax.jit(chunk)
