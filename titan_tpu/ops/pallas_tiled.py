"""Grid-tiled Pallas step kernel for scenes too big for the VMEM-resident
kernel (ops/pallas_step.py) -- e.g. the 100^3 config (1M masses / 12.7M
springs).

Per step, the grid walks column tiles of T masses.  Mass-payload arrays that
need neighbor access (pos, and vel when damping) are pre-padded with
H = max|delta| (lane-aligned) rows on both sides and reshaped to
[., rows, 128]; each tile DMAs one halo'd window of rows from HBM into a
revolving two-slot scratch buffer -- the DMA for tile t+1 is issued before
tile t's compute, overlapping memory and VPU work.  Spring family parameters
are handled two ways (decided by the static scene shape):

  - family-uniform fields (``SceneShape.stencil_uniform``; true for every
    regular lattice): ONE scalar per family rides in SMEM -- zero HBM
    traffic per step, the dominant saving at 12.7M springs;
  - non-uniform fields: stacked into a single [P, rows, 128] HBM array and
    window-DMA'd alongside pos (k is always windowed: it carries the
    existence mask as k=0).

Everything else (gravity+extern, planes, balls, drag, integration) happens
on the tile's own rows via auto-pipelined blocked inputs.

Envelope: Euler (velocity clamp optional), Verlet, or RK2 (two kernel
launches per step -- midpoint predictor then corrector, the same double
force pass the reference pays, sim.cu:1778-1799); damping; breathing
(ACTIVE_*); ACTUATED_* springs; local constraints; drag; soft-deleted
masses; magnets; remainder (irregular) springs; unbounded N.  Magnet and
remainder forces are evaluated OUTSIDE the kernel each step -- by exactly
the code the XLA step path would run (dense-grid Pallas / cell-binned /
pairwise magnets via ops.step.magnet_pass; gather+segment-sum remainder
via ops.forces) -- and enter the kernel through its per-mass constant-
force input, which becomes per-step when either feature is present.
Ordering is safe because force accumulation commutes and the kernel
applies global/local constraints and friction to the completed sum, same
as the XLA step.  This makes the tiled path feature-complete for f32
scenes (the reference kernels support all features at any scene size,
sim.cu:1157-1367) and never SLOWER than the XLA fallback: the glue per
step costs what the XLA path would pay for the same term, while the
stencil springs -- the bulk at beyond-VMEM scale -- stay in the kernel.

ACTUATED_* rest needs no per-step writeback or carried state: the
reference's rest mutation (sim.cu:1173-1181 -- advance by rate*dt each step
while short of the one-sided bound, overshoot retained) is independent of
the physics state, so rest at step s has the closed form
``rest0 + min(s + 1, s_stop) * rate * dt`` with
``s_stop = ceil((bound - rest0) / (rate * dt))``.  The kernel streams two
extra windowed planes (rate*dt and s_stop) and evaluates the closed form
from the SMEM step counter; the end-of-chunk rest is reconstructed in XLA
the same way.  (f32 note: the closed form fuses the per-step additions the
iterative paths accumulate, a ~1e-7 relative difference absorbed by the
equivalence-test tolerances.)

Local constraints are per-mass with no neighbor access, so their stacked
slot planes ride the auto-pipelined blocked inputs (no halo windows).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import (ACTIVE_CONTRACT_THEN_EXPAND, ACTIVE_EXPAND_THEN_CONTRACT,
                      ACTUATED_CONTRACT, ACTUATED_EXPAND, Integrator)
from ..state import SceneShape, SimState


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _plan(shape: SceneShape):
    """Static layout plan shared by the kernel and its chunk wrapper."""
    u_k, u_rest, u_damp, u_type, u_omega = shape.stencil_uniform
    nf = len(shape.stencil_deltas)
    breathing = shape.has_breathing
    damping = shape.has_damping
    # Windowed param planes: k carries the existence mask (k=0 at empty
    # lanes), so a family-uniform k is replaced by an SMEM scalar plus ONE
    # packed int32 bitmask plane (bit fi = family fi's mask) -- 1/F the HBM
    # traffic, the dominant per-step term at 12.7M springs.  Non-uniform
    # fields stream as f32 planes.
    offsets = {}
    p = 0
    if not u_k:
        offsets["k"] = p
        p += nf
    if not u_rest or shape.has_actuated:
        # actuated rest is per-spring state even if initially uniform
        offsets["rest"] = p
        p += nf
    if shape.has_actuated:
        # closed-form actuation inputs (see module docstring)
        offsets["aratedt"] = p
        p += nf
        offsets["sstop"] = p
        p += nf
    if damping:
        # damping is ALWAYS windowed (zeroed at mask=False lanes): a
        # family-uniform scalar would apply the axial-damping term to
        # nonexistent springs, which neither k=0 nor the bitmask masks out
        # of the mag sum on its own.
        offsets["damping"] = p
        p += nf
    if breathing and not u_type:
        offsets["bsign"] = p
        p += nf
    if breathing and not u_omega:
        offsets["bomega"] = p
        p += nf
    n_state = 6 if damping else 3     # pos (+vel) window planes
    return offsets, p, n_state


def _vmem_bytes(shape: SceneShape, t: int, h: int) -> int:
    """Double-buffered window DMAs + blocked tiles, bytes (estimate used by
    both the envelope check and the tile-size pick)."""
    w = t + 2 * h
    _, n_param, n_state = _plan(shape)
    n_win = n_state + n_param + (1 if shape.stencil_uniform[0] else 0)
    win_bytes = 2 * 4 * (w // 128) * 128 * n_win
    from .pallas_step import _lc_planes
    # RK2's corrector launch streams three extra blocked [3, T] inputs
    # (original pos, pass-1 vel, pre-step vel)
    rk2_planes = 9 if shape.config.integrator is Integrator.RK2 else 0
    blk_bytes = 2 * 4 * t * (3 * 6 + 4 + rk2_planes + _lc_planes(shape))
    return win_bytes + blk_bytes


_VMEM_EST_BUDGET = 48 * 1024 * 1024

# A/B hook (scripts/tpu_tiled_carry_ab.py): "padded" keeps the fori_loop
# carry in the kernel's padded-flat [3, n_t] layout (no per-step output
# slices / input right-pads); "legacy" reproduces the round-3 [3, n] carry
# and its per-step pad/slice traffic.  Snapshotted by build_tiled_chunk at
# BUILD time (a module global read inside the jitted chunk would resolve
# at first-call trace time instead -- the flag must bind when the chunk is
# built, not when it first runs).
CARRY_MODE = "padded"


def _tile_size(h: int, shape: SceneShape = None) -> int:
    """Tile size: 4 halos wide by default; a multiple of 1024 so windows
    stay sublane-aligned (Mosaic faults otherwise -- see CLAUDE.md).  The
    mass array is padded up to a tile multiple.

    A work-minimizing larger pick (131072 at 100^3, window overhead 1.21x
    vs this floor's 1.50x) measured NO faster (1,424 vs 1,450 steps/s,
    one-process A/B on v5e, scripts/tpu_tiled_ab.py) -- the halo tax does
    not convert to wall time at this geometry, so keep the small tile and
    its cheaper VMEM footprint.  RE-MEASURED after the padded-flat carry
    removed the tile-size-independent glue that explained that wash
    (scripts/tpu_tiled_tile_ab2.py, one process, 6k-step windows): the
    floor now WINS outright -- 2,500/2,504 steps/s vs 2,302 (2x tile)
    and 2,289 (131072) at 100^3 -- so bigger tiles are a measured
    regression, not merely a wash; don't retry.

    When ``shape`` is given, the tile SHRINKS (halving, toward one halo)
    until the window fits the VMEM budget: beyond ~180^3 the 4-halo
    window overflows and the old fixed tile fell off the kernel entirely
    (a measured ~10x cliff to the XLA path at 190^3); since the halo DMA
    overhead does not convert to wall time, a 2-3x-overhead window is
    strictly better than the cliff."""
    t = _round_up(max(4 * h, 32768), 1024)
    if shape is None:
        return t
    floor = _round_up(h, 1024)
    while t > floor and _vmem_bytes(shape, t, h) >= _VMEM_EST_BUDGET:
        t = _round_up(max(t // 2, h), 1024)
    return t


def tiled_reject_reason(shape: SceneShape):
    """None if the grid-tiled kernel accepts this scene, else a one-line
    reason naming the envelope condition that failed."""
    cfg = shape.config
    if cfg.integrator not in (Integrator.EULER, Integrator.VERLET,
                              Integrator.RK2):
        return (f"integrator {cfg.integrator.name} not supported by the "
                "tiled kernel")
    if cfg.dtype != "float32":
        return f"dtype {cfg.dtype} (tiled kernel is f32-only)"
    if not cfg.use_stencil or not shape.stencil_deltas:
        return "no stencil spring families"
    if not cfg.persistent_extern_force:
        return "strict per-step extern_force mode"
    h = _round_up(max(abs(d) for d in shape.stencil_deltas), 1024)
    t = _tile_size(h, shape)             # shrinks toward one halo to fit
    b = _vmem_bytes(shape, t, h)
    if b >= _VMEM_EST_BUDGET:
        return (f"tile window needs ~{b >> 20} MB of VMEM > "
                f"{_VMEM_EST_BUDGET >> 20} MB budget even at the "
                f"one-halo tile")
    return None


def tiled_supported(shape: SceneShape) -> bool:
    return tiled_reject_reason(shape) is None


def _build_kernel(shape: SceneShape, t_size: int, h: int,
                  mode: str = "single", k_seg: int = 0, n_tiles_s: int = 0,
                  hw: int = 0):
    """mode selects the integrate tail: "single" is one launch per step
    (Euler or Verlet); "rk2a"/"rk2b" are the two launches of one RK2 step
    (midpoint predictor / corrector, reference sim.cu:1778-1799 +
    1336-1349).  The force evaluation (springs over the halo'd window,
    planes/balls/local constraints/drag on tile rows) is identical in all
    modes -- rk2a receives (pos, vel) and emits (pos_half, vel_half, vel1);
    rk2b receives (pos_half, vel_half) windows plus blocked original pos,
    pass-1 vel1, and pre-step vel0, and emits the final (pos, vel, acc).

    mode="mega" is the RESIDENT GRID kernel (round 4): ONE pallas_call
    advances ``k_seg`` whole steps over a grid of (k_seg, n_tiles) cells.
    State (pos, vel, acc) lives in TWO HBM buffers, window-layout
    [9, (n_t + 2h)/128, 128]: step s reads windows from buffer A (s even)
    or B (s odd) and writes its tile's rows to the other, so each cell
    sees exactly the one-step path's s-1 state (the TPU grid executes
    sequentially; pads are never written and stay zero).  Step 0 reads
    the aliased INPUT buffer so correctness never depends on
    input_output_aliasing being observable in-kernel.  This amortizes the
    measured ~320 us per-launch fixed cost of the one-step path (80% of
    the 401 us step at 100^3 -- docs/PERFORMANCE.md round-4
    decomposition) over k_seg steps and removes the per-step XLA
    pad/reshape glue entirely; per-step physics is op-for-op the
    "single"-mode kernel (equivalence pinned in test_pallas_tiled.py).
    Envelope: Euler/Verlet, no magnet/remainder glue (glue needs XLA
    between steps).  Euler writes only pos+vel planes per step (acc joins
    on the segment's last step); Verlet reads+writes acc every step.

    mode="megatrace" is the adjoint TRACE variant of mega (round 5): the
    per-cell physics is op-for-op the mega cell, but instead of two
    parity buffers the state flows through consecutive entries of ONE
    [seg+1, 9, rows_hw, 128] trace buffer with the BACKWARD's halo pads
    ``hw`` (step s reads entry s0+s and writes entry s0+s+1; ``s0`` rides
    scal[3], so one launch per k_seg-step slice reproduces the primal
    chunk's mega segmentation -- and hence its per-launch t_now / advance
    scalars -- BITWISE).  The filled trace is exactly what the reverse
    sweep (ops/adjoint_tiled.py mega backward) consumes."""
    deltas = shape.stencil_deltas
    w = t_size + 2 * h
    wr, tr, hr = w // 128, t_size // 128, h // 128
    n_planes, n_balls = shape.n_planes, shape.n_balls
    plane_friction = shape.plane_friction
    clamp = shape.config.velocity_clamp
    rk2a = mode == "rk2a"
    rk2b = mode == "rk2b"
    megatr = mode == "megatrace"
    mega = mode == "mega" or megatr
    megark2 = mode == "megark2"
    woffr = (hw - h) // 128 if megatr else 0   # trace window read offset
    hwb = hw // 128 if megatr else 0           # trace tile-row/write offset
    verlet = (mode in ("single", "mega", "megatrace")
              and shape.config.integrator is Integrator.VERLET)
    has_damping = shape.has_damping
    has_breathing = shape.has_breathing
    has_actuated = shape.has_actuated
    has_drag = shape.has_drag
    caps = (shape.cap_cp, shape.cap_ball, shape.cap_pl, shape.cap_dir)
    has_local = any(caps)
    normal_coeff = shape.config.normal_coeff
    from .forces import use_rsqrt
    rsqrt_norms = use_rsqrt(jnp.float32)
    offsets, n_param, n_state = _plan(shape)
    n_tp = tp0 = 0
    if mega:
        # vel and acc ride the dynamic state buffers (layout pos 0:3,
        # vel 3:6, acc 6:9), but only DAMPING needs vel on HALO rows
        # (the roll-gathered damping term); everything else reads vel --
        # and acc under Verlet -- as TILE rows via a second, smaller DMA
        # (~12% of the window traffic on the no-damping bench scene,
        # and the kernel is measured HBM-bound)
        n_state = 6 if has_damping else 3          # windowed planes
        tp0 = 6 if has_damping else 3              # tile-rows DMA start
        n_tp = (0 if has_damping else 3) + (3 if verlet else 0)
    if megark2:
        # ONE swin scratch serves both passes: pass A windows S = pos
        # (+vel under damping), pass B windows M = ph (+vh) -- the same
        # plane count.  Pass A's vel tiles ride vtile; pass B reads vh
        # (when not damping) + v1 from M and pos0/vel0 from S as tiles.
        n_state = 6 if has_damping else 3
        tp0 = 3                                    # pass-A vel tile start
        n_tp = 0 if has_damping else 3
        m_t0 = 6 if has_damping else 3             # M tile-rows start
        n_mt = 9 - m_t0                            # vh?+v1 planes
    nf = len(deltas)
    u_k = shape.stencil_uniform[0]
    has_pwin = n_param > 0
    mask_sem = 2 if has_pwin else 1
    tp_sem = 1 + has_pwin + u_k                    # mega tile-rows sem
    mt_sem = tp_sem + 1                            # megark2 M-tiles sem
    s0_sem = tp_sem + 2                            # megark2 S-tiles sem

    def kernel(*refs):
        (scal_ref, plane_ref, ball_ref, fparam_ref, state_hbm) = refs[:5]
        i = 5
        if (mega and not megatr) or megark2:
            _state_b_in = refs[i]   # aliased to out_b; never read
            i += 1
        if megark2:
            _state_m_in = refs[i]   # aliased to out_m; never read
            i += 1
        if has_pwin:
            param_hbm = refs[i]
            i += 1
        if u_k:
            mask_hbm = refs[i]
            i += 1
        if not has_damping and not (mega or megark2):
            vel_ref = refs[i]
            i += 1
        if verlet and not mega:
            acc_ref = refs[i]
            i += 1
        cforce_ref, minv_ref, fixed_ref = refs[i:i + 3]
        i += 3
        if rk2b:
            pos0_ref, vel1_ref, vel0_ref = refs[i:i + 3]
            i += 3
        if has_drag:
            drag_ref = refs[i]
            i += 1
        if has_local:
            lc_ref = refs[i]    # [P_lc, tr, 128] stacked slot planes
            i += 1
        if megatr:
            out_t = refs[i]
            i += 1
        elif mega:
            out_a, out_b = refs[i:i + 2]
            i += 2
        elif megark2:
            out_a, out_b, out_m = refs[i:i + 3]
            i += 3
        else:
            opos_ref, ovel_ref, oacc_ref = refs[i:i + 3]
            i += 3
        swin = refs[i]
        i += 1
        if has_pwin:
            pwin = refs[i]
            i += 1
        if u_k:
            mwin = refs[i]
            i += 1
        if (mega or megark2) and n_tp:
            vtile = refs[i]     # [2, n_tp, tr, 128] vel/acc tile rows
            i += 1
        if megark2:
            mtile = refs[i]     # [2, n_mt, tr, 128] M tiles (vh? + v1)
            s0tile = refs[i + 1]  # [2, 6, tr, 128] pos0 + vel0 tiles
            i += 2
        if mega or megark2:
            wstage = refs[i]    # [9, tr, 128] write staging (Mosaic needs
            i += 1              # ANY-dest DMAs staged + sublane-aligned)
        sem = refs[i]
        if mega or megark2:
            wsem = refs[i + 1]

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)

        def roll_gather(x, d):
            # row rolls + ONE lane rotation (select commutes inside the
            # rotation with its boundary shifted by r; see pallas_step.py)
            q, r = divmod(d, 128)
            if r == 0:
                return pltpu.roll(x, (-q) % wr, 1)
            a = pltpu.roll(x, (-q) % wr, 1)
            b = pltpu.roll(x, (-(q + 1)) % wr, 1)
            z = jnp.where(lane >= r, a, b)
            return pltpu.roll(z, 128 - r, 2)

        def roll_scatter(x, d):
            q, r = divmod(d, 128)
            if r == 0:
                return pltpu.roll(x, q % wr, 1)
            a = pltpu.roll(x, q % wr, 1)
            b = pltpu.roll(x, (q + 1) % wr, 1)
            z = jnp.where(lane < 128 - r, a, b)
            return pltpu.roll(z, r, 2)

        if megark2:
            # one cell = ONE RK2 pass: p_id 0 = midpoint predictor (reads
            # S_s, writes M), p_id 1 = corrector (reads M + S_s tiles,
            # writes S_{s+1}).  Pass A of step s fully precedes pass B
            # (sequential grid), so pass B's M windows are complete.
            s = pl.program_id(0)
            p_id = pl.program_id(1)
            t = pl.program_id(2)
            n_tiles = pl.num_programs(2)
            lidx = (s * 2 + p_id) * n_tiles + t
            slot = jax.lax.rem(lidx, 2)
            s_f = s.astype(jnp.float32)
            p_f = p_id.astype(jnp.float32)
            dt = scal_ref[0]
            # pass B evaluates at the midpoint time; ACTUATED rest
            # advances TWICE per dt (reference double-pass quirk,
            # sim.cu:1778-1799): pass A sees 2s+1 advances (the +1 is in
            # the family loop), pass B 2s+2
            t_now = scal_ref[1] + (s_f + 0.5 * p_f) * dt
            adv_base = scal_ref[2] + 2.0 * s_f + p_f
        elif mega:
            s = pl.program_id(0)
            t = pl.program_id(1)
            n_tiles = pl.num_programs(1)
            lidx = s * n_tiles + t
            slot = jax.lax.rem(lidx, 2)
            s_f = s.astype(jnp.float32)
            dt = scal_ref[0]
            t_now = scal_ref[1] + s_f * dt
            adv_base = scal_ref[2] + s_f
            if megatr:
                s0i = scal_ref[3].astype(jnp.int32)  # absolute trace base
        else:
            t = pl.program_id(0)
            n_tiles = pl.num_programs(0)
            slot = jax.lax.rem(t, 2)
            dt = scal_ref[0]
            t_now = scal_ref[1]
            adv_base = scal_ref[2]

        def issue(tile_idx, into, s_n=None):
            row0 = tile_idx * tr
            if megatr:
                # the state source is trace entry s0+s_n; step 0 of the
                # launch reads the (aliased) INPUT ref -- for launch 0
                # that is the XLA-staged initial state, for later launches
                # the previous launch's final entry (chained aliasing)
                def cpt(src):
                    pltpu.make_async_copy(
                        src.at[s0i + s_n, pl.ds(0, n_state),
                               pl.ds(woffr + row0, wr), :],
                        swin.at[into], sem.at[into, 0]).start()
                    if n_tp:
                        pltpu.make_async_copy(
                            src.at[s0i + s_n, pl.ds(tp0, n_tp),
                                   pl.ds(row0 + hwb, tr), :],
                            vtile.at[into], sem.at[into, tp_sem]).start()

                @pl.when(s_n == 0)
                def _():
                    cpt(state_hbm)

                @pl.when(s_n > 0)
                def _():
                    cpt(out_t)
            elif mega:
                # parity-selected state source: step 0 reads the (aliased)
                # INPUT buffer, odd steps read out_b, even steps out_a --
                # the TPU grid runs cells sequentially, so the source
                # always holds exactly the previous step's state
                def cp(src):
                    pltpu.make_async_copy(
                        src.at[pl.ds(0, n_state), pl.ds(row0, wr), :],
                        swin.at[into], sem.at[into, 0]).start()
                    if n_tp:
                        pltpu.make_async_copy(
                            src.at[pl.ds(tp0, n_tp),
                                   pl.ds(row0 + hr, tr), :],
                            vtile.at[into], sem.at[into, tp_sem]).start()

                @pl.when(s_n == 0)
                def _():
                    cp(state_hbm)

                odd = jax.lax.rem(s_n, 2) == 1

                @pl.when((s_n > 0) & odd)
                def _():
                    cp(out_b)

                @pl.when((s_n > 0) & ~odd)
                def _():
                    cp(out_a)
            else:
                pltpu.make_async_copy(
                    state_hbm.at[:, pl.ds(row0, wr), :], swin.at[into],
                    sem.at[into, 0]).start()
            if has_pwin:
                pltpu.make_async_copy(
                    param_hbm.at[:, pl.ds(row0, wr), :], pwin.at[into],
                    sem.at[into, 1]).start()
            if u_k:
                pltpu.make_async_copy(
                    mask_hbm.at[:, pl.ds(row0, wr), :], mwin.at[into],
                    sem.at[into, mask_sem]).start()

        def issue_rk2(s_n, p_n, tile_idx, into):
            row0 = tile_idx * tr

            def s_src(fn):
                # parity-selected S_{s_n} source (step 0 = aliased input)
                @pl.when(s_n == 0)
                def _():
                    fn(state_hbm)

                odd = jax.lax.rem(s_n, 2) == 1

                @pl.when((s_n > 0) & odd)
                def _():
                    fn(out_b)

                @pl.when((s_n > 0) & ~odd)
                def _():
                    fn(out_a)

            def cpw(src):
                pltpu.make_async_copy(
                    src.at[pl.ds(0, n_state), pl.ds(row0, wr), :],
                    swin.at[into], sem.at[into, 0]).start()

            @pl.when(p_n == 0)
            def _():
                s_src(cpw)

            @pl.when(p_n == 1)
            def _():
                cpw(out_m)

            if has_pwin:
                pltpu.make_async_copy(
                    param_hbm.at[:, pl.ds(row0, wr), :], pwin.at[into],
                    sem.at[into, 1]).start()
            if u_k:
                pltpu.make_async_copy(
                    mask_hbm.at[:, pl.ds(row0, wr), :], mwin.at[into],
                    sem.at[into, mask_sem]).start()
            if n_tp:
                # vel (pass A, from S) / vh (pass B, from M) tile rows
                def cpv(src):
                    pltpu.make_async_copy(
                        src.at[pl.ds(3, 3), pl.ds(row0 + hr, tr), :],
                        vtile.at[into], sem.at[into, tp_sem]).start()

                @pl.when(p_n == 0)
                def _():
                    s_src(cpv)

                @pl.when(p_n == 1)
                def _():
                    cpv(out_m)

            @pl.when(p_n == 1)
            def _():
                # corrector extras: v1 from M, pos0+vel0 from S_{s_n}
                pltpu.make_async_copy(
                    out_m.at[pl.ds(6, 3), pl.ds(row0 + hr, tr), :],
                    mtile.at[into], sem.at[into, mt_sem]).start()
                s_src(lambda src: pltpu.make_async_copy(
                    src.at[pl.ds(0, 6), pl.ds(row0 + hr, tr), :],
                    s0tile.at[into], sem.at[into, s0_sem]).start())

        if megark2:
            @pl.when(lidx == 0)
            def _():
                issue_rk2(jnp.int32(0), jnp.int32(0), 0, 0)

            cross_ok = h <= (n_tiles_s - 2) * t_size
            if cross_ok:
                t_n = t + 1
                wrapt = t_n == n_tiles
                t_n = jnp.where(wrapt, 0, t_n)
                p_n = jax.lax.rem(p_id + wrapt.astype(jnp.int32), 2)
                s_n = s + (wrapt & (p_id == 1)).astype(jnp.int32)

                @pl.when(lidx + 1 < k_seg * 2 * n_tiles)
                def _():
                    issue_rk2(s_n, p_n, t_n, 1 - slot)
            else:
                @pl.when(t + 1 < n_tiles)
                def _():
                    issue_rk2(s, p_id, t + 1, 1 - slot)

                @pl.when((t == 0) & (lidx > 0))
                def _():
                    issue_rk2(s, p_id, 0, slot)
        elif mega:
            @pl.when(lidx == 0)
            def _():
                issue(0, 0, s_n=jnp.int32(0))

            # cross-step prefetch is safe only when the next step's first
            # window [0, w) lies entirely in rows already written this
            # step (tiles 0..n_tiles-2 plus the never-written zero pads):
            # w <= h + (n_tiles - 1) * t_size  <=>  h <= (n_tiles-2)*t_size
            cross_ok = h <= (n_tiles_s - 2) * t_size
            if cross_ok:
                t_n = t + 1
                wrap = t_n == n_tiles
                s_n = s + wrap.astype(jnp.int32)
                t_n = jnp.where(wrap, 0, t_n)

                @pl.when(lidx + 1 < k_seg * n_tiles)
                def _():
                    issue(t_n, 1 - slot, s_n=s_n)
            else:
                @pl.when(t + 1 < n_tiles)
                def _():
                    issue(t + 1, 1 - slot, s_n=s)

                # each step's first cell issues its own window instead
                # (prefetching it would race this step's last writes)
                @pl.when((t == 0) & (s > 0))
                def _():
                    issue(0, slot, s_n=s)
        else:
            @pl.when(t == 0)
            def _():
                issue(0, 0)

            # prefetch the next tile's windows before computing this one
            @pl.when(t + 1 < n_tiles)
            def _():
                issue(t + 1, 1 - slot)

        row0 = t * tr
        if mega or megark2:
            # wait descriptors built with shape-matched source slices
            # (the source REF here is arbitrary -- only the semaphore and
            # byte count matter -- but the shapes must agree)
            shp_src = state_hbm.at[0] if megatr else state_hbm
            pltpu.make_async_copy(
                shp_src.at[pl.ds(0, n_state), pl.ds(row0, wr), :],
                swin.at[slot], sem.at[slot, 0]).wait()
            if n_tp:
                pltpu.make_async_copy(
                    shp_src.at[pl.ds(tp0, n_tp),
                               pl.ds(row0 + hr, tr), :],
                    vtile.at[slot], sem.at[slot, tp_sem]).wait()
            if megark2:
                @pl.when(p_id == 1)
                def _():
                    pltpu.make_async_copy(
                        state_hbm.at[pl.ds(6, 3), pl.ds(row0 + hr, tr), :],
                        mtile.at[slot], sem.at[slot, mt_sem]).wait()
                    pltpu.make_async_copy(
                        state_hbm.at[pl.ds(0, 6), pl.ds(row0 + hr, tr), :],
                        s0tile.at[slot], sem.at[slot, s0_sem]).wait()
        else:
            pltpu.make_async_copy(
                state_hbm.at[:, pl.ds(row0, wr), :], swin.at[slot],
                sem.at[slot, 0]).wait()
        if has_pwin:
            pltpu.make_async_copy(
                param_hbm.at[:, pl.ds(row0, wr), :], pwin.at[slot],
                sem.at[slot, 1]).wait()
        if u_k:
            pltpu.make_async_copy(
                mask_hbm.at[:, pl.ds(row0, wr), :], mwin.at[slot],
                sem.at[slot, mask_sem]).wait()

        sw = swin[slot]                              # [n_state, WR, 128]
        pw = sw[0:3]
        if has_damping:
            vw = sw[3:6]
        if has_pwin:
            pv = pwin[slot]                          # [n_param, WR, 128]
        if u_k:
            mbits = mwin[slot][0]                    # [WR, 128] int32

        # shared-subexpression force form (TPU only, gated like the rsqrt
        # norms; measured +3% on the VMEM kernel, one-process A/B):
        # c = k*(rest*inv - 1) never materializes ln, damping folds in via
        # inv2.  See pallas_step.py for the derivation and exactness note.
        import os as _os
        fmath_shared = (rsqrt_norms
                        and _os.environ.get("TITAN_FMATH", "") != "legacy")

        def family_forces(pw, vw, t_now, adv_base):
            """Window-wide stencil spring forces (a reusable pass: the
            fused mega-RK2 cell runs this twice per dt)."""
            fw = jnp.zeros_like(pw)
            for fi, d in enumerate(deltas):
                pr = roll_gather(pw, d)
                diff = pr - pw
                # one rsqrt on TPU, matching forces.inv_norm's backend
                # gate (measured +8% on the VMEM kernel; keeps cross-path
                # equivalence tight on every backend)
                d2 = jnp.sum(diff * diff, axis=0)
                if rsqrt_norms:
                    inv = jnp.where(
                        d2 > 0, jax.lax.rsqrt(jnp.where(d2 > 0, d2, 1.0)),
                        0.0)
                    ln = None if fmath_shared else d2 * inv
                else:
                    ln = jnp.where(d2 > 0,
                                   jnp.sqrt(jnp.where(d2 > 0, d2, 1.0)), 0.0)
                    inv = jnp.where(ln > 0,
                                    1.0 / jnp.where(ln > 0, ln, 1.0), 0.0)
                if u_k:
                    # family fi's existence mask is bit fi of the bitmask
                    mf = ((mbits >> fi) & 1).astype(jnp.float32)
                    k = fparam_ref[0, fi] * mf
                else:
                    k = pv[offsets["k"] + fi]
                if "rest" in offsets:
                    rest = pv[offsets["rest"] + fi]
                else:
                    rest = fparam_ref[1, fi]
                if has_actuated:
                    # closed-form ACTUATED advance (module docstring): at
                    # step s the reference has applied min(s + 1, s_stop)
                    # per-step increments (advance-then-use, one-sided
                    # bound, overshoot retained, sim.cu:1173-1181)
                    adv = jnp.minimum(adv_base + 1.0,
                                      pv[offsets["sstop"] + fi])
                    rest = rest + adv * pv[offsets["aratedt"] + fi]
                if has_breathing:
                    bsign = (pv[offsets["bsign"] + fi] if "bsign" in offsets
                             else fparam_ref[3, fi])
                    bomega = (pv[offsets["bomega"] + fi]
                              if "bomega" in offsets else fparam_ref[4, fi])
                    rest = rest * (1.0 + bsign * jnp.sin(bomega * t_now))
                if fmath_shared:
                    c = k * (rest * inv - 1.0)
                    if has_damping:
                        dmp = pv[offsets["damping"] + fi]
                        vr = roll_gather(vw, d)
                        axdot = jnp.sum((vw - vr) * diff, axis=0)
                        c = c + (axdot * dmp) * (inv * inv)
                    f = c * diff
                else:
                    mag = k * (rest - ln)
                    if has_damping:
                        dmp = pv[offsets["damping"] + fi]
                        vr = roll_gather(vw, d)
                        axial = jnp.sum((vw - vr) * diff, axis=0) * inv
                        mag = mag + axial * dmp
                    f = (mag * inv) * diff
                fw = fw - f + roll_scatter(f, d)
            return fw

        fw = family_forces(pw, vw if has_damping else None, t_now, adv_base)
        # extract the tile's rows (aligned slice) and add mass-level forces
        pos = pw[:, hr:hr + tr, :]
        f_acc = fw[:, hr:hr + tr, :] + cforce_ref[:]
        if has_damping:
            vel = vw[:, hr:hr + tr, :]
        elif mega or megark2:
            vel = vtile[slot][0:3]
        else:
            vel = vel_ref[:]
        vel_in = vel   # pre-constraint vel: frozen masses keep this
        def mass_tail(pos, vel, f_acc):
            """Planes/balls/local-constraint/drag tail on tile
            rows (constraint planes and directions MUTATE vel,
            which the integrator consumes); reusable -- the fused
            mega-RK2 cell runs it once per pass."""
            for p in range(n_planes):
                nx, ny, nz = plane_ref[p, 0], plane_ref[p, 1], plane_ref[p, 2]
                off, fk, fs = plane_ref[p, 3], plane_ref[p, 4], plane_ref[p, 5]
                disp = pos[0] * nx + pos[1] * ny + pos[2] * nz - off
                nvec = jnp.stack([jnp.full_like(disp, nx),
                                  jnp.full_like(disp, ny),
                                  jnp.full_like(disp, nz)])
                inside = disp < 0
                if plane_friction[p]:
                    fn_mag = f_acc[0] * nx + f_acc[1] * ny + f_acc[2] * nz
                    f_n = fn_mag * nvec
                    has_fric = (fs > 0) | (fk > 0)
                    vdotn = vel[0] * nx + vel[1] * ny + vel[2] * nz
                    v_perp = vel - vdotn * nvec
                    v_norm = jnp.sqrt(jnp.sum(v_perp * v_perp, axis=0))
                    kinetic = v_norm > 1e-16
                    fn_abs = jnp.abs(fn_mag)
                    safe_vn = jnp.where(kinetic, v_norm, 1.0)
                    f_kin = f_acc - v_perp * (fk * fn_abs / safe_vn)
                    f_perp = f_acc - f_n
                    fp_norm = jnp.sqrt(jnp.sum(f_perp * f_perp, axis=0))
                    f_sta = jnp.where(fs * fn_abs > fp_norm,
                                      f_acc - f_perp, f_acc)
                    f_fric = jnp.where(kinetic, f_kin, f_sta)
                    f_acc = jnp.where(inside & has_fric, f_fric, f_acc)
                contact = jnp.where(inside, -disp * normal_coeff, 0.0)
                f_acc = f_acc + contact * nvec
            for b in range(n_balls):
                cx, cy, cz = ball_ref[b, 0], ball_ref[b, 1], ball_ref[b, 2]
                rad = ball_ref[b, 3]
                d0, d1, d2 = pos[0] - cx, pos[1] - cy, pos[2] - cz
                dist = jnp.sqrt(d0 * d0 + d1 * d1 + d2 * d2)
                safe = jnp.where(dist > 0, dist, 1.0)
                push = jnp.where((dist <= rad) & (dist > 0),
                                 normal_coeff / safe, 0.0)
                f_acc = f_acc + jnp.stack([d0, d1, d2]) * push
            if has_local:
                # per-mass local constraint slots in reference order: contact
                # planes, balls, constraint planes, directions
                # (sim.cu:1311-1326); constraint planes and directions MUTATE
                # vel, which drag and the integrator then consume -- same
                # block as the VMEM kernel (pallas_step.py), on tile rows.
                o = 0
                for _ in range(caps[0]):             # contact planes
                    act = lc_ref[o] > 0.5
                    nvec = lc_ref[o + 1:o + 4]       # [3, tr, 128] per-mass
                    off = lc_ref[o + 4]
                    fk = lc_ref[o + 5]
                    fs = lc_ref[o + 6]
                    o += 7
                    disp = jnp.sum(pos * nvec, axis=0) - off
                    inside = disp < 0
                    fn_mag = jnp.sum(f_acc * nvec, axis=0)
                    f_n = fn_mag * nvec
                    has_fric = (fs > 0) | (fk > 0)
                    vdotn = jnp.sum(vel * nvec, axis=0)
                    v_perp = vel - vdotn * nvec
                    v_norm = jnp.sqrt(jnp.sum(v_perp * v_perp, axis=0))
                    kinetic = v_norm > 1e-16
                    fn_abs = jnp.abs(fn_mag)
                    safe_vn = jnp.where(kinetic, v_norm, 1.0)
                    f_kin = f_acc - v_perp * (fk * fn_abs / safe_vn)
                    f_perp = f_acc - f_n
                    fp_norm = jnp.sqrt(jnp.sum(f_perp * f_perp, axis=0))
                    f_sta = jnp.where(fs * fn_abs > fp_norm,
                                      f_acc - f_perp, f_acc)
                    f_fric = jnp.where(kinetic, f_kin, f_sta)
                    f_new = jnp.where(inside & has_fric, f_fric, f_acc)
                    f_new = f_new + jnp.where(inside, -disp * normal_coeff,
                                              0.0) * nvec
                    f_acc = jnp.where(act, f_new, f_acc)
                for _ in range(caps[1]):             # balls
                    act = lc_ref[o] > 0.5
                    cvec = lc_ref[o + 1:o + 4]
                    rad = lc_ref[o + 4]
                    o += 5
                    dvec = pos - cvec
                    dist = jnp.sqrt(jnp.sum(dvec * dvec, axis=0))
                    safe = jnp.where(dist > 0, dist, 1.0)
                    push = jnp.where((dist <= rad) & (dist > 0),
                                     normal_coeff / safe, 0.0)
                    f_acc = jnp.where(act, f_acc + dvec * push, f_acc)
                for _ in range(caps[2]):             # constraint planes
                    act = lc_ref[o] > 0.5
                    nvec = lc_ref[o + 1:o + 4]
                    fric = lc_ref[o + 4]
                    o += 5
                    # reference quirk (object.cu:118-127): |v| taken BEFORE
                    # the normal component is removed, friction applied to
                    # the UPDATED velocity over the OLD norm
                    nf_ = jnp.sum(f_acc * nvec, axis=0)
                    f2 = f_acc - nvec * nf_
                    v_norm = jnp.sqrt(jnp.sum(vel * vel, axis=0))
                    moving = v_norm >= 1e-16
                    v2c = vel - nvec * jnp.sum(vel * nvec, axis=0)
                    safe_vn = jnp.where(moving, v_norm, 1.0)
                    f3 = f2 - fric * nf_ * v2c / safe_vn
                    f_acc = jnp.where(act, jnp.where(moving, f3, f2), f_acc)
                    vel = jnp.where(act & moving, v2c, vel)
                for _ in range(caps[3]):             # directions
                    act = lc_ref[o] > 0.5
                    tvec = lc_ref[o + 1:o + 4]
                    fric = lc_ref[o + 4]
                    o += 5
                    nf_ = f_acc - tvec * jnp.sum(f_acc * tvec, axis=0)
                    f2 = f_acc - nf_
                    v_norm = jnp.sqrt(jnp.sum(vel * vel, axis=0))
                    moving = v_norm >= 1e-16
                    nf_norm = jnp.sqrt(jnp.sum(nf_ * nf_, axis=0))
                    f3 = f2 - nf_norm * fric * tvec
                    f_acc = jnp.where(act, jnp.where(moving, f3, f2), f_acc)
                    vel = jnp.where(act & moving,
                                    tvec * jnp.sum(vel * tvec, axis=0), vel)
            if has_drag:
                vn = jnp.sqrt(jnp.sum(vel * vel, axis=0))
                f_acc = f_acc - drag_ref[:] * vn * vel
            return f_acc, vel

        f_acc, vel = mass_tail(pos, vel, f_acc)

        not_fixed = 1.0 - fixed_ref[:]
        acc = f_acc * minv_ref[:]
        if megark2:
            # the fused two-pass RK2 cell: pass A = the rk2a tail below
            # written to M, pass B = the rk2b tail written to S_{s+1};
            # `vel` is the pass's constraint-mutated velocity (vel1 / vel2)
            even = jax.lax.rem(s, 2) == 0
            row0w = t * tr + hr

            def wcopy_rk2(dst, n_pl):
                cp = pltpu.make_async_copy(
                    wstage.at[pl.ds(0, n_pl)],
                    dst.at[pl.ds(0, n_pl), pl.ds(row0w, tr), :], wsem)
                cp.start()
                cp.wait()

            @pl.when(p_id == 0)
            def _():
                ph = pos + 0.5 * vel * dt
                vh = vel + 0.5 * acc * dt
                wstage[0:3] = ph * not_fixed + pos * fixed_ref[:]
                wstage[3:6] = vh * not_fixed + vel * fixed_ref[:]
                wstage[6:9] = vel                    # v1
                wcopy_rk2(out_m, 9)

            @pl.when(p_id == 1)
            def _():
                v1 = mtile[slot][0:3]
                pos0 = s0tile[slot][0:3]
                vel0 = s0tile[slot][3:6]
                v2 = ((v1 + acc * dt) * not_fixed
                      + vel0 * fixed_ref[:])
                wstage[0:3] = pos0 + vel * dt * not_fixed
                wstage[3:6] = v2
                wstage[6:9] = acc * not_fixed
                last = s == k_seg - 1

                @pl.when(even & ~last)
                def _():
                    wcopy_rk2(out_b, 6)

                @pl.when(even & last)
                def _():
                    wcopy_rk2(out_b, 9)

                @pl.when(~even & ~last)
                def _():
                    wcopy_rk2(out_a, 6)

                @pl.when(~even & last)
                def _():
                    wcopy_rk2(out_a, 9)
        elif rk2a:
            # RK2 midpoint predictor (sim.cu:1336-1343): half-step state
            # from the pass-1 forces; fixed masses keep pos, and their
            # pass-2 velocity input stays vel1 (the constraint-mutated
            # value) -- mirroring the `half` state of ops/step.py's RK2
            # branch and the VMEM kernel (pallas_step.py).  `vel` here is
            # the post-constraint pass-1 velocity (vel1).
            pos_h = pos + 0.5 * vel * dt
            vel_h = vel + 0.5 * acc * dt
            opos_ref[:] = pos_h * not_fixed + pos * fixed_ref[:]
            ovel_ref[:] = vel_h * not_fixed + vel * fixed_ref[:]
            oacc_ref[:] = vel            # third output carries vel1
        elif rk2b:
            # RK2 corrector (sim.cu:1344-1349): pos from the ORIGINAL pos
            # plus the pass-2 constraint-mutated velocity (`vel` here is
            # vel2); vel from pass-1's vel1 plus the pass-2 acc; frozen
            # masses keep their pre-step velocity vel0.
            v2 = ((vel1_ref[:] + acc * dt) * not_fixed
                  + vel0_ref[:] * fixed_ref[:])
            opos_ref[:] = pos0_ref[:] + vel * dt * not_fixed
            ovel_ref[:] = v2
            oacc_ref[:] = acc * not_fixed
        else:
            if verlet:
                # reference 'Verlet' (sim.cu:1350-1354)
                if mega:
                    acc_prev = (vtile[slot][0:3] if has_damping
                                else vtile[slot][3:6])
                else:
                    acc_prev = acc_ref[:]
                v2 = vel + 0.5 * (acc_prev + acc) * dt
                v2 = v2 * not_fixed + vel_in * fixed_ref[:]
                po = pos + (v2 * dt + 0.5 * acc * dt * dt) * not_fixed
            else:
                v2 = vel + acc * dt
                if clamp:
                    vn = jnp.sqrt(jnp.sum(v2 * v2, axis=0))
                    v2 = jnp.where(vn > 1.0,
                                   v2 / jnp.where(vn > 0, vn, 1.0), v2)
                v2 = v2 * not_fixed + vel_in * fixed_ref[:]
                po = pos + v2 * dt * not_fixed
            ao = acc * not_fixed
            if not mega:
                opos_ref[:] = po
                ovel_ref[:] = v2
                oacc_ref[:] = ao
            elif megatr:
                # single destination: trace entry s0+s+1 (no parity);
                # plane count matches the mega write policy so the traced
                # stepping is op-for-op the mega cell
                wstage[0:3] = po
                wstage[3:6] = v2
                wstage[6:9] = ao
                row0w = t * tr + hwb

                def wcopy_t(n_pl):
                    cp = pltpu.make_async_copy(
                        wstage.at[pl.ds(0, n_pl)],
                        out_t.at[s0i + s + 1, pl.ds(0, n_pl),
                                 pl.ds(row0w, tr), :], wsem)
                    cp.start()
                    cp.wait()

                if verlet:
                    wcopy_t(9)
                else:
                    last = s == k_seg - 1

                    @pl.when(last)
                    def _():
                        wcopy_t(9)

                    @pl.when(~last)
                    def _():
                        wcopy_t(6)
            else:
                # stage the tile's new rows in VMEM, then one aligned DMA
                # into the destination buffer (parity-opposite the source;
                # Mosaic requires ANY-dest DMAs staged + sublane-aligned,
                # see CLAUDE.md).  Euler skips the acc planes except on
                # the segment's last step (nothing reads them earlier);
                # Verlet reads acc every step.  The wait serializes ~2 us
                # of write into the cell -- negligible vs the window DMAs.
                wstage[0:3] = po
                wstage[3:6] = v2
                wstage[6:9] = ao
                even = jax.lax.rem(s, 2) == 0
                row0w = t * tr + hr

                def wcopy(dst, n_pl):
                    cp = pltpu.make_async_copy(
                        wstage.at[pl.ds(0, n_pl)],
                        dst.at[pl.ds(0, n_pl), pl.ds(row0w, tr), :], wsem)
                    cp.start()
                    cp.wait()

                if verlet:
                    @pl.when(even)
                    def _():
                        wcopy(out_b, 9)

                    @pl.when(~even)
                    def _():
                        wcopy(out_a, 9)
                else:
                    last = s == k_seg - 1

                    @pl.when(even & ~last)
                    def _():
                        wcopy(out_b, 6)

                    @pl.when(even & last)
                    def _():
                        wcopy(out_b, 9)

                    @pl.when(~even & ~last)
                    def _():
                        wcopy(out_a, 6)

                    @pl.when(~even & last)
                    def _():
                        wcopy(out_a, 9)

    return kernel


def make_tiled_call(shape: SceneShape, t_size: int, h: int, n_tiles: int,
                    mode: str):
    """The pallas_call for one tiled launch, reusable by both the
    single-device chunk (build_tiled_chunk) and the distributed halo path
    (parallel/halo_tiled.py, which runs the SAME kernel per device shard
    with its window pads filled by ppermuted neighbor halos)."""
    tr = t_size // 128
    w = t_size + 2 * h
    wr = w // 128
    n_t = n_tiles * t_size
    offsets, n_param, n_state = _plan(shape)
    verlet = shape.config.integrator is Integrator.VERLET
    u_k = shape.stencil_uniform[0]
    has_pwin = n_param > 0
    caps = (shape.cap_cp, shape.cap_ball, shape.cap_pl, shape.cap_dir)
    has_local = any(caps)
    from .pallas_step import _lc_planes
    p_lc = _lc_planes(shape)

    def blk3(i, s):
        return (0, i, 0)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # planes
        pl.BlockSpec(memory_space=pltpu.SMEM),   # balls
        pl.BlockSpec(memory_space=pltpu.SMEM),   # fparams [5, nf]
        pl.BlockSpec(memory_space=pl.ANY),    # state windows (HBM)
    ]
    if has_pwin:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # param wins
    if u_k:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # mask bits
    if not shape.has_damping:
        in_specs.append(pl.BlockSpec((3, tr, 128), blk3,
                                     memory_space=pltpu.VMEM))  # vel
    if mode == "single" and verlet:
        in_specs.append(pl.BlockSpec((3, tr, 128), blk3,
                                     memory_space=pltpu.VMEM))  # acc
    in_specs += [
        pl.BlockSpec((3, tr, 128), blk3, memory_space=pltpu.VMEM),  # cf
        pl.BlockSpec((1, tr, 128), blk3, memory_space=pltpu.VMEM),  # minv
        pl.BlockSpec((1, tr, 128), blk3, memory_space=pltpu.VMEM),  # fixd
    ]
    if mode == "rk2b":
        # corrector extras: original pos, pass-1 vel1, pre-step vel0
        in_specs += [pl.BlockSpec((3, tr, 128), blk3,
                                  memory_space=pltpu.VMEM)] * 3
    if shape.has_drag:
        in_specs.append(pl.BlockSpec((1, tr, 128), blk3,
                                     memory_space=pltpu.VMEM))  # drag
    if has_local:
        in_specs.append(pl.BlockSpec((p_lc, tr, 128), blk3,
                                     memory_space=pltpu.VMEM))  # lc slots

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # scal = [dt, t_now, advance base]
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((3, tr, 128), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tr, 128), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tr, 128), blk3, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=(
            [pltpu.VMEM((2, n_state, wr, 128), jnp.float32)]  # state wins
            + ([pltpu.VMEM((2, n_param, wr, 128), jnp.float32)]
               if has_pwin else [])                         # param wins
            + ([pltpu.VMEM((2, 1, wr, 128), jnp.int32)]
               if u_k else [])                              # mask bits
            + [pltpu.SemaphoreType.DMA((2, 1 + has_pwin + u_k))]
        ),
    )

    return pl.pallas_call(
        _build_kernel(shape, t_size, h, mode),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((3, n_t // 128, 128), jnp.float32)
                   for _ in range(3)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )


def make_mega_call(shape: SceneShape, t_size: int, h: int, n_tiles: int,
                   k_seg: int):
    """The resident grid kernel's pallas_call: ONE launch advances k_seg
    steps over a grid of (k_seg, n_tiles) cells (see _build_kernel's
    "mega" docstring).  Takes and returns the two state buffers
    [9, (n_t + 2h)/128, 128] (pos/vel/acc planes), input_output_aliased
    for in-place stepping; all other inputs are chunk-constant."""
    assert k_seg % 2 == 0, "k_seg must be even (final state lands in A)"
    tr = t_size // 128
    w = t_size + 2 * h
    wr = w // 128
    n_t = n_tiles * t_size
    rows = (n_t + 2 * h) // 128
    offsets, n_param, _ = _plan(shape)
    verlet = shape.config.integrator is Integrator.VERLET
    # mirrors _build_kernel's mega plane split: pos (+vel under damping)
    # windowed; vel (+acc under Verlet) as tile rows
    n_state = 6 if shape.has_damping else 3
    n_tp = ((0 if shape.has_damping else 3) + (3 if verlet else 0))
    u_k = shape.stencil_uniform[0]
    has_pwin = n_param > 0
    caps = (shape.cap_cp, shape.cap_ball, shape.cap_pl, shape.cap_dir)
    has_local = any(caps)
    from .pallas_step import _lc_planes
    p_lc = _lc_planes(shape)

    def blk3(s, t, scal):
        return (0, t, 0)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # planes
        pl.BlockSpec(memory_space=pltpu.SMEM),   # balls
        pl.BlockSpec(memory_space=pltpu.SMEM),   # fparams [5, nf]
        pl.BlockSpec(memory_space=pl.ANY),       # state buffer A
        pl.BlockSpec(memory_space=pl.ANY),       # state buffer B
    ]
    if has_pwin:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # param wins
    if u_k:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # mask bits
    in_specs += [
        pl.BlockSpec((3, tr, 128), blk3, memory_space=pltpu.VMEM),  # cf
        pl.BlockSpec((1, tr, 128), blk3, memory_space=pltpu.VMEM),  # minv
        pl.BlockSpec((1, tr, 128), blk3, memory_space=pltpu.VMEM),  # fixd
    ]
    if shape.has_drag:
        in_specs.append(pl.BlockSpec((1, tr, 128), blk3,
                                     memory_space=pltpu.VMEM))  # drag
    if has_local:
        in_specs.append(pl.BlockSpec((p_lc, tr, 128), blk3,
                                     memory_space=pltpu.VMEM))  # lc slots

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # scal = [dt, t_base, advance base]
        grid=(k_seg, n_tiles),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=(
            [pltpu.VMEM((2, n_state, wr, 128), jnp.float32)]  # state wins
            + ([pltpu.VMEM((2, n_param, wr, 128), jnp.float32)]
               if has_pwin else [])                          # param wins
            + ([pltpu.VMEM((2, 1, wr, 128), jnp.int32)]
               if u_k else [])                               # mask bits
            + ([pltpu.VMEM((2, n_tp, tr, 128), jnp.float32)]
               if n_tp else [])                              # vel/acc tiles
            + [pltpu.VMEM((9, tr, 128), jnp.float32)]        # write stage
            + [pltpu.SemaphoreType.DMA((2, 1 + has_pwin + u_k + (n_tp > 0))),
               pltpu.SemaphoreType.DMA(())]                  # write sem
        ),
    )

    # input_output_aliases indexes the FLAT call operands, scalar-prefetch
    # included: scal=0, planes=1, balls=2, fparams=3, A=4, B=5 (validated
    # loudly against output shapes by pallas_call)
    return pl.pallas_call(
        _build_kernel(shape, t_size, h, "mega", k_seg=k_seg,
                      n_tiles_s=n_tiles),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((9, rows, 128), jnp.float32)
                   for _ in range(2)],
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
    )


def make_mega_rk2_call(shape: SceneShape, t_size: int, h: int,
                       n_tiles: int, k_seg: int):
    """The fused-RK2 resident grid kernel's pallas_call: grid
    (k_seg, 2, n_tiles), one cell per RK2 PASS (see _build_kernel's
    megark2 branch).  Buffers: the two parity state buffers plus the
    midpoint buffer M ([ph, vh, v1]), all input_output_aliased."""
    assert k_seg % 2 == 0, "k_seg must be even (final state lands in A)"
    tr = t_size // 128
    w = t_size + 2 * h
    wr = w // 128
    n_t = n_tiles * t_size
    rows = (n_t + 2 * h) // 128
    offsets, n_param, _ = _plan(shape)
    n_state = 6 if shape.has_damping else 3
    n_tp = 0 if shape.has_damping else 3
    u_k = shape.stencil_uniform[0]
    has_pwin = n_param > 0
    caps = (shape.cap_cp, shape.cap_ball, shape.cap_pl, shape.cap_dir)
    has_local = any(caps)
    from .pallas_step import _lc_planes
    p_lc = _lc_planes(shape)

    def blk3(s, p, t, scal):
        return (0, t, 0)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # planes
        pl.BlockSpec(memory_space=pltpu.SMEM),   # balls
        pl.BlockSpec(memory_space=pltpu.SMEM),   # fparams [5, nf]
        pl.BlockSpec(memory_space=pl.ANY),       # state buffer A
        pl.BlockSpec(memory_space=pl.ANY),       # state buffer B
        pl.BlockSpec(memory_space=pl.ANY),       # midpoint buffer M
    ]
    if has_pwin:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # param wins
    if u_k:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # mask bits
    in_specs += [
        pl.BlockSpec((3, tr, 128), blk3, memory_space=pltpu.VMEM),  # cf
        pl.BlockSpec((1, tr, 128), blk3, memory_space=pltpu.VMEM),  # minv
        pl.BlockSpec((1, tr, 128), blk3, memory_space=pltpu.VMEM),  # fixd
    ]
    if shape.has_drag:
        in_specs.append(pl.BlockSpec((1, tr, 128), blk3,
                                     memory_space=pltpu.VMEM))  # drag
    if has_local:
        in_specs.append(pl.BlockSpec((p_lc, tr, 128), blk3,
                                     memory_space=pltpu.VMEM))  # lc slots

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # scal = [dt, t_base, 2*advance base]
        grid=(k_seg, 2, n_tiles),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        scratch_shapes=(
            [pltpu.VMEM((2, n_state, wr, 128), jnp.float32)]  # windows
            + ([pltpu.VMEM((2, n_param, wr, 128), jnp.float32)]
               if has_pwin else [])                          # param wins
            + ([pltpu.VMEM((2, 1, wr, 128), jnp.int32)]
               if u_k else [])                               # mask bits
            + ([pltpu.VMEM((2, n_tp, tr, 128), jnp.float32)]
               if n_tp else [])                              # vel/vh tiles
            + [pltpu.VMEM((2, 3, tr, 128), jnp.float32)]     # v1 tiles
            + [pltpu.VMEM((2, 6, tr, 128), jnp.float32)]     # pos0+vel0
            + [pltpu.VMEM((9, tr, 128), jnp.float32)]        # write stage
            + [pltpu.SemaphoreType.DMA((2, 4 + has_pwin + u_k)),
               pltpu.SemaphoreType.DMA(())]                  # write sem
        ),
    )

    return pl.pallas_call(
        _build_kernel(shape, t_size, h, "megark2", k_seg=k_seg,
                      n_tiles_s=n_tiles),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((9, rows, 128), jnp.float32)
                   for _ in range(3)],
        input_output_aliases={4: 0, 5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )


def make_megatrace_call(shape: SceneShape, t_size: int, h: int, hw: int,
                        n_tiles: int, k_seg: int, seg_total: int):
    """The adjoint-trace resident-grid kernel's pallas_call: ONE launch
    advances ``k_seg`` steps, with the state flowing through consecutive
    entries of a single [seg_total + 1, 9, (n_t + 2*hw)/128, 128] trace
    buffer (input_output_aliased; entry s = state BEFORE step s0 + s,
    s0 = scal[3]).  Running ceil-free slices of k_seg (the primal chunk's
    mega segment size) reproduces the primal's launches -- and scalars --
    bitwise, while leaving behind exactly the (pos, vel) trace the mega
    backward sweep (ops/adjoint_tiled.py) consumes."""
    tr = t_size // 128
    w = t_size + 2 * h
    wr = w // 128
    n_t = n_tiles * t_size
    rows = (n_t + 2 * hw) // 128
    offsets, n_param, _ = _plan(shape)
    verlet = shape.config.integrator is Integrator.VERLET
    n_state = 6 if shape.has_damping else 3
    n_tp = ((0 if shape.has_damping else 3) + (3 if verlet else 0))
    u_k = shape.stencil_uniform[0]
    has_pwin = n_param > 0
    caps = (shape.cap_cp, shape.cap_ball, shape.cap_pl, shape.cap_dir)
    has_local = any(caps)
    from .pallas_step import _lc_planes
    p_lc = _lc_planes(shape)

    def blk3(s, t, scal):
        return (0, t, 0)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # planes
        pl.BlockSpec(memory_space=pltpu.SMEM),   # balls
        pl.BlockSpec(memory_space=pltpu.SMEM),   # fparams [5, nf]
        pl.BlockSpec(memory_space=pl.ANY),       # trace buffer (aliased)
    ]
    if has_pwin:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # param wins
    if u_k:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # mask bits
    in_specs += [
        pl.BlockSpec((3, tr, 128), blk3, memory_space=pltpu.VMEM),  # cf
        pl.BlockSpec((1, tr, 128), blk3, memory_space=pltpu.VMEM),  # minv
        pl.BlockSpec((1, tr, 128), blk3, memory_space=pltpu.VMEM),  # fixd
    ]
    if shape.has_drag:
        in_specs.append(pl.BlockSpec((1, tr, 128), blk3,
                                     memory_space=pltpu.VMEM))  # drag
    if has_local:
        in_specs.append(pl.BlockSpec((p_lc, tr, 128), blk3,
                                     memory_space=pltpu.VMEM))  # lc slots

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # scal = [dt, t_base, advance base, s0]
        grid=(k_seg, n_tiles),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=(
            [pltpu.VMEM((2, n_state, wr, 128), jnp.float32)]  # state wins
            + ([pltpu.VMEM((2, n_param, wr, 128), jnp.float32)]
               if has_pwin else [])                          # param wins
            + ([pltpu.VMEM((2, 1, wr, 128), jnp.int32)]
               if u_k else [])                               # mask bits
            + ([pltpu.VMEM((2, n_tp, tr, 128), jnp.float32)]
               if n_tp else [])                              # vel/acc tiles
            + [pltpu.VMEM((9, tr, 128), jnp.float32)]        # write stage
            + [pltpu.SemaphoreType.DMA((2, 1 + has_pwin + u_k + (n_tp > 0))),
               pltpu.SemaphoreType.DMA(())]                  # write sem
        ),
    )

    return pl.pallas_call(
        _build_kernel(shape, t_size, h, "megatrace", k_seg=k_seg,
                      n_tiles_s=n_tiles, hw=hw),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((seg_total + 1, 9, rows, 128),
                                        jnp.float32)],
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
    )


def prep_flat_inputs(shape: SceneShape, state: SimState):
    """The per-chunk FLAT (unpadded, [.., n]) kernel inputs shared by the
    single-device chunk and the distributed halo path: validity-folded
    pair masks, SMEM family scalars, the stacked windowed-param planes and
    packed mask bitmask, closed-form actuation inputs, and the blocked
    per-mass planes.  Traceable (called inside jit)."""
    deltas = shape.stencil_deltas
    nf = len(deltas)
    offsets, _, _ = _plan(shape)
    u_k, u_rest, u_damp, u_type, u_omega = shape.stencil_uniform
    caps = (shape.cap_cp, shape.cap_ball, shape.cap_pl, shape.cap_dir)
    n_planes, n_balls = max(shape.n_planes, 1), max(shape.n_balls, 1)
    m = state.masses
    stc = state.stencil

    pair_ok = stc.mask
    if not shape.all_valid:
        pair_ok = jnp.stack([
            pair_ok[fi] & m.valid & jnp.roll(m.valid, -d)
            for fi, d in enumerate(deltas)])
    k_eff = jnp.where(pair_ok, stc.k, 0.0)

    # family scalar params (SMEM) for the uniform fields; value taken
    # from each family's first masked lane (mask-free families read 0,
    # harmless because their k is 0 everywhere)
    lane0 = jnp.argmax(stc.mask, axis=1)
    at0 = lambda a: jnp.take_along_axis(a, lane0[:, None], 1)[:, 0]
    styp = stc.type
    bsign_full = jnp.where(
        styp == ACTIVE_CONTRACT_THEN_EXPAND, -0.2,
        jnp.where(styp == ACTIVE_EXPAND_THEN_CONTRACT, 0.2,
                  0.0)).astype(jnp.float32)
    fparams = jnp.stack([
        at0(stc.k) if u_k else jnp.zeros(nf),
        at0(stc.rest) if u_rest else jnp.zeros(nf),
        at0(stc.damping) if u_damp else jnp.zeros(nf),
        at0(bsign_full) if u_type else jnp.zeros(nf),
        at0(stc.omega) if u_omega else jnp.zeros(nf),
    ]).astype(jnp.float32)

    dt32 = state.dt.astype(jnp.float32)

    aratedt = sstop = None
    if shape.has_actuated:
        # closed-form actuation inputs (module docstring): per-spring
        # signed rate*dt and the advance count at which the one-sided
        # bound is crossed (invalid pairs never actuate: reference
        # early-return at sim.cu:1163)
        arate = jnp.where(styp == ACTUATED_EXPAND, stc.rate,
                          jnp.where(styp == ACTUATED_CONTRACT,
                                    -stc.rate, 0.0))
        arate = jnp.where(pair_ok, arate, 0.0).astype(jnp.float32)
        aratedt = arate * dt32
        abound = jnp.where(
            styp == ACTUATED_EXPAND, stc.l_max,
            jnp.where(styp == ACTUATED_CONTRACT, stc.l_min,
                      0.0)).astype(jnp.float32)
        nz = aratedt != 0
        sstop = jnp.where(
            nz,
            jnp.ceil((abound - stc.rest.astype(jnp.float32))
                     / jnp.where(nz, aratedt, 1.0)), 0.0)
        sstop = jnp.maximum(sstop, 0.0)

    # windowed (non-uniform) params, stacked into one HBM array
    parts = []
    if "k" in offsets:
        parts.append(k_eff)
    if "rest" in offsets:
        parts.append(stc.rest)
    if "aratedt" in offsets:
        parts.append(aratedt)
    if "sstop" in offsets:
        parts.append(sstop)
    if "damping" in offsets:
        parts.append(jnp.where(pair_ok, stc.damping, 0.0))
    if "bsign" in offsets:
        parts.append(bsign_full)
    if "bomega" in offsets:
        parts.append(stc.omega)
    param_flat = (jnp.concatenate(parts, axis=0).astype(jnp.float32)
                  if parts else None)
    bits_flat = None
    if u_k:
        # pack each family's existence+validity mask into bit fi of one
        # int32 per mass: 1/F the traffic of streaming k itself
        bits = jnp.zeros(pair_ok.shape[1], jnp.int32)
        for fi in range(nf):
            bits = bits | (pair_ok[fi].astype(jnp.int32) << fi)
        bits_flat = bits[None, :]

    move = m.valid & ~m.fixed
    minv_flat = (1.0 / m.m)[None, :]
    fixed_flat = (~move).astype(m.pos.dtype)[None, :]
    const_flat = m.extern_force + m.m * state.g[:, None]
    drag_flat = m.drag[None, :] if shape.has_drag else None
    lc_flat = None
    if any(caps):
        lcon = state.lcon
        lparts = []
        for j in range(caps[0]):
            lparts += [(j < lcon.cp_count).astype(jnp.float32)[None],
                       lcon.cp_normal[:, j, :].T,
                       lcon.cp_offset[:, j][None],
                       lcon.cp_fk[:, j][None], lcon.cp_fs[:, j][None]]
        for j in range(caps[1]):
            lparts += [(j < lcon.ball_count).astype(jnp.float32)[None],
                       lcon.ball_center[:, j, :].T,
                       lcon.ball_radius[:, j][None]]
        for j in range(caps[2]):
            lparts += [(j < lcon.pl_count).astype(jnp.float32)[None],
                       lcon.pl_normal[:, j, :].T,
                       lcon.pl_friction[:, j][None]]
        for j in range(caps[3]):
            lparts += [(j < lcon.dir_count).astype(jnp.float32)[None],
                       lcon.dir_tangent[:, j, :].T,
                       lcon.dir_friction[:, j][None]]
        lc_flat = jnp.concatenate(lparts, axis=0).astype(jnp.float32)
    planes = jnp.zeros((n_planes, 6), jnp.float32)
    if shape.n_planes:
        planes = planes.at[: shape.n_planes].set(jnp.concatenate([
            state.gcon.plane_normal,
            state.gcon.plane_offset[:, None],
            state.gcon.plane_fk[:, None],
            state.gcon.plane_fs[:, None]], axis=1).astype(jnp.float32))
    balls = jnp.zeros((n_balls, 4), jnp.float32)
    if shape.n_balls:
        balls = balls.at[: shape.n_balls].set(jnp.concatenate([
            state.gcon.ball_center,
            state.gcon.ball_radius[:, None]], axis=1).astype(jnp.float32))
    return dict(fparams=fparams, param_flat=param_flat, bits_flat=bits_flat,
                minv_flat=minv_flat, fixed_flat=fixed_flat,
                const_flat=const_flat, drag_flat=drag_flat, lc_flat=lc_flat,
                planes=planes, balls=balls, aratedt=aratedt, sstop=sstop,
                move=move)


def make_step_setup(shape: SceneShape, t_size: int, h: int, n_tiles: int,
                    carry_legacy: bool = False):
    """ONE implementation of the single-device tiled per-step machinery --
    staging, the per-step magnet/remainder glue, kernel-call marshalling,
    and the step sequencing (one launch per step; two under RK2) --
    shared by build_tiled_chunk (the primal) and the adjoint trace
    replay (ops/adjoint_tiled.build_tiled_trace).  Gradient correctness
    requires the replay to be BITWISE the primal; sharing the code makes
    that true by construction instead of by hand-kept mirrors.

    Returns ``setup(state) -> (step, p)`` where
    ``step(i, pos, vel, acc, rem_rest) -> (pos2, vel2, acc2, rem_rest2,
    aux)`` advances one dt in the carry layout (padded-flat [3, n_t], or
    [3, n] when ``carry_legacy``), ``p`` is the prep_flat_inputs dict
    (for the chunk epilogue), and ``aux`` carries the trace replay's
    per-step observables -- the UNBLOCKED [3, n_t] total constant-force
    input(s) and the remainder-rest linearization point(s):
    ``cf_a_flat``/``rest_in`` (glue scenes) plus ``cf_b_flat``/
    ``rest_mid`` (RK2 glue).  Callers that ignore aux (the chunk) pay
    nothing: XLA dead-code-eliminates the unused outputs."""
    n = shape.n_masses
    n_t = n_tiles * t_size
    pad_n = n_t - n
    rk2 = shape.config.integrator is Integrator.RK2
    verlet = shape.config.integrator is Integrator.VERLET
    has_glue = shape.has_remainder or shape.has_magnets

    if rk2:
        call_a = make_tiled_call(shape, t_size, h, n_tiles, "rk2a")
        call_b = make_tiled_call(shape, t_size, h, n_tiles, "rk2b")
    else:
        step_call = make_tiled_call(shape, t_size, h, n_tiles, "single")

    def setup(state: SimState):
        m = state.masses
        p = prep_flat_inputs(shape, state)
        const_flat = p["const_flat"]
        planes, balls, fparams = p["planes"], p["balls"], p["fparams"]

        r3 = lambda x: x.reshape(x.shape[0], -1, 128)
        hpad = lambda x: r3(jnp.pad(x, ((0, 0), (h, h + pad_n))))

        param_hbm = hpad(p["param_flat"]) if p["param_flat"] is not None \
            else None
        mask_hbm = hpad(p["bits_flat"]) if p["bits_flat"] is not None \
            else None

        # blocked per-tile inputs; invalid masses are frozen like fixed ones
        zpad = lambda x: r3(jnp.pad(x, ((0, 0), (0, pad_n))))
        minv = zpad(p["minv_flat"])
        fixed = zpad(p["fixed_flat"])
        const_f = zpad(const_flat)
        drag = zpad(p["drag_flat"]) if p["drag_flat"] is not None else None
        lc_in = zpad(p["lc_flat"]) if p["lc_flat"] is not None else None

        dt32 = state.dt.astype(jnp.float32)
        t032 = state.t.astype(jnp.float32)

        if carry_legacy:
            win_in = hpad                               # (h, h + pad_n) pad
            blk_in = lambda x: r3(jnp.pad(x, ((0, 0), (0, pad_n))))
            out_tx = lambda x: x.reshape(3, n_t)[:, :n]
        else:
            win_in = lambda x: r3(jnp.pad(x, ((0, 0), (h, h))))
            blk_in = r3
            out_tx = lambda x: x.reshape(3, n_t)

        magnet_ridx = None
        if shape.has_magnets and shape.magnet_receivers:
            # hoist the chunk-constant compacted-receiver top_k out of the
            # per-step glue
            from .magnets import magnet_receiver_idx
            magnet_ridx = magnet_receiver_idx(m, shape.magnet_receivers)
        sp_glue = None
        if shape.has_remainder:
            # endpoint validity folded once per chunk (it only changes at
            # re-marshal boundaries); it gates the force AND the actuated
            # advance, matching spring_forces' pair_valid (sim.cu:1163)
            sp_glue = state.springs
            if not shape.all_valid:
                sp_glue = dataclasses.replace(
                    sp_glue, valid=(sp_glue.valid & m.valid[sp_glue.left]
                                    & m.valid[sp_glue.right]))

        def glue_cf_flat(pos_c, vel_c, t_i, rem_rest):
            # per-step magnet/remainder glue (module docstring), entering
            # the kernel through its constant-force input.  RK2 evaluates
            # it once per force pass -- at (pos, vel, t) then (pos_h,
            # vel_h, t + dt/2) -- advancing the remainder rest each pass,
            # exactly like ops/step.py's RK2 branch re-stamps rests
            # between passes.  Remainder springs use the O(S) compact
            # evaluator rather than the step path's O(N*D) incidence
            # scatter: glue scenes have S (cross links) << N (a measured
            # 6.7x on the tiled glue adjoint, docs/PERFORMANCE.md).
            # Returns the UNBLOCKED padded-flat [3, n_t] total cf (the
            # trace replay stores exactly this plane).
            from . import forces as F
            from .step import magnet_pass
            extra = jnp.zeros_like(const_flat)
            if shape.has_remainder:
                f_rem, rem_rest = F.compact_remainder_forces(
                    sp_glue, pos_c[:, :n],
                    vel_c[:, :n] if shape.has_damping else None,
                    rem_rest, t_i, state.dt, 0, n,
                    shape.has_breathing, shape.has_damping)
                # spring forces never land on fixed masses
                # (sim.cu:1187-1193)
                extra = extra + jnp.where(m.fixed, 0.0, f_rem)
            if shape.has_magnets:
                mm = dataclasses.replace(m, pos=pos_c[:, :n],
                                         vel=vel_c[:, :n])
                # fixed masses stay field sources but receive nothing
                # (sim.cu:1292-1298), matching ops.step._mass_forces
                extra = extra + jnp.where(m.fixed, 0.0,
                                          magnet_pass(mm, shape,
                                                      magnet_ridx))
            return (jnp.pad(const_flat + extra, ((0, 0), (0, pad_n))),
                    rem_rest)

        def call_args(scal, pos_c, vel_c, cf=None, acc_c=None,
                      extra3=None):
            if shape.has_damping:
                state_hbm = win_in(jnp.concatenate([pos_c, vel_c], axis=0))
            else:
                state_hbm = win_in(pos_c)
            args = [scal, planes, balls, fparams, state_hbm]
            if param_hbm is not None:
                args.append(param_hbm)
            if mask_hbm is not None:
                args.append(mask_hbm)
            if not shape.has_damping:
                args.append(blk_in(vel_c))
            if acc_c is not None:
                args.append(blk_in(acc_c))
            args += [const_f if cf is None else cf, minv, fixed]
            if extra3 is not None:
                args += [blk_in(x) for x in extra3]
            if shape.has_drag:
                args.append(drag)
            if lc_in is not None:
                args.append(lc_in)
            return args

        def step(i, pos, vel, acc, rem_rest):
            i32 = i.astype(jnp.float32)
            t_i = state.t + i.astype(state.t.dtype) * state.dt
            aux = {}
            cf = None
            if has_glue:
                aux["rest_in"] = rem_rest
                cf_a_flat, rem_rest = glue_cf_flat(pos, vel, t_i, rem_rest)
                aux["cf_a_flat"] = cf_a_flat
                cf = r3(cf_a_flat)
            if rk2:
                # two launches per step (module docstring); scal[2] is the
                # count of ACTUATED rest advances already applied, which
                # runs at TWO per dt under RK2 (the reference's double-pass
                # rest-mutation quirk, sim.cu:1778-1799)
                scal = jnp.stack([dt32, t032 + i32 * dt32, 2.0 * i32])
                ph, vh, v1 = call_a(*call_args(scal, pos, vel, cf=cf))
                ph, vh, v1 = out_tx(ph), out_tx(vh), out_tx(v1)
                cf2 = None
                if has_glue:
                    aux["rest_mid"] = rem_rest
                    cf_b_flat, rem_rest = glue_cf_flat(
                        ph, vh, t_i + 0.5 * state.dt, rem_rest)
                    aux["cf_b_flat"] = cf_b_flat
                    cf2 = r3(cf_b_flat)
                scal2 = jnp.stack([dt32, t032 + (i32 + 0.5) * dt32,
                                   2.0 * i32 + 1.0])
                p2, v2, a2 = call_b(*call_args(
                    scal2, ph, vh, cf=cf2, extra3=(pos, v1, vel)))
            else:
                scal = jnp.stack([dt32, t032 + i32 * dt32, i32])
                p2, v2, a2 = step_call(*call_args(
                    scal, pos, vel, cf=cf,
                    acc_c=acc if verlet else None))
            return out_tx(p2), out_tx(v2), out_tx(a2), rem_rest, aux

        return step, p

    return setup


#: steps per resident-grid ("mega") launch.  Even (the final state must
#: land back in buffer A); the n_steps % MEGA_SEG tail runs through the
#: per-step path.  Measured at 100^3 (scripts/tpu_mega_ab.py, one
#: process): seg 16 = 64 = 128 within noise (3,433/3,434/3,419 steps/s)
#: -- the amortized launch cost is gone by 16, so keep the small segment
#: (cheaper per-step tail, more of a short control-plane chunk rides the
#: mega path).  A/B hook: TITAN_MEGA=0 disables, TITAN_MEGA_SEG=k
#: overrides (bound at build time, like CARRY_MODE).
MEGA_SEG = 16


def _mega_env_ok(shape: SceneShape) -> bool:
    """Non-VMEM mega envelope: f32 Euler/Verlet/RK2 without glue."""
    if os.environ.get("TITAN_MEGA", "1") == "0":
        return False
    if shape.config.integrator not in (Integrator.EULER, Integrator.VERLET,
                                       Integrator.RK2):
        return False
    return not (shape.has_remainder or shape.has_magnets)


def _mega_seg(shape: SceneShape, t_size: int, h: int) -> int:
    """Steps per mega launch for this scene; 0 = use per-step launches.

    Envelope: Euler/Verlet only (RK2 is two coupled launches per step)
    and no magnet/remainder glue (glue needs XLA between steps).  VMEM:
    the mega windows carry 6/9 state planes (vel -- and acc under Verlet
    -- must ride the dynamic buffers) vs the one-step kernel's 3/6, plus
    the [9, T] write stage."""
    if not _mega_env_ok(shape):
        return 0
    cfg = shape.config
    # mega windows match _plan's state plane count (pos, +vel if
    # damping); the extras are the vel/acc (RK2: +v1, +pos0/vel0)
    # tile-row buffers + write stage
    if cfg.integrator is Integrator.RK2:
        n_tp = (0 if shape.has_damping else 3) + 9
    else:
        n_tp = ((0 if shape.has_damping else 3)
                + (3 if cfg.integrator is Integrator.VERLET else 0))
    extra = 2 * 4 * t_size * n_tp + 4 * 9 * t_size
    if _vmem_bytes(shape, t_size, h) + extra >= _VMEM_EST_BUDGET:
        return 0
    k = int(os.environ.get("TITAN_MEGA_SEG", str(MEGA_SEG)))
    return max(2, k + (k % 2))


def _mega_fit(shape: SceneShape, t_size: int, h: int):
    """(t_size', k_seg): the mega-engaged tile size and segment length
    for this scene.  Beyond ~160^3 the _tile_size pick sits at the
    VMEM-budget edge and the mega scratch (vel/acc tiles + write stage)
    pushes the estimate over; a SMALLER tile restores it -- halo-DMA
    overhead is measured free and the mega launch win dwarfs it, so
    shrink (halving, toward one halo) until mega fits; tile size never
    changes the physics (bitwise, pinned by the tile A/Bs).  Returns
    (t_size, 0) when mega cannot engage at any tile.  Shared by
    build_tiled_chunk and the adjoint's mega trace replay
    (ops/adjoint_tiled.py), which must reproduce the primal's mega
    segmentation exactly."""
    k_seg = _mega_seg(shape, t_size, h)
    if k_seg == 0 and _mega_env_ok(shape):
        floor = _round_up(h, 1024)
        t2 = t_size
        while t2 > floor and _mega_seg(shape, t2, h) == 0:
            t2 = _round_up(max(t2 // 2, floor), 1024)
        k2 = _mega_seg(shape, t2, h)
        if k2:
            return t2, k2
    return t_size, k_seg


def build_tiled_chunk(shape: SceneShape, donate: bool = False):
    """Jitted chunk(state, n_steps): n_steps // MEGA_SEG resident-grid
    launches (one pallas_call per MEGA_SEG steps -- the round-4 answer to
    the measured 80% per-launch fixed cost) plus a per-step-launch tail,
    both op-for-op the same physics (the shared make_step_setup
    machinery; scenes outside the mega envelope run per-step throughout).

    donate=True donates the input state's buffers (exclusive-owner callers
    like bench.py and the scale probes -- at the ~200^3 HBM ceiling the
    un-donated pos/vel/acc copies are live growth); the control plane
    keeps donate=False for its concurrent getAll() snapshot readers."""
    n = shape.n_masses
    deltas = shape.stencil_deltas
    h = _round_up(max(abs(d) for d in deltas), 1024)
    t_size = _tile_size(h, shape)
    # A/B hook (scripts/tpu_tiled_multistep_ab.py): widen the halo by an
    # integer factor at the SAME tile size.  Physics is unchanged (the
    # extra halo rows are redundant compute); the measured rate vs factor
    # is the marginal cost of window rows -- exactly what a k-step-per-
    # launch kernel would pay (k*H halos), so it prices that design
    # without building it.  Bound at build time, like CARRY_MODE.
    h *= max(1, int(os.environ.get("TITAN_HALO_AB", "1")))
    rk2 = shape.config.integrator is Integrator.RK2
    carry_legacy = CARRY_MODE == "legacy"   # bound at build time, not trace
    if carry_legacy:
        k_seg = 0
    else:
        t_size, k_seg = _mega_fit(shape, t_size, h)
    n_tiles = -(-n // t_size)            # ceil: last tile covers padding
    n_t = n_tiles * t_size
    pad_n = n_t - n
    setup = make_step_setup(shape, t_size, h, n_tiles, carry_legacy)
    if not k_seg:
        mega_call = None
    elif rk2:
        mega_call = make_mega_rk2_call(shape, t_size, h, n_tiles, k_seg)
    else:
        mega_call = make_mega_call(shape, t_size, h, n_tiles, k_seg)

    def chunk(state: SimState, n_steps) -> SimState:
        m = state.masses
        stc = state.stencil
        step, p = setup(state)
        move, aratedt, sstop = p["move"], p["aratedt"], p["sstop"]

        def body(i, carry):
            # carries stay in the kernel's padded-flat [3, n_t] layout the
            # whole chunk (tail rows are inert: minv = 0 there, so they
            # never move) -- the per-step [:, :n] output slices and the
            # right-pads of vel/acc that a [3, n] carry forced were pure
            # HBM copies, ~100 MB/step at 100^3, and tile-size-INDEPENDENT
            # (why the round-3 bigger-tile A/B measured a wash).  Only the
            # (h, h) halo pad of the windowed planes remains per step.
            pos, vel, acc, rem_rest = carry
            p2, v2, a2, rem_rest, _aux = step(i, pos, vel, acc, rem_rest)
            return p2, v2, a2, rem_rest

        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad_n)))
        init = (m.pos, m.vel, m.acc) if carry_legacy else \
            (padf(m.pos), padf(m.vel), padf(m.acc))

        lower = jnp.int32(0)
        if mega_call is not None:
            # n_steps // k_seg resident-grid launches advance the bulk of
            # the chunk; the state rides the two aliased window-layout
            # buffers (final state in A: k_seg is even)
            r3 = lambda x: x.reshape(x.shape[0], -1, 128)
            a0 = r3(jnp.pad(jnp.concatenate(init, axis=0), ((0, 0), (h, h))))
            b0 = jnp.zeros_like(a0)
            bufs0 = (a0, b0, jnp.zeros_like(a0)) if rk2 else (a0, b0)
            margs = [p["planes"], p["balls"], p["fparams"]]
            tail = []
            if p["param_flat"] is not None:
                tail.append(r3(jnp.pad(p["param_flat"],
                                       ((0, 0), (h, h + pad_n)))))
            if p["bits_flat"] is not None:
                tail.append(r3(jnp.pad(p["bits_flat"],
                                       ((0, 0), (h, h + pad_n)))))
            zp = lambda x: r3(padf(x))
            tail += [zp(p["const_flat"]), zp(p["minv_flat"]),
                     zp(p["fixed_flat"])]
            if p["drag_flat"] is not None:
                tail.append(zp(p["drag_flat"]))
            if p["lc_flat"] is not None:
                tail.append(zp(p["lc_flat"]))
            dt32 = state.dt.astype(jnp.float32)
            t032 = state.t.astype(jnp.float32)
            n_seg = n_steps // k_seg

            def seg_body(si, bufs):
                base = (si * k_seg).astype(jnp.float32)
                # RK2 advances ACTUATED rest twice per dt: scal[2] is the
                # advance count already applied (2 per completed step)
                scal = jnp.stack([dt32, t032 + base * dt32,
                                  2.0 * base if rk2 else base])
                return tuple(mega_call(scal, *margs, *bufs, *tail))

            a_buf = jax.lax.fori_loop(0, n_seg, seg_body, bufs0)[0]
            flat = a_buf.reshape(9, -1)[:, h:h + n_t]
            init = (flat[0:3], flat[3:6], flat[6:9])
            lower = n_seg * k_seg

        pos, vel, acc, rem_rest = jax.lax.fori_loop(
            lower, n_steps, body, init + (state.springs.rest,))
        pos, vel, acc = pos[:, :n], vel[:, :n], acc[:, :n]
        # the kernel zeroes frozen masses' acc each step; the reference
        # (massForcesAndUpdate early-return) and the VMEM kernel preserve
        # the prior value, so restore it once after the loop
        acc = jnp.where(move, acc, m.acc)

        dtn = jnp.asarray(n_steps, state.dt.dtype) * state.dt
        new_m = dataclasses.replace(
            m, pos=pos, vel=vel, acc=acc,
            T=m.T + jnp.where(move, dtn, 0.0))
        new_state = dataclasses.replace(state, masses=new_m, t=state.t + dtn)
        if shape.has_actuated:
            # end-of-chunk rest via the same closed form the kernel used;
            # RK2 advances rest twice per dt (reference double-pass quirk)
            n_adv = jnp.asarray(n_steps, jnp.float32) * (2.0 if rk2 else 1.0)
            advn = jnp.minimum(n_adv, sstop)
            new_state = dataclasses.replace(
                new_state, stencil=dataclasses.replace(
                    stc, rest=stc.rest + advn * aratedt))
        if shape.has_remainder:
            # remainder rest advanced iteratively in the per-step glue
            new_state = dataclasses.replace(
                new_state, springs=dataclasses.replace(
                    state.springs, rest=rem_rest))
        return new_state

    return jax.jit(chunk, donate_argnums=(0,) if donate else ())
