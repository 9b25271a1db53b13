"""Fused adjoint for BEYOND-VMEM (grid-tiled) scenes: gradients at
tiled-kernel speed.

ops/adjoint.py keeps the whole adjoint state VMEM-resident, so its
envelope ends where the forward VMEM kernel's does (~a few hundred
thousand masses).  Bigger scenes (the 100^3 config: 1M masses / 12.7M
springs) previously differentiated only through diff.fast_rollout's
XLA-recompute backward, ~20x under the tiled forward.  This module
extends the hand-derived adjoint to the grid-tiled kernel
(ops/pallas_tiled.py):

  forward (primal)   : the existing tiled chunk, unchanged.
  backward, per seg  : (1) a TRACE REPLAY re-runs the segment through
                       the SAME per-step tiled kernel launches
                       (make_tiled_call -- bitwise the primal's physics),
                       writing each step's input (pos, vel) into an HBM
                       trace laid out with the backward's halo padding;
                       (2) a BACKWARD tile kernel sweeps the trace in
                       reverse: per step, a Pallas grid walks column
                       tiles, window-DMAs the traced state, the incoming
                       cotangents, AND the per-mass/per-family invariants
                       (double-buffered), runs ops/adjoint.backward_step
                       on the halo'd window, and writes the tile's rows
                       of the new cotangents and per-spring param
                       gradients as blocked outputs.

THE TRICK that avoids cross-tile scatter in the transpose: the adjoint
of a stencil gather is a stencil scatter, which would send gradient
contributions into neighbor tiles (an overlap-add).  Instead each tile
recomputes the pointwise integrate/constraint transpose REDUNDANTLY on
its halo rows (inputs are all windowed), so the force transpose can
GATHER every contribution to its own rows -- the same
redundant-halo-compute trade the distributed forward makes
(parallel/halo_tiled.py), applied to the backward.  Outputs are
disjoint blocked tiles; no read-modify-write, no atomics, no
overlap-add glue.

Halo depth: the backward needs the integrate/constraint transpose (and
its recomputed primal forces) CORRECT on one spring-reach beyond the
tile, which itself reads springs one reach further, so the window halo
is 2 * h for Euler/Verlet.  RK2 recomputes the midpoint state (one
force depth) and composes two force transposes, deepening the chain to
4 * h (window values beyond the needed depth are wrap-around garbage
from the circular window rolls and are sliced away, exactly like the
forward kernel's discarded halo rows).

Per-spring param gradients attach to the spring's own lane (its gather
side), and gradient flow starts from the integrate-transpose cotangent
field, which each tile zeroes outside its window -- every
(spring, affected-row) contribution is produced by exactly one tile, so
blocked bar outputs accumulate to the exact total across tiles; the
XLA-side fori accumulates them across steps.

Envelope (``tiled_adjoint_reject_reason``): the FULL tiled forward
envelope (ops/pallas_tiled.tiled_reject_reason).
Magnet / remainder forces run as per-step XLA glue through the kernel's
constant-force input (pallas_tiled module docstring); the adjoint
traces each step's TOTAL cf, the backward tile kernel emits that step's
cf cotangent, and an XLA-side jax.vjp of the SAME glue routes it onto
pos/vel and the glue params (per-spring k/rest/damping/omega/rate on
state.springs; per-mass mag_rad/stiffness/maxf/scale) -- see
build_tiled_bwd.  RK2 re-evaluates the glue at the midpoint state,
which lives inside the fused kernel's half-steps, so RK2 glue scenes
run a SPLIT backward: per step, a pass-2 tile kernel transposes the
second force pass and emits the recomputed midpoint primal plus its raw
cotangents, the midpoint glue vjp runs XLA-side, and a pass-1 tile
kernel finishes (backward_rk2_pass2/pass1 in ops/adjoint.py; each half
needs only a 2h window, vs the fused RK2's 4h).  Differentiable inputs
and exclusions otherwise match ops/adjoint.py (the math IS
ops/adjoint.backward_step, applied per window).

Reference: the physics is computeSpringForces + massForcesAndUpdate
(sim.cu:1157-1200, 1285-1367) at any scene size; the reference has no
gradient capability at all.
"""

from __future__ import annotations

import dataclasses
import functools
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Integrator
from ..state import SceneShape, SimState
from . import pallas_tiled
from .adjoint import (_actuation_inputs, _make_P, assemble_ct,
                      backward_step)
from .pallas_tiled import (_round_up, prep_flat_inputs,
                           tiled_reject_reason)

_BWD_VMEM_BUDGET = 64 * 1024 * 1024


def _has_glue(shape: SceneShape) -> bool:
    """Magnet / remainder-spring forces run as per-step XLA glue through
    the tiled kernel's constant-force input (pallas_tiled module
    docstring); the adjoint traces that total cf per step and routes its
    cotangent through jax.vjp of the same glue."""
    return shape.has_remainder or shape.has_magnets


def _rk2_glue(shape: SceneShape) -> bool:
    return _has_glue(shape) and shape.config.integrator is Integrator.RK2


def _halo_mult(shape: SceneShape) -> int:
    """Backward window halo depth in units of h.  Fused RK2 composes
    both force transposes around an in-kernel midpoint recompute: 4h.
    RK2 GLUE scenes run the SPLIT backward (two kernels per step with
    the midpoint glue vjp between them, see build_tiled_bwd), where each
    half needs only its own transpose depth: 2h, like Euler/Verlet."""
    if shape.config.integrator is Integrator.RK2 and not _has_glue(shape):
        return 4
    return 2


def _tr_planes(shape: SceneShape) -> int:
    """Traced planes per step: (pos, vel) -- plus the step's total
    constant-force input when the scene has glue (the backward recomputes
    the primal's friction/contact selects from the TOTAL force, and the
    per-step cf cotangent feeds the glue transpose); RK2 glue scenes
    trace BOTH per-pass cf inputs (cf_a at the step state, cf_b at the
    midpoint)."""
    if _rk2_glue(shape):
        return 12
    return 9 if _has_glue(shape) else 6


def _inv_plan(shape: SceneShape):
    """Offsets into the stacked invariant window planes [NI, ., 128]."""
    nf = len(shape.stencil_deltas)
    offs, p = {}, 0

    def add(name, count):
        nonlocal p
        offs[name] = p
        p += count

    add("k", nf)
    add("rest", nf)
    if shape.has_damping:
        add("damping", nf)
    if shape.has_breathing:
        add("bsign", nf)
        add("bomega", nf)
    if shape.has_actuated:
        add("aratedt", nf)
        add("sstop", nf)
    add("minv", 1)
    add("fixed", 1)
    if not _has_glue(shape):
        # glue scenes read the per-step TOTAL cf from the trace instead
        add("cf", 3)
    if shape.has_drag:
        add("drag", 1)
    caps = (shape.cap_cp, shape.cap_ball, shape.cap_pl, shape.cap_dir)
    if any(caps):
        from .pallas_step import _lc_planes
        add("lc", _lc_planes(shape))
    return offs, p


def _bar_plan(shape: SceneShape):
    """Offsets into the blocked bar-gradient output planes [NB, ., 128]."""
    nf = len(shape.stencil_deltas)
    offs, p = {}, 0

    def add(name, count):
        nonlocal p
        offs[name] = p
        p += count

    add("cf", 3)
    add("minv", 1)
    add("k", nf)
    add("rest", nf)
    if shape.has_damping:
        add("damping", nf)
    if shape.has_breathing:
        add("omega", nf)
    if shape.has_actuated:
        add("aratedt", nf)
    if shape.has_drag:
        add("drag", 1)
    return offs, p


def _mega_adjoint_ok(shape: SceneShape) -> bool:
    """True when BOTH adjoint passes ride resident grids (round 5): the
    trace replay runs megatrace launches mirroring the primal chunk's
    mega segmentation, and the backward is ONE reverse-sweep pallas_call
    per segment (parity-alternating cotangent buffers + in-kernel bar
    accumulation).  Envelope: the primal mega envelope (f32 Euler/Verlet,
    no glue -- RK2 keeps the per-step split path).  A/B hook:
    TITAN_MEGA_ADJ=0 falls back to the round-4 per-step trace/backward."""
    if _os.environ.get("TITAN_MEGA_ADJ", "1") == "0":
        return False
    if pallas_tiled.CARRY_MODE == "legacy":
        return False
    if shape.config.integrator not in (Integrator.EULER, Integrator.VERLET):
        return False
    if not pallas_tiled._mega_env_ok(shape):
        return False
    h = _round_up(max(abs(d) for d in shape.stencil_deltas), 1024)
    t = pallas_tiled._tile_size(h, shape)
    _, k = pallas_tiled._mega_fit(shape, t, h)
    return k > 0


def _mega_inv_plan(shape: SceneShape):
    """Invariant plan for the MEGA backward: family-uniform param fields
    ride SMEM scalars (prep_flat_inputs' fparams table) plus ONE packed
    pair_ok bitmask plane instead of nf HBM window planes each.
    Value-exact: scalar * bit == the masked plane bitwise (bit in {0,1};
    at masked lanes the uniform plane holds exactly the scalar), and the
    compacted fields were the dominant backward window traffic (38 of 44
    planes on the damped 100^3 scene, measured round 5).  Returns
    (offs, ni, uni) -- ``uni``: field -> True when SMEM-compacted."""
    u_k, u_rest, u_damp, u_type, u_omega = shape.stencil_uniform
    nf = len(shape.stencil_deltas)
    uni = {"k": u_k,
           "rest": False,
           "damping": u_damp and shape.has_damping,
           "bsign": u_type and shape.has_breathing,
           "bomega": u_omega and shape.has_breathing}
    # AT MOST TWO compacted fields, and never rest (hardware-bisected,
    # round 5): compacting k+rest+damping together mis-executed on real
    # Mosaic (grads 0.018-0.15 rel vs <= 1.2e-6 for every single field
    # and every PAIR, same scene, same seg -- a compiler sensitivity at
    # the all-compacted ni=6 layout, not a value error; interpret is
    # exact in all cases).  k+damping keeps most of the win: 44 -> 20
    # invariant planes on the damped 100^3 scene.
    n_on = 0
    for f in ("k", "damping", "bsign", "bomega"):
        if uni[f]:
            n_on += 1
            if n_on > 2:
                uni[f] = False
    # A/B + bisect hook: TITAN_MEGA_COMPACT="none" disables the SMEM
    # compaction entirely; a comma list (e.g. "k,damping") limits it to
    # those fields (bypasses the two-field cap -- bisect use only)
    sel = _os.environ.get("TITAN_MEGA_COMPACT")
    if sel is not None:
        allow = set() if sel == "none" else set(sel.split(","))
        uni = {"k": u_k, "rest": u_rest and not shape.has_actuated,
               "damping": u_damp and shape.has_damping,
               "bsign": u_type and shape.has_breathing,
               "bomega": u_omega and shape.has_breathing}
        uni = {f: (v and f in allow) for f, v in uni.items()}
    offs, p = {}, 0

    def add(name, count):
        nonlocal p
        offs[name] = p
        p += count

    if uni["k"] or uni["damping"]:
        add("bits", 1)                  # packed pair_ok (f32-bitcast)
    if not uni["k"]:
        add("k", nf)
    if not uni["rest"]:
        add("rest", nf)
    if shape.has_damping and not uni["damping"]:
        add("damping", nf)
    if shape.has_breathing and not uni["bsign"]:
        add("bsign", nf)
    if shape.has_breathing and not uni["bomega"]:
        add("bomega", nf)
    if shape.has_actuated:
        add("aratedt", nf)
        add("sstop", nf)
    add("minv", 1)
    add("fixed", 1)
    add("cf", 3)                        # mega envelope is non-glue
    if shape.has_drag:
        add("drag", 1)
    caps = (shape.cap_cp, shape.cap_ball, shape.cap_pl, shape.cap_dir)
    if any(caps):
        from .pallas_step import _lc_planes
        add("lc", _lc_planes(shape))
    return offs, p, uni


def _bwd_vmem_est(shape: SceneShape, t: int, hw: int,
                  mega: bool = False) -> int:
    """Backward-kernel VMEM estimate at tile size t, window halo hw."""
    _, nb = _bar_plan(shape)
    nf = len(shape.stencil_deltas)
    wr = (t + 2 * hw) // 128
    if mega:
        _, ni, uni = _mega_inv_plan(shape)
        # megabwd: 6-plane trace windows; compacted fields materialize
        # [nf, wr, 128] values in VMEM (single-buffered); no blocked
        # outs; bars RMW blocks (2x read + 1 write stage) + the 9-plane
        # cotangent write stage
        win = 2 * 4 * wr * 128 * (6 + 9 + ni)
        mat = 4 * wr * 128 * nf * sum(uni.values())
        blk = 4 * (t // 128) * 128 * (3 * nb + 9)
        return win + mat + blk + 4 * wr * 128 * 48
    _, ni = _inv_plan(shape)
    win = 2 * 4 * wr * 128 * (_tr_planes(shape) + 9 + ni)  # dbl-buf windows
    gout = 12 if _rk2_glue(shape) else 9       # rk2b emits midpoint too
    blk = 2 * 4 * (t // 128) * 128 * (gout + nb)  # blocked outputs
    tmp = 4 * wr * 128 * 48                    # transpose temporaries
    return win + blk + tmp


def _shrink_bwd_tile(shape: SceneShape, t: int, hw: int,
                     mega: bool = False) -> int:
    """Halve the backward tile (1024-aligned, dividing the forward tile
    hence the padded layout) until the VMEM estimate fits."""
    while (t % 2048 == 0 and t > 2048
           and _bwd_vmem_est(shape, t, hw, mega) >= _BWD_VMEM_BUDGET):
        t //= 2
    return t


def _geom(shape: SceneShape):
    """(h, hw, t_fwd, t_bwd, n_tiles_fwd, n_t): the forward chunk's tile
    geometry (the trace replay must reproduce it exactly) plus the
    backward's window halo hw = mult * h and its own tile size t_bwd
    (halved toward the VMEM budget; t_bwd divides t_fwd so both walk the
    same padded-flat [., n_t] layout).  When the mega adjoint engages,
    t_fwd is the primal chunk's mega-fitted tile (pallas_tiled._mega_fit
    -- the trace buffer layout must match the megatrace launches)."""
    n = shape.n_masses
    h = _round_up(max(abs(d) for d in shape.stencil_deltas), 1024)
    # late-bound so tests that shrink pallas_tiled._tile_size reshape the
    # primal chunk, the trace replay, and this backward consistently
    t_fwd = pallas_tiled._tile_size(h, shape)
    mega = _mega_adjoint_ok(shape)
    if mega:
        t_fwd, _ = pallas_tiled._mega_fit(shape, t_fwd, h)
    n_tiles = -(-n // t_fwd)
    n_t = n_tiles * t_fwd
    hw = _halo_mult(shape) * h
    t_bwd = _shrink_bwd_tile(shape, t_fwd, hw, mega)
    return h, hw, t_fwd, t_bwd, n_tiles, n_t


def tiled_adjoint_reject_reason(shape: SceneShape):
    """None if the tiled adjoint accepts this scene, else a one-line
    reason naming the envelope condition that failed."""
    r = tiled_reject_reason(shape)
    if r is not None:
        return r
    if not shape.config.persistent_extern_force:
        return "strict per-step extern_force mode"
    h, hw, t_fwd, t_bwd, n_tiles, n_t = _geom(shape)
    # the FULL backward estimate (windows + blocked outputs + transpose
    # temporaries) at the already-shrunken t_bwd -- the same predicate
    # halo_adjoint_reject_reason applies, so a scene the shrink loop
    # could not fit is cleanly rejected on every tier instead of built
    # into a kernel that overflows VMEM at runtime
    need = _bwd_vmem_est(shape, t_bwd, hw, _mega_adjoint_ok(shape))
    if need >= _BWD_VMEM_BUDGET:
        return (f"backward tile needs ~{need >> 20} MB of VMEM > "
                f"{_BWD_VMEM_BUDGET >> 20} MB budget even at the minimum "
                "tile")
    return None


def tiled_adjoint_supported(shape: SceneShape) -> bool:
    return tiled_adjoint_reject_reason(shape) is None


# ---------------------------------------------------------------------------
# Staging
# ---------------------------------------------------------------------------

def _stage_flat(shape: SceneShape, state: SimState):
    """Chunk-invariant backward inputs in UNPADDED flat form: the stacked
    [NI, n] invariant planes (params + per-mass fields, all full planes
    -- no SMEM-scalar shortcut; the backward needs per-spring values to
    emit per-spring gradients), plus planes/balls tables and pair_ok.
    Shared by the single-device wrapper below and the distributed
    adjoint (parallel/halo_adjoint.py), which pads/shards it itself.

    The VALUES match what the tiled forward consumed
    (pallas_tiled.prep_flat_inputs -- gradient correctness requires
    transposing exactly that staging)."""
    p = prep_flat_inputs(shape, state)
    stc = state.stencil
    m = state.masses
    offs, ni = _inv_plan(shape)
    nf = len(shape.stencil_deltas)
    n = shape.n_masses

    pair_ok = stc.mask
    if not shape.all_valid:
        pair_ok = jnp.stack([
            pair_ok[fi] & m.valid & jnp.roll(m.valid, -d)
            for fi, d in enumerate(shape.stencil_deltas)])
    k_eff = jnp.where(pair_ok, stc.k, 0.0).astype(jnp.float32)

    parts = [k_eff, stc.rest.astype(jnp.float32)]
    if shape.has_damping:
        parts.append(jnp.where(pair_ok, stc.damping, 0.0)
                     .astype(jnp.float32))
    if shape.has_breathing:
        from ..config import (ACTIVE_CONTRACT_THEN_EXPAND,
                              ACTIVE_EXPAND_THEN_CONTRACT)
        styp = stc.type
        bsign = jnp.where(
            styp == ACTIVE_CONTRACT_THEN_EXPAND, -0.2,
            jnp.where(styp == ACTIVE_EXPAND_THEN_CONTRACT, 0.2,
                      0.0)).astype(jnp.float32)
        parts += [bsign, stc.omega.astype(jnp.float32)]
    if shape.has_actuated:
        aratedt, sstop = _actuation_inputs(state, pair_ok)
        parts += [aratedt, sstop]
    parts += [p["minv_flat"].astype(jnp.float32),
              p["fixed_flat"].astype(jnp.float32)]
    if not _has_glue(shape):
        parts.append(p["const_flat"].astype(jnp.float32))
    if shape.has_drag:
        parts.append(p["drag_flat"].astype(jnp.float32))
    if p["lc_flat"] is not None:
        parts.append(p["lc_flat"])
    inv_flat = jnp.concatenate([x if x.ndim == 2 else x[None]
                                for x in parts], axis=0)
    assert inv_flat.shape[0] == ni, (inv_flat.shape, ni)
    return dict(inv_flat=inv_flat, planes=p["planes"], balls=p["balls"],
                pair_ok=pair_ok, offs=offs, ni=ni, move=p["move"],
                fixed_flat=p["fixed_flat"])


def _stage(shape: SceneShape, state: SimState, hw: int, n_t: int):
    """_stage_flat padded into the single-device windowed HBM layout."""
    st = _stage_flat(shape, state)
    n = shape.n_masses
    ni = st["ni"]
    st["inv_hbm"] = jnp.pad(st["inv_flat"], ((0, 0), (hw, n_t - n + hw))
                            ).reshape(ni, (n_t + 2 * hw) // 128, 128)
    return st


def _stage_mega(shape: SceneShape, state: SimState, hw: int, n_t: int):
    """The mega backward's staging: _mega_inv_plan's compacted invariant
    windows (uniform fields -> the fparams SMEM table + a packed pair_ok
    bitmask plane, f32-bitcast to share the one stacked array)."""
    p = prep_flat_inputs(shape, state)
    offs, ni, uni = _mega_inv_plan(shape)
    stc = state.stencil
    m = state.masses
    nf = len(shape.stencil_deltas)
    n = shape.n_masses

    pair_ok = stc.mask
    if not shape.all_valid:
        pair_ok = jnp.stack([
            pair_ok[fi] & m.valid & jnp.roll(m.valid, -d)
            for fi, d in enumerate(shape.stencil_deltas)])

    parts = []
    if "bits" in offs:
        bits = jnp.zeros(pair_ok.shape[1], jnp.int32)
        for fi in range(nf):
            bits = bits | (pair_ok[fi].astype(jnp.int32) << fi)
        parts.append(jax.lax.bitcast_convert_type(
            bits, jnp.float32)[None])
    if "k" in offs:
        parts.append(jnp.where(pair_ok, stc.k, 0.0).astype(jnp.float32))
    if "rest" in offs:
        parts.append(stc.rest.astype(jnp.float32))
    if "damping" in offs:
        parts.append(jnp.where(pair_ok, stc.damping, 0.0)
                     .astype(jnp.float32))
    if "bsign" in offs or "bomega" in offs:
        from ..config import (ACTIVE_CONTRACT_THEN_EXPAND,
                              ACTIVE_EXPAND_THEN_CONTRACT)
        styp = stc.type
        bsign = jnp.where(
            styp == ACTIVE_CONTRACT_THEN_EXPAND, -0.2,
            jnp.where(styp == ACTIVE_EXPAND_THEN_CONTRACT, 0.2,
                      0.0)).astype(jnp.float32)
        if "bsign" in offs:
            parts.append(bsign)
        if "bomega" in offs:
            parts.append(stc.omega.astype(jnp.float32))
    if shape.has_actuated:
        aratedt, sstop = _actuation_inputs(state, pair_ok)
        parts += [aratedt, sstop]
    parts += [p["minv_flat"].astype(jnp.float32),
              p["fixed_flat"].astype(jnp.float32),
              p["const_flat"].astype(jnp.float32)]
    if shape.has_drag:
        parts.append(p["drag_flat"].astype(jnp.float32))
    if p["lc_flat"] is not None:
        parts.append(p["lc_flat"])
    inv_flat = jnp.concatenate([x if x.ndim == 2 else x[None]
                                for x in parts], axis=0)
    assert inv_flat.shape[0] == ni, (inv_flat.shape, ni)
    inv_hbm = jnp.pad(inv_flat, ((0, 0), (hw, n_t - n + hw))
                      ).reshape(ni, (n_t + 2 * hw) // 128, 128)
    return dict(inv_hbm=inv_hbm, planes=p["planes"], balls=p["balls"],
                fscal=p["fparams"], pair_ok=pair_ok,
                fixed_flat=p["fixed_flat"])


# ---------------------------------------------------------------------------
# Trace replay (forward, writing per-step inputs)
# ---------------------------------------------------------------------------

def build_tiled_trace(shape: SceneShape, seg: int):
    """(state) -> (trace, rtrace): trace [seg, NP, (n_t + 2hw)//128, 128]
    holds each step's input (pos, vel) -- plus, for glue scenes (NP = 9),
    the step's TOTAL constant-force input (const + magnet/remainder
    glue) -- in the padded-flat layout with the backward's halo pads
    already in place (zeros); rtrace [seg, S] holds each step's
    remainder-rest INPUT (None unless shape.has_remainder -- the glue
    transpose re-linearizes at that rest).  Runs the SAME per-step
    machinery as build_tiled_chunk's padded-carry mode -- literally:
    pallas_tiled.make_step_setup is ONE implementation shared by the
    primal chunk and this replay, so the replayed trajectory is bitwise
    the primal's BY CONSTRUCTION (and test-pinned); this function only
    adds the trace/rtrace writes from the step's aux observables."""
    h, hw, t_fwd, _, n_tiles, n_t = _geom(shape)
    pad_n = n_t - shape.n_masses
    rk2 = shape.config.integrator is Integrator.RK2
    twr = (n_t + 2 * hw) // 128
    has_glue = _has_glue(shape)
    np_tr = _tr_planes(shape)
    setup = pallas_tiled.make_step_setup(shape, t_fwd, h, n_tiles,
                                         carry_legacy=False)

    if _mega_adjoint_ok(shape):
        return _build_megatrace_run(shape, seg, h, hw, t_fwd, n_tiles,
                                    n_t, twr, setup)

    def run(state: SimState):
        m = state.masses
        step, _ = setup(state)
        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad_n)))

        def body(i, carry):
            pos, vel, acc, rem_rest, trace, rtrace = carry
            p2, v2, a2, rem_rest, aux = step(i, pos, vel, acc, rem_rest)
            if has_glue:
                # the backward transposes each glue pass at its rest
                # INPUT (before that pass's actuation advance)
                cfs = [aux["cf_a_flat"]] + ([aux["cf_b_flat"]] if rk2
                                            else [])
                planes_i = jnp.concatenate([pos, vel] + cfs, axis=0)
                if shape.has_remainder:
                    if rk2:
                        rtrace = jax.lax.dynamic_update_slice(
                            rtrace, jnp.stack([aux["rest_in"],
                                               aux["rest_mid"]])[None],
                            (i, 0, 0))
                    else:
                        rtrace = jax.lax.dynamic_update_slice(
                            rtrace, aux["rest_in"][None], (i, 0))
            else:
                planes_i = jnp.concatenate([pos, vel], axis=0)
            trace = jax.lax.dynamic_update_slice(
                trace, planes_i[None], (i, 0, hw))
            return p2, v2, a2, rem_rest, trace, rtrace

        trace0 = jnp.zeros((seg, np_tr, n_t + 2 * hw), jnp.float32)
        if shape.has_remainder:
            rsh = ((seg, 2) if rk2 else (seg,)) + state.springs.rest.shape
            rtrace0 = jnp.zeros(rsh, state.springs.rest.dtype)
        else:
            rtrace0 = jnp.zeros((seg, 0))
        _, _, _, _, trace, rtrace = jax.lax.fori_loop(
            0, seg, body, (padf(m.pos), padf(m.vel), padf(m.acc),
                           state.springs.rest, trace0, rtrace0))
        return (trace.reshape(seg, np_tr, twr, 128),
                rtrace if shape.has_remainder else None)

    return run


def _build_megatrace_run(shape: SceneShape, seg: int, h: int, hw: int,
                         t_fwd: int, n_tiles: int, n_t: int, twr: int,
                         setup):
    """Mega trace replay: (state) -> (T, None) where T is the
    [seg + 1, 9, twr, 128] trace buffer -- entry s = the padded-flat
    (pos, vel, acc) state BEFORE step s, with the backward's hw halo
    pads.  seg // k_prim megatrace launches mirror the primal chunk's
    mega segments (same k_prim, same per-launch scalars -> bitwise the
    primal); the seg % k_prim tail replays through the shared per-step
    machinery, writing its (pos, vel) trace entries XLA-side."""
    n = shape.n_masses
    pad_n = n_t - n
    _, k_prim = pallas_tiled._mega_fit(
        shape, pallas_tiled._tile_size(h, shape), h)
    assert k_prim > 0 and t_fwd * n_tiles == n_t
    n_seg = seg // k_prim
    lower = n_seg * k_prim
    mtrace_call = pallas_tiled.make_megatrace_call(
        shape, t_fwd, h, hw, n_tiles, k_prim, seg) if n_seg else None

    def run(state: SimState):
        m = state.masses
        step, p = setup(state)
        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad_n)))
        r3hw = lambda x: jnp.pad(x, ((0, 0), (hw, hw))).reshape(
            x.shape[0], twr, 128)
        init9 = jnp.concatenate(
            [padf(m.pos), padf(m.vel), padf(m.acc)], axis=0)
        T = jnp.zeros((seg + 1, 9, twr, 128), jnp.float32
                      ).at[0].set(r3hw(init9))
        dt32 = state.dt.astype(jnp.float32)
        t032 = state.t.astype(jnp.float32)

        if n_seg:
            r3 = lambda x: x.reshape(x.shape[0], -1, 128)
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

            def seg_body(si, T):
                # scal[0:3] EXACTLY as build_tiled_chunk's seg_body (the
                # bitwise-replay requirement); scal[3] = absolute trace
                # base (exact in f32: integer < 2^24)
                base = (si * k_prim).astype(jnp.float32)
                scal = jnp.stack([dt32, t032 + base * dt32, base, base])
                (T,) = mtrace_call(scal, *margs, T, *tail)
                return T

            T = jax.lax.fori_loop(0, n_seg, seg_body, T)

        if lower < seg:
            # per-step tail (shared machinery = bitwise the primal tail);
            # each step writes its INPUT (pos, vel) into its trace entry
            flat = T[lower].reshape(9, -1)[:, hw:hw + n_t]
            carry0 = (flat[0:3], flat[3:6], flat[6:9],
                      state.springs.rest, T)

            def body(i, carry):
                pos, vel, acc, rem_rest, T = carry
                e = r3hw(jnp.concatenate([pos, vel], axis=0))
                T = jax.lax.dynamic_update_slice(T, e[None], (i, 0, 0, 0))
                p2, v2, a2, rem_rest, _aux = step(i, pos, vel, acc,
                                                  rem_rest)
                return p2, v2, a2, rem_rest, T

            T = jax.lax.fori_loop(lower, seg, body, carry0)[4]
        return T, None

    return run


# ---------------------------------------------------------------------------
# Backward tile kernel
# ---------------------------------------------------------------------------

_GOUT_PLANES = {"fused": 9, "rk2b": 12, "rk2a": 6}


def _build_bwd_tile_kernel(shape: SceneShape, t_size: int, hw: int,
                           offs, ni: int, boffs, nb: int,
                           mode: str = "fused"):
    wr = (t_size + 2 * hw) // 128
    tr = t_size // 128
    hwr = hw // 128
    nf = len(shape.stencil_deltas)
    has_glue = _has_glue(shape)

    def kernel(scal_ref, plane_ref, ball_ref, state_hbm, cot_hbm, inv_hbm,
               gout_ref, bars_ref, swin, cwin, iwin, sem):
        t = pl.program_id(0)
        n_tiles = pl.num_programs(0)
        slot = jax.lax.rem(t, 2)

        def issue(tile_idx, into):
            row0 = tile_idx * tr
            pltpu.make_async_copy(
                state_hbm.at[:, pl.ds(row0, wr), :], swin.at[into],
                sem.at[into, 0]).start()
            pltpu.make_async_copy(
                cot_hbm.at[:, pl.ds(row0, wr), :], cwin.at[into],
                sem.at[into, 1]).start()
            pltpu.make_async_copy(
                inv_hbm.at[:, pl.ds(row0, wr), :], iwin.at[into],
                sem.at[into, 2]).start()

        @pl.when(t == 0)
        def _():
            issue(0, 0)

        @pl.when(t + 1 < n_tiles)
        def _():
            issue(t + 1, 1 - slot)

        row0 = t * tr
        pltpu.make_async_copy(
            state_hbm.at[:, pl.ds(row0, wr), :], swin.at[slot],
            sem.at[slot, 0]).wait()
        pltpu.make_async_copy(
            cot_hbm.at[:, pl.ds(row0, wr), :], cwin.at[slot],
            sem.at[slot, 1]).wait()
        pltpu.make_async_copy(
            inv_hbm.at[:, pl.ds(row0, wr), :], iwin.at[slot],
            sem.at[slot, 2]).wait()

        sw = swin[slot]
        pos, vel = sw[0:3], sw[3:6]
        cw = cwin[slot]
        iw = iwin[slot]

        def inv(name, count):
            o = offs[name]
            return iw[o:o + count]

        # glue scenes: the per-step TOTAL cf (const + magnet/remainder
        # glue) rides in the trace window; its cotangent (bars cf) is
        # routed through jax.vjp of the glue XLA-side per step.  RK2
        # glue traces BOTH per-pass cfs (cf_a then cf_b)
        cf_w = sw[6:9] if has_glue else inv("cf", 3)
        P = _make_P(
            shape,
            k_ref=inv("k", nf), rest_ref=inv("rest", nf),
            damp_ref=(inv("damping", nf) if shape.has_damping else None),
            minv=inv("minv", 1), fixed=inv("fixed", 1), cf=cf_w,
            drag=(inv("drag", 1) if shape.has_drag else None),
            plane_ref=plane_ref, ball_ref=ball_ref, dt=scal_ref[0],
            bsign=(inv("bsign", nf) if shape.has_breathing else None),
            bomega=(inv("bomega", nf) if shape.has_breathing else None),
            aratedt=(inv("aratedt", nf) if shape.has_actuated else None),
            sstop=(inv("sstop", nf) if shape.has_actuated else None),
            lc=(iw[offs["lc"]:] if "lc" in offs else None))
        # magnet/remainder forces entered the kernel THROUGH cf (per-step
        # glue), so their transpose is the cf cotangent routed through
        # jax.vjp of the glue XLA-side (build_tiled_bwd) -- the in-kernel
        # remainder/magnet transposes must stay off
        P["has_remainder"] = False
        P["has_magnets"] = False

        from .pallas_step import make_rolls
        rg, rs = make_rolls(wr)
        c = slice(hwr, hwr + tr)

        def write_bars(bars):
            bars_ref[boffs["cf"]:boffs["cf"] + 3] = bars["cf"][:, c]
            bars_ref[boffs["minv"]:boffs["minv"] + 1] = bars["minv"][:, c]
            for fi in range(nf):
                bars_ref[boffs["k"] + fi] = bars["k"][fi][c]
                bars_ref[boffs["rest"] + fi] = bars["rest"][fi][c]
                if shape.has_damping:
                    bars_ref[boffs["damping"] + fi] = \
                        bars["damping"][fi][c]
                if shape.has_breathing:
                    bars_ref[boffs["omega"] + fi] = bars["omega"][fi][c]
                if shape.has_actuated:
                    bars_ref[boffs["aratedt"] + fi] = \
                        bars["aratedt"][fi][c]
            if shape.has_drag:
                bars_ref[boffs["drag"]:boffs["drag"] + 1] = \
                    bars["drag"][:, c]

        if mode == "fused":
            gp2, gv2, ga2 = cw[0:3], cw[3:6], cw[6:9]
            gp, gv, ga, bars = backward_step(
                pos, vel, gp2, gv2, ga2, P, rg, rs,
                t_now=scal_ref[1], s_idx=scal_ref[2])
            gout_ref[0:3] = gp[:, c]
            gout_ref[3:6] = gv[:, c]
            gout_ref[6:9] = ga[:, c]
        elif mode == "rk2b":
            # pass-2 half of the split RK2 transpose: emits the
            # recomputed midpoint primal + raw midpoint cotangents; the
            # XLA side injects the midpoint glue vjp, then runs rk2a
            from .adjoint import backward_rk2_pass2
            gp2, gv2, ga2 = cw[0:3], cw[3:6], cw[6:9]
            P2 = dict(P, cf=sw[9:12])
            pos_h, vel_h, gph, gvh, bars = backward_rk2_pass2(
                pos, vel, gp2, gv2, ga2, P, P2, rg, rs,
                t_now=scal_ref[1], s_idx=scal_ref[2])
            gout_ref[0:3] = pos_h[:, c]
            gout_ref[3:6] = vel_h[:, c]
            gout_ref[6:9] = gph[:, c]
            gout_ref[9:12] = gvh[:, c]
        else:
            # pass-1 half: cot window = (glue-augmented gph, gvh, gvel2)
            from .adjoint import backward_rk2_pass1
            gph, gvh, gv2 = cw[0:3], cw[3:6], cw[6:9]
            gp_c, gv_c, bars = backward_rk2_pass1(
                pos, vel, gph, gvh, gv2, P, rg, rs,
                t_now=scal_ref[1], s_idx=scal_ref[2])
            gout_ref[0:3] = gp_c[:, c]
            gout_ref[3:6] = gv_c[:, c]
        write_bars(bars)

    return kernel


def _make_bwd_call(shape: SceneShape, t_size: int, hw: int, n_tiles: int,
                   offs, ni: int, boffs, nb: int, mode: str = "fused"):
    tr = t_size // 128
    wr = (t_size + 2 * hw) // 128
    n_t = n_tiles * t_size
    np_tr = _tr_planes(shape)
    ng = _GOUT_PLANES[mode]

    blkg = pl.BlockSpec((ng, tr, 128), lambda i, s: (0, i, 0),
                        memory_space=pltpu.VMEM)
    blkb = pl.BlockSpec((nb, tr, 128), lambda i, s: (0, i, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                 # scal = [dt, t_now, s_idx]
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # planes
            pl.BlockSpec(memory_space=pltpu.SMEM),   # balls
            pl.BlockSpec(memory_space=pl.ANY),       # traced (pos, vel)
            pl.BlockSpec(memory_space=pl.ANY),       # cotangent windows
            pl.BlockSpec(memory_space=pl.ANY),       # invariant windows
        ],
        out_specs=[blkg, blkb],
        scratch_shapes=[
            pltpu.VMEM((2, np_tr, wr, 128), jnp.float32),
            pltpu.VMEM((2, 9, wr, 128), jnp.float32),
            pltpu.VMEM((2, ni, wr, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    return pl.pallas_call(
        _build_bwd_tile_kernel(shape, t_size, hw, offs, ni, boffs, nb,
                               mode),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ng, n_t // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, n_t // 128, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def _build_megabwd_run(shape: SceneShape, seg: int):
    """build_tiled_bwd's mega form: ONE reverse-sweep pallas_call per
    segment (same gradient dict contract; mega envelope is non-glue, so
    no per-step-vjp keys)."""
    h, hw, t_fwd, t_bwd, n_tiles_f, n_t = _geom(shape)
    n = shape.n_masses
    pad_n = n_t - n
    n_tiles_b = n_t // t_bwd
    offs, ni, uni = _mega_inv_plan(shape)
    boffs, nb = _bar_plan(shape)
    nf = len(shape.stencil_deltas)
    call = _make_megabwd_call(shape, t_bwd, hw, n_tiles_b, offs, ni, uni,
                              boffs, nb, seg)

    def run(state: SimState, trace, rtrace, gpos, gvel, gacc, grest=None):
        st = _stage_mega(shape, state, hw, n_t)
        dt32 = state.dt.astype(jnp.float32)
        t032 = state.t.astype(jnp.float32)
        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad_n)))
        cotA0 = jnp.pad(
            jnp.concatenate([padf(gpos), padf(gvel), padf(gacc)], axis=0),
            ((0, 0), (hw, hw))).reshape(9, (n_t + 2 * hw) // 128, 128)
        cotB0 = jnp.zeros_like(cotA0)
        bars0 = jnp.zeros((nb, n_t // 128, 128), jnp.float32)
        scal = jnp.stack([dt32, t032])
        outA, outB, bars = call(scal, st["planes"], st["balls"],
                                st["fscal"], trace, cotA0, cotB0, bars0,
                                st["inv_hbm"])
        # last backward step j = seg-1 writes B when j is even (seg odd)
        final = outB if seg % 2 == 1 else outA
        flat = final.reshape(9, -1)[:, hw:hw + n_t]
        bars = bars.reshape(nb, n_t)

        def bar(name, count):
            o = boffs[name]
            return bars[o:o + count, :n]

        g = {"pos": flat[0:3, :n], "vel": flat[3:6, :n],
             "acc": flat[6:9, :n],
             "cf": bar("cf", 3), "minv": bar("minv", 1)[0],
             "k": bar("k", nf), "rest": bar("rest", nf),
             "pair_ok": st["pair_ok"]}
        if shape.has_damping:
            g["damping"] = bar("damping", nf)
        if shape.has_breathing:
            g["omega"] = bar("omega", nf)
        if shape.has_actuated:
            g["aratedt"] = bar("aratedt", nf)
        if shape.has_drag:
            g["drag"] = bar("drag", 1)[0]
        return g

    return run


def _build_megabwd_kernel(shape: SceneShape, t_size: int, hw: int,
                          offs, ni: int, uni, boffs, nb: int, seg: int,
                          n_tiles_s: int):
    """Reverse-sweep resident-grid backward (round 5): ONE pallas_call
    runs all ``seg`` backward steps over a grid of (seg, n_tiles) cells.
    The cotangent state (gpos, gvel, gacc -- 9 planes, hw halo pads)
    lives in two parity-alternating HBM buffers exactly like the forward
    mega kernel's state (j even reads A/writes B; j = 0 reads the
    aliased input); per-spring/per-mass bar gradients accumulate by
    read-modify-write of an aliased [NB, n_t] HBM accumulator (safe:
    the sequential grid revisits a tile's rows only on later steps, and
    the accumulation order matches the per-step XLA fori bitwise).  The
    per-cell math IS the fused per-step backward tile kernel's
    (ops/adjoint.backward_step on the halo'd window)."""
    wr = (t_size + 2 * hw) // 128
    tr = t_size // 128
    hwr = hw // 128
    nf = len(shape.stencil_deltas)
    np_tr = 6     # (pos, vel) read from the 9-plane mega trace entries

    def kernel(scal_ref, plane_ref, ball_ref, fscal_ref, trace_hbm,
               cotA_in, cotB_in, bars_in, inv_hbm, outA, outB, bars_hbm,
               swin, cwin, iwin, bstage, bwrite, wstage, sem, wsem, bsem):
        j = pl.program_id(0)
        t = pl.program_id(1)
        n_tiles = pl.num_programs(1)
        lidx = j * n_tiles + t
        slot = jax.lax.rem(lidx, 2)
        s = (seg - 1) - j
        s_f = s.astype(jnp.float32)
        dt = scal_ref[0]
        t_now = scal_ref[1] + s_f * dt

        def issue(j_n, tile_idx, into):
            row0 = tile_idx * tr
            s_n = (seg - 1) - j_n
            pltpu.make_async_copy(
                trace_hbm.at[s_n, pl.ds(0, np_tr), pl.ds(row0, wr), :],
                swin.at[into], sem.at[into, 0]).start()

            def cpc(src):
                pltpu.make_async_copy(
                    src.at[pl.ds(0, 9), pl.ds(row0, wr), :],
                    cwin.at[into], sem.at[into, 1]).start()

            @pl.when(j_n == 0)
            def _():
                cpc(cotA_in)

            odd = jax.lax.rem(j_n, 2) == 1

            @pl.when((j_n > 0) & ~odd)
            def _():
                cpc(outA)

            @pl.when((j_n > 0) & odd)
            def _():
                cpc(outB)

            pltpu.make_async_copy(
                inv_hbm.at[:, pl.ds(row0, wr), :], iwin.at[into],
                sem.at[into, 2]).start()

            def cpb(src):
                pltpu.make_async_copy(
                    src.at[:, pl.ds(tile_idx * tr, tr), :],
                    bstage.at[into], sem.at[into, 3]).start()

            @pl.when(j_n == 0)
            def _():
                cpb(bars_in)

            @pl.when(j_n > 0)
            def _():
                cpb(bars_hbm)

        @pl.when(lidx == 0)
        def _():
            issue(jnp.int32(0), 0, 0)

        cross_ok = hw <= (n_tiles_s - 2) * t_size
        if cross_ok:
            t_n = t + 1
            wrap = t_n == n_tiles
            j_n = j + wrap.astype(jnp.int32)
            t_n = jnp.where(wrap, 0, t_n)

            @pl.when(lidx + 1 < seg * n_tiles)
            def _():
                issue(j_n, t_n, 1 - slot)
        else:
            @pl.when(t + 1 < n_tiles)
            def _():
                issue(j, t + 1, 1 - slot)

            @pl.when((t == 0) & (j > 0))
            def _():
                issue(j, 0, slot)

        row0 = t * tr
        pltpu.make_async_copy(
            trace_hbm.at[0, pl.ds(0, np_tr), pl.ds(row0, wr), :],
            swin.at[slot], sem.at[slot, 0]).wait()
        pltpu.make_async_copy(
            cotA_in.at[pl.ds(0, 9), pl.ds(row0, wr), :],
            cwin.at[slot], sem.at[slot, 1]).wait()
        pltpu.make_async_copy(
            inv_hbm.at[:, pl.ds(row0, wr), :], iwin.at[slot],
            sem.at[slot, 2]).wait()
        pltpu.make_async_copy(
            bars_in.at[:, pl.ds(row0, tr), :], bstage.at[slot],
            sem.at[slot, 3]).wait()

        sw = swin[slot]
        pos, vel = sw[0:3], sw[3:6]
        cw = cwin[slot]
        iw = iwin[slot]

        def inv(name, count):
            o = offs[name]
            return iw[o:o + count]

        bits = None
        if "bits" in offs:
            bits = jax.lax.bitcast_convert_type(iw[offs["bits"]],
                                                jnp.int32)   # [wr, 128]

        def famvals(name, row, masked):
            """[nf, wr, 128] field values: the HBM window plane, or the
            SMEM scalar (times the pair_ok bit for masked fields --
            bitwise the plane, see _mega_inv_plan)."""
            if not uni.get(name):
                return inv(name, nf)
            vals = []
            for fi in range(nf):
                v = fscal_ref[row, fi]
                if masked:
                    b = ((bits >> fi) & 1).astype(jnp.float32)
                    vals.append(b * v)
                else:
                    vals.append(jnp.zeros((wr, 128), jnp.float32) + v)
            return jnp.stack(vals)

        P = _make_P(
            shape,
            k_ref=famvals("k", 0, True),
            rest_ref=famvals("rest", 1, False),
            damp_ref=(famvals("damping", 2, True)
                      if shape.has_damping else None),
            minv=inv("minv", 1), fixed=inv("fixed", 1), cf=inv("cf", 3),
            drag=(inv("drag", 1) if shape.has_drag else None),
            plane_ref=plane_ref, ball_ref=ball_ref, dt=dt,
            bsign=(famvals("bsign", 3, False)
                   if shape.has_breathing else None),
            bomega=(famvals("bomega", 4, False)
                    if shape.has_breathing else None),
            aratedt=(inv("aratedt", nf) if shape.has_actuated else None),
            sstop=(inv("sstop", nf) if shape.has_actuated else None),
            lc=(iw[offs["lc"]:] if "lc" in offs else None))
        P["has_remainder"] = False
        P["has_magnets"] = False

        from .pallas_step import make_rolls
        rg, rs = make_rolls(wr)
        c = slice(hwr, hwr + tr)

        gp2, gv2, ga2 = cw[0:3], cw[3:6], cw[6:9]
        gp, gv, ga, bars = backward_step(
            pos, vel, gp2, gv2, ga2, P, rg, rs, t_now=t_now, s_idx=s_f)

        # new cotangent tile rows -> the parity-opposite buffer
        wstage[0:3] = gp[:, c]
        wstage[3:6] = gv[:, c]
        wstage[6:9] = ga[:, c]
        row0w = t * tr + hwr

        def wcopy(dst):
            cp = pltpu.make_async_copy(
                wstage, dst.at[pl.ds(0, 9), pl.ds(row0w, tr), :], wsem)
            cp.start()
            cp.wait()

        even = jax.lax.rem(j, 2) == 0

        @pl.when(even)
        def _():
            wcopy(outB)

        @pl.when(~even)
        def _():
            wcopy(outA)

        # bars RMW: prior accumulator block + this (step, tile)'s
        # contribution, written back in place (same addition order as
        # the per-step XLA `bars + bars_s` fori)
        bs = bstage[slot]
        o = boffs["cf"]
        bwrite[o:o + 3] = bs[o:o + 3] + bars["cf"][:, c]
        o = boffs["minv"]
        bwrite[o:o + 1] = bs[o:o + 1] + bars["minv"][:, c]
        for fi in range(nf):
            bwrite[boffs["k"] + fi] = bs[boffs["k"] + fi] + bars["k"][fi][c]
            bwrite[boffs["rest"] + fi] = (bs[boffs["rest"] + fi]
                                          + bars["rest"][fi][c])
            if shape.has_damping:
                bwrite[boffs["damping"] + fi] = (
                    bs[boffs["damping"] + fi] + bars["damping"][fi][c])
            if shape.has_breathing:
                bwrite[boffs["omega"] + fi] = (
                    bs[boffs["omega"] + fi] + bars["omega"][fi][c])
            if shape.has_actuated:
                bwrite[boffs["aratedt"] + fi] = (
                    bs[boffs["aratedt"] + fi] + bars["aratedt"][fi][c])
        if shape.has_drag:
            o = boffs["drag"]
            bwrite[o:o + 1] = bs[o:o + 1] + bars["drag"][:, c]
        bcp = pltpu.make_async_copy(
            bwrite, bars_hbm.at[:, pl.ds(row0, tr), :], bsem)
        bcp.start()
        bcp.wait()

    return kernel


def _make_megabwd_call(shape: SceneShape, t_size: int, hw: int,
                       n_tiles: int, offs, ni: int, uni, boffs, nb: int,
                       seg: int):
    tr = t_size // 128
    wr = (t_size + 2 * hw) // 128
    n_t = n_tiles * t_size
    rows = (n_t + 2 * hw) // 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                 # scal = [dt, t0]
        grid=(seg, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # planes
            pl.BlockSpec(memory_space=pltpu.SMEM),   # balls
            pl.BlockSpec(memory_space=pltpu.SMEM),   # fscal [5, nf]
            pl.BlockSpec(memory_space=pl.ANY),       # mega trace buffer
            pl.BlockSpec(memory_space=pl.ANY),       # cotangent A
            pl.BlockSpec(memory_space=pl.ANY),       # cotangent B
            pl.BlockSpec(memory_space=pl.ANY),       # bars accumulator
            pl.BlockSpec(memory_space=pl.ANY),       # invariant windows
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        scratch_shapes=[
            pltpu.VMEM((2, 6, wr, 128), jnp.float32),   # traced windows
            pltpu.VMEM((2, 9, wr, 128), jnp.float32),   # cot windows
            pltpu.VMEM((2, ni, wr, 128), jnp.float32),  # invariant wins
            pltpu.VMEM((2, nb, tr, 128), jnp.float32),  # bars RMW read
            pltpu.VMEM((nb, tr, 128), jnp.float32),     # bars write stage
            pltpu.VMEM((9, tr, 128), jnp.float32),      # cot write stage
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA(()),                # cot write
            pltpu.SemaphoreType.DMA(()),                # bars write
        ],
    )
    # flat operand indices: scal=0, planes=1, balls=2, fscal=3, trace=4,
    # cotA=5, cotB=6, bars=7, inv=8
    return pl.pallas_call(
        _build_megabwd_kernel(shape, t_size, hw, offs, ni, uni, boffs,
                              nb, seg, n_tiles),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((9, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((9, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, n_t // 128, 128), jnp.float32),
        ],
        input_output_aliases={5: 0, 6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
    )


def build_tiled_bwd(shape: SceneShape, seg: int):
    """(state0, trace, rtrace, gpos, gvel, gacc [3, N], grest) -> gradient
    dict with the keys assemble_ct consumes (pos/vel/acc/cf/minv [.., N];
    k/rest (/damping/omega/aratedt) [F, N]; drag [N]; pair_ok) -- plus,
    for glue scenes, the per-step-vjp keys (rest_chain/k_e/damp_e/
    omega_e/rate_e [S] and/or mag [4, N]).

    GLUE TRANSPOSE: magnet/remainder forces entered each step through
    the kernel's constant-force input (cf_s = const + glue(pos_s, vel_s,
    rest_s)), so after the backward tile kernel emits that step's cf
    cotangent, it is routed through jax.vjp of the SAME glue code
    evaluated at the traced (pos_s, vel_s, rest_s): pos/vel contributions
    join the cotangent carry, per-spring / per-mass param grads
    accumulate, and the remainder-rest cotangent chains backwards through
    the glue's own actuation advance (seeded by ``grest``, the
    chunk-output rest cotangent).  One deliberate approximation: scenes
    whose primal ran the dense-grid Pallas magnet kernel re-linearize
    through the XLA binned/pairwise pass (xla_only_shape) -- the same
    physics to ~1e-9 rel (ops/magnets_grid.py), and Pallas kernels define
    no VJP."""
    if _mega_adjoint_ok(shape):
        return _build_megabwd_run(shape, seg)
    h, hw, t_fwd, t_bwd, n_tiles_f, n_t = _geom(shape)
    n = shape.n_masses
    pad_n = n_t - n
    n_tiles_b = n_t // t_bwd
    offs, ni = _inv_plan(shape)
    boffs, nb = _bar_plan(shape)
    nf = len(shape.stencil_deltas)
    np_tr = _tr_planes(shape)
    has_glue = _has_glue(shape)
    rk2_glue = _rk2_glue(shape)
    if rk2_glue:
        bwd_call_b = _make_bwd_call(shape, t_bwd, hw, n_tiles_b, offs,
                                    ni, boffs, nb, mode="rk2b")
        bwd_call_a = _make_bwd_call(shape, t_bwd, hw, n_tiles_b, offs,
                                    ni, boffs, nb, mode="rk2a")
    else:
        bwd_call = _make_bwd_call(shape, t_bwd, hw, n_tiles_b, offs, ni,
                                  boffs, nb)
    twr = (n_t + 2 * hw) // 128

    def run(state: SimState, trace, rtrace, gpos, gvel, gacc, grest=None):
        st = _stage(shape, state, hw, n_t)
        dt32 = state.dt.astype(jnp.float32)
        t032 = state.t.astype(jnp.float32)
        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad_n)))
        m0 = state.masses
        sp0 = state.springs

        if has_glue:
            from ..state import xla_only_shape
            from . import forces as F
            from .step import magnet_pass
            xshape = xla_only_shape(shape)
            magnet_ridx = None
            if shape.has_magnets and shape.magnet_receivers:
                from .magnets import magnet_receiver_idx
                magnet_ridx = magnet_receiver_idx(m0,
                                                  shape.magnet_receivers)
            sp_glue = sp0
            if shape.has_remainder and not shape.all_valid:
                sp_glue = dataclasses.replace(
                    sp_glue, valid=(sp_glue.valid & m0.valid[sp_glue.left]
                                    & m0.valid[sp_glue.right]))

            def glue(t_i, pos_n, vel_n, *va):
                # mirror of build_tiled_chunk.glue_cf minus the constant
                # const_flat term (additive: its cotangent is the cf bar
                # itself, already accumulated for assemble_ct), with the
                # differentiated params as explicit arguments
                a = list(va)
                extra = jnp.zeros((3, n), jnp.float32)
                new_rest = None
                if shape.has_remainder:
                    rest_e, k_e, damp_e, omega_e, rate_e = a[:5]
                    a = a[5:]
                    sp = dataclasses.replace(
                        sp_glue, k=k_e, damping=damp_e,
                        omega=omega_e, rate=rate_e)
                    f_rem, new_rest = F.compact_remainder_forces(
                        sp, pos_n,
                        vel_n if shape.has_damping else None,
                        rest_e, t_i, state.dt, 0, n,
                        shape.has_breathing, shape.has_damping)
                    extra = extra + jnp.where(m0.fixed, 0.0, f_rem)
                if shape.has_magnets:
                    (mag4,) = a
                    mm2 = dataclasses.replace(
                        m0, pos=pos_n, vel=vel_n, mag_rad=mag4[0],
                        mag_stiffness=mag4[1], mag_maxf=mag4[2],
                        mag_scale=mag4[3])
                    extra = extra + jnp.where(
                        m0.fixed, 0.0,
                        magnet_pass(mm2, xshape, magnet_ridx))
                if shape.has_remainder:
                    return extra, new_rest
                return extra

        def glue_vjp(t_i, pos_s, vel_s, rest_s, cfbar, chain, gl):
            """jax.vjp of one glue evaluation at its traced
            linearization point; returns the pos/vel cotangent
            contributions [3, n], the rest-INPUT cotangent (the chain
            for the preceding pass/step), and the updated param
            accumulators."""
            args = [pos_s, vel_s]
            if shape.has_remainder:
                args += [rest_s, sp0.k, sp0.damping, sp0.omega,
                         sp0.rate]
            if shape.has_magnets:
                args.append(jnp.stack([m0.mag_rad, m0.mag_stiffness,
                                       m0.mag_maxf, m0.mag_scale]))
            _, vjp_fn = jax.vjp(lambda *aa: glue(t_i, *aa), *args)
            if shape.has_remainder:
                cts = vjp_fn((cfbar, chain))
            else:
                cts = vjp_fn(cfbar)
            new_chain = None
            if shape.has_remainder:
                new_chain = cts[2]
                gl = dict(gl, remp=gl["remp"] + jnp.stack(cts[3:7]))
            if shape.has_magnets:
                gl = dict(gl, mag=gl["mag"] + cts[-1])
            return cts[0], cts[1], new_chain, gl

        def body(j, carry):
            gp, gv, ga, bars, gl = carry
            s = (seg - 1 - j)
            sf = s.astype(jnp.float32)
            tr_s = jax.lax.dynamic_slice(
                trace, (s, 0, 0, 0), (1, np_tr, twr, 128))[0]
            cot = jnp.pad(jnp.concatenate([gp, gv, ga], axis=0),
                          ((0, 0), (hw, hw))).reshape(9, twr, 128)
            scal = jnp.stack([dt32, t032 + sf * dt32, sf])
            gout, bars_s = bwd_call(scal, st["planes"], st["balls"],
                                    tr_s, cot, st["inv_hbm"])
            gout = gout.reshape(9, n_t)
            bars_s = bars_s.reshape(nb, n_t)
            gp, gv, ga = gout[0:3], gout[3:6], gout[6:9]
            if has_glue:
                cfbar = bars_s[boffs["cf"]:boffs["cf"] + 3, :n]
                tf = tr_s.reshape(np_tr, twr * 128)
                pos_s = tf[0:3, hw:hw + n]
                vel_s = tf[3:6, hw:hw + n]
                rest_s = None
                if shape.has_remainder:
                    rest_s = jax.lax.dynamic_slice(
                        rtrace, (s, 0), (1,) + rtrace.shape[1:])[0]
                t_i = state.t + s.astype(state.t.dtype) * state.dt
                gp_a, gv_a, chain, gl = glue_vjp(
                    t_i, pos_s, vel_s, rest_s, cfbar,
                    gl["grem"] if shape.has_remainder else None, gl)
                gp = gp + padf(gp_a)
                gv = gv + padf(gv_a)
                if shape.has_remainder:
                    gl = dict(gl, grem=chain)
            return gp, gv, ga, bars + bars_s, gl

        def body_rk2glue(j, carry):
            """Split RK2 backward (module docstring): pass-2 kernel ->
            midpoint glue vjp -> pass-1 kernel -> step-state glue vjp;
            the integrate transpose's pointwise fixed-mask pieces run
            XLA-side (gvel = gvel2*fx + ..., gacc = gacc2*fx)."""
            gp, gv, ga, bars, gl = carry
            s = (seg - 1 - j)
            sf = s.astype(jnp.float32)
            tr_s = jax.lax.dynamic_slice(
                trace, (s, 0, 0, 0), (1, np_tr, twr, 128))[0]
            scal = jnp.stack([dt32, t032 + sf * dt32, sf])
            cot = jnp.pad(jnp.concatenate([gp, gv, ga], axis=0),
                          ((0, 0), (hw, hw))).reshape(9, twr, 128)
            outB, bars_b = bwd_call_b(scal, st["planes"], st["balls"],
                                      tr_s, cot, st["inv_hbm"])
            outB = outB.reshape(12, n_t)
            bars_b = bars_b.reshape(nb, n_t)
            pos_h, vel_h = outB[0:3], outB[3:6]
            gph, gvh = outB[6:9], outB[9:12]
            t_i = state.t + s.astype(state.t.dtype) * state.dt
            rest2 = None
            if shape.has_remainder:
                rest2 = jax.lax.dynamic_slice(
                    rtrace, (s, 0, 0), (1,) + rtrace.shape[1:])[0]
            cfbar_b = bars_b[boffs["cf"]:boffs["cf"] + 3, :n]
            gp_b, gv_b, chain, gl = glue_vjp(
                t_i + 0.5 * state.dt, pos_h[:, :n], vel_h[:, :n],
                rest2[1] if rest2 is not None else None, cfbar_b,
                gl["grem"] if shape.has_remainder else None, gl)
            gph = gph + padf(gp_b)
            gvh = gvh + padf(gv_b)
            cotA = jnp.pad(jnp.concatenate([gph, gvh, gv], axis=0),
                           ((0, 0), (hw, hw))).reshape(9, twr, 128)
            outA, bars_a = bwd_call_a(scal, st["planes"], st["balls"],
                                      tr_s, cotA, st["inv_hbm"])
            outA = outA.reshape(6, n_t)
            bars_a = bars_a.reshape(nb, n_t)
            gp_c, gv_c = outA[0:3], outA[3:6]
            tf = tr_s.reshape(np_tr, twr * 128)
            pos_s = tf[0:3, hw:hw + n]
            vel_s = tf[3:6, hw:hw + n]
            cfbar_a = bars_a[boffs["cf"]:boffs["cf"] + 3, :n]
            gp_a, gv_a, chain, gl = glue_vjp(
                t_i, pos_s, vel_s,
                rest2[0] if rest2 is not None else None, cfbar_a,
                chain, gl)
            if shape.has_remainder:
                gl = dict(gl, grem=chain)
            gp_new = gp + gph + gp_c + padf(gp_a)
            gv_new = gv * fxp + gv_c + padf(gv_a)
            ga_new = ga * fxp
            return gp_new, gv_new, ga_new, bars + bars_b + bars_a, gl

        gl0 = {}
        if shape.has_remainder:
            gl0["grem"] = grest            # chunk-output rest cotangent
            gl0["remp"] = jnp.zeros((4,) + sp0.rest.shape, jnp.float32)
        if shape.has_magnets:
            gl0["mag"] = jnp.zeros((4, n), jnp.float32)
        init = (padf(gpos), padf(gvel), padf(gacc),
                jnp.zeros((nb, n_t), jnp.float32), gl0)
        if rk2_glue:
            fxp = jnp.pad(st["fixed_flat"].astype(jnp.float32),
                          ((0, 0), (0, pad_n)))
            step_body = body_rk2glue
        else:
            step_body = body
        gp, gv, ga, bars, gl = jax.lax.fori_loop(0, seg, step_body, init)

        def bar(name, count):
            o = boffs[name]
            return bars[o:o + count, :n]

        g = {"pos": gp[:, :n], "vel": gv[:, :n], "acc": ga[:, :n],
             "cf": bar("cf", 3), "minv": bar("minv", 1)[0],
             "k": bar("k", nf), "rest": bar("rest", nf),
             "pair_ok": st["pair_ok"]}
        if shape.has_damping:
            g["damping"] = bar("damping", nf)
        if shape.has_breathing:
            g["omega"] = bar("omega", nf)
        if shape.has_actuated:
            g["aratedt"] = bar("aratedt", nf)
        if shape.has_drag:
            g["drag"] = bar("drag", 1)[0]
        if shape.has_remainder:
            g["rest_chain"] = gl["grem"]
            g["k_e"], g["damp_e"], g["omega_e"], g["rate_e"] = gl["remp"]
        if shape.has_magnets:
            g["mag"] = gl["mag"]
        return g

    return run


# ---------------------------------------------------------------------------
# Rollout
# ---------------------------------------------------------------------------

def _tiled_adjoint_segment(shape: SceneShape, seg: int):
    """Build (and cache) the tiled custom_vjp segment for a scene.

    Cached per (shape, seg) -- same rationale as ops/adjoint.py's
    _adjoint_segment: one traced/compiled program per scene instead of a
    fresh function object (= full retrace + recompile) per rollout call.
    EVERY build-time hook that changes the generated kernels joins the
    key -- TITAN_FMATH, pallas_tiled.CARRY_MODE, and the monkeypatchable
    function bindings pallas_tiled._tile_size (tests/graft dryrun shrink
    it) and pl.pallas_call (interpret-mode patches) -- so same-process
    A/Bs and patched tests are never served a segment traced under a
    different geometry or execution mode (functions key by identity;
    each patch installs a fresh object)."""
    from . import pallas_tiled as _pt
    return _tiled_adjoint_segment_cached(
        shape, seg, _os.environ.get("TITAN_FMATH", ""), _pt.CARRY_MODE,
        _os.environ.get("TITAN_MEGA", "1"),
        _os.environ.get("TITAN_MEGA_SEG", ""),
        _os.environ.get("TITAN_MEGA_ADJ", "1")
        + _os.environ.get("TITAN_MEGA_COMPACT", "*"),
        _pt._tile_size, pl.pallas_call)


@functools.lru_cache(maxsize=16)
def _tiled_adjoint_segment_cached(shape: SceneShape, seg: int,
                                  _fmath: str, _carry: str,
                                  _mega: str, _mseg: str, _madj: str,
                                  _tile, _pcall):
    from .pallas_tiled import build_tiled_chunk
    fwd_chunk = build_tiled_chunk(shape)
    trace_run = build_tiled_trace(shape, seg)
    bwd_run = build_tiled_bwd(shape, seg)

    @jax.custom_vjp
    def seg_fn(state):
        return fwd_chunk(state, jnp.int32(seg))

    def seg_fwd(state):
        return seg_fn(state), state

    def seg_bwd(s0, ct):
        trace, rtrace = trace_run(s0)
        g = bwd_run(s0, trace, rtrace,
                    ct.masses.pos, ct.masses.vel, ct.masses.acc,
                    grest=(ct.springs.rest if shape.has_remainder
                           else None))
        return assemble_ct(shape, seg, s0, ct, g)

    seg_fn.defvjp(seg_fwd, seg_bwd)
    return seg_fn


def tiled_adjoint_rollout(shape: SceneShape, state: SimState, n_steps: int,
                          segment: Optional[int] = None) -> SimState:
    """Differentiable rollout for beyond-VMEM scenes where BOTH passes run
    grid-tiled Pallas kernels (module docstring).  Residual memory is one
    state per segment plus one (pos, vel) trace of ``segment`` steps
    (~segment * 6 * N_padded * 4 bytes of HBM -- the default segment caps
    the trace at ~1.5 GB)."""
    r = tiled_adjoint_reject_reason(shape)
    if r is not None:
        raise ValueError(
            f"scene outside the tiled adjoint envelope: {r}")
    if n_steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")
    if segment is None:
        _, hw, _, _, _, n_t = _geom(shape)
        mega = _mega_adjoint_ok(shape)
        planes = 9 if mega else _tr_planes(shape)
        cap = max(1, int(1.5e9 // (4 * planes * (n_t + 2 * hw))))
        hi = min(n_steps, 64, cap)
        segment = next(s for s in range(hi, 0, -1) if n_steps % s == 0)
        if mega:
            # prefer a multiple of the primal mega segment so the trace
            # replay has no per-step tail (pure resident-grid launches)
            h = _round_up(max(abs(d) for d in shape.stencil_deltas), 1024)
            _, k_prim = pallas_tiled._mega_fit(
                shape, pallas_tiled._tile_size(h, shape), h)
            best = next((s for s in range(hi - hi % k_prim, 0, -k_prim)
                         if n_steps % s == 0), None)
            if best:
                segment = best
    seg = segment
    if n_steps % seg != 0:
        raise ValueError(f"segment {seg} does not divide n_steps {n_steps}")
    seg_fn = _tiled_adjoint_segment(shape, seg)
    if n_steps == seg:
        return seg_fn(state)
    out, _ = jax.lax.scan(lambda s, _: (seg_fn(s), None), state, None,
                          length=n_steps // seg)
    return out
