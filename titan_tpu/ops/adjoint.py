"""Fused multi-step ADJOINT Pallas kernel: gradients at kernel speed.

diff.fast_rollout's backward pass recomputes every segment through the
per-step XLA path and differentiates that, so the gradient path runs at
XLA-step speed (~700 fwd+bwd steps/s at the 1M-spring bench vs ~50k
forward-only through the VMEM kernel -- the backward is HBM-bound: every
step round-trips state AND the [F, N] spring params).  This module closes
that gap with a hand-derived adjoint that has the same VMEM-residency
structure as the forward kernel (ops/pallas_step.py):

  forward (primal)   : the existing fused VMEM chunk, unchanged.
  backward, per seg  : (1) a TRACE kernel re-runs the segment with state
                       resident in VMEM, streaming only (pos_t, vel_t) per
                       step to an HBM trace buffer (DMA overlapped with
                       the step compute);
                       (2) a BACKWARD kernel sweeps the trace in reverse,
                       keeping the adjoint state (gpos, gvel, gacc) and
                       all param-gradient accumulators VMEM-resident,
                       re-reading one (pos_t, vel_t) pair per step
                       (double-buffered DMA).

The adjoint math is hand-derived transpose-of-the-forward, written as
pure functions on [.., R, 128] arrays parameterized by the roll pair so
the SAME code runs inside the kernel (pltpu.roll 2-D decomposition) and
under plain jnp.roll in tests, where it is pinned against jax.vjp of the
identically-shaped forward (tests/test_adjoint.py).

Differentiable inputs (exact VJP of the kernel's forward physics):
  masses.pos, masses.vel, masses.acc, masses.extern_force, masses.m,
  masses.drag, masses.mag_rad/mag_stiffness/mag_maxf/mag_scale,
  stencil.k, stencil.rest, stencil.damping, stencil.omega
  (breathing frequency), stencil.rate (ACTUATED_* actuation speed --
  both enable gradient-based gait optimization), springs.k/rest/
  damping/omega/rate (remainder springs), state.g.
NOT differentiated (cotangents pass through untouched / stay zero):
  dt, global plane/ball geometry, t, actuation bounds l_min/l_max (they
  act through the piecewise-constant stop count, zero gradient a.e.).
  Scenes needing those gradients (or features outside the envelope
  below) use diff.rollout / diff.fast_rollout, which differentiate
  everything through the XLA step.

ACTUATED_* rest needs no per-step tracing: like the tiled kernel
(ops/pallas_tiled.py module docstring), the adjoint evaluates the
reference's state-independent rest mutation (sim.cu:1173-1181) in
CLOSED FORM -- after c force calls, rest_c = rest0 + min(c, s_stop) *
arate * dt with s_stop = ceil((bound - rest0) / (arate * dt)).  The
fused forward chunk stays iterative; the replay/backward closed form
matches it to f32 fusion error (~1e-7 rel, absorbed by the gradient
tolerances).  The call count c advances on EVERY force evaluation, so
RK2 actuates twice per dt exactly like the forward kernel.  The rate
gradient is d rest_c / d (arate dt) = min(c, s_stop), accumulated per
step in VMEM; the chunk's rest OUTPUT also carries a rate cotangent
(min(c_total, s_stop) * ct_rest), added XLA-side in the segment VJP.

Envelope (``adjoint_reject_reason``): the FULL VMEM kernel envelope
(only f64 scenes stay out, upstream); Euler (with or without the
velocity clamp), Verlet, or RK2 (two force passes, each with its own
transpose).  Supports ACTIVE_*
breathing springs, ACTUATED_* springs (closed-form rest, see above),
damping, drag, fixed/deleted masses, global contact planes incl.
static+kinetic friction, balls, per-mass local constraints (contact
planes, balls, constraint planes, directions -- slot geometry/friction
are NOT differentiated, like global plane/ball geometry; the
vel-mutating constraint-plane/direction slots thread the mutated
velocity's cotangent back through the reversed slot sweep), and
remainder (irregular-topology) springs: their endpoint gather/scatter
runs as the forward kernel's factorized one-hot MXU matmuls
(pallas_step.remainder_gather/scatter), and since gather^T == scatter
the transpose reuses the SAME two primitives -- cross-agent links
(the reference's multi-agent mechanism) differentiate at kernel speed,
with per-spring k/rest/damping/omega/rate gradients flowing back onto
``state.springs``.  Magnet scenes up to magnet_pallas_max differentiate
through the dense in-VMEM pairwise sweep (transpose recomputes each
source-row block; per-mass mag_rad/stiffness/maxf/scale grads onto
``state.masses``; shell |inter| and select boundaries use the standard
subgradients).

Reference: the physics being differentiated is computeSpringForces +
massForcesAndUpdate (sim.cu:1157-1200, 1285-1367); the reference has no
gradient capability at all.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ACTUATED_CONTRACT, ACTUATED_EXPAND, Integrator
from ..state import SceneShape, SimState

_VMEM_BUDGET = 100 * 1024 * 1024


def adjoint_reject_reason(shape: SceneShape):
    """None if the fused adjoint kernels accept this scene, else why not."""
    from .pallas_step import pallas_reject_reason
    r = pallas_reject_reason(shape)
    if r is not None:
        return r
    n, f = shape.n_masses, len(shape.stencil_deltas)
    # resident: k/rest(/damping) in + the same param-grad accumulators out,
    # breathing adds bsign/bomega in + the gomega accumulator, actuation
    # adds aratedt/sstop in + the garate accumulator,
    # minv/fixed/cf(+drag) + their grads, adjoint carries in+out, two trace
    # slots, ~10 vec3 temporaries
    fam = f * ((3 if shape.has_damping else 2) * 2
               + (3 if shape.has_breathing else 0)
               + (3 if shape.has_actuated else 0))
    caps = (shape.cap_cp, shape.cap_ball, shape.cap_pl, shape.cap_dir)
    # local constraints: the stacked slot input [L, N] plus the transpose's
    # staged intermediates -- contact planes stash f, constraint planes and
    # directions stash (f, v), per force pass (RK2 keeps two passes live)
    lc_planes = 7 * caps[0] + 5 * (caps[1] + caps[2] + caps[3])
    lc_stash = 3 * (caps[0] + 2 * caps[2] + 2 * caps[3])
    if shape.config.integrator is Integrator.RK2:
        lc_stash *= 2
    bytes_ = 4 * n * (fam + lc_planes + lc_stash + 3 * 14 + 8 + 12)
    if shape.has_remainder:
        # factorized selectors (budget-capped upstream by
        # pallas_reject_reason) + per-spring params/stages/grad
        # accumulators + the transpose's extra [2S, 128] dot temporaries
        s = shape.n_springs
        bytes_ += 4 * 2 * s * (n // 128 + 5 * 128) + 4 * s * 24
    if shape.has_magnets:
        # the dense pairwise transpose holds ~2x the forward's [R, 128,
        # 128] temporaries live (forward capped at 16 MB upstream)
        bytes_ += 8 * (n // 128) * 128 * 128 * 4
    if bytes_ >= _VMEM_BUDGET:
        return (f"adjoint residency ~{bytes_ >> 20} MB exceeds "
                f"{_VMEM_BUDGET >> 20} MB budget")
    return None


def adjoint_supported(shape: SceneShape) -> bool:
    return adjoint_reject_reason(shape) is None


# ---------------------------------------------------------------------------
# Pure step math on [.., R, 128] arrays.
#
# ``P`` is a dict: k/rest/damping indexable per family -> [R, 128] (refs in
# the kernel, arrays in tests); minv/fixed [1, R, 128]; cf [3, R, 128];
# drag [1, R, 128] or None; planes: list of (nx, ny, nz, off, fk, fs)
# scalars; plane_friction: static per-plane bools; balls: list of
# (cx, cy, cz, rad); dt scalar; plus static flags: deltas, clamp,
# has_damping, has_drag, normal_coeff, fmath_shared, rsqrt_norms.
# ``rg``/``rs`` are the roll_gather / roll_scatter pair.
# ---------------------------------------------------------------------------

def _vdot3(a, b):
    return jnp.sum(a * b, axis=0)


def _inv_len(d2, P):
    """Guarded 1/|d| and |d| from d2, matching the forward kernel's
    backend-gated forms (pallas_step.py:252-264)."""
    if P["rsqrt_norms"]:
        inv = jnp.where(d2 > 0, jax.lax.rsqrt(jnp.where(d2 > 0, d2, 1.0)),
                        0.0)
        ln = None if P["fmath_shared"] else d2 * inv
    else:
        ln = jnp.where(d2 > 0, jnp.sqrt(jnp.where(d2 > 0, d2, 1.0)), 0.0)
        inv = jnp.where(ln > 0, 1.0 / jnp.where(ln > 0, ln, 1.0), 0.0)
    return inv, ln


def _rest_eff(P, fi, t_now, cidx=None):
    """Per-family effective rest.  ACTUATED_* springs evaluate the
    closed-form mutated rest after ``cidx`` force calls (module
    docstring; pallas_step.py:282-293 is the iterative forward);
    breathing then folds the 1 -/+ 0.2 sin(wt) scale in as
    rest * (1 + bsign sin(bomega t)) (pallas_step.py:295-299, reference
    sim.cu:1169-1172).  A spring has at most one mechanism (aratedt = 0
    on breathing springs, bsign = 0 on actuated ones), so the
    composition is exact elementwise."""
    rest = P["rest"][fi]
    if P.get("has_actuated"):
        rest = rest + (jnp.minimum(cidx, P["sstop"][fi])
                       * P["aratedt"][fi])
    if P["has_breathing"]:
        rest = rest * (1.0 + P["bsign"][fi]
                       * jnp.sin(P["bomega"][fi] * t_now))
    return rest


def _force(pos, vel, P, rg, rs, t_now=None, keep_stages=False, cidx=None):
    """Full force evaluation (springs + global planes/balls + local
    constraints + drag), mirroring the forward kernel's compute_forces
    for the adjoint envelope.  Returns (f, vel_out, stages): local
    constraint planes and directions MUTATE the velocity the drag term
    and the integrator consume (sim.cu:1311-1326).  With keep_stages,
    stages holds the per-constraint input forces/velocities the
    transpose needs (friction selects read the accumulated force; the
    vel-mutating constraints read the running velocity)."""
    f = P["cf"] + 0.0
    fam = ({"inv": [], "cm": [], "ax": [], "ln": []}
           if keep_stages and P.get("famstash", True) else None)
    for fi, d in enumerate(P["deltas"]):
        pr = rg(pos, d)
        diff = pr - pos
        d2 = _vdot3(diff, diff)
        inv, ln = _inv_len(d2, P)
        rest = _rest_eff(P, fi, t_now, cidx)
        axdot = None
        if P["fmath_shared"]:
            cm = P["k"][fi] * (rest * inv - 1.0)
            if P["has_damping"]:
                vr = rg(vel, d)
                axdot = _vdot3(vel - vr, diff)
                cm = cm + (axdot * P["damping"][fi]) * (inv * inv)
            fs_ = cm * diff
        else:
            cm = P["k"][fi] * (rest - ln)
            if P["has_damping"]:
                vr = rg(vel, d)
                axdot = _vdot3(vel - vr, diff)
                cm = cm + (axdot * inv) * P["damping"][fi]
            fs_ = (cm * inv) * diff
        f = f - fs_ + rs(fs_, d)
        if fam is not None:
            # per-family scalar intermediates, re-used by the transpose
            # loop instead of recomputing reductions + rsqrt (the vector
            # quantities diff / vel-vr are re-derived by rolls -- free)
            fam["inv"].append(inv)
            fam["cm"].append(cm)
            fam["ax"].append(axdot)
            fam["ln"].append(ln)
    rem = None
    if P.get("has_remainder"):
        # remainder (irregular-topology) springs, the forward kernel's
        # factorized one-hot MXU path verbatim (pallas_step.py
        # compute_forces has_remainder block; reference computeSpringForces
        # sim.cu:1157-1200).  NOTE the remainder always uses the legacy
        # mag*inv force form (matching the kernel), independent of
        # fmath_shared.
        from .pallas_step import remainder_gather
        S = P["n_rem"]
        rsel = P["rowsel"][:]                        # [2S, R]
        lsel = P["lanesel"][:]                       # [2S, 128]
        remp = P["remp"]
        g = remainder_gather(rsel, lsel, pos)        # [2S, 3]
        diffe = g[S:] - g[:S]                        # right - left
        d2e = jnp.sum(diffe * diffe, axis=1, keepdims=True)  # [S, 1]
        if P["rsqrt_norms"]:
            inve = jnp.where(
                d2e > 0, jax.lax.rsqrt(jnp.where(d2e > 0, d2e, 1.0)), 0.0)
            lne = d2e * inve
        else:
            lne = jnp.where(d2e > 0,
                            jnp.sqrt(jnp.where(d2e > 0, d2e, 1.0)), 0.0)
            inve = jnp.where(lne > 0, 1.0 / jnp.where(lne > 0, lne, 1.0),
                             0.0)
        reste = remp[1]
        if P.get("has_actuated"):
            # closed-form ACTUATED rest after cidx force calls (module
            # docstring; the fused chunk's orest_rem carry is iterative)
            reste = reste + (jnp.minimum(cidx, P["sstop_e"][:])
                             * P["aratedt_e"][:])
        if P["has_breathing"]:
            reste = reste * (1.0 + remp[3] * jnp.sin(remp[4] * t_now))
        mage = remp[0] * (reste - lne)               # [S, 1]
        gv = axde = None
        if P["has_damping"]:
            gv = remainder_gather(rsel, lsel, vel)
            axde = jnp.sum((gv[:S] - gv[S:]) * diffe, axis=1,
                           keepdims=True)            # pre-inve axial dot
            mage = mage + (axde * inve) * remp[2]
        fe = (mage * inve) * diffe                   # [S, 3]
        fboth = jnp.concatenate([-fe, fe], axis=0)   # [2S, 3]
        from .pallas_step import remainder_scatter
        f = f + remainder_scatter(rsel, lsel, fboth)
        if keep_stages:
            rem = {"g": g, "gv": gv, "inve": inve, "lne": lne,
                   "mage": mage, "axde": axde, "reste": reste}
    if P.get("has_magnets"):
        # dense in-VMEM pairwise magnet sweep, the forward kernel's block
        # verbatim (pallas_step.py compute_forces has_magnets; reference
        # computeExternalMagnetForce, sim.cu:1223-1241): one 128-lane
        # source row at a time.  Fixed masses get no magnet force but
        # still act as sources (sim.cu:1292-1298).
        mag = P["mag"]
        rows_m = pos.shape[1]
        rrad, rstiff, rmaxf, rvalid = mag[0], mag[1], mag[2], mag[4]
        cutoff = P["magnet_cutoff"]
        ridx = (jax.lax.broadcasted_iota(jnp.int32, (rows_m, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (rows_m, 128), 1))
        fm0 = jnp.zeros_like(pos[0])
        fm1 = jnp.zeros_like(pos[0])
        fm2 = jnp.zeros_like(pos[0])
        for sr in range(rows_m):
            spx = pos[0, sr][None, None, :]
            spy = pos[1, sr][None, None, :]
            spz = pos[2, sr][None, None, :]
            d0 = pos[0][:, :, None] - spx            # [R, 128, 128]
            d1 = pos[1][:, :, None] - spy
            d2m = pos[2][:, :, None] - spz
            dist2 = d0 * d0 + d1 * d1 + d2m * d2m
            pos_d = dist2 > 0
            dist = jnp.where(
                pos_d, jnp.sqrt(jnp.where(pos_d, dist2, 1.0)), 0.0)
            safe = jnp.where(dist > 0, dist, 1.0)
            sidx = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
                    + sr * 128)
            ok = (dist < cutoff) & (ridx[:, :, None] != sidx)
            okf = rvalid[:, :, None] * mag[4, sr][None, None, :]
            inter = dist - (rrad[:, :, None] + mag[0, sr][None, None, :])
            shell = jnp.where(inter < 0,
                              jnp.abs(inter) * rstiff[:, :, None], 0.0)
            attract = (mag[3, sr][None, None, :] * rmaxf[:, :, None]
                       / jnp.maximum(dist2, 1e-12))
            coeff = jnp.where(ok, (shell - attract) / safe, 0.0) * okf
            fm0 = fm0 + jnp.sum(d0 * coeff, axis=2)
            fm1 = fm1 + jnp.sum(d1 * coeff, axis=2)
            fm2 = fm2 + jnp.sum(d2m * coeff, axis=2)
        f = f + jnp.stack([fm0, fm1, fm2]) * (1.0 - P["fixed"])
    # staged inputs: plane/local-contact-plane friction selects read the
    # accumulated force; the vel-mutating local constraints read the
    # running velocity.  Global ball / local ball / drag transposes are
    # pass-through in f.
    stages = ({"plane_in": [], "lcp_in": [], "lpl_in": [], "ldir_in": [],
               "fam": fam, "rem": rem} if keep_stages else None)
    for p, pp in enumerate(P["planes"]):
        if keep_stages:
            stages["plane_in"].append(f)
        f = _plane_fwd(f, pos, vel, pp, P["plane_friction"][p],
                       P["normal_coeff"])
    for bb in P["balls"]:
        f = _ball_fwd(f, pos, bb, P["normal_coeff"])
    v = vel
    caps = P.get("caps") or (0, 0, 0, 0)
    if any(caps):
        # per-mass local constraint slots in the kernel's reference
        # order (pallas_step.py compute_forces, sim.cu:1311-1326);
        # slot geometry/friction params are NOT differentiated (like
        # global plane/ball geometry)
        lc = P["lc"]
        nc = P["normal_coeff"]
        o = 0
        for _ in range(caps[0]):             # local contact planes
            act = lc[o] > 0.5
            nvec = lc[o + 1:o + 4]
            off, fk, fs = lc[o + 4], lc[o + 5], lc[o + 6]
            o += 7
            if keep_stages:
                stages["lcp_in"].append(f)
            disp = jnp.sum(pos * nvec, axis=0) - off
            inside = disp < 0
            fn_mag = jnp.sum(f * nvec, axis=0)
            f_n = fn_mag * nvec
            has_fric = (fs > 0) | (fk > 0)
            vdotn = jnp.sum(v * nvec, axis=0)
            v_perp = v - vdotn * nvec
            v_norm = jnp.sqrt(jnp.sum(v_perp * v_perp, axis=0))
            kinetic = v_norm > 1e-16
            fn_abs = jnp.abs(fn_mag)
            safe_vn = jnp.where(kinetic, v_norm, 1.0)
            f_kin = f - v_perp * (fk * fn_abs / safe_vn)
            f_perp = f - f_n
            fp_norm = jnp.sqrt(jnp.sum(f_perp * f_perp, axis=0))
            f_sta = jnp.where(fs * fn_abs > fp_norm, f - f_perp, f)
            f_fric = jnp.where(kinetic, f_kin, f_sta)
            f_new = jnp.where(inside & has_fric, f_fric, f)
            f_new = f_new + jnp.where(inside, -disp * nc, 0.0) * nvec
            f = jnp.where(act, f_new, f)
        for _ in range(caps[1]):             # local balls
            act = lc[o] > 0.5
            cvec = lc[o + 1:o + 4]
            rad = lc[o + 4]
            o += 5
            dvec = pos - cvec
            dist = jnp.sqrt(jnp.sum(dvec * dvec, axis=0))
            safe = jnp.where(dist > 0, dist, 1.0)
            push = jnp.where((dist <= rad) & (dist > 0), nc / safe, 0.0)
            f = jnp.where(act, f + dvec * push, f)
        for _ in range(caps[2]):             # constraint planes
            act = lc[o] > 0.5
            nvec = lc[o + 1:o + 4]
            fric = lc[o + 4]
            o += 5
            if keep_stages:
                stages["lpl_in"].append((f, v))
            # reference quirk (object.cu:118-127): |v| taken BEFORE the
            # normal component is removed, friction applied to the
            # UPDATED velocity over the OLD norm
            nf_ = jnp.sum(f * nvec, axis=0)
            f2 = f - nvec * nf_
            v_norm = jnp.sqrt(jnp.sum(v * v, axis=0))
            moving = v_norm >= 1e-16
            v2c = v - nvec * jnp.sum(v * nvec, axis=0)
            safe_vn = jnp.where(moving, v_norm, 1.0)
            f3 = f2 - fric * nf_ * v2c / safe_vn
            f = jnp.where(act, jnp.where(moving, f3, f2), f)
            v = jnp.where(act & moving, v2c, v)
        for _ in range(caps[3]):             # directions
            act = lc[o] > 0.5
            tvec = lc[o + 1:o + 4]
            fric = lc[o + 4]
            o += 5
            if keep_stages:
                stages["ldir_in"].append((f, v))
            nf_ = f - tvec * jnp.sum(f * tvec, axis=0)
            f2 = f - nf_
            v_norm = jnp.sqrt(jnp.sum(v * v, axis=0))
            moving = v_norm >= 1e-16
            nf_norm = jnp.sqrt(jnp.sum(nf_ * nf_, axis=0))
            f3 = f2 - nf_norm * fric * tvec
            f = jnp.where(act, jnp.where(moving, f3, f2), f)
            v = jnp.where(act & moving,
                          tvec * jnp.sum(v * tvec, axis=0), v)
    if P["has_drag"]:
        sq = _vdot3(v, v)
        vn = jnp.sqrt(sq)
        f = f - P["drag"] * vn * v
    if keep_stages:
        stages["v_final"] = v
    return f, v, stages


def _plane_fwd(f, pos, vel, pp, fric, normal_coeff):
    """One global contact plane (object.cu:76-109 order), identical to the
    forward kernel's plane block."""
    nx, ny, nz, off, fk, fs = pp
    disp = pos[0] * nx + pos[1] * ny + pos[2] * nz - off
    nvec = jnp.stack([jnp.full_like(disp, nx), jnp.full_like(disp, ny),
                      jnp.full_like(disp, nz)])
    inside = disp < 0
    if fric:
        fn_mag = f[0] * nx + f[1] * ny + f[2] * nz
        f_n = fn_mag * nvec
        has_fric = (fs > 0) | (fk > 0)
        vdotn = vel[0] * nx + vel[1] * ny + vel[2] * nz
        v_perp = vel - vdotn * nvec
        v_norm = jnp.sqrt(_vdot3(v_perp, v_perp))
        kinetic = v_norm > 1e-16
        fn_abs = jnp.abs(fn_mag)
        safe_vn = jnp.where(kinetic, v_norm, 1.0)
        f_kin = f - v_perp * (fk * fn_abs / safe_vn)
        f_perp = f - f_n
        fp_norm = jnp.sqrt(_vdot3(f_perp, f_perp))
        f_sta = jnp.where(fs * fn_abs > fp_norm, f - f_perp, f)
        f_fric = jnp.where(kinetic, f_kin, f_sta)
        f = jnp.where(inside & has_fric, f_fric, f)
    contact = jnp.where(inside, -disp * normal_coeff, 0.0)
    return f + contact * nvec


def _ball_fwd(f, pos, bb, normal_coeff):
    cx, cy, cz, rad = bb
    d0 = pos[0] - cx
    d1 = pos[1] - cy
    d2_ = pos[2] - cz
    dist = jnp.sqrt(d0 * d0 + d1 * d1 + d2_ * d2_)
    safe = jnp.where(dist > 0, dist, 1.0)
    push = jnp.where((dist <= rad) & (dist > 0), normal_coeff / safe, 0.0)
    return f + jnp.stack([d0, d1, d2_]) * push


def _cidx(P, s_idx, call):
    """Force-call count for the closed-form ACTUATED rest: calls are
    1-based, and RK2 runs two per step (rest advances on EVERY force
    evaluation, matching the forward kernel's double-pass quirk)."""
    if not P.get("has_actuated"):
        return None
    base = 2.0 * s_idx if P["rk2"] else s_idx
    return base + call


def forward_step(pos, vel, acc_prev, P, rg, rs, t_now=None, s_idx=0.0):
    """One Euler or Verlet step, the adjoint envelope's slice of the
    forward kernel's body (pallas_step.py:567-588).  ``s_idx`` is the
    f32 step index within the segment (only consumed by the ACTUATED
    closed-form rest).  Returns (pos2, vel2, acc)."""
    nf = 1.0 - P["fixed"]
    fx = P["fixed"]
    dt = P["dt"]
    if P["rk2"]:
        # reference RK2 (pallas_step.py:550-566, sim.cu:1778-1799):
        # midpoint predictor + corrector, two force passes per dt; the
        # constraint-mutated velocities vel1/vel2 feed the predictor and
        # the position update (with no local constraints vel1 == vel and
        # vel2 == vel_h)
        f1, vel1, _ = _force(pos, vel, P, rg, rs, t_now,
                             cidx=_cidx(P, s_idx, 1.0))
        acc1 = f1 * P["minv"]
        pos_h = (pos + 0.5 * vel1 * dt) * nf + pos * fx
        vel_h = (vel1 + 0.5 * acc1 * dt) * nf + vel1 * fx
        t_h = None if t_now is None else t_now + 0.5 * dt
        f2, vel2, _ = _force(pos_h, vel_h, P, rg, rs, t_h,
                             cidx=_cidx(P, s_idx, 2.0))
        acc = f2 * P["minv"]
        v2 = (vel1 + acc * dt) * nf + vel * fx
        pos2 = pos + vel2 * dt * nf
        acc_out = acc * nf + acc_prev * fx
        return pos2, v2, acc_out
    f, vel_m, _ = _force(pos, vel, P, rg, rs, t_now,
                         cidx=_cidx(P, s_idx, 1.0))
    acc = f * P["minv"]
    if P["verlet"]:
        # reference 'Verlet' (sim.cu:1350-1354)
        v2 = vel_m + 0.5 * (acc_prev + acc) * dt
        v2 = v2 * nf + vel * fx
        pos2 = pos + (v2 * dt + 0.5 * acc * dt * dt) * nf
    else:
        v2 = vel_m + acc * dt
        if P["clamp"]:
            vn = jnp.sqrt(_vdot3(v2, v2))
            v2 = jnp.where(vn > 1.0, v2 / jnp.where(vn > 0, vn, 1.0), v2)
        v2 = v2 * nf + vel * fx
        pos2 = pos + v2 * dt * nf
    acc_out = acc * nf + acc_prev * fx
    return pos2, v2, acc_out


def _bars_accumulate(dst, src):
    """dst += src for the per-force-pass gradient bars (RK2 runs two
    force transposes per step)."""
    for key, v in src.items():
        if key not in dst:
            dst[key] = v
        elif isinstance(v, list):
            dst[key] = [a + b for a, b in zip(dst[key], v)]
        else:
            dst[key] = dst[key] + v


def backward_rk2_pass2(pos, vel, gpos2, gvel2, gacc2, P1, P2, rg, rs,
                       t_now=None, s_idx=0.0):
    """Pass-2 half of the RK2 transpose, split at the midpoint.

    Identical math to backward_step's RK2 branch up to (and including)
    the pass-2 force transpose, but it STOPS there and returns the raw
    midpoint cotangents plus the recomputed midpoint primal -- the
    caller may inject additional midpoint cotangent (the tiled glue
    adjoint adds jax.vjp of the per-pass glue evaluated at (pos_h,
    vel_h)) before finishing with backward_rk2_pass1.  ``P1``/``P2``
    differ only in ``cf`` (per-pass glue constant force); composing the
    two halves with P1 == P2 and no injection reproduces backward_step
    exactly (test-pinned).

    Returns (pos_h, vel_h, gpos_h, gv_h, bars2); bars2 carries pass-2's
    cf bar (the glue-b cotangent) and minv part."""
    nf = 1.0 - P1["fixed"]
    fx = P1["fixed"]
    dt = P1["dt"]
    c1, c2 = _cidx(P1, s_idx, 1.0), _cidx(P1, s_idx, 2.0)
    # pass-1 force only feeds the midpoint recompute here; its stages are
    # consumed by backward_rk2_pass1, not this half -- don't stash them.
    f1, vel1, _ = _force(pos, vel, P1, rg, rs, t_now,
                         keep_stages=False, cidx=c1)
    acc1 = f1 * P1["minv"]
    pos_h = (pos + 0.5 * vel1 * dt) * nf + pos * fx
    vel_h = (vel1 + 0.5 * acc1 * dt) * nf + vel1 * fx
    t_h = None if t_now is None else t_now + 0.5 * dt
    f2, _vel2, st2 = _force(pos_h, vel_h, P2, rg, rs, t_h,
                            keep_stages=True, cidx=c2)
    gvel2ct = gpos2 * (dt * nf)
    gacc = gacc2 * nf + gvel2 * (dt * nf)
    gf2 = gacc * P2["minv"]
    minv_bar = jnp.sum(gacc * f2, axis=0, keepdims=True)
    gpos_h, gv_h, bars = _force_transpose(pos_h, vel_h, gf2, gvel2ct,
                                          P2, rg, rs, t_h, st2, cidx=c2)
    bars["minv"] = minv_bar
    return pos_h, vel_h, gpos_h, gv_h, bars


def backward_rk2_pass1(pos, vel, gph, gvh, gvel2, P1, rg, rs,
                       t_now=None, s_idx=0.0):
    """Pass-1 half of the split RK2 transpose: ``gph``/``gvh`` are the
    (possibly glue-augmented) midpoint cotangents from
    backward_rk2_pass2, ``gvel2`` the step-output vel cotangent (its
    nf part feeds the pass-1 mutated vel1).  Returns (gp_c, gv_c,
    bars1) -- the caller finishes with

        gpos  = gpos2 + gph + gp_c   (+ the glue-a pos cotangent)
        gvel  = gvel2 * fx + gv_c    (+ the glue-a vel cotangent)
        gacc  = gacc2 * fx
    """
    nf = 1.0 - P1["fixed"]
    dt = P1["dt"]
    c1 = _cidx(P1, s_idx, 1.0)
    f1, _vel1, st1 = _force(pos, vel, P1, rg, rs, t_now,
                            keep_stages=True, cidx=c1)
    gvel1 = gvel2 * nf + gvh + gph * (0.5 * dt * nf)
    gacc1 = gvh * (0.5 * dt * nf)
    gf1 = gacc1 * P1["minv"]
    minv_bar = jnp.sum(gacc1 * f1, axis=0, keepdims=True)
    gp_c, gv_c, bars = _force_transpose(pos, vel, gf1, gvel1, P1, rg,
                                        rs, t_now, st1, cidx=c1)
    bars["minv"] = minv_bar
    return gp_c, gv_c, bars


def backward_step(pos, vel, gpos2, gvel2, gacc2, P, rg, rs, t_now=None,
                  s_idx=0.0):
    """Transpose of forward_step at primal (pos, vel): given cotangents of
    (pos2, vel2, acc_out), produce cotangents of (pos, vel, acc_prev) plus
    param-gradient increments.  Recomputes the forward force pipeline
    (standard recompute-adjoint; the trace stores only pos/vel).

    Hand-derived and pinned against jax.vjp of forward_step under jnp
    rolls in tests/test_adjoint.py (both force forms, every constraint
    variant)."""
    nf = 1.0 - P["fixed"]
    fx = P["fixed"]
    dt = P["dt"]
    if P["rk2"]:
        # reference RK2 (sim.cu:1778-1799): two force passes per dt; the
        # midpoint primal is recomputed from the traced (pos, vel), and
        # each pass gets its own force transpose.  The pass-1 mutated
        # velocity vel1 feeds the predictor; the pass-2 mutated vel2
        # feeds the position update -- each pass's vel cotangent threads
        # through its own force transpose.
        c1, c2 = _cidx(P, s_idx, 1.0), _cidx(P, s_idx, 2.0)
        f1, vel1, st1 = _force(pos, vel, P, rg, rs, t_now,
                               keep_stages=True, cidx=c1)
        acc1 = f1 * P["minv"]
        pos_h = (pos + 0.5 * vel1 * dt) * nf + pos * fx
        vel_h = (vel1 + 0.5 * acc1 * dt) * nf + vel1 * fx
        t_h = None if t_now is None else t_now + 0.5 * dt
        f2, _vel2, st2 = _force(pos_h, vel_h, P, rg, rs, t_h,
                                keep_stages=True, cidx=c2)
        # integrate transpose: v2 = (vel1 + acc dt) nf + vel fx;
        # pos2 = pos + vel2 dt nf; acc_out = acc nf + accp fx
        gpos = gpos2 + 0.0
        gacc_prev = gacc2 * fx
        gvel2ct = gpos2 * (dt * nf)       # cotangent on the mutated vel2
        gvel1 = gvel2 * nf
        gvel0 = gvel2 * fx
        gacc = gacc2 * nf + gvel2 * (dt * nf)
        gf2 = gacc * P["minv"]
        minv_bar = jnp.sum(gacc * f2, axis=0, keepdims=True)
        gpos_h, gv_h, bars = _force_transpose(pos_h, vel_h, gf2, gvel2ct,
                                              P, rg, rs, t_h, st2, cidx=c2)
        # vel_h = (vel1 + 0.5 acc1 dt) nf + vel1 fx; pos_h likewise in pos
        gvel1 = gvel1 + gv_h + gpos_h * (0.5 * dt * nf)
        gacc1 = gv_h * (0.5 * dt * nf)
        gpos = gpos + gpos_h
        gf1 = gacc1 * P["minv"]
        minv_bar = minv_bar + jnp.sum(gacc1 * f1, axis=0, keepdims=True)
        gp_c, gv_c, bars1 = _force_transpose(pos, vel, gf1, gvel1, P, rg,
                                             rs, t_now, st1, cidx=c1)
        _bars_accumulate(bars, bars1)
        bars["minv"] = minv_bar
        return gpos + gp_c, gvel0 + gv_c, gacc_prev, bars

    c1 = _cidx(P, s_idx, 1.0)
    f_final, vel_m, st = _force(pos, vel, P, rg, rs, t_now,
                                keep_stages=True, cidx=c1)
    acc = f_final * P["minv"]

    # ---- integrate transpose ----
    gpos = gpos2 + 0.0
    gv2 = gvel2 + gpos2 * (dt * nf)
    if P["verlet"]:
        gvel0 = gv2 * fx
        gvel_mut = gv2 * nf
        gacc_prev = gacc2 * fx + gv2 * (0.5 * dt * nf)
        gacc = (gacc2 * nf + gv2 * (0.5 * dt * nf)
                + gpos2 * (0.5 * dt * dt * nf))
    else:
        gacc_prev = gacc2 * fx
        gacc = gacc2 * nf
        gvel0 = gv2 * fx
        gv2c = gv2 * nf
        if P["clamp"]:
            v1 = vel_m + acc * dt
            vn2 = _vdot3(v1, v1)
            vn = jnp.sqrt(jnp.where(vn2 > 0, vn2, 1.0))
            over = (vn2 > 0) & (vn > 1.0)
            invn = 1.0 / vn
            dot_ = _vdot3(v1, gv2c)
            gv1 = jnp.where(over, invn * gv2c - ((invn ** 3) * dot_) * v1,
                            gv2c)
        else:
            gv1 = gv2c
        gvel_mut = gv1
        gacc = gacc + gv1 * dt
    gf = gacc * P["minv"]
    gp_c, gv_c, bars = _force_transpose(pos, vel, gf, gvel_mut, P, rg, rs,
                                        t_now, st, cidx=c1)
    bars["minv"] = jnp.sum(gacc * f_final, axis=0, keepdims=True)
    return gpos + gp_c, gvel0 + gv_c, gacc_prev, bars


def _force_transpose(pos, vel, gf, gvel_mut, P, rg, rs, t_now, st,
                     cidx=None):
    """Transpose of _force at primal (pos, vel) for output cotangents
    ``gf`` (on the force) and ``gvel_mut`` (on the constraint-mutated
    velocity the integrator consumed): returns (gpos contribution,
    gvel contribution on the INPUT vel, param bars).  ``st`` is the
    matching _force(..., keep_stages=True) stages."""
    gpos = jnp.zeros_like(pos)
    bars = {}
    nc = P["normal_coeff"]
    # running cotangent on the (possibly constraint-mutated) velocity;
    # after the reversed local-constraint sweep it is the cotangent on
    # the input vel
    gv = gvel_mut + 0.0

    # ---- drag transpose (consumes the final mutated velocity) ----
    if P["has_drag"]:
        vF = st["v_final"]
        sq = _vdot3(vF, vF)
        vn = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
        vnm = jnp.where(sq > 0, vn, 0.0)
        dotv = _vdot3(vF, gf)
        gv = gv - P["drag"] * (vnm * gf
                               + jnp.where(sq > 0, dotv / vn, 0.0) * vF)
        bars["drag"] = -(vnm * dotv)[None]

    # ---- local constraints transpose (reverse of the forward order:
    # directions, constraint planes, balls, contact planes) ----
    caps = P.get("caps") or (0, 0, 0, 0)
    if any(caps):
        lc = P["lc"]
        ball_base = 7 * caps[0]
        pl_base = ball_base + 5 * caps[1]
        dir_base = pl_base + 5 * caps[2]
        for idx in reversed(range(caps[3])):         # directions
            o = dir_base + idx * 5
            act = lc[o] > 0.5
            tvec = lc[o + 1:o + 4]
            fric = lc[o + 4]
            f_in, v_in = st["ldir_in"][idx]
            nfv = f_in - tvec * _vdot3(f_in, tvec)
            v_norm = jnp.sqrt(_vdot3(v_in, v_in))
            moving = v_norm >= 1e-16
            nf_norm = jnp.sqrt(_vdot3(nfv, nfv))
            # v_out = where(act & moving, tvec * dot(v_in, tvec), v_in)
            selv = act & moving
            gtd = jnp.where(selv, gv, 0.0)
            gv = jnp.where(selv, 0.0, gv) + tvec * _vdot3(tvec, gtd)
            # f_out = where(act, where(moving, f3, f2), f_in);
            # f3 = f2 - nf_norm * fric * tvec;  f2 = f_in - nfv
            gf3 = jnp.where(act & moving, gf, 0.0)
            gf2 = gf3 + jnp.where(act & ~moving, gf, 0.0)
            gf_keep = jnp.where(~act, gf, 0.0)
            gnf_norm = -fric * _vdot3(tvec, gf3)
            gnfv = (jnp.where(nf_norm > 0,
                              gnf_norm
                              / jnp.where(nf_norm > 0, nf_norm, 1.0),
                              0.0) * nfv - gf2)
            gf = (gf_keep + gf2
                  + (gnfv - tvec * _vdot3(tvec, gnfv)))
        for idx in reversed(range(caps[2])):         # constraint planes
            o = pl_base + idx * 5
            act = lc[o] > 0.5
            nvec = lc[o + 1:o + 4]
            fric = lc[o + 4]
            f_in, v_in = st["lpl_in"][idx]
            nf_ = _vdot3(f_in, nvec)
            v_norm = jnp.sqrt(_vdot3(v_in, v_in))
            moving = v_norm >= 1e-16
            vdn = _vdot3(v_in, nvec)
            v2c = v_in - nvec * vdn
            safe = jnp.where(moving, v_norm, 1.0)
            # v_out = where(act & moving, v2c, v_in)
            selv = act & moving
            gv2c = jnp.where(selv, gv, 0.0)
            gv = jnp.where(selv, 0.0, gv)
            # f_out = where(act, where(moving, f3, f2), f_in);
            # f3 = f2 - fric * nf_ * v2c / safe;  f2 = f_in - nvec * nf_
            gf3 = jnp.where(act & moving, gf, 0.0)
            gf2 = gf3 + jnp.where(act & ~moving, gf, 0.0)
            gf_keep = jnp.where(~act, gf, 0.0)
            s = fric / safe
            gnf = -s * _vdot3(v2c, gf3)
            gv2c = gv2c - (s * nf_) * gf3
            gsafe = fric * nf_ * _vdot3(v2c, gf3) / (safe * safe)
            gv_norm = jnp.where(moving, gsafe, 0.0)
            gv = gv + gv2c - nvec * _vdot3(nvec, gv2c)
            gv = gv + (jnp.where(v_norm > 0,
                                 gv_norm
                                 / jnp.where(v_norm > 0, v_norm, 1.0),
                                 0.0) * v_in)
            gnf = gnf - _vdot3(nvec, gf2)
            gf = gf_keep + gf2 + gnf * nvec
        for idx in reversed(range(caps[1])):         # local balls
            o = ball_base + idx * 5
            act = lc[o] > 0.5
            cvec = lc[o + 1:o + 4]
            rad = lc[o + 4]
            dvec = pos - cvec
            dist = jnp.sqrt(_vdot3(dvec, dvec))
            safe = jnp.where(dist > 0, dist, 1.0)
            hit = (dist <= rad) & (dist > 0)
            push = jnp.where(hit, nc / safe, 0.0)
            # f_out = f_in + where(act, dvec * push, 0)
            geff = jnp.where(act, gf, 0.0)
            gpush = _vdot3(dvec, geff)
            gdvec = push * geff
            gdist = jnp.where(hit, -nc * gpush / (safe * safe), 0.0)
            gdvec = gdvec + (gdist / safe) * dvec
            gpos = gpos + gdvec
        for idx in reversed(range(caps[0])):         # local contact planes
            o = idx * 7
            act = lc[o] > 0.5
            nvec = lc[o + 1:o + 4]
            off, fk, fs = lc[o + 4], lc[o + 5], lc[o + 6]
            f_in = st["lcp_in"][idx]
            # recompute the forward intermediates (contact planes precede
            # every vel mutation, so the friction velocity is the input
            # vel itself)
            disp = _vdot3(pos, nvec) - off
            inside = disp < 0
            fn_mag = _vdot3(f_in, nvec)
            has_fric = (fs > 0) | (fk > 0)
            vdotn = _vdot3(vel, nvec)
            v_perp = vel - vdotn * nvec
            v_norm = jnp.sqrt(_vdot3(v_perp, v_perp))
            kinetic = v_norm > 1e-16
            fn_abs = jnp.abs(fn_mag)
            safe_vn = jnp.where(kinetic, v_norm, 1.0)
            f_perp = f_in - fn_mag * nvec
            fp_norm = jnp.sqrt(_vdot3(f_perp, f_perp))
            sta_hold = fs * fn_abs > fp_norm
            # f_out = where(act, f_new, f_in)
            gnew = jnp.where(act, gf, 0.0)
            gf = jnp.where(~act, gf, 0.0)
            # contact term: + where(inside, -disp*nc, 0) * nvec
            gcontact = _vdot3(gnew, nvec)
            gdisp = jnp.where(inside, -nc * gcontact, 0.0)
            gpos = gpos + gdisp * nvec
            # friction select: f_new(pre-contact) =
            # where(inside & has_fric, f_fric, f_in)
            sel = inside & has_fric
            gf_fric = jnp.where(sel, gnew, 0.0)
            gf = gf + jnp.where(sel, 0.0, gnew)
            gf_kin = jnp.where(kinetic, gf_fric, 0.0)
            gf_sta = jnp.where(kinetic, 0.0, gf_fric)
            # f_sta = where(hold, f_in - f_perp, f_in)
            gf = gf + gf_sta
            gf_perp = jnp.where(sta_hold, -gf_sta, 0.0)
            # f_perp = f_in - f_n
            gf = gf + gf_perp
            gf_n = -gf_perp
            # f_kin = f_in - v_perp * s,  s = fk*fn_abs/safe_vn
            gf = gf + gf_kin
            s = fk * fn_abs / safe_vn
            gs = -_vdot3(v_perp, gf_kin)
            gv_perp = -s * gf_kin
            gfn_abs = fk * gs / safe_vn
            gsafe_vn = -fk * fn_abs * gs / (safe_vn * safe_vn)
            gv_norm = jnp.where(kinetic, gsafe_vn, 0.0)
            gv_perp = gv_perp + jnp.where(v_norm > 0,
                                          gv_norm / safe_vn, 0.0) * v_perp
            # v_perp = vel - vdotn*nvec
            gv = gv + gv_perp
            gvdotn = -_vdot3(nvec, gv_perp)
            gv = gv + gvdotn * nvec
            # f_n = fn_mag*nvec; fn_abs = |fn_mag|; fn_mag = dot(f_in, n)
            gfn_mag = _vdot3(gf_n, nvec) + jnp.sign(fn_mag) * gfn_abs
            gf = gf + gfn_mag * nvec
    # past the local block the running cotangent IS the input-vel one
    gvel = gv

    # ---- balls transpose (reverse order) ----
    for bb in reversed(P["balls"]):
        cx, cy, cz, rad = bb
        dvec = jnp.stack([pos[0] - cx, pos[1] - cy, pos[2] - cz])
        dist = jnp.sqrt(_vdot3(dvec, dvec))
        safe = jnp.where(dist > 0, dist, 1.0)
        active = (dist <= rad) & (dist > 0)
        push = jnp.where(active, nc / safe, 0.0)
        gpush = _vdot3(dvec, gf)
        gdvec = push * gf
        gdist = jnp.where(active, -nc * gpush / (safe * safe), 0.0)
        gdvec = gdvec + (gdist / safe) * dvec
        gpos = gpos + gdvec
        # gf passes through unchanged (f_out = f_in + dvec*push)

    # ---- planes transpose (reverse order) ----
    for p in range(len(P["planes"]) - 1, -1, -1):
        pp = P["planes"][p]
        f_in = st["plane_in"][p]
        nx, ny, nz, off, fk, fs = pp
        disp = pos[0] * nx + pos[1] * ny + pos[2] * nz - off
        nvec = jnp.stack([jnp.full_like(disp, nx), jnp.full_like(disp, ny),
                          jnp.full_like(disp, nz)])
        inside = disp < 0
        gcontact = _vdot3(gf, nvec)
        gdisp = jnp.where(inside, -nc * gcontact, 0.0)
        gpos = gpos + gdisp * nvec
        if P["plane_friction"][p]:
            f = f_in
            fn_mag = f[0] * nx + f[1] * ny + f[2] * nz
            f_n = fn_mag * nvec
            has_fric = (fs > 0) | (fk > 0)
            vdotn = vel[0] * nx + vel[1] * ny + vel[2] * nz
            v_perp = vel - vdotn * nvec
            v_norm = jnp.sqrt(_vdot3(v_perp, v_perp))
            kinetic = v_norm > 1e-16
            fn_abs = jnp.abs(fn_mag)
            safe_vn = jnp.where(kinetic, v_norm, 1.0)
            f_perp = f - f_n
            fp_norm = jnp.sqrt(_vdot3(f_perp, f_perp))
            sta_hold = fs * fn_abs > fp_norm
            sel = inside & has_fric
            gf1 = gf
            gf_fric = jnp.where(sel, gf1, 0.0)
            gf = jnp.where(sel, 0.0, gf1)
            gf_kin = jnp.where(kinetic, gf_fric, 0.0)
            gf_sta = jnp.where(kinetic, 0.0, gf_fric)
            # f_sta = where(hold, f - f_perp, f)
            gf = gf + gf_sta
            gf_perp = jnp.where(sta_hold, -gf_sta, 0.0)
            # f_perp = f - f_n
            gf = gf + gf_perp
            gf_n = -gf_perp
            # f_kin = f - v_perp * s,  s = fk*fn_abs/safe_vn
            gf = gf + gf_kin
            s = fk * fn_abs / safe_vn
            gs = -_vdot3(v_perp, gf_kin)
            gv_perp = -s * gf_kin
            gfn_abs = fk * gs / safe_vn
            gsafe_vn = -fk * fn_abs * gs / (safe_vn * safe_vn)
            gv_norm = jnp.where(kinetic, gsafe_vn, 0.0)
            gv_perp = gv_perp + jnp.where(v_norm > 0,
                                          gv_norm / safe_vn, 0.0) * v_perp
            # v_perp = vel - vdotn*nvec
            gvel = gvel + gv_perp
            gvdotn = -_vdot3(nvec, gv_perp)
            gvel = gvel + gvdotn * nvec
            # f_n = fn_mag*nvec; fn_abs = |fn_mag|; fn_mag = dot(f, n)
            gfn_mag = _vdot3(gf_n, nvec) + jnp.sign(fn_mag) * gfn_abs
            gf = gf + gfn_mag * nvec

    # ---- magnets transpose (recompute per source row, like the forward
    # sweep; additive in f, so gf passes through unchanged) ----
    if P.get("has_magnets"):
        mag = P["mag"]
        rows_m = pos.shape[1]
        rrad, rstiff, rmaxf, rvalid = mag[0], mag[1], mag[2], mag[4]
        cutoff = P["magnet_cutoff"]
        ridx = (jax.lax.broadcasted_iota(jnp.int32, (rows_m, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (rows_m, 128), 1))
        gfm = gf * (1.0 - P["fixed"])                # [3, R, 128]
        g_rad = jnp.zeros_like(rrad)
        g_stiff = jnp.zeros_like(rrad)
        g_maxf = jnp.zeros_like(rrad)
        src_rad, src_scale = [], []                  # per-source-row [128]
        src_g = [[], [], []]
        for sr in range(rows_m):
            # recompute the forward row sweep's intermediates
            d0 = pos[0][:, :, None] - pos[0, sr][None, None, :]
            d1 = pos[1][:, :, None] - pos[1, sr][None, None, :]
            d2m = pos[2][:, :, None] - pos[2, sr][None, None, :]
            dist2 = d0 * d0 + d1 * d1 + d2m * d2m
            pos_d = dist2 > 0
            dist = jnp.where(
                pos_d, jnp.sqrt(jnp.where(pos_d, dist2, 1.0)), 0.0)
            safe = jnp.where(dist > 0, dist, 1.0)
            sidx = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
                    + sr * 128)
            ok = (dist < cutoff) & (ridx[:, :, None] != sidx)
            okf = rvalid[:, :, None] * mag[4, sr][None, None, :]
            inter = dist - (rrad[:, :, None] + mag[0, sr][None, None, :])
            shell = jnp.where(inter < 0,
                              jnp.abs(inter) * rstiff[:, :, None], 0.0)
            md = jnp.maximum(dist2, 1e-12)
            sscale = mag[3, sr][None, None, :]
            attract = sscale * rmaxf[:, :, None] / md
            coeff = jnp.where(ok, (shell - attract) / safe, 0.0) * okf
            # fm_c += sum_s d_c * coeff
            gcoeff = (d0 * gfm[0][:, :, None] + d1 * gfm[1][:, :, None]
                      + d2m * gfm[2][:, :, None])
            gd0 = coeff * gfm[0][:, :, None]
            gd1 = coeff * gfm[1][:, :, None]
            gd2 = coeff * gfm[2][:, :, None]
            # coeff = where(ok, (shell - attract)/safe, 0) * okf
            gsa = gcoeff * okf
            gshell = jnp.where(ok, gsa / safe, 0.0)
            gattr = -gshell
            gsafe = jnp.where(ok, -(shell - attract) * gsa / (safe * safe),
                              0.0)
            # shell = where(inter < 0, -inter * rstiff, 0)
            ginter = jnp.where(inter < 0, -rstiff[:, :, None] * gshell,
                               0.0)
            g_stiff = g_stiff + jnp.sum(
                jnp.where(inter < 0, -inter * gshell, 0.0), axis=2)
            g_rad = g_rad - jnp.sum(ginter, axis=2)
            src_rad.append(-jnp.sum(ginter, axis=(0, 1)))
            gdist = ginter
            # attract = sscale * rmaxf / max(dist2, 1e-12)
            g_maxf = g_maxf + jnp.sum(gattr * sscale / md, axis=2)
            src_scale.append(jnp.sum(gattr * rmaxf[:, :, None] / md,
                                     axis=(0, 1)))
            gdist2 = jnp.where(dist2 > 1e-12,
                               -gattr * sscale * rmaxf[:, :, None]
                               / (md * md), 0.0)
            # safe = where(dist > 0, dist, 1); dist = guarded sqrt(dist2)
            gdist = gdist + jnp.where(dist > 0, gsafe, 0.0)
            gdist2 = gdist2 + jnp.where(
                dist > 0, 0.5 * gdist / jnp.where(pos_d, dist, 1.0), 0.0)
            gd0 = gd0 + 2.0 * d0 * gdist2
            gd1 = gd1 + 2.0 * d1 * gdist2
            gd2 = gd2 + 2.0 * d2m * gdist2
            # d_c = pos_recv[c] - pos_src[c, sr]
            gpos = gpos + jnp.stack([jnp.sum(gd0, axis=2),
                                     jnp.sum(gd1, axis=2),
                                     jnp.sum(gd2, axis=2)])
            src_g[0].append(-jnp.sum(gd0, axis=(0, 1)))
            src_g[1].append(-jnp.sum(gd1, axis=(0, 1)))
            src_g[2].append(-jnp.sum(gd2, axis=(0, 1)))
        gpos = gpos + jnp.stack([jnp.stack(src_g[c]) for c in range(3)])
        bars["mag_rad"] = g_rad + jnp.stack(src_rad)
        bars["mag_stiffness"] = g_stiff
        bars["mag_maxf"] = g_maxf
        bars["mag_scale"] = jnp.stack(src_scale)

    # ---- spring families transpose (recompute per family) ----
    nfam = len(P["deltas"])
    gk = [None] * nfam
    grest = [None] * nfam
    gdamp = [None] * nfam if P["has_damping"] else None
    gomega = [None] * nfam if P["has_breathing"] else None
    garate = [None] * nfam if P.get("has_actuated") else None
    for fi, d in enumerate(P["deltas"]):
        pr = rg(pos, d)
        diff = pr - pos
        rest_b = P["rest"][fi]
        advc = None
        if P.get("has_actuated"):
            # closed-form ACTUATED rest after cidx force calls (module
            # docstring); aratedt = 0 on non-actuated springs
            advc = jnp.minimum(cidx, P["sstop"][fi])
            rest_b = rest_b + advc * P["aratedt"][fi]
        if P["has_breathing"]:
            # rest_eff = rest_b * scale, scale = 1 + bsign sin(bomega t)
            sin_t = jnp.sin(P["bomega"][fi] * t_now)
            scale = 1.0 + P["bsign"][fi] * sin_t
            rest = rest_b * scale
        else:
            scale = None
            rest = rest_b
        k = P["k"][fi]
        if st["fam"] is not None:
            # scalar intermediates stashed by the pass-A recompute; the
            # guards d2 > 0 / ln > 0 are equivalent to inv > 0 (guarded
            # inv is zero exactly at d2 == 0)
            inv = st["fam"]["inv"][fi]
            ln = st["fam"]["ln"][fi]
            cm = st["fam"]["cm"][fi]
            ax = st["fam"]["ax"][fi]
        else:
            # TITAN_ADJ_STASH=off A/B hook: recompute them (the round-3
            # pre-stash form)
            d2 = _vdot3(diff, diff)
            inv, ln = _inv_len(d2, P)
            ax = None
            if P["fmath_shared"]:
                cm = k * (rest * inv - 1.0)
                if P["has_damping"]:
                    ax = _vdot3(vel - rg(vel, d), diff)
                    cm = cm + (ax * P["damping"][fi]) * (inv * inv)
            else:
                cm = k * (rest - ln)
                if P["has_damping"]:
                    ax = _vdot3(vel - rg(vel, d), diff)
                    cm = cm + (ax * inv) * P["damping"][fi]
        # f_acc += -f + rs(f, d)  =>  fbar = -g + rg(g, d)
        fbar = -gf + rg(gf, d)
        if P["fmath_shared"]:
            cbar = _vdot3(fbar, diff)
            dbar = cm * fbar
            gk[fi] = cbar * (rest * inv - 1.0)
            resteffbar = cbar * k * inv
            invbar = cbar * k * rest
            if P["has_damping"]:
                axdot = ax
                vr = rg(vel, d)
                dmp = P["damping"][fi]
                axbar = cbar * dmp * (inv * inv)
                invbar = invbar + cbar * axdot * dmp * 2.0 * inv
                gdamp[fi] = cbar * axdot * (inv * inv)
                dbar = dbar + axbar * (vel - vr)
                gvel = gvel + axbar * diff + rs(-(axbar * diff), d)
            d2bar = jnp.where(inv > 0, -0.5 * invbar * inv * inv * inv,
                              0.0)
        else:
            cbar = _vdot3(fbar, diff)
            dbar = (cm * inv) * fbar
            magbar = cbar * inv
            invbar = cbar * cm
            gk[fi] = magbar * (rest - ln)
            resteffbar = magbar * k
            lnbar = -magbar * k
            if P["has_damping"]:
                ax_a = ax
                vr = rg(vel, d)
                dmp = P["damping"][fi]
                axialbar = magbar * dmp
                abar = axialbar * inv
                invbar = invbar + axialbar * ax_a
                gdamp[fi] = magbar * (ax_a * inv)
                dbar = dbar + abar * (vel - vr)
                gvel = gvel + abar * diff + rs(-(abar * diff), d)
            # inv = 1/ln (guarded); ln = sqrt(d2) (guarded)
            lnbar = lnbar - jnp.where(ln > 0, invbar * inv * inv, 0.0)
            d2bar = jnp.where(inv > 0, 0.5 * lnbar * inv, 0.0)
        if P["has_breathing"]:
            restbbar = resteffbar * scale
            scalebar = resteffbar * rest_b
            gomega[fi] = (scalebar * P["bsign"][fi]
                          * jnp.cos(P["bomega"][fi] * t_now) * t_now)
        else:
            restbbar = resteffbar
        grest[fi] = restbbar
        if P.get("has_actuated"):
            # rest_b = rest0 + advc * aratedt  (advc piecewise-constant)
            garate[fi] = restbbar * advc
        dbar = dbar + 2.0 * diff * d2bar
        gpos = gpos - dbar + rs(dbar, d)
    if P.get("has_remainder"):
        # remainder springs transpose: gather^T == scatter, so the
        # cotangent flow reuses the forward's two MXU primitives
        # (pallas_step.remainder_gather/scatter).  Mirrors the stencil
        # legacy-force-form branch above, on [S, 1] / [2S, 3] shapes.
        from .pallas_step import remainder_gather, remainder_scatter
        S = P["n_rem"]
        rsel = P["rowsel"][:]
        lsel = P["lanesel"][:]
        remp = P["remp"]
        sr = st["rem"]
        g, inve, lne, mage = sr["g"], sr["inve"], sr["lne"], sr["mage"]
        diffe = g[S:] - g[:S]
        reste = sr["reste"]
        k_e = remp[0]
        # f += scatter(fboth), fboth = [-fe; fe]  =>  gfe = gather(gf)
        # differenced across the endpoint halves
        gfb = remainder_gather(rsel, lsel, gf)       # [2S, 3]
        gfe = gfb[S:] - gfb[:S]                      # cotangent on fe
        # fe = (mage * inve) * diffe
        cbar = jnp.sum(gfe * diffe, axis=1, keepdims=True)
        dbar_e = (mage * inve) * gfe
        magbar = cbar * inve
        invbar = cbar * mage
        gk_e = magbar * (reste - lne)
        restebar = magbar * k_e
        lnbar = -magbar * k_e
        gdamp_e = gomega_e = garate_e = None
        if P["has_damping"]:
            gv, axde = sr["gv"], sr["axde"]
            axiale = axde * inve
            dmp_e = remp[2]
            axialbar = magbar * dmp_e
            gdamp_e = magbar * axiale
            abar = axialbar * inve                   # cotangent on axde
            invbar = invbar + axialbar * axde
            dbar_e = dbar_e + abar * (gv[:S] - gv[S:])
            ggv = jnp.concatenate([abar * diffe, -(abar * diffe)], axis=0)
            gvel = gvel + remainder_scatter(rsel, lsel, ggv)
        if P["has_breathing"]:
            # reste = reste_b * scale; reste_b recomputed (cheap [S, 1])
            sin_t = jnp.sin(remp[4] * t_now)
            scale = 1.0 + remp[3] * sin_t
            reste_b = remp[1]
            if P.get("has_actuated"):
                reste_b = reste_b + (jnp.minimum(cidx, P["sstop_e"][:])
                                     * P["aratedt_e"][:])
            restbbar = restebar * scale
            gomega_e = (restebar * reste_b * remp[3]
                        * jnp.cos(remp[4] * t_now) * t_now)
        else:
            restbbar = restebar
        grest_e = restbbar
        if P.get("has_actuated"):
            garate_e = restbbar * jnp.minimum(cidx, P["sstop_e"][:])
        # inv = 1/ln, ln = sqrt(d2) chains (guarded; valid for both
        # norm forms -- see the stencil branch's rationale)
        lnbar = lnbar - jnp.where(lne > 0, invbar * inve * inve, 0.0)
        d2bar = jnp.where(inve > 0, 0.5 * lnbar * inve, 0.0)
        dbar_e = dbar_e + 2.0 * diffe * d2bar
        gg = jnp.concatenate([-dbar_e, dbar_e], axis=0)
        gpos = gpos + remainder_scatter(rsel, lsel, gg)
        bars["k_e"] = gk_e
        bars["rest_e"] = grest_e
        if P["has_damping"]:
            bars["damp_e"] = gdamp_e
        if P["has_breathing"]:
            bars["omega_e"] = gomega_e
        if P.get("has_actuated"):
            bars["aratedt_e"] = garate_e
    bars["cf"] = gf
    bars["k"] = gk
    bars["rest"] = grest
    if P["has_damping"]:
        bars["damping"] = gdamp
    if P["has_breathing"]:
        bars["omega"] = gomega
    if P.get("has_actuated"):
        bars["aratedt"] = garate
    return gpos, gvel, bars


def jnp_rolls(rows: int):
    """(roll_gather, roll_scatter) under plain jnp.roll on the flattened
    trailing [R, 128] axes -- flat-index semantics identical to the
    kernel's 2-D pltpu.roll decomposition.  For tests and oracles."""
    def rg(x, d):
        flat = x.reshape(x.shape[:-2] + (rows * 128,))
        return jnp.roll(flat, -d, axis=-1).reshape(x.shape)

    def rs(x, d):
        flat = x.reshape(x.shape[:-2] + (rows * 128,))
        return jnp.roll(flat, d, axis=-1).reshape(x.shape)

    return rg, rs


def _pltpu_rolls(rows: int):
    """The forward kernel's 2-D roll decomposition, shared so the trace
    replay stays bitwise-equal to the fused chunk (pallas_step.make_rolls;
    the TITAN_ABLATE hook deliberately stays forward-kernel-only)."""
    from .pallas_step import make_rolls
    return make_rolls(rows)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _static_flags(shape: SceneShape):
    from .forces import use_rsqrt
    rsqrt_norms = use_rsqrt(jnp.float32)
    fmath_shared = (rsqrt_norms
                    and os.environ.get("TITAN_FMATH", "") != "legacy")
    return rsqrt_norms, fmath_shared


def _make_P(shape: SceneShape, k_ref, rest_ref, damp_ref, minv, fixed, cf,
            drag, plane_ref, ball_ref, dt, bsign=None, bomega=None,
            aratedt=None, sstop=None, lc=None, famstash=True,
            rowsel=None, lanesel=None, remp=None, aratedt_e=None,
            sstop_e=None, mag=None):
    rsqrt_norms, fmath_shared = _static_flags(shape)
    planes = [tuple(plane_ref[p, c] for c in range(6))
              for p in range(shape.n_planes)]
    balls = [tuple(ball_ref[b, c] for c in range(4))
             for b in range(shape.n_balls)]
    return {
        "deltas": shape.stencil_deltas, "k": k_ref, "rest": rest_ref,
        "damping": damp_ref, "minv": minv, "fixed": fixed, "cf": cf,
        "drag": drag, "planes": planes,
        "plane_friction": shape.plane_friction, "balls": balls, "dt": dt,
        "clamp": shape.config.velocity_clamp,
        "verlet": shape.config.integrator is Integrator.VERLET,
        "rk2": shape.config.integrator is Integrator.RK2,
        "has_damping": shape.has_damping, "has_drag": shape.has_drag,
        "has_breathing": shape.has_breathing,
        "bsign": bsign, "bomega": bomega,
        "has_actuated": shape.has_actuated,
        "aratedt": aratedt, "sstop": sstop,
        "caps": (shape.cap_cp, shape.cap_ball, shape.cap_pl,
                 shape.cap_dir),
        "lc": lc,
        "normal_coeff": shape.config.normal_coeff,
        "rsqrt_norms": rsqrt_norms, "fmath_shared": fmath_shared,
        "famstash": famstash,
        "has_remainder": shape.has_remainder, "n_rem": shape.n_springs,
        "rowsel": rowsel, "lanesel": lanesel, "remp": remp,
        "aratedt_e": aratedt_e, "sstop_e": sstop_e,
        "has_magnets": shape.has_magnets, "mag": mag,
        "magnet_cutoff": shape.config.magnet_cutoff,
    }


def _trows(shape: SceneShape) -> int:
    """Trace-row count: rows padded up to sublane (8) alignment -- Mosaic
    manual DMAs fault on unaligned row counts (hard-won, see
    ops/pallas_tiled.py's 1024-mass window alignment)."""
    rows = shape.n_masses // 128
    return (rows + 7) // 8 * 8


def _build_trace_kernel(shape: SceneShape, seg: int):
    """Forward replay writing (pos_t, vel_t) per step to an HBM trace.
    Step t's inputs are staged into a VMEM scratch slot and DMA'd out as
    one aligned [6, TR, 128] block while the step computes."""
    rows = shape.n_masses // 128
    trows = _trows(shape)
    has_damping, has_drag = shape.has_damping, shape.has_drag
    has_breathing = shape.has_breathing
    has_actuated = shape.has_actuated
    has_local = any((shape.cap_cp, shape.cap_ball, shape.cap_pl,
                     shape.cap_dir))
    has_remainder = shape.has_remainder
    has_magnets = shape.has_magnets

    def kernel(*refs):
        (scal_ref, plane_ref, ball_ref, pos_ref, vel_ref, acc_ref,
         cf_ref, minv_ref, fixed_ref, k_ref, rest_ref) = refs[:11]
        i = 11
        damp_ref = None
        if has_damping:
            damp_ref = refs[i]
            i += 1
        drag_ref = None
        if has_drag:
            drag_ref = refs[i]
            i += 1
        bsign_ref = bomega_ref = None
        if has_breathing:
            bsign_ref, bomega_ref = refs[i], refs[i + 1]
            i += 2
        aratedt_ref = sstop_ref = None
        if has_actuated:
            aratedt_ref, sstop_ref = refs[i], refs[i + 1]
            i += 2
        lc_ref = None
        if has_local:
            lc_ref = refs[i]
            i += 1
        rowsel_ref = lanesel_ref = remp_ref = None
        aratedt_e_ref = sstop_e_ref = None
        if has_remainder:
            rowsel_ref, lanesel_ref, remp_ref = refs[i:i + 3]
            i += 3
            if has_actuated:
                aratedt_e_ref, sstop_e_ref = refs[i], refs[i + 1]
                i += 2
        mag_ref = None
        if has_magnets:
            mag_ref = refs[i]
            i += 1
        opos_ref, ovel_ref, oacc_ref, trace_ref = refs[i:i + 4]
        stage, sem = refs[i + 4], refs[i + 5]

        rg, rs = _pltpu_rolls(rows)
        P = _make_P(shape, k_ref, rest_ref, damp_ref, minv_ref[:],
                    fixed_ref[:], cf_ref[:],
                    drag_ref[:] if has_drag else None,
                    plane_ref, ball_ref, scal_ref[0],
                    bsign=bsign_ref, bomega=bomega_ref,
                    aratedt=aratedt_ref, sstop=sstop_ref, lc=lc_ref,
                    rowsel=rowsel_ref, lanesel=lanesel_ref, remp=remp_ref,
                    aratedt_e=aratedt_e_ref, sstop_e=sstop_e_ref,
                    mag=mag_ref)
        opos_ref[:] = pos_ref[:]
        ovel_ref[:] = vel_ref[:]
        oacc_ref[:] = acc_ref[:]
        if trows != rows:
            stage[:] = jnp.zeros(stage.shape, stage.dtype)

        def body(t, _):
            slot = jax.lax.rem(t, 2)
            # the DMA issued two steps ago re-reads this slot: wait first
            @pl.when(t >= 2)
            def _():
                pltpu.make_async_copy(stage.at[slot], trace_ref.at[t - 2],
                                      sem.at[slot]).wait()
            stage[slot, 0:3, 0:rows] = opos_ref[:]
            stage[slot, 3:6, 0:rows] = ovel_ref[:]
            pltpu.make_async_copy(stage.at[slot], trace_ref.at[t],
                                  sem.at[slot]).start()
            t_now = scal_ref[1] + t.astype(jnp.float32) * scal_ref[0]
            pos2, vel2, acc2 = forward_step(opos_ref[:], ovel_ref[:],
                                            oacc_ref[:], P, rg, rs, t_now,
                                            s_idx=t.astype(jnp.float32))
            opos_ref[:] = pos2
            ovel_ref[:] = vel2
            oacc_ref[:] = acc2
            return 0

        jax.lax.fori_loop(0, seg, body, 0)
        pltpu.make_async_copy(stage.at[(seg - 1) % 2],
                              trace_ref.at[seg - 1],
                              sem.at[(seg - 1) % 2]).wait()
        if seg >= 2:
            pltpu.make_async_copy(stage.at[(seg - 2) % 2],
                                  trace_ref.at[seg - 2],
                                  sem.at[(seg - 2) % 2]).wait()

    return kernel


def _build_bwd_kernel(shape: SceneShape, seg: int,
                      famstash: bool = True):
    """Reverse sweep over the trace: adjoint state and param-grad
    accumulators VMEM-resident, one (pos_t, vel_t) DMA per step
    (double-buffered: slot for t-1 issued while t computes)."""
    rows = shape.n_masses // 128
    trows = _trows(shape)
    has_damping, has_drag = shape.has_damping, shape.has_drag
    has_breathing = shape.has_breathing
    has_actuated = shape.has_actuated
    has_local = any((shape.cap_cp, shape.cap_ball, shape.cap_pl,
                     shape.cap_dir))
    has_remainder = shape.has_remainder
    has_magnets = shape.has_magnets
    nfam = len(shape.stencil_deltas)

    def kernel(*refs):
        (scal_ref, plane_ref, ball_ref, cf_ref, minv_ref, fixed_ref,
         k_ref, rest_ref) = refs[:8]
        i = 8
        damp_ref = None
        if has_damping:
            damp_ref = refs[i]
            i += 1
        drag_ref = None
        if has_drag:
            drag_ref = refs[i]
            i += 1
        bsign_ref = bomega_ref = None
        if has_breathing:
            bsign_ref, bomega_ref = refs[i], refs[i + 1]
            i += 2
        aratedt_ref = sstop_ref = None
        if has_actuated:
            aratedt_ref, sstop_ref = refs[i], refs[i + 1]
            i += 2
        lc_ref = None
        if has_local:
            lc_ref = refs[i]
            i += 1
        rowsel_ref = lanesel_ref = remp_ref = None
        aratedt_e_ref = sstop_e_ref = None
        if has_remainder:
            rowsel_ref, lanesel_ref, remp_ref = refs[i:i + 3]
            i += 3
            if has_actuated:
                aratedt_e_ref, sstop_e_ref = refs[i], refs[i + 1]
                i += 2
        mag_ref = None
        if has_magnets:
            mag_ref = refs[i]
            i += 1
        gposK_ref, gvelK_ref, gaccK_ref, trace_ref = refs[i:i + 4]
        i += 4
        gpos_ref, gvel_ref, gacc_ref = refs[i:i + 3]
        gk_ref, grest_ref = refs[i + 3], refs[i + 4]
        i += 5
        gdamp_ref = None
        if has_damping:
            gdamp_ref = refs[i]
            i += 1
        gomega_ref = None
        if has_breathing:
            gomega_ref = refs[i]
            i += 1
        garate_ref = None
        if has_actuated:
            garate_ref = refs[i]
            i += 1
        gcf_ref, gminv_ref = refs[i], refs[i + 1]
        i += 2
        gdrag_ref = None
        if has_drag:
            gdrag_ref = refs[i]
            i += 1
        gk_e_ref = grest_e_ref = None
        gdamp_e_ref = gomega_e_ref = garate_e_ref = None
        if has_remainder:
            gk_e_ref, grest_e_ref = refs[i], refs[i + 1]
            i += 2
            if has_damping:
                gdamp_e_ref = refs[i]
                i += 1
            if has_breathing:
                gomega_e_ref = refs[i]
                i += 1
            if has_actuated:
                garate_e_ref = refs[i]
                i += 1
        gmag_ref = None
        if has_magnets:
            gmag_ref = refs[i]                       # [4, R, 128]
            i += 1
        tslot, sem = refs[i], refs[i + 1]

        rg, rs = _pltpu_rolls(rows)
        P = _make_P(shape, k_ref, rest_ref, damp_ref, minv_ref[:],
                    fixed_ref[:], cf_ref[:],
                    drag_ref[:] if has_drag else None,
                    plane_ref, ball_ref, scal_ref[0],
                    bsign=bsign_ref, bomega=bomega_ref,
                    aratedt=aratedt_ref, sstop=sstop_ref, lc=lc_ref,
                    famstash=famstash,
                    rowsel=rowsel_ref, lanesel=lanesel_ref, remp=remp_ref,
                    aratedt_e=aratedt_e_ref, sstop_e=sstop_e_ref,
                    mag=mag_ref)
        gpos_ref[:] = gposK_ref[:]
        gvel_ref[:] = gvelK_ref[:]
        gacc_ref[:] = gaccK_ref[:]
        zero = lambda ref: jnp.zeros(ref.shape, ref.dtype)
        gk_ref[:] = zero(gk_ref)
        grest_ref[:] = zero(grest_ref)
        if has_damping:
            gdamp_ref[:] = zero(gdamp_ref)
        if has_breathing:
            gomega_ref[:] = zero(gomega_ref)
        if has_actuated:
            garate_ref[:] = zero(garate_ref)
        gcf_ref[:] = zero(gcf_ref)
        gminv_ref[:] = zero(gminv_ref)
        if has_drag:
            gdrag_ref[:] = zero(gdrag_ref)
        if has_remainder:
            gk_e_ref[:] = zero(gk_e_ref)
            grest_e_ref[:] = zero(grest_e_ref)
            if has_damping:
                gdamp_e_ref[:] = zero(gdamp_e_ref)
            if has_breathing:
                gomega_e_ref[:] = zero(gomega_e_ref)
            if has_actuated:
                garate_e_ref[:] = zero(garate_e_ref)
        if has_magnets:
            gmag_ref[:] = zero(gmag_ref)

        def issue(t, slot):
            pltpu.make_async_copy(trace_ref.at[t], tslot.at[slot],
                                  sem.at[slot]).start()

        issue(seg - 1, 0)

        def body(ii, _):
            t = seg - 1 - ii
            slot = jax.lax.rem(ii, 2)
            pltpu.make_async_copy(trace_ref.at[t], tslot.at[slot],
                                  sem.at[slot]).wait()

            @pl.when(t > 0)
            def _():
                issue(t - 1, 1 - slot)

            tv = tslot[slot]
            pos, vel = tv[0:3, 0:rows], tv[3:6, 0:rows]
            t_now = scal_ref[1] + t.astype(jnp.float32) * scal_ref[0]
            gpos, gvel, gacc_prev, bars = backward_step(
                pos, vel, gpos_ref[:], gvel_ref[:], gacc_ref[:], P, rg, rs,
                t_now, s_idx=t.astype(jnp.float32))
            gpos_ref[:] = gpos
            gvel_ref[:] = gvel
            gacc_ref[:] = gacc_prev
            for fi in range(nfam):
                gk_ref[fi] = gk_ref[fi] + bars["k"][fi]
                grest_ref[fi] = grest_ref[fi] + bars["rest"][fi]
                if has_damping:
                    gdamp_ref[fi] = gdamp_ref[fi] + bars["damping"][fi]
                if has_breathing:
                    gomega_ref[fi] = gomega_ref[fi] + bars["omega"][fi]
                if has_actuated:
                    garate_ref[fi] = garate_ref[fi] + bars["aratedt"][fi]
            gcf_ref[:] = gcf_ref[:] + bars["cf"]
            gminv_ref[:] = gminv_ref[:] + bars["minv"]
            if has_drag:
                gdrag_ref[:] = gdrag_ref[:] + bars["drag"]
            if has_remainder:
                gk_e_ref[:] = gk_e_ref[:] + bars["k_e"]
                grest_e_ref[:] = grest_e_ref[:] + bars["rest_e"]
                if has_damping:
                    gdamp_e_ref[:] = gdamp_e_ref[:] + bars["damp_e"]
                if has_breathing:
                    gomega_e_ref[:] = gomega_e_ref[:] + bars["omega_e"]
                if has_actuated:
                    garate_e_ref[:] = garate_e_ref[:] + bars["aratedt_e"]
            if has_magnets:
                gmag_ref[:] = gmag_ref[:] + jnp.stack(
                    [bars["mag_rad"], bars["mag_stiffness"],
                     bars["mag_maxf"], bars["mag_scale"]])
            return 0

        jax.lax.fori_loop(0, seg, body, 0)

    return kernel


def _prep(shape: SceneShape, state: SimState):
    """Loop-invariant kernel inputs: pallas_step.prep_invariants (the
    SAME staging the fused forward chunk runs -- the backward
    differentiates exactly that physics), reshaped to the kernel's
    [.., R, 128] layout."""
    from .pallas_step import prep_invariants
    m = state.masses
    n = shape.n_masses
    rows = n // 128
    r3 = lambda x: x.reshape(x.shape[:-1] + (rows, 128))
    inv_ = prep_invariants(shape, state)
    out = {"scal": inv_["scal"], "planes": inv_["planes"],
           "balls": inv_["balls"],
           "pos": r3(m.pos), "vel": r3(m.vel), "acc": r3(m.acc),
           "cf": r3(inv_["const_f"]), "minv": r3(inv_["minv"]),
           "fixed": r3(inv_["fixed"]),
           "k": r3(inv_["k_eff"]), "rest": r3(state.stencil.rest),
           "pair_ok": inv_["pair_ok"], "r3": r3}
    if shape.has_damping:
        out["damping"] = r3(inv_["damp_eff"])
    if shape.has_drag:
        out["drag"] = r3(m.drag[None, :])
    if shape.has_breathing:
        out["bsign"] = r3(inv_["bsign"])
        out["bomega"] = r3(inv_["bomega"])
    if shape.has_actuated:
        aratedt, sstop = _actuation_inputs(state, inv_["pair_ok"])
        out["aratedt"] = r3(aratedt)
        out["sstop"] = r3(sstop)
    if any((shape.cap_cp, shape.cap_ball, shape.cap_pl, shape.cap_dir)):
        from .pallas_step import stage_local_constraints
        out["lc"] = r3(stage_local_constraints(shape, state))
    if shape.has_magnets:
        # validity-folded magnet params, the chunk's staging verbatim
        validf = m.valid.astype(m.pos.dtype)
        out["mag"] = r3(jnp.stack([
            jnp.where(m.valid, m.mag_rad, 0.0),
            jnp.where(m.valid, m.mag_stiffness, 0.0),
            jnp.where(m.valid, m.mag_maxf, 0.0),
            jnp.where(m.valid, m.mag_scale, 0.0),
            validf]).astype(m.pos.dtype))
    if shape.has_remainder:
        from .pallas_step import stage_remainder
        rowsel, lanesel, remp = stage_remainder(shape, state)
        out["rowsel"], out["lanesel"], out["remp"] = rowsel, lanesel, remp
        sp = state.springs
        out["rem_ok"] = (sp.valid & m.valid[sp.left] & m.valid[sp.right])
        if shape.has_actuated:
            # closed-form remainder actuation inputs from remp rows 5/6
            # (arate validity-masked by stage_remainder; same derivation
            # as _actuation_inputs)
            aratedt_e = remp[5] * state.dt.astype(jnp.float32)
            nz = aratedt_e != 0
            sstop_e = jnp.where(
                nz, jnp.ceil((remp[6] - remp[1])
                             / jnp.where(nz, aratedt_e, 1.0)), 0.0)
            out["aratedt_e"] = aratedt_e
            out["sstop_e"] = jnp.maximum(sstop_e, 0.0)
    return out


def _actuation_inputs(state: SimState, pair_ok):
    """Closed-form actuation inputs (module docstring; same derivation
    as the tiled kernel's, ops/pallas_tiled.py stage_chunk): the signed
    per-call rest advance ``aratedt`` and the call count ``sstop`` at
    which the one-sided bound is crossed (invalid pairs never actuate,
    sim.cu:1163).  [F, N] f32 arrays."""
    stc = state.stencil
    styp = stc.type
    arate = jnp.where(styp == ACTUATED_EXPAND, stc.rate,
                      jnp.where(styp == ACTUATED_CONTRACT,
                                -stc.rate, 0.0))
    arate = jnp.where(pair_ok, arate, 0.0).astype(jnp.float32)
    aratedt = arate * state.dt.astype(jnp.float32)
    abound = jnp.where(
        styp == ACTUATED_EXPAND, stc.l_max,
        jnp.where(styp == ACTUATED_CONTRACT, stc.l_min,
                  0.0)).astype(jnp.float32)
    nz = aratedt != 0
    sstop = jnp.where(
        nz, jnp.ceil((abound - stc.rest.astype(jnp.float32))
                     / jnp.where(nz, aratedt, 1.0)), 0.0)
    return aratedt, jnp.maximum(sstop, 0.0)


def build_trace_run(shape: SceneShape, seg: int):
    """(state) -> trace [seg, 6, rows, 128] (HBM), the segment's per-step
    (pos_t, vel_t) inputs."""
    kernel = _build_trace_kernel(shape, seg)
    rows = shape.n_masses // 128

    def run(state: SimState):
        p = _prep(shape, state)
        ins = [p["planes"], p["balls"], p["pos"], p["vel"], p["acc"],
               p["cf"], p["minv"], p["fixed"], p["k"], p["rest"]]
        if shape.has_damping:
            ins.append(p["damping"])
        if shape.has_drag:
            ins.append(p["drag"])
        if shape.has_breathing:
            ins += [p["bsign"], p["bomega"]]
        if shape.has_actuated:
            ins += [p["aratedt"], p["sstop"]]
        if "lc" in p:
            ins.append(p["lc"])
        if shape.has_remainder:
            ins += [p["rowsel"], p["lanesel"], p["remp"]]
            if shape.has_actuated:
                ins += [p["aratedt_e"], p["sstop_e"]]
        if shape.has_magnets:
            ins.append(p["mag"])
        out_shape = [
            jax.ShapeDtypeStruct((3, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((3, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((3, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((seg, 6, _trows(shape), 128), jnp.float32),
        ]
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                         + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                         * (len(ins) - 2),
                out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
                          + [pl.BlockSpec(memory_space=pl.ANY)],
                scratch_shapes=(
                    pltpu.VMEM((2, 6, _trows(shape), 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ),
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_BUDGET + 24 * 1024 * 1024),
        )(p["scal"], *ins)
        return outs[3]

    return run


def build_bwd_run(shape: SceneShape, seg: int,
                  famstash: bool = True):
    """(state0, trace, gpos, gvel, gacc) -> dict of gradients
    (pos, vel, acc [3, N]; k, rest(, damping) [F, N]; cf [3, N];
    minv(, drag) [N])."""
    kernel = _build_bwd_kernel(shape, seg, famstash)
    n = shape.n_masses
    rows = n // 128
    nfam = len(shape.stencil_deltas)

    def run(state: SimState, trace, gpos, gvel, gacc):
        p = _prep(shape, state)
        r3 = p["r3"]
        ins = [p["planes"], p["balls"], p["cf"], p["minv"], p["fixed"],
               p["k"], p["rest"]]
        if shape.has_damping:
            ins.append(p["damping"])
        if shape.has_drag:
            ins.append(p["drag"])
        if shape.has_breathing:
            ins += [p["bsign"], p["bomega"]]
        if shape.has_actuated:
            ins += [p["aratedt"], p["sstop"]]
        if "lc" in p:
            ins.append(p["lc"])
        if shape.has_remainder:
            ins += [p["rowsel"], p["lanesel"], p["remp"]]
            if shape.has_actuated:
                ins += [p["aratedt_e"], p["sstop_e"]]
        if shape.has_magnets:
            ins.append(p["mag"])
        ins += [r3(gpos), r3(gvel), r3(gacc), trace]
        v3 = jax.ShapeDtypeStruct((3, rows, 128), jnp.float32)
        vf = jax.ShapeDtypeStruct((nfam, rows, 128), jnp.float32)
        v1 = jax.ShapeDtypeStruct((1, rows, 128), jnp.float32)
        vs = jax.ShapeDtypeStruct((shape.n_springs, 1), jnp.float32)
        out_shape = [v3, v3, v3, vf, vf]
        if shape.has_damping:
            out_shape.append(vf)
        if shape.has_breathing:
            out_shape.append(vf)
        if shape.has_actuated:
            out_shape.append(vf)
        out_shape += [v3, v1]
        if shape.has_drag:
            out_shape.append(v1)
        if shape.has_remainder:
            n_rem_out = 2 + int(shape.has_damping) \
                + int(shape.has_breathing) + int(shape.has_actuated)
            out_shape += [vs] * n_rem_out
        if shape.has_magnets:
            out_shape.append(
                jax.ShapeDtypeStruct((4, rows, 128), jnp.float32))
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                         + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                         * (len(ins) - 3)
                         + [pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
                          * len(out_shape),
                scratch_shapes=(
                    pltpu.VMEM((2, 6, _trows(shape), 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ),
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_BUDGET + 24 * 1024 * 1024),
        )(p["scal"], *ins)
        i = 0
        g = {"pos": outs[0].reshape(3, n), "vel": outs[1].reshape(3, n),
             "acc": outs[2].reshape(3, n), "k": outs[3].reshape(nfam, n),
             "rest": outs[4].reshape(nfam, n)}
        i = 5
        if shape.has_damping:
            g["damping"] = outs[i].reshape(nfam, n)
            i += 1
        if shape.has_breathing:
            g["omega"] = outs[i].reshape(nfam, n)
            i += 1
        if shape.has_actuated:
            g["aratedt"] = outs[i].reshape(nfam, n)
            i += 1
        g["cf"] = outs[i].reshape(3, n)
        g["minv"] = outs[i + 1].reshape(n)
        i += 2
        if shape.has_drag:
            g["drag"] = outs[i].reshape(n)
            i += 1
        if shape.has_remainder:
            g["k_e"] = outs[i].reshape(-1)
            g["rest_e"] = outs[i + 1].reshape(-1)
            i += 2
            if shape.has_damping:
                g["damp_e"] = outs[i].reshape(-1)
                i += 1
            if shape.has_breathing:
                g["omega_e"] = outs[i].reshape(-1)
                i += 1
            if shape.has_actuated:
                g["aratedt_e"] = outs[i].reshape(-1)
                i += 1
            g["rem_ok"] = p["rem_ok"]
        if shape.has_magnets:
            g["mag"] = outs[i].reshape(4, n)
            i += 1
        g["pair_ok"] = p["pair_ok"]
        return g

    return run


# ---------------------------------------------------------------------------
# custom_vjp segment + public rollout
# ---------------------------------------------------------------------------

def assemble_ct(shape: SceneShape, seg: int, s0: SimState, ct, g):
    """Map the backward kernels' gradient dict ``g`` onto the input
    state's cotangent structure (shared by the VMEM segment below and the
    tiled segment in ops/adjoint_tiled.py; the keys absent from a path's
    envelope are simply never read)."""
    m0 = s0.masses
    minv2 = 1.0 / (m0.m * m0.m)
    gm = (ct.masses.m + jnp.sum(s0.g[:, None] * g["cf"], axis=0)
          - minv2 * g["minv"])
    gmasses = dataclasses.replace(
        ct.masses, pos=g["pos"], vel=g["vel"], acc=g["acc"],
        extern_force=ct.masses.extern_force + g["cf"], m=gm)
    if shape.has_drag:
        gmasses = dataclasses.replace(
            gmasses, drag=ct.masses.drag + g["drag"])
    if shape.has_magnets:
        # magnet param grads (the staging folds validity, so invalid
        # masses' params have zero effect -> masked)
        vmask = m0.valid
        gm4 = g["mag"]
        gmasses = dataclasses.replace(
            gmasses,
            mag_rad=ct.masses.mag_rad
            + jnp.where(vmask, gm4[0], 0.0),
            mag_stiffness=ct.masses.mag_stiffness
            + jnp.where(vmask, gm4[1], 0.0),
            mag_maxf=ct.masses.mag_maxf
            + jnp.where(vmask, gm4[2], 0.0),
            mag_scale=ct.masses.mag_scale
            + jnp.where(vmask, gm4[3], 0.0))
    gstencil = dataclasses.replace(
        ct.stencil,
        k=ct.stencil.k + jnp.where(g["pair_ok"], g["k"], 0.0),
        rest=ct.stencil.rest + g["rest"])
    if shape.has_damping:
        gstencil = dataclasses.replace(
            gstencil, damping=ct.stencil.damping
            + jnp.where(g["pair_ok"], g["damping"], 0.0))
    if shape.has_breathing:
        # omega only acts through c-bar * k (masked k zeroes padding)
        gstencil = dataclasses.replace(
            gstencil, omega=ct.stencil.omega + g["omega"])
    if shape.has_actuated:
        # rate acts through aratedt = sign(type) * rate * dt: the
        # kernel accumulated d loss / d aratedt over the per-call
        # force transposes; the chunk's mutated rest OUTPUT adds its
        # own closed-form chain ct_rest * min(c_total, s_stop), with
        # c_total the segment's force-call count (RK2 actuates twice
        # per dt).  rest0's contribution to rest_out is identity --
        # already covered by the ct.stencil.rest passthrough above.
        aratedt, sstop = _actuation_inputs(s0, g["pair_ok"])
        calls = (2.0 * seg if shape.config.integrator is Integrator.RK2
                 else float(seg))
        g_aratedt = (g["aratedt"]
                     + jnp.minimum(calls, sstop) * ct.stencil.rest)
        styp = s0.stencil.type
        sign = jnp.where(styp == ACTUATED_EXPAND, 1.0,
                         jnp.where(styp == ACTUATED_CONTRACT,
                                   -1.0, 0.0))
        grate = sign * s0.dt.astype(jnp.float32) * g_aratedt
        gstencil = dataclasses.replace(
            gstencil, rate=ct.stencil.rate
            + jnp.where(g["pair_ok"], grate, 0.0))
    gg = ct.g + jnp.sum(m0.m[None, :] * g["cf"], axis=1)
    out_ct = dataclasses.replace(ct, masses=gmasses, stencil=gstencil,
                                 g=gg)
    if shape.has_remainder and "rest_chain" in g:
        # tiled glue path (ops/adjoint_tiled.build_tiled_bwd): the
        # per-step jax.vjp of the glue already chained everything --
        # rest_chain carries the full reverse chain (the chunk-output
        # rest cotangent seeded it, each step's actuation advance and
        # force use transposed on the way back), and the per-spring
        # param grads are final (invalid springs zero out through the
        # vjp of the glue's own pair_valid masking; k/damping/omega/rate
        # pass through the chunk as identity, so their output cotangents
        # add)
        gsprings = dataclasses.replace(
            ct.springs,
            k=ct.springs.k + g["k_e"],
            rest=g["rest_chain"],
            damping=ct.springs.damping + g["damp_e"],
            omega=ct.springs.omega + g["omega_e"],
            rate=ct.springs.rate + g["rate_e"])
        out_ct = dataclasses.replace(out_ct, springs=gsprings)
    elif shape.has_remainder:
        # remainder per-spring param grads back onto state.springs
        # (rem_ok masks deleted/padding springs, whose k was folded
        # to 0 -- the VJP of the kernel's own physics)
        rem_ok = g["rem_ok"]
        gsprings = dataclasses.replace(
            ct.springs,
            k=ct.springs.k + jnp.where(rem_ok, g["k_e"], 0.0),
            rest=ct.springs.rest + g["rest_e"])
        if shape.has_damping:
            gsprings = dataclasses.replace(
                gsprings, damping=ct.springs.damping
                + jnp.where(rem_ok, g["damp_e"], 0.0))
        if shape.has_breathing:
            gsprings = dataclasses.replace(
                gsprings, omega=ct.springs.omega + g["omega_e"])
        if shape.has_actuated:
            # same two-part rate chain as the stencil block above:
            # in-step accumulation + the mutated rest OUTPUT's
            # closed-form cotangent (the chunk outputs springs.rest)
            from .pallas_step import stage_remainder
            _, _, remp = stage_remainder(shape, s0)
            aratedt_e = (remp[5, :, 0]
                         * s0.dt.astype(jnp.float32))
            nz = aratedt_e != 0
            sstop_e = jnp.maximum(jnp.where(
                nz, jnp.ceil((remp[6, :, 0] - remp[1, :, 0])
                             / jnp.where(nz, aratedt_e, 1.0)),
                0.0), 0.0)
            calls = (2.0 * seg
                     if shape.config.integrator is Integrator.RK2
                     else float(seg))
            g_aratedt_e = (g["aratedt_e"]
                           + jnp.minimum(calls, sstop_e)
                           * ct.springs.rest)
            styr = s0.springs.type
            sign_e = jnp.where(styr == ACTUATED_EXPAND, 1.0,
                               jnp.where(styr == ACTUATED_CONTRACT,
                                         -1.0, 0.0))
            grate_e = sign_e * s0.dt.astype(jnp.float32) * g_aratedt_e
            gsprings = dataclasses.replace(
                gsprings, rate=ct.springs.rate
                + jnp.where(rem_ok, grate_e, 0.0))
        out_ct = dataclasses.replace(out_ct, springs=gsprings)
    return (out_ct,)


def _adjoint_segment(shape: SceneShape, seg: int,
                     famstash: bool = True):
    """Build (and cache) the custom_vjp segment function for a scene.

    Cached per (shape, seg, famstash): adjoint_rollout is typically
    called once per optimizer iteration on the same scene, and an
    uncached rebuild would hand jax a fresh function object every time,
    forcing a full retrace + XLA recompile of the segment program per
    call.  The cache keeps one traced/compiled program per scene shape
    (SceneShape is the same frozen dataclass that keys every other jit
    cache in the framework).  The kernel-math env hooks (TITAN_ABLATE /
    TITAN_FMATH, read at build time inside pallas_step) join the key so
    same-process A/B runs are not served a stale build, as does the
    monkeypatchable pl.pallas_call binding (interpret-mode tests install
    a fresh wrapper, which keys by identity)."""
    return _adjoint_segment_cached(shape, seg, famstash,
                                   os.environ.get("TITAN_ABLATE", ""),
                                   os.environ.get("TITAN_FMATH", ""),
                                   pl.pallas_call)


@functools.lru_cache(maxsize=32)
def _adjoint_segment_cached(shape: SceneShape, seg: int,
                            famstash: bool, _ablate: str, _fmath: str,
                            _pcall):
    from .pallas_step import build_pallas_chunk
    fwd_chunk = build_pallas_chunk(shape)
    trace_run = build_trace_run(shape, seg)
    bwd_run = build_bwd_run(shape, seg, famstash)

    @jax.custom_vjp
    def seg_fn(state):
        return fwd_chunk(state, jnp.int32(seg))

    def seg_fwd(state):
        return seg_fn(state), state

    def seg_bwd(s0, ct):
        trace = trace_run(s0)
        g = bwd_run(s0, trace, ct.masses.pos, ct.masses.vel, ct.masses.acc)
        return assemble_ct(shape, seg, s0, ct, g)

    seg_fn.defvjp(seg_fwd, seg_bwd)
    return seg_fn


def adjoint_rollout(shape: SceneShape, state: SimState, n_steps: int,
                    segment: Optional[int] = None,
                    _famstash: bool = True) -> SimState:
    """Differentiable rollout where BOTH passes run fused VMEM kernels.

    Forward: the existing fused chunk.  Backward, per ``segment``-step
    block: a trace-writing forward replay plus a reverse-sweep adjoint
    kernel (module docstring).  Residual memory is one state per segment
    plus one (pos, vel) trace buffer of ``segment`` steps (re-used across
    segments by XLA; ~segment * 6N * 4 bytes).

    Gradients are the exact VJP of the kernel's own forward physics (the
    same f32 op ordering), for the differentiable-input set in the module
    docstring; dt and plane/ball geometry are NOT differentiated on this
    path (their cotangents pass through as if the step ignored them) --
    use diff.rollout for those.

    Scenes outside ``adjoint_supported`` should use diff.fast_rollout
    (fused primal, XLA-recompute backward)."""
    r = adjoint_reject_reason(shape)
    if r is not None:
        raise ValueError(f"scene outside the adjoint kernel envelope: {r}")
    if n_steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")
    if segment is None:
        # largest divisor of n_steps <= 128 (the trace buffer is
        # segment * 6N floats of HBM; one state residual per segment)
        segment = next(s for s in range(min(n_steps, 128), 0, -1)
                       if n_steps % s == 0)
    seg = segment
    if n_steps % seg != 0:
        raise ValueError(f"segment {seg} does not divide n_steps {n_steps}")
    seg_fn = _adjoint_segment(shape, seg, _famstash)
    if n_steps == seg:
        return seg_fn(state)
    out, _ = jax.lax.scan(lambda s, _: (seg_fn(s), None), state, None,
                          length=n_steps // seg)
    return out
