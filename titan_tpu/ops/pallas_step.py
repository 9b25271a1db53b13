"""VMEM-resident multi-step Pallas kernel: the single-chip fast path.

The XLA chunk (ops/step.py) round-trips pos/vel/params through HBM every
step.  For scenes that fit VMEM, this kernel keeps the whole state in VMEM
across an entire chunk of steps -- HBM is touched once per chunk, and each
step is pure VPU work (stencil rolls + elementwise physics).  Measured 1.7x
faster than the already-stencilized XLA path at the 1M-spring benchmark
config (9.3k vs 5.4k steps/s on one TPU v5e chip).

Specialization envelope (checked by ``pallas_supported``); scenes outside it
use the XLA path and get identical physics:
  - float32; springs in stencil families, plus an irregular-topology
    remainder whose endpoint gather/scatter runs as FACTORIZED one-hot
    matmuls on the otherwise-idle MXU: a [2S, R] row-selection matmul plus
    a [2S, 128] lane-selection dot replace the round-1 [2S, N] incidence
    at identical FLOPs but 128x less VMEM, so thousands of irregular
    springs fit (accepted while the selectors fit _REM_SEL_BUDGET)
  - breathing (ACTIVE_*) and ACTUATED_* (rest-mutating, rate-clamped per
    sim.cu:1173-1181) springs; rest is carried in VMEM across the chunk
  - axial spring damping supported (adds velocity halo rolls)
  - Euler (velocity clamp optional), Verlet, or RK2 integrators (RK2 runs
    the reference's double force pass per dt, sim.cu:1778-1799)
  - gravity, persistent external force, fixed masses, quadratic drag
  - global contact planes (incl. static+kinetic friction) and balls
  - local constraints (per-mass contact/constraint planes, balls,
    directions -- fixed-capacity slots resident in VMEM)
  - magnets for scenes up to config.magnet_pallas_max masses (dense
    in-VMEM pairwise per step; this is what puts full RobotLink scenes on
    the fast path)
  - soft-deleted masses (validity folded into k/rate/fixed at chunk entry --
    validity only changes at re-marshal boundaries, so it's chunk-constant)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import (ACTIVE_CONTRACT_THEN_EXPAND, ACTIVE_EXPAND_THEN_CONTRACT,
                      ACTUATED_CONTRACT, ACTUATED_EXPAND, Integrator)
from ..state import SceneShape, SimState

# VMEM budget: pos/vel/const_f in + pos/vel/acc out + k/rest [F,N] + minv +
# fixed + per-family temporaries.  Leave headroom under the chip's VMEM.
_VMEM_BUDGET = 100 * 1024 * 1024
# cap on the factorized remainder selectors ([2S, R] row one-hot +
# [2S, 128] lane one-hot + two [2S, 128] body temporaries, f32):
# irregular-topology scenes beyond this use the XLA gather path.
# Capacity at this budget: ~4.3k irregular springs at the reference
# multiagent scale (12.5k masses), ~2.0k at 43^3 (the round-1 full [2S, N]
# incidence capped out at ~160 and ~25 respectively).
_REM_SEL_BUDGET = 16 * 1024 * 1024


def pallas_reject_reason(shape: SceneShape):
    """None if the fused VMEM kernel accepts this scene, else a one-line
    human-readable reason naming the envelope condition that failed."""
    cfg = shape.config
    if cfg.integrator not in (Integrator.EULER, Integrator.VERLET,
                              Integrator.RK2):
        return f"integrator {cfg.integrator.name} not supported in-kernel"
    if cfg.dtype != "float32":
        return (f"dtype {cfg.dtype} (the kernel is f32-only; f64 stays on "
                "the XLA path by design -- TPU f64 is emulated)")
    if not cfg.use_stencil or not shape.stencil_deltas:
        return "no stencil spring families (use_stencil off or none found)"
    if shape.has_magnets and shape.n_masses > cfg.magnet_pallas_max:
        return (f"magnetic scene with {shape.n_masses} masses > "
                f"magnet_pallas_max={cfg.magnet_pallas_max}")
    if not cfg.persistent_extern_force:
        return "strict per-step extern_force mode (persistent_extern_force"\
               "=False)"
    n, f = shape.n_masses, len(shape.stencil_deltas)
    rem_bytes = 0
    if shape.has_remainder:
        # remainder endpoint gather/scatter runs as factorized one-hot
        # matmuls on the (otherwise idle) MXU; the [2S, R] + [2S, 128]
        # selectors and two [2S, 128] temporaries live in VMEM
        rem_bytes = 4 * 2 * shape.n_springs * (n // 128 + 3 * 128)
        if rem_bytes > _REM_SEL_BUDGET:
            return (f"{shape.n_springs} irregular (remainder) springs need "
                    f"{rem_bytes >> 20} MB of endpoint selectors > "
                    f"{_REM_SEL_BUDGET >> 20} MB budget")
    # resident refs: 7 [3,N] vec3 (pos/vel/acc/cforce in + 3 outs), [1,N]
    # minv/fixed (+drag, +4 magnet params, +valid, +local-constraint slot
    # planes), [F,N] k/rest/damping/bsign/bomega (+arate/abound/orest when
    # actuated), plus ~6 [3,N] body temporaries (pr/diff/f/...)
    fam = 5 * f + (3 * f if shape.has_actuated else 0)
    sc = 2 + (1 if shape.has_drag else 0)
    if shape.has_magnets:
        sc += 5
        # dense pairwise temporaries: a few [R, 128, 128] arrays
        if 4 * (n // 128) * 128 * 128 * 4 > 16 * 1024 * 1024:
            return (f"in-VMEM pairwise magnet temporaries at {n} masses "
                    "exceed 16 MB")
    sc += _lc_planes(shape)
    # RK2 holds the pass-1 results (f1/vel1/pos_h/vel_h) live across the
    # second force evaluation: budget extra [3, N] temporaries for it
    tmp = 3 * 10 if cfg.integrator is Integrator.RK2 else 3 * 6
    vmem_bytes = 4 * n * (3 * 7 + fam + sc) + 4 * n * tmp + rem_bytes
    if vmem_bytes >= _VMEM_BUDGET:
        return (f"scene needs ~{vmem_bytes >> 20} MB of VMEM residency > "
                f"{_VMEM_BUDGET >> 20} MB budget ({n} masses, {f} families)")
    return None


def pallas_supported(shape: SceneShape) -> bool:
    return pallas_reject_reason(shape) is None


def _lc_planes(shape: SceneShape) -> int:
    """[1, N]-plane count of the stacked local-constraint slot array."""
    return (shape.cap_cp * 7 + shape.cap_ball * 5 + shape.cap_pl * 5
            + shape.cap_dir * 5)


def make_rolls(rows: int):
    """(roll_gather, roll_scatter) for flat index n +/- d on [.., R, 128]
    refs inside a Pallas kernel: whole-row rolls + ONE <128 lane rotation
    (the select commutes inside the rotation, halving cross-lane work vs
    rotating both row-rolled copies -- measured 2.1x over a flat lane
    rotation in VMEM, then 1.22x again for the single rotation).  Shared
    by this kernel and the adjoint kernels (ops/adjoint.py), whose
    trace-vs-forward bitwise equality depends on both using the identical
    decomposition.  `pltpu.roll` requires non-negative shifts (% n)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)

    def roll_gather(x, d):
        q, r = divmod(d, 128)
        if r == 0:
            return pltpu.roll(x, (-q) % rows, 1)
        a = pltpu.roll(x, (-q) % rows, 1)
        b = pltpu.roll(x, (-(q + 1)) % rows, 1)
        z = jnp.where(lane >= r, a, b)
        return pltpu.roll(z, 128 - r, 2)

    def roll_scatter(x, d):
        q, r = divmod(d, 128)
        if r == 0:
            return pltpu.roll(x, q % rows, 1)
        a = pltpu.roll(x, q % rows, 1)
        b = pltpu.roll(x, (q + 1) % rows, 1)
        z = jnp.where(lane < 128 - r, a, b)
        return pltpu.roll(z, r, 2)

    return roll_gather, roll_scatter


def remainder_gather(rowsel, lanesel, x):
    """Gather both endpoints of every remainder spring from a [3, R, 128]
    array via the factorized one-hot selectors (rowsel [2S, R], lanesel
    [2S, 128]) -> [2S, 3].  MXU row selection + VPU lane dot; HIGHEST
    precision keeps the one-hot products exact in f32 (default bf16
    rounds the gathered VALUES -- measured 1.2e-3 drift).  Shared by the
    forward kernel and the adjoint kernels (ops/adjoint.py): the
    transpose of this gather is exactly ``remainder_scatter`` and vice
    versa, so the adjoint reuses the same two primitives."""
    cols = []
    for c in range(3):
        a = jax.lax.dot_general(
            rowsel, x[c], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # [2S, 128]
        cols.append(jnp.sum(a * lanesel, axis=1))        # [2S]
    return jnp.stack(cols, axis=1)                       # [2S, 3]


def remainder_scatter(rowsel, lanesel, fboth):
    """Scatter per-endpoint values fboth [2S, 3] back onto the mass
    layout -> [3, R, 128] (transpose of ``remainder_gather``)."""
    scat = []
    for c in range(3):
        b = fboth[:, c:c + 1] * lanesel                  # [2S, 128]
        scat.append(jax.lax.dot_general(
            rowsel, b, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32))         # [R, 128]
    return jnp.stack(scat)


def _build_kernel(shape: SceneShape):
    deltas = shape.stencil_deltas
    n = shape.n_masses
    rows = n // 128
    n_planes, n_balls = shape.n_planes, shape.n_balls
    plane_friction = shape.plane_friction
    clamp = shape.config.velocity_clamp
    verlet = shape.config.integrator is Integrator.VERLET
    rk2 = shape.config.integrator is Integrator.RK2
    has_damping = shape.has_damping
    has_breathing = shape.has_breathing
    has_actuated = shape.has_actuated
    has_drag = shape.has_drag
    has_magnets = shape.has_magnets
    has_remainder = shape.has_remainder
    n_rem = shape.n_springs
    caps = (shape.cap_cp, shape.cap_ball, shape.cap_pl, shape.cap_dir)
    has_local = any(caps)
    normal_coeff = shape.config.normal_coeff
    magnet_cutoff = shape.config.magnet_cutoff
    from .forces import use_rsqrt
    rsqrt_norms = use_rsqrt(jnp.float32)

    def kernel(*refs):
        (nsteps_ref, scal_ref, plane_ref, ball_ref,
         pos_ref, vel_ref, acc_ref, cforce_ref, minv_ref, fixed_ref,
         k_ref, rest_ref, damping_ref, bsign_ref, bomega_ref) = refs[:15]
        i = 15
        if has_actuated:
            arate_ref, abound_ref = refs[i], refs[i + 1]
            i += 2
        if has_drag:
            drag_ref = refs[i]
            i += 1
        if has_magnets:
            mag_ref = refs[i]   # [5, R, 128]: rad, stiffness, maxf, scale,
            i += 1              # valid (all validity-folded)
        if has_local:
            lc_ref = refs[i]    # [P_lc, R, 128] stacked slot planes
            i += 1
        if has_remainder:
            rowsel_ref = refs[i]     # [2S, R] endpoint row one-hot
            lanesel_ref = refs[i + 1]  # [2S, 128] endpoint lane one-hot
            remp_ref = refs[i + 2]   # [Q, S, 1] per-spring scalar params
            i += 3
        opos_ref, ovel_ref, oacc_ref = refs[i:i + 3]
        if has_actuated:
            orest_ref = refs[i + 3]
            if has_remainder:
                orest_rem_ref = refs[i + 4]   # [S, 1] carried remainder rest
        # All mass-payload refs are [.., R, 128]: flat-index rolls decompose
        # into whole-row rolls + one <128 lane rotation (make_rolls; shared
        # with the adjoint kernels), which Mosaic runs ~2.1x faster in VMEM
        # than a full-width lane rotation (19.6k vs 9.3k steps/s at the
        # 1M-spring config, springs-only A/B).
        _rg, _rs = make_rolls(rows)

        import os as _os
        _ablate = _os.environ.get("TITAN_ABLATE", "")
        if _ablate:
            from ..runtime.logging import get_logger
            get_logger().warning(
                "TITAN_ABLATE=%r is set: the Pallas kernel is being built "
                "in a TIMING-ABLATION mode with DELIBERATELY WRONG physics "
                "(benchmark instrumentation only). Unset TITAN_ABLATE for "
                "correct results.", _ablate)

        def roll_gather(x, d):
            if _ablate == "noshift":
                # timing ablation: physics WRONG; 1 mul replaces the shift
                # (a plain identity would let the compiler fold diff to 0
                # and delete the whole force body)
                return x * (1.0 + 1e-6 * d)
            return _rg(x, d)

        def roll_scatter(x, d):
            if _ablate == "noshift":
                return x * (1.0 + 1e-6 * d)   # timing ablation (see above)
            return _rs(x, d)

        dt = scal_ref[0]
        opos_ref[:] = pos_ref[:]
        ovel_ref[:] = vel_ref[:]
        oacc_ref[:] = acc_ref[:]                # Verlet carries acc
        if has_actuated:
            orest_ref[:] = rest_ref[:]          # rest is carried state
            if has_remainder:
                orest_rem_ref[:] = remp_ref[1]  # row 1 = rest
        not_fixed = 1.0 - fixed_ref[:]          # [1, R, 128] f32 mask

        def compute_forces(pos, vel, t_now):
            # One full force evaluation at (pos, vel, t_now): springs,
            # magnets, global planes/balls, local constraints (which may
            # mutate vel), drag.  RK2 (sim.cu:1778-1799) calls this twice
            # per step; ACTUATED rest (orest_ref) advances on every call,
            # matching the reference's double-pass rest-mutation quirk.
            # springs: stencil families, masked via k_eff == 0 padding
            f_acc = cforce_ref[:]               # m*g + persistent extern
            # shared-subexpression force form (round-3, TPU only, gated
            # like the rsqrt norms): the Hooke coefficient is computed as
            #   c = k * (rest * inv - 1)        [== k*(rest - ln)*inv]
            # so the length ln = d2*inv is never materialized and the
            # damping term folds in through inv2 = inv*inv:
            #   c += damping * dot(vl - vr, diff) * inv2.
            # Exact at diff == 0 (f = c*diff = 0 either way); masked lanes
            # have k = damping = 0.  TITAN_FMATH=legacy restores the
            # reference-shaped mag*inv form for A/B.
            fmath_shared = (rsqrt_norms
                            and _os.environ.get("TITAN_FMATH", "") != "legacy")
            for fi, d in enumerate(deltas):
                pr = roll_gather(pos, d)
                diff = pr - pos
                # ONE rsqrt instead of sqrt + divide on TPU: measured +8%
                # for the whole kernel (29.0k vs 26.8k steps/s at 43^3,
                # v5e).  Backend-gated exactly like forces.inv_norm so
                # kernel-vs-XLA equivalence stays tight on every backend.
                d2 = jnp.sum(diff * diff, axis=0)
                if rsqrt_norms:
                    # (a guard-free epsilon-bias variant measured a wash;
                    # docs/PERFORMANCE.md Measured design decisions)
                    inv = jnp.where(d2 > 0,
                                    jax.lax.rsqrt(jnp.where(d2 > 0, d2, 1.0)),
                                    0.0)
                    ln = None if fmath_shared else d2 * inv
                else:
                    ln = jnp.where(d2 > 0,
                                   jnp.sqrt(jnp.where(d2 > 0, d2, 1.0)), 0.0)
                    inv = jnp.where(ln > 0,
                                    1.0 / jnp.where(ln > 0, ln, 1.0), 0.0)
                if has_actuated:
                    # ACTUATED_* rest mutation with the reference's one-sided
                    # rate clamp (sim.cu:1173-1181): expand while rest<l_max,
                    # contract while rest>l_min.  arate is +rate / -rate / 0,
                    # abound the matching bound; zeroed for invalid pairs.
                    rest = orest_ref[fi]
                    ar = arate_ref[fi]
                    ab = abound_ref[fi]
                    adv = (((ar > 0) & (rest < ab))
                           | ((ar < 0) & (rest > ab)))
                    rest = rest + jnp.where(adv, ar * dt, 0.0)
                    orest_ref[fi] = rest
                else:
                    rest = rest_ref[fi]
                if has_breathing:
                    # rest scale 1 -/+ 0.2 sin(omega t) folded into
                    # bsign = -/+0.2 (0 for passive), reference sim.cu:1169-72
                    rest = rest * (1.0 + bsign_ref[fi]
                                   * jnp.sin(bomega_ref[fi] * t_now))
                if fmath_shared:
                    c = k_ref[fi] * (rest * inv - 1.0)
                    if has_damping:
                        vr = roll_gather(vel, d)
                        axdot = jnp.sum((vel - vr) * diff, axis=0)
                        c = c + (axdot * damping_ref[fi]) * (inv * inv)
                    f = c * diff
                else:
                    mag = k_ref[fi] * (rest - ln)
                    if has_damping:
                        vr = roll_gather(vel, d)
                        axial = jnp.sum((vel - vr) * diff, axis=0) * inv
                        mag = mag + axial * damping_ref[fi]
                    f = (mag * inv) * diff
                f_acc = f_acc - f + roll_scatter(f, d)
            if has_remainder:
                # irregular-topology (remainder) springs: endpoint gather
                # and force scatter run as FACTORIZED one-hot matmuls on
                # the otherwise IDLE MXU (this physics has no other
                # matmuls) -- TPU scalar gathers measured ~1000x slower
                # than stencil rolls.  The round-1 [2S, N] incidence is
                # factorized into a [2S, R] row selection (MXU) plus a
                # [2S, 128] lane selection (VPU lane-dot): identical MACs
                # (E*N either way), exact (one-hot products are exact in
                # f32 at Precision.HIGHEST; default bf16 would round the
                # gathered VALUES -- measured 1.2e-3 drift), but VMEM
                # drops from O(S*N) to O(S*N/128), so thousands of
                # irregular springs fit.  Physics identical to
                # ops/forces.spring_forces (reference computeSpringForces,
                # sim.cu:1157-1200); invalid/padding springs carry k == 0.
                rs = rowsel_ref[:]                           # [2S, R]
                ls = lanesel_ref[:]                          # [2S, 128]
                gather_ends = lambda x: remainder_gather(rs, ls, x)
                g = gather_ends(pos)
                diffe = g[n_rem:] - g[:n_rem]                # right - left
                d2e = jnp.sum(diffe * diffe, axis=1,
                              keepdims=True)                 # [S, 1]
                if rsqrt_norms:
                    inve = jnp.where(
                        d2e > 0,
                        jax.lax.rsqrt(jnp.where(d2e > 0, d2e, 1.0)), 0.0)
                    lne = d2e * inve
                else:
                    lne = jnp.where(d2e > 0,
                                    jnp.sqrt(jnp.where(d2e > 0, d2e, 1.0)),
                                    0.0)
                    inve = jnp.where(lne > 0,
                                     1.0 / jnp.where(lne > 0, lne, 1.0), 0.0)
                if has_actuated:
                    reste = orest_rem_ref[:]                 # [S, 1]
                    ar = remp_ref[5]
                    ab = remp_ref[6]
                    adv = (((ar > 0) & (reste < ab))
                           | ((ar < 0) & (reste > ab)))
                    reste = reste + jnp.where(adv, ar * dt, 0.0)
                    orest_rem_ref[:] = reste
                else:
                    reste = remp_ref[1]
                if has_breathing:
                    reste = reste * (1.0 + remp_ref[3]
                                     * jnp.sin(remp_ref[4] * t_now))
                mage = remp_ref[0] * (reste - lne)           # [S, 1]
                if has_damping:
                    gv = gather_ends(vel)
                    axiale = jnp.sum((gv[:n_rem] - gv[n_rem:]) * diffe,
                                     axis=1, keepdims=True) * inve
                    mage = mage + axiale * remp_ref[2]
                fe = (mage * inve) * diffe                   # [S, 3]
                # scatter: +f at right, -f at left (sim.cu:1189-1196) in
                # one signed [2S] pass through the same factorization
                fboth = jnp.concatenate([-fe, fe], axis=0)   # [2S, 3]
                f_acc = f_acc + remainder_scatter(rs, ls, fboth)
            if has_magnets:
                # dense in-VMEM pairwise magnet sweep, one 128-lane source
                # row at a time (reference computeExternalMagnetForce,
                # sim.cu:1223-1241; the O(N^2) form it ships disabled --
                # exact where its occupancy grid approximates).  Invalid
                # masses carry zeroed params + a validity plane.
                rrad = mag_ref[0]                    # [R, 128] receivers
                rstiff = mag_ref[1]
                rmaxf = mag_ref[2]
                rvalid = mag_ref[4]
                ridx = (jax.lax.broadcasted_iota(
                            jnp.int32, (rows, 128), 0) * 128
                        + jax.lax.broadcasted_iota(
                            jnp.int32, (rows, 128), 1))
                fm0 = jnp.zeros_like(pos[0])
                fm1 = jnp.zeros_like(pos[0])
                fm2 = jnp.zeros_like(pos[0])
                for sr in range(rows):
                    spx = pos[0, sr][None, None, :]  # [1, 1, 128] sources
                    spy = pos[1, sr][None, None, :]
                    spz = pos[2, sr][None, None, :]
                    d0 = pos[0][:, :, None] - spx    # [R, 128, 128]
                    d1 = pos[1][:, :, None] - spy
                    d2 = pos[2][:, :, None] - spz
                    dist2 = d0 * d0 + d1 * d1 + d2 * d2
                    pos_d = dist2 > 0
                    dist = jnp.where(
                        pos_d, jnp.sqrt(jnp.where(pos_d, dist2, 1.0)), 0.0)
                    safe = jnp.where(dist > 0, dist, 1.0)
                    sidx = (jax.lax.broadcasted_iota(
                                jnp.int32, (1, 1, 128), 2) + sr * 128)
                    ok = ((dist < magnet_cutoff)
                          & (ridx[:, :, None] != sidx))
                    okf = (rvalid[:, :, None] * mag_ref[4, sr][None, None, :])
                    inter = dist - (rrad[:, :, None]
                                    + mag_ref[0, sr][None, None, :])
                    shell = jnp.where(
                        inter < 0,
                        jnp.abs(inter) * rstiff[:, :, None], 0.0)
                    attract = (mag_ref[3, sr][None, None, :]
                               * rmaxf[:, :, None]
                               / jnp.maximum(dist2, 1e-12))
                    coeff = (jnp.where(ok, (shell - attract) / safe, 0.0)
                             * okf)
                    fm0 = fm0 + jnp.sum(d0 * coeff, axis=2)
                    fm1 = fm1 + jnp.sum(d1 * coeff, axis=2)
                    fm2 = fm2 + jnp.sum(d2 * coeff, axis=2)
                # fixed masses early-return before the magnet pass
                # (sim.cu:1292-1298); they still act as sources above
                f_acc = f_acc + jnp.stack([fm0, fm1, fm2]) * not_fixed
            # global contact planes (object.cu:76-109 semantics, in order)
            for p in range(n_planes):
                nx, ny, nz = plane_ref[p, 0], plane_ref[p, 1], plane_ref[p, 2]
                off, fk, fs = plane_ref[p, 3], plane_ref[p, 4], plane_ref[p, 5]
                disp = pos[0] * nx + pos[1] * ny + pos[2] * nz - off  # [N]
                nvec = jnp.stack([jnp.full_like(disp, nx),
                                  jnp.full_like(disp, ny),
                                  jnp.full_like(disp, nz)])
                inside = disp < 0
                if plane_friction[p]:  # static: skip when both coeffs == 0
                    fn_mag = (f_acc[0] * nx + f_acc[1] * ny + f_acc[2] * nz)
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
                d0 = pos[0] - cx
                d1 = pos[1] - cy
                d2 = pos[2] - cz
                dist = jnp.sqrt(d0 * d0 + d1 * d1 + d2 * d2)
                safe = jnp.where(dist > 0, dist, 1.0)
                push = jnp.where((dist <= rad) & (dist > 0),
                                 normal_coeff / safe, 0.0)
                f_acc = f_acc + jnp.stack([d0, d1, d2]) * push
            if has_local:
                # per-mass local constraint slots in reference order:
                # contact planes, balls, constraint planes, directions
                # (sim.cu:1311-1326); slot j active iff j < count.
                # Constraint planes and directions MUTATE vel, which the
                # drag term and the integrator then consume -- mirrors
                # ops/forces.apply_local_constraints exactly.
                o = 0
                for _ in range(caps[0]):             # contact planes
                    act = lc_ref[o] > 0.5
                    nvec = lc_ref[o + 1:o + 4]       # [3, R, 128] per-mass
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
                    nf = jnp.sum(f_acc * nvec, axis=0)
                    f2 = f_acc - nvec * nf
                    v_norm = jnp.sqrt(jnp.sum(vel * vel, axis=0))
                    moving = v_norm >= 1e-16
                    v2c = vel - nvec * jnp.sum(vel * nvec, axis=0)
                    safe_vn = jnp.where(moving, v_norm, 1.0)
                    f3 = f2 - fric * nf * v2c / safe_vn
                    f_acc = jnp.where(act, jnp.where(moving, f3, f2), f_acc)
                    vel = jnp.where(act & moving, v2c, vel)
                for _ in range(caps[3]):             # directions
                    act = lc_ref[o] > 0.5
                    tvec = lc_ref[o + 1:o + 4]
                    fric = lc_ref[o + 4]
                    o += 5
                    nf = f_acc - tvec * jnp.sum(f_acc * tvec, axis=0)
                    f2 = f_acc - nf
                    v_norm = jnp.sqrt(jnp.sum(vel * vel, axis=0))
                    moving = v_norm >= 1e-16
                    nf_norm = jnp.sqrt(jnp.sum(nf * nf, axis=0))
                    f3 = f2 - nf_norm * fric * tvec
                    f_acc = jnp.where(act, jnp.where(moving, f3, f2), f_acc)
                    vel = jnp.where(act & moving,
                                    tvec * jnp.sum(vel * tvec, axis=0), vel)
            if has_drag:
                # -C |v|^2 v_hat == -C |v| v (reference sim.cu:1329-1332)
                vn = jnp.sqrt(jnp.sum(vel * vel, axis=0))
                f_acc = f_acc - drag_ref[:] * vn * vel
            return f_acc, vel

        def body(step, _):
            t_base = scal_ref[1] + step.astype(jnp.float32) * dt
            pos = opos_ref[:]
            vel0 = ovel_ref[:]  # pre-constraint vel (frozen masses keep it)
            if rk2:
                # reference RK2 (sim.cu:1778-1799 + 1336-1349): midpoint
                # predictor then corrector, forces evaluated twice per dt
                f1, vel1 = compute_forces(pos, vel0, t_base)
                acc1 = f1 * minv_ref[:]
                pos_h = pos + 0.5 * vel1 * dt
                vel_h = vel1 + 0.5 * acc1 * dt
                # frozen masses keep pos; their pass-2 velocity input stays
                # vel1 (the constraint-mutated value), mirroring the `half`
                # state of ops/step.py's RK2 branch
                pos_h = pos_h * not_fixed + pos * fixed_ref[:]
                vel_h = vel_h * not_fixed + vel1 * fixed_ref[:]
                f2, vel2 = compute_forces(pos_h, vel_h, t_base + 0.5 * dt)
                acc = f2 * minv_ref[:]
                v2 = ((vel1 + acc * dt) * not_fixed
                      + vel0 * fixed_ref[:])
                opos_ref[:] = pos + vel2 * dt * not_fixed
            else:
                f_acc, vel = compute_forces(pos, vel0, t_base)
                # integrate; fixed masses frozen (sim.cu:1292-1294)
                acc = f_acc * minv_ref[:]
                if verlet:
                    # reference 'Verlet' (sim.cu:1350-1354)
                    v2 = vel + 0.5 * (oacc_ref[:] + acc) * dt
                    v2 = v2 * not_fixed + vel0 * fixed_ref[:]
                    opos_ref[:] = pos + (v2 * dt
                                         + 0.5 * acc * dt * dt) * not_fixed
                else:
                    # Euler with optional clamp (sim.cu:1355-1362)
                    v2 = vel + acc * dt
                    if clamp:
                        vn = jnp.sqrt(jnp.sum(v2 * v2, axis=0))
                        v2 = jnp.where(vn > 1.0,
                                       v2 / jnp.where(vn > 0, vn, 1.0), v2)
                    v2 = v2 * not_fixed + vel0 * fixed_ref[:]
                    opos_ref[:] = pos + v2 * dt * not_fixed
            ovel_ref[:] = v2
            oacc_ref[:] = (acc * not_fixed
                           + oacc_ref[:] * fixed_ref[:])
            return 0

        jax.lax.fori_loop(0, nsteps_ref[0], body, 0)

    return kernel


def prep_invariants(shape: SceneShape, state: SimState) -> dict:
    """Loop-invariant kernel inputs: validity-folded spring params,
    breathing arrays, inverse-mass / frozen masks, the constant force,
    and the SMEM scalar tables.

    Shared by the forward chunk below and the adjoint kernels
    (ops/adjoint.py), whose gradient correctness REQUIRES the trace
    replay to consume exactly the values the fused chunk ran -- any
    change to this staging applies to both automatically.
    """
    m = state.masses
    pair_ok = state.stencil.mask
    if not shape.all_valid:
        pair_ok = jnp.stack([
            pair_ok[fi] & m.valid & jnp.roll(m.valid, -d)
            for fi, d in enumerate(shape.stencil_deltas)])
    k_eff = jnp.where(pair_ok, state.stencil.k, 0.0)
    damp_eff = jnp.where(pair_ok, state.stencil.damping, 0.0)
    styp = state.stencil.type
    bsign = jnp.where(styp == ACTIVE_CONTRACT_THEN_EXPAND, -0.2,
                      jnp.where(styp == ACTIVE_EXPAND_THEN_CONTRACT,
                                0.2, 0.0)).astype(m.pos.dtype)
    bomega = state.stencil.omega
    minv = (1.0 / m.m)[None, :]
    # invalid (deleted/padding) masses are frozen exactly like fixed ones
    move = m.valid & ~m.fixed
    fixed = (~move).astype(m.pos.dtype)[None, :]
    const_f = m.extern_force + m.m * state.g[:, None]
    scal = jnp.stack([state.dt.astype(jnp.float32),
                      state.t.astype(jnp.float32)])
    n_planes, n_balls = max(shape.n_planes, 1), max(shape.n_balls, 1)
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
    return dict(pair_ok=pair_ok, k_eff=k_eff, damp_eff=damp_eff,
                styp=styp, bsign=bsign, bomega=bomega, minv=minv,
                move=move, fixed=fixed, const_f=const_f, scal=scal,
                planes=planes, balls=balls)


def stage_local_constraints(shape: SceneShape, state: SimState):
    """Pack the per-mass local-constraint slot planes into one [L, N]
    array in the kernel's reference order (contact planes 7 planes each,
    balls 5, constraint planes 5, directions 5; slot j active iff
    j < count).  Shared by the forward chunk and the adjoint kernels
    (ops/adjoint.py) so the replayed physics consumes exactly the values
    the fused chunk ran."""
    m = state.masses
    lcon = state.lcon
    caps = (shape.cap_cp, shape.cap_ball, shape.cap_pl, shape.cap_dir)
    parts = []
    for j in range(caps[0]):
        parts += [(j < lcon.cp_count).astype(m.pos.dtype)[None],
                  lcon.cp_normal[:, j, :].T,
                  lcon.cp_offset[:, j][None],
                  lcon.cp_fk[:, j][None], lcon.cp_fs[:, j][None]]
    for j in range(caps[1]):
        parts += [(j < lcon.ball_count).astype(m.pos.dtype)[None],
                  lcon.ball_center[:, j, :].T,
                  lcon.ball_radius[:, j][None]]
    for j in range(caps[2]):
        parts += [(j < lcon.pl_count).astype(m.pos.dtype)[None],
                  lcon.pl_normal[:, j, :].T,
                  lcon.pl_friction[:, j][None]]
    for j in range(caps[3]):
        parts += [(j < lcon.dir_count).astype(m.pos.dtype)[None],
                  lcon.dir_tangent[:, j, :].T,
                  lcon.dir_friction[:, j][None]]
    return jnp.concatenate(parts, axis=0).astype(m.pos.dtype)


def stage_remainder(shape: SceneShape, state: SimState):
    """Stage the irregular-topology (remainder) spring inputs for the
    fused kernel: factorized endpoint one-hot selectors plus the stacked
    per-spring scalar params.  Shared by the forward chunk and the
    adjoint kernels (ops/adjoint.py) so the replayed physics consumes
    exactly the values the fused chunk ran.

    Returns (rowsel [2S, R], lanesel [2S, 128], remp [Q, S, 1]) with
    remp rows [k, rest, damping, bsign, bomega] (+ [arate, abound] when
    the scene has ACTUATED_* springs).  Padding/invalid springs point at
    index 0 and carry k == 0, so their force is exactly zero."""
    m = state.masses
    rows = shape.n_masses // 128
    sp = state.springs
    rem_ok = sp.valid & m.valid[sp.left] & m.valid[sp.right]
    styr = sp.type
    rows_p = [
        jnp.where(rem_ok, sp.k, 0.0),
        sp.rest,
        jnp.where(rem_ok, sp.damping, 0.0),
        jnp.where(styr == ACTIVE_CONTRACT_THEN_EXPAND, -0.2,
                  jnp.where(styr == ACTIVE_EXPAND_THEN_CONTRACT,
                            0.2, 0.0)),
        sp.omega,
    ]
    if shape.has_actuated:
        ratr = jnp.where(styr == ACTUATED_EXPAND, sp.rate,
                         jnp.where(styr == ACTUATED_CONTRACT,
                                   -sp.rate, 0.0))
        rows_p += [
            jnp.where(rem_ok, ratr, 0.0),
            jnp.where(styr == ACTUATED_EXPAND, sp.l_max,
                      jnp.where(styr == ACTUATED_CONTRACT,
                                sp.l_min, 0.0)),
        ]
    remp = jnp.stack([jnp.asarray(r, m.pos.dtype) for r in rows_p]
                     )[:, :, None]                    # [Q, S, 1]
    lr = jnp.concatenate([sp.left, sp.right]).astype(jnp.int32)
    # factorized endpoint selectors (see kernel): row one-hot [2S, R] +
    # lane one-hot [2S, 128]
    rowsel = ((lr[:, None] // 128)
              == jnp.arange(rows, dtype=jnp.int32)[None, :]
              ).astype(m.pos.dtype)                   # [2S, R]
    lanesel = ((lr[:, None] % 128)
               == jnp.arange(128, dtype=jnp.int32)[None, :]
               ).astype(m.pos.dtype)                  # [2S, 128]
    return rowsel, lanesel, remp


def build_pallas_chunk(shape: SceneShape, donate: bool = False):
    """Jitted chunk(state, n_steps) -> state using the fused VMEM kernel.

    donate=True donates the input state's buffers (exclusive-owner callers
    like bench.py; the control plane keeps donate=False because concurrent
    getAll() readers hold state snapshots)."""
    kernel = _build_kernel(shape)
    n = shape.n_masses
    n_planes, n_balls = max(shape.n_planes, 1), max(shape.n_balls, 1)

    def chunk(state: SimState, n_steps) -> SimState:
        m = state.masses
        # loop invariants, precomputed outside the kernel (shared with the
        # adjoint kernels): masked/invalid springs exert zero force ->
        # fold mask (and endpoint validity, which only changes at
        # re-marshal boundaries) into k
        inv_ = prep_invariants(shape, state)
        pair_ok, k_eff, damp_eff = (inv_["pair_ok"], inv_["k_eff"],
                                    inv_["damp_eff"])
        styp, bsign, bomega = inv_["styp"], inv_["bsign"], inv_["bomega"]
        minv, move, fixed = inv_["minv"], inv_["move"], inv_["fixed"]
        const_f, scal = inv_["const_f"], inv_["scal"]
        planes, balls = inv_["planes"], inv_["balls"]

        rows = n // 128
        nf = len(shape.stencil_deltas)
        r3 = lambda x: x.reshape(x.shape[:-1] + (rows, 128))  # free reshape

        extra_in = []
        if shape.has_actuated:
            rate = state.stencil.rate
            arate = jnp.where(styp == ACTUATED_EXPAND, rate,
                              jnp.where(styp == ACTUATED_CONTRACT, -rate, 0.0))
            # invalid pairs never mutate rest (the reference kernel
            # early-returns before actuation, sim.cu:1163)
            arate = jnp.where(pair_ok, arate, 0.0).astype(m.pos.dtype)
            abound = jnp.where(
                styp == ACTUATED_EXPAND, state.stencil.l_max,
                jnp.where(styp == ACTUATED_CONTRACT, state.stencil.l_min,
                          0.0)).astype(m.pos.dtype)
            extra_in += [r3(arate), r3(abound)]
        if shape.has_drag:
            extra_in.append(r3(m.drag[None, :]))
        if shape.has_magnets:
            validf = m.valid.astype(m.pos.dtype)
            mag = jnp.stack([
                jnp.where(m.valid, m.mag_rad, 0.0),
                jnp.where(m.valid, m.mag_stiffness, 0.0),
                jnp.where(m.valid, m.mag_maxf, 0.0),
                jnp.where(m.valid, m.mag_scale, 0.0),
                validf]).astype(m.pos.dtype)
            extra_in.append(r3(mag))
        caps = (shape.cap_cp, shape.cap_ball, shape.cap_pl, shape.cap_dir)
        if any(caps):
            extra_in.append(r3(stage_local_constraints(shape, state)))
        if shape.has_remainder:
            extra_in += list(stage_remainder(shape, state))

        n_in = 11 + len(extra_in)
        n_out = 4 if shape.has_actuated else 3
        out_shape = [jax.ShapeDtypeStruct((3, rows, 128), m.pos.dtype)
                     for _ in range(3)]
        if shape.has_actuated:
            out_shape.append(
                jax.ShapeDtypeStruct((nf, rows, 128), m.pos.dtype))
            if shape.has_remainder:
                n_out += 1
                out_shape.append(jax.ShapeDtypeStruct(
                    (shape.n_springs, 1), m.pos.dtype))
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,   # nsteps, scal (SMEM)
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)]
                         + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
                out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_BUDGET + 24 * 1024 * 1024),
        )(jnp.asarray([n_steps], jnp.int32), scal, planes, balls,
          r3(m.pos), r3(m.vel), r3(m.acc), r3(const_f), r3(minv), r3(fixed),
          r3(k_eff), r3(state.stencil.rest), r3(damp_eff), r3(bsign),
          r3(bomega), *extra_in)
        pos, vel, acc = (outs[0].reshape(3, n), outs[1].reshape(3, n),
                         outs[2].reshape(3, n))

        dtn = jnp.asarray(n_steps, state.dt.dtype) * state.dt
        new_masses = dataclasses.replace(
            m, pos=pos, vel=vel, acc=acc,
            T=m.T + jnp.where(move, dtn, 0.0))
        new_state = dataclasses.replace(
            state, masses=new_masses, t=state.t + dtn)
        if shape.has_actuated:
            new_state = dataclasses.replace(
                new_state, stencil=dataclasses.replace(
                    state.stencil, rest=outs[3].reshape(nf, n)))
            if shape.has_remainder:
                new_state = dataclasses.replace(
                    new_state, springs=dataclasses.replace(
                        state.springs, rest=outs[4].reshape(-1)))
        return new_state

    return jax.jit(chunk, donate_argnums=(0,) if donate else ())
