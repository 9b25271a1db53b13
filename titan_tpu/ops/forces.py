"""Force computation: springs, scatter, global/local constraints, magnets.

All functions are pure; they consume/produce ``[3, N]``-layout component-major
arrays.  Each docstring cites the reference CUDA code whose behavior it
reproduces (reference = /root/reference, GitWyd/Titan).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import (
    ACTIVE_CONTRACT_THEN_EXPAND,
    ACTIVE_EXPAND_THEN_CONTRACT,
    ACTUATED_CONTRACT,
    ACTUATED_EXPAND,
    SimConfig,
    ScatterMode,
)
from ..state import MassState, SpringState, GlobalConstraints, LocalConstraints, Topology


def _safe_norm(sq: jax.Array) -> jax.Array:
    """sqrt of a sum-of-squares, gradient-safe at 0.

    d(sqrt)/dx is inf at 0; even though forward values are masked by
    jnp.where, reverse-mode produces inf * 0 = NaN cotangents (the classic
    JAX where-grad pitfall).  Guarding the operand inside sqrt keeps forward
    values identical and gradients finite (zero) at the masked points.
    """
    pos = sq > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)


def use_rsqrt(dtype) -> bool:
    """Whether the PALLAS kernels' spring norms use rsqrt (True) or
    sqrt + divide (False).

    f32 on TPU: ONE hardware rsqrt (len = sq * rsqrt(sq)) measured +8% on
    the fused VMEM kernel at the 1M-spring bench (29.0k vs 26.8k steps/s,
    v5e, interleaved one-process A/B); TPU rsqrt is a deterministic
    per-element hardware op.

    CPU (where the kernels only ever run in interpret mode next to the
    XLA paths' sqrt + divide): NO -- XLA CPU lowers rsqrt as an
    approximation whose result is context-dependent (LLVM FMA contraction
    differs between programs), and a first attempt at using it everywhere
    broke the bitwise halo-vs-single-device equivalence tests (6e-5 drift
    over 200 chaotic steps).  The XLA paths keep their exact original
    sqrt + divide graphs on every backend for the same reason: the CPU
    equivalence suite depends on cross-program bitwise stability, which
    only identical instruction graphs provide.  f64 always uses
    sqrt + divide so the f64 XLA path stays exact to 1e-9 against the
    independent numpy oracle (tests/reference_impl.py)."""
    return dtype == jnp.float32 and jax.default_backend() != "cpu"


def spring_forces(
    masses: MassState,
    springs: SpringState,
    t: jax.Array,
    dt: jax.Array,
    has_breathing: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Per-spring Hooke + axial damping force, plus actuation.

    Reference kernel: computeSpringForces (sim.cu:1157-1200).
      d = pos_right - pos_left
      ACTIVE_CONTRACT_THEN_EXPAND: scale = 1 - 0.2 sin(omega t)
      ACTIVE_EXPAND_THEN_CONTRACT: scale = 1 + 0.2 sin(omega t)
      ACTUATED_EXPAND:   rest += rate*dt while rest < l_max (no clamp at l_max)
      ACTUATED_CONTRACT: rest -= rate*dt while rest > l_min
      f = k (rest*scale - |d|) d_hat + dot(v_l - v_r, d_hat) * damping * d_hat
    Springs with an invalid endpoint contribute nothing (sim.cu:1163).
    Zero-length springs are guarded to zero force (the reference would produce
    NaN; documented deviation, strictly safer).

    Returns (force [3, S] to be applied +f at right / -f at left, new_rest [S]).
    """
    left, right = springs.left, springs.right
    d = masses.pos[:, right] - masses.pos[:, left]            # [3, S]
    length = _safe_norm(jnp.sum(d * d, axis=0))               # [S]
    inv_len = jnp.where(length > 0, 1.0 / jnp.where(length > 0, length, 1.0), 0.0)
    unit = d * inv_len                                        # [3, S]

    pair_valid = (
        springs.valid & masses.valid[left] & masses.valid[right]
    )

    rest = springs.rest
    if has_breathing:
        styp = springs.type
        sin_wt = jnp.sin(springs.omega * t)
        scale = jnp.where(
            styp == ACTIVE_CONTRACT_THEN_EXPAND, 1.0 - 0.2 * sin_wt,
            jnp.where(styp == ACTIVE_EXPAND_THEN_CONTRACT, 1.0 + 0.2 * sin_wt, 1.0),
        )
        # invalid springs never actuate: the reference kernel early-returns
        # before the rest mutation (sim.cu:1163)
        rest = jnp.where(
            pair_valid & (styp == ACTUATED_EXPAND) & (rest < springs.l_max),
            rest + springs.rate * dt,
            jnp.where(
                pair_valid & (styp == ACTUATED_CONTRACT) & (rest > springs.l_min),
                rest - springs.rate * dt,
                rest,
            ),
        )
    else:
        scale = 1.0

    dv = masses.vel[:, left] - masses.vel[:, right]           # v_l - v_r, [3, S]
    axial_dv = jnp.sum(dv * unit, axis=0)                     # [S]
    mag = springs.k * (rest * scale - length) + axial_dv * springs.damping
    f = mag * unit                                            # [3, S]

    f = jnp.where(pair_valid, f, 0.0)
    return f, rest


def compact_remainder_forces(sp, pos_all, vel_all, rem_rest, t_now, dt,
                             my0, b, has_breathing, has_damping):
    """O(S) remainder-spring evaluation: per-spring endpoint ``take`` +
    a dropping scatter onto the rows in [my0, my0 + b).

    Same physics as :func:`spring_forces` (computeSpringForces,
    sim.cu:1157-1200), but the accumulation is O(S) scatter-adds instead
    of :func:`scatter_spring_forces`'s O(N*D) incidence gather -- the
    right trade when S << N (tiled-kernel glue: thousands of cross links
    on a beyond-VMEM scene; measured 6.7x on the tiled glue adjoint at
    60^3 + 2k links).  Endpoint validity must be pre-folded into
    ``sp.valid`` (it gates the force AND the actuated-rest advance,
    matching spring_forces' pair_valid, sim.cu:1163); fixed-mass
    masking is the caller's (the reference masks the applied force,
    sim.cu:1187-1193).  Also the D-way form: each device passes its
    gathered pos/vel and keeps only its own block's rows
    (parallel/halo.gathered_remainder_forces delegates here).  Returns
    (f [3, b], new_rem_rest [S])."""
    pl_ = jnp.take(pos_all, sp.left, axis=1)               # [3, S]
    pr = jnp.take(pos_all, sp.right, axis=1)
    diff = pr - pl_
    # _safe_norm: forward values bitwise identical to a plain sqrt, but
    # the sqrt VJP at zero-length (padded/invalid) spring rows would be
    # inf -> 0 * inf = NaN; the adjoints jax.vjp this glue
    length = _safe_norm(jnp.sum(diff * diff, axis=0))
    inv = jnp.where(length > 0,
                    1.0 / jnp.where(length > 0, length, 1.0), 0.0)
    rest = rem_rest
    scale = 1.0
    new_rem_rest = rem_rest
    if has_breathing:
        styp = sp.type
        sin_wt = jnp.sin(sp.omega * t_now)
        scale = jnp.where(
            styp == ACTIVE_CONTRACT_THEN_EXPAND, 1.0 - 0.2 * sin_wt,
            jnp.where(styp == ACTIVE_EXPAND_THEN_CONTRACT,
                      1.0 + 0.2 * sin_wt, 1.0))
        rest = jnp.where(
            sp.valid & (styp == ACTUATED_EXPAND) & (rest < sp.l_max),
            rest + sp.rate * dt,
            jnp.where(
                sp.valid & (styp == ACTUATED_CONTRACT)
                & (rest > sp.l_min),
                rest - sp.rate * dt, rest))
        new_rem_rest = rest
    mag = sp.k * (rest * scale - length)
    if has_damping:
        vl = jnp.take(vel_all, sp.left, axis=1)
        vr = jnp.take(vel_all, sp.right, axis=1)
        axial = jnp.sum((vl - vr) * (diff * inv), axis=0)
        mag = mag + axial * sp.damping
    f = jnp.where(sp.valid, mag, 0.0) * (diff * inv)       # [3, S]
    li = sp.left - my0
    ri = sp.right - my0
    li_s = jnp.where((li >= 0) & (li < b), li, b)          # b = drop row
    ri_s = jnp.where((ri >= 0) & (ri < b), ri, b)
    buf = jnp.zeros((3, b + 1), pos_all.dtype)
    buf = buf.at[:, li_s].add(-f).at[:, ri_s].add(f)
    return buf[:, :b], new_rem_rest


def _roll_gather(x: jax.Array, d: int) -> jax.Array:
    """Roll reading flat index n+d along the last axis.

    A plain lane roll measures fastest here: an alternative that decomposes
    the shift on a [R, 128] view into sublane row-rolls + one <128 lane
    rotation was 1.36x faster in an isolated spring-pass microbenchmark but
    1.56x SLOWER inside the full fused step (A/B at the 1M-spring config),
    so the simple form stays.
    """
    return jnp.roll(x, -d, axis=-1)


def _roll_scatter(x: jax.Array, d: int) -> jax.Array:
    """Inverse of _roll_gather: place value from n at n+d."""
    return jnp.roll(x, d, axis=-1)


def stencil_spring_forces(
    masses: MassState,
    st,  # StencilState
    deltas: tuple,
    t: jax.Array,
    dt: jax.Array,
    has_breathing: bool,
    has_damping: bool = True,
    all_valid: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Spring forces for offset-bucketed families via lane rotations.

    Family f connects left mass n to right mass n + deltas[f]; the endpoint
    'gather' is jnp.roll(x, -delta) and the force 'scatter' back onto the
    right endpoint is jnp.roll(f, +delta).  Same physics as spring_forces()
    (reference computeSpringForces, sim.cu:1157-1200), zero irregular memory
    traffic.  Returns (accumulated mass force [3, N], new rest [F, N]).

    Roll wrap-around is harmless: wrapped lanes correspond to mask=False
    slots whose force is zeroed before the inverse rotation.
    """
    pos, vel, valid = masses.pos, masses.vel, masses.valid
    f_acc = jnp.zeros_like(pos)
    new_rest = st.rest
    for fi, d in enumerate(deltas):
        pos_r = _roll_gather(pos, d)
        diff = pos_r - pos                                   # right - left
        length = _safe_norm(jnp.sum(diff * diff, axis=0))    # [N]
        inv_len = jnp.where(length > 0,
                            1.0 / jnp.where(length > 0, length, 1.0), 0.0)
        unit = diff * inv_len

        pair_ok = st.mask[fi]
        if not all_valid:
            pair_ok = pair_ok & valid & _roll_gather(valid, d)

        rest = st.rest[fi]
        if has_breathing:
            styp = st.type[fi]
            sin_wt = jnp.sin(st.omega[fi] * t)
            scale = jnp.where(
                styp == ACTIVE_CONTRACT_THEN_EXPAND, 1.0 - 0.2 * sin_wt,
                jnp.where(styp == ACTIVE_EXPAND_THEN_CONTRACT,
                          1.0 + 0.2 * sin_wt, 1.0))
            # invalid springs never actuate (reference early-return,
            # sim.cu:1163)
            rest = jnp.where(
                pair_ok & (styp == ACTUATED_EXPAND) & (rest < st.l_max[fi]),
                rest + st.rate[fi] * dt,
                jnp.where(
                    pair_ok & (styp == ACTUATED_CONTRACT)
                    & (rest > st.l_min[fi]),
                    rest - st.rate[fi] * dt, rest))
            new_rest = new_rest.at[fi].set(rest)
        else:
            scale = 1.0

        mag = st.k[fi] * (rest * scale - length)
        if has_damping:
            vel_r = _roll_gather(vel, d)
            axial_dv = jnp.sum((vel - vel_r) * unit, axis=0)  # v_l - v_r
            mag = mag + axial_dv * st.damping[fi]
        f = jnp.where(pair_ok, mag, 0.0) * unit              # [3, N]
        # -f at the left endpoint (index n), +f at the right (n + d)
        f_acc = f_acc - f + _roll_scatter(f, d)
    return f_acc, new_rest


def scatter_spring_forces(
    f_springs: jax.Array,
    topo: Topology,
    fixed: jax.Array,
    n_masses: int,
    mode: ScatterMode,
) -> jax.Array:
    """Accumulate +f on right endpoints, -f on left, skipping fixed masses.

    Replaces the reference's atomicVecAdd scatter (sim.cu:1189-1196,
    vec.cu:13-37) with a deterministic reduction.  GATHER mode turns the
    scatter into a per-mass gather over precomputed incidence lists; SEGMENT
    mode uses a sorted segment-sum.
    """
    if mode == ScatterMode.GATHER:
        # Append a zero column so the padding index S reads zeros.
        zero = jnp.zeros((3, 1), dtype=f_springs.dtype)
        fpad = jnp.concatenate([f_springs, zero], axis=1)     # [3, S+1]
        comps = []
        for c in range(3):
            g = jnp.take(fpad[c], topo.inc_idx, axis=0)       # [N, D]
            comps.append(jnp.sum(g * topo.inc_sign, axis=1))  # [N]
        mf = jnp.stack(comps, axis=0)                         # [3, N]
    else:
        both = jnp.concatenate([f_springs, -f_springs], axis=1)  # [3, 2S]
        sortd = both[:, topo.seg_perm]
        comps = [
            jax.ops.segment_sum(
                sortd[c], topo.seg_ids, num_segments=n_masses,
                indices_are_sorted=True,
            )
            for c in range(3)
        ]
        mf = jnp.stack(comps, axis=0)
    # Spring forces are not applied to fixed masses (sim.cu:1187-1193).
    return jnp.where(fixed, 0.0, mf)


def _vdot(a: jax.Array, n: jax.Array) -> jax.Array:
    """dot of [3, N] field with [3] or [3, N] vector -> [N]."""
    return jnp.sum(a * (n[:, None] if n.ndim == 1 else n), axis=0)


def apply_contact_plane(
    f: jax.Array, pos: jax.Array, vel: jax.Array,
    normal: jax.Array, offset: jax.Array, fk: jax.Array, fs: jax.Array,
    normal_coeff: float, static_friction_hint: bool = True,
) -> jax.Array:
    """One global contact plane, applied to all masses.

    Reference: CudaContactPlane::applyForce (object.cu:76-109).
      disp = dot(pos, n) - offset
      friction (only if disp < 0 and any friction coeff > 0), computed from
      the force accumulated SO FAR (order matters):
        kinetic (|v_perp| > 1e-16): f -= v_perp * fk*|f_n| / |v_perp|
        static  (otherwise):        f -= f_perp if fs*|f_n| > |f_perp|
      then penalty: f += (disp < 0) * (-disp) * NORMAL * n
    ``normal``/``offset``/``fk``/``fs`` are scalars or [] arrays for one plane.
    """
    n = normal  # [3] (global plane) or [3, N] (per-mass local plane)
    nb = n[:, None] if n.ndim == 1 else n                     # broadcastable
    disp = _vdot(pos, n) - offset                             # [N]
    inside = disp < 0

    # ``static_friction_hint=False`` means the caller knows at trace time
    # that both coefficients are zero -> skip the friction math entirely.
    if static_friction_hint:
        fn_mag = _vdot(f, n)                                  # [N] signed
        f_n = fn_mag * nb                                     # [3, N]
        has_friction = (fs > 0) | (fk > 0)
        v_perp = vel - _vdot(vel, n) * nb                     # [3, N]
        v_norm = _safe_norm(jnp.sum(v_perp * v_perp, axis=0))  # [N]
        kinetic = v_norm > 1e-16
        fn_abs = jnp.abs(fn_mag)                              # |normal comp|
        safe_vn = jnp.where(kinetic, v_norm, 1.0)
        f_kin = f - v_perp * (fk * fn_abs / safe_vn)          # kinetic branch
        f_perp = f - f_n
        fp_norm = _safe_norm(jnp.sum(f_perp * f_perp, axis=0))
        f_sta = jnp.where(fs * fn_abs > fp_norm, f - f_perp, f)  # static br.
        f_fric = jnp.where(kinetic, f_kin, f_sta)
        f = jnp.where(inside & has_friction, f_fric, f)

    contact = jnp.where(inside, -disp * normal_coeff, 0.0)    # [N]
    return f + contact * nb


def apply_ball(
    f: jax.Array, pos: jax.Array, center: jax.Array, radius: jax.Array,
    normal_coeff: float,
) -> jax.Array:
    """One global ball constraint: radial penalty inside the ball.

    Reference: CudaBall::applyForce (object.cu:56-59):
      f += (|pos - c| <= r) ? NORMAL * (pos - c) / |pos - c| : 0
    Guarded at dist == 0 (reference would NaN).
    """
    d = pos - center[:, None]                                 # [3, N]
    dist = _safe_norm(jnp.sum(d * d, axis=0))                 # [N]
    safe = jnp.where(dist > 0, dist, 1.0)
    push = jnp.where((dist <= radius) & (dist > 0), normal_coeff / safe, 0.0)
    return f + d * push


def apply_constraint_plane(
    f: jax.Array, vel: jax.Array, normal: jax.Array, friction: jax.Array,
    active: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Per-mass constraint plane: project out normal force and velocity.

    Reference: CudaConstraintPlane::applyForce (object.cu:118-127).  NOTE the
    reference computes |v| BEFORE zeroing the normal velocity component, then
    uses the UPDATED velocity over the OLD norm in the friction term.
    ``normal`` is [3, N] (per-mass), ``active`` is [N] bool.
    """
    nf = _vdot(f, normal)                                     # [N]
    f2 = f - normal * nf
    v_norm = _safe_norm(jnp.sum(vel * vel, axis=0))
    moving = v_norm >= 1e-16
    v2 = vel - normal * _vdot(vel, normal)
    safe_vn = jnp.where(moving, v_norm, 1.0)
    f3 = f2 - friction * nf * v2 / safe_vn
    f_out = jnp.where(active, jnp.where(moving, f3, f2), f)
    v_out = jnp.where(active & moving, v2, vel)
    return f_out, v_out


def apply_direction(
    f: jax.Array, vel: jax.Array, tangent: jax.Array, friction: jax.Array,
    active: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Per-mass direction constraint: allow motion only along a tangent.

    Reference: CudaDirection::applyForce (object.cu:136-144):
      nf = f - dot(f, t) t;  f -= nf
      if |v| >= 1e-16: v = t dot(v, t);  f += -|nf| * friction * t
    """
    nf = f - tangent * _vdot(f, tangent)                      # [3, N]
    f2 = f - nf
    v_norm = _safe_norm(jnp.sum(vel * vel, axis=0))
    moving = v_norm >= 1e-16
    nf_norm = _safe_norm(jnp.sum(nf * nf, axis=0))
    f3 = f2 - nf_norm * friction * tangent
    f_out = jnp.where(active, jnp.where(moving, f3, f2), f)
    v_out = jnp.where(active & moving, tangent * _vdot(vel, tangent), vel)
    return f_out, v_out


def apply_global_constraints(
    f: jax.Array, masses: MassState, gcon: GlobalConstraints,
    n_planes: int, n_balls: int, normal_coeff: float,
    plane_friction: tuple = (),
) -> jax.Array:
    """All global planes then all balls, in registration order (sim.cu:1303-1309)."""
    for p in range(n_planes):
        f = apply_contact_plane(
            f, masses.pos, masses.vel,
            gcon.plane_normal[p], gcon.plane_offset[p],
            gcon.plane_fk[p], gcon.plane_fs[p], normal_coeff,
            static_friction_hint=(plane_friction[p] if p < len(plane_friction)
                                  else True),
        )
    for b in range(n_balls):
        f = apply_ball(f, masses.pos, gcon.ball_center[b], gcon.ball_radius[b],
                       normal_coeff)
    return f


def apply_local_constraints(
    f: jax.Array, vel: jax.Array, masses: MassState, lcon: LocalConstraints,
    caps: Tuple[int, int, int, int], normal_coeff: float,
) -> Tuple[jax.Array, jax.Array]:
    """Per-mass local constraints in reference order: contact planes, balls,
    constraint planes, directions (sim.cu:1311-1326).  Slot j of a type is
    active for mass n iff j < count[n]."""
    cap_cp, cap_ball, cap_pl, cap_dir = caps
    for j in range(cap_cp):
        active = j < lcon.cp_count
        n = lcon.cp_normal[:, j, :].T                         # [3, N]
        f_new = apply_contact_plane(
            f, masses.pos, vel, n, lcon.cp_offset[:, j],
            lcon.cp_fk[:, j], lcon.cp_fs[:, j], normal_coeff,
        )
        f = jnp.where(active, f_new, f)
    for j in range(cap_ball):
        active = j < lcon.ball_count
        c = lcon.ball_center[:, j, :].T                       # [3, N]
        d = masses.pos - c
        dist = _safe_norm(jnp.sum(d * d, axis=0))
        safe = jnp.where(dist > 0, dist, 1.0)
        push = jnp.where((dist <= lcon.ball_radius[:, j]) & (dist > 0),
                         normal_coeff / safe, 0.0)
        f = jnp.where(active, f + d * push, f)
    for j in range(cap_pl):
        active = (j < lcon.pl_count)
        f, vel = apply_constraint_plane(
            f, vel, lcon.pl_normal[:, j, :].T, lcon.pl_friction[:, j], active,
        )
    for j in range(cap_dir):
        active = (j < lcon.dir_count)
        f, vel = apply_direction(
            f, vel, lcon.dir_tangent[:, j, :].T, lcon.dir_friction[:, j], active,
        )
    return f, vel


def magnet_forces(masses: MassState, cutoff: float,
                  chunk: int = 2048) -> jax.Array:
    """All-pairs magnet interaction within ``cutoff`` (masked O(N^2)).

    Reference: computeExternalMagnetForce (sim.cu:1223-1241), driven through a
    2-D occupancy grid (sim.cu:1250-1281).  For each receiver i and source j:
      temp = pos_i - pos_j; if |temp| < 0.14:
        shell:  += |inter| * stiffness_i * temp_hat   when inter < 0,
                where inter = |temp| - (rad_i + rad_j)
        magnet: -= mag_scale_j * max_mag_force_i / max(|temp|^2, 1e-12) * temp_hat
    The TPU version is a masked dense pairwise computation -- deterministic,
    no grid rebuild, exact within the cutoff (the reference grid is an
    approximation that can overflow cells).  Magnet scenes are small-N (robot
    links); a cell-binned variant can be added for large N.
    """
    pos = masses.pos                                          # [3, N]
    n = pos.shape[1]

    def against_sources(src_pos, src_rad, src_scale, src_valid, src_idx):
        """Force on every receiver i from a chunk of sources j; [3, N]."""
        diff = pos[:, :, None] - src_pos[:, None, :]          # [3, N, C]
        dist2 = jnp.sum(diff * diff, axis=0)                  # [N, C]
        dist = _safe_norm(dist2)
        self_pair = (
            jax.lax.broadcasted_iota(jnp.int32, dist.shape, 0)
            == src_idx[None, :])
        pair_ok = ((dist < cutoff) & ~self_pair
                   & masses.valid[:, None] & src_valid[None, :])
        safe_dist = jnp.where(dist > 0, dist, 1.0)
        inter = dist - (masses.mag_rad[:, None] + src_rad[None, :])
        shell = jnp.where(
            inter < 0, jnp.abs(inter) * masses.mag_stiffness[:, None], 0.0)
        attract = (src_scale[None, :] * masses.mag_maxf[:, None]
                   / jnp.maximum(dist2, 1e-12))
        coeff = jnp.where(pair_ok, (shell - attract) / safe_dist, 0.0)
        return jnp.sum(diff * coeff[None, :, :], axis=2)      # [3, N]

    if n <= chunk:
        return against_sources(pos, masses.mag_rad, masses.mag_scale,
                               masses.valid,
                               jnp.arange(n, dtype=jnp.int32))

    # big scenes: scan over source chunks to bound the [3, N, C] temporary
    # (O(N^2) compute remains; a cell-binned neighbor structure is the
    # planned upgrade if large magnetic scenes ever matter -- the reference
    # only uses magnets for few-mass RobotLink scenes)
    n_chunks = (n + chunk - 1) // chunk
    n_pad = n_chunks * chunk
    pad = lambda a, fill=0: jnp.pad(a, [(0, 0)] * (a.ndim - 1)
                                    + [(0, n_pad - n)], constant_values=fill)
    src_pos = pad(pos).reshape(3, n_chunks, chunk).transpose(1, 0, 2)
    src_rad = pad(masses.mag_rad).reshape(n_chunks, chunk)
    src_scale = pad(masses.mag_scale).reshape(n_chunks, chunk)
    src_valid = pad(masses.valid).reshape(n_chunks, chunk)
    src_idx = pad(jnp.arange(n, dtype=jnp.int32), fill=-1).reshape(
        n_chunks, chunk)

    def scan_body(acc, xs):
        sp, sr, ss, sv, si = xs
        return acc + against_sources(sp, sr, ss, sv, si), None

    init = jnp.zeros_like(pos)
    total, _ = jax.lax.scan(
        scan_body, init, (src_pos, src_rad, src_scale, src_valid, src_idx))
    return total
