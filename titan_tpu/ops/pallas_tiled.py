"""Grid-tiled Pallas step kernel for scenes too big for the VMEM-resident
kernel (ops/pallas_step.py) -- e.g. the 100^3 config (1M masses / 12.7M
springs).

Per step, the grid walks column tiles of T masses.  Position arrays are
pre-padded with H = max|delta| (lane-aligned) zeros on both sides and
reshaped to [., rows, 128]; each tile DMAs one halo'd window of rows from
HBM, then runs the same 2D-decomposed stencil rolls as the VMEM kernel over
the window (wrap-around lanes land outside the tile's extraction range, so
they're harmless).  Everything else (gravity+extern, planes, balls, Euler)
happens on the tile rows.

Envelope: physics envelope of pallas_step minus damping (no vel halo yet),
unbounded N.  HBM traffic per step ~= state + params once (the XLA path
re-materializes per family).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Integrator
from ..state import SceneShape, SimState


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def tiled_supported(shape: SceneShape) -> bool:
    """Physics envelope of pallas_step (Euler only, no damping), any N."""
    cfg = shape.config
    if cfg.integrator is not Integrator.EULER or cfg.dtype != "float32":
        return False
    if not cfg.use_stencil or not shape.stencil_deltas:
        return False
    if (shape.has_remainder or shape.has_breathing or shape.has_damping
            or shape.has_magnets or shape.has_drag or not shape.all_valid):
        return False
    if any((shape.cap_cp, shape.cap_ball, shape.cap_pl, shape.cap_dir)):
        return False
    if not cfg.persistent_extern_force:
        return False
    h = _round_up(max(abs(d) for d in shape.stencil_deltas), 1024)
    t = _tile_size(h)
    w = t + 2 * h
    nf_pad = _round_up(len(shape.stencil_deltas), 8)
    # VMEM per tile: pos window + k/rest windows + temps; stay under ~40MB
    return 4 * w * (4 + 2 * nf_pad + 12) < 40 * 1024 * 1024


def _tile_size(h: int) -> int:
    """Tile size: >= 4 halos wide (<= 1.5x window overhead); a multiple of
    1024 so the [3, T/128, 128] block's sublane dim is divisible by 8.
    The mass array is padded up to a tile multiple inside the chunk."""
    return _round_up(max(4 * h, 8192), 1024)


def _build_kernel(shape: SceneShape, t_size: int, h: int):
    deltas = shape.stencil_deltas
    w = t_size + 2 * h
    wr, tr, hr = w // 128, t_size // 128, h // 128
    n_planes, n_balls = shape.n_planes, shape.n_balls
    plane_friction = shape.plane_friction
    clamp = shape.config.velocity_clamp
    normal_coeff = shape.config.normal_coeff

    def kernel(scal_ref, plane_ref, ball_ref,
               pos_hbm, k_hbm, rest_hbm,           # ANY [., NR', 128]
               vel_ref, cforce_ref, minv_ref, fixed_ref,  # blocked VMEM
               opos_ref, ovel_ref, oacc_ref,        # blocked VMEM out
               pos_win, param_win, sem):            # scratch
        # window shifts use the same row-roll + <128 lane rotation
        # decomposition as the VMEM kernel (2.1x over flat lane rolls)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)

        def roll_gather(x, d):
            q, r = divmod(d, 128)
            if r == 0:
                return pltpu.roll(x, (-q) % wr, 1)
            a = pltpu.roll(pltpu.roll(x, (-q) % wr, 1), 128 - r, 2)
            b = pltpu.roll(pltpu.roll(x, (-(q + 1)) % wr, 1), 128 - r, 2)
            return jnp.where(lane < 128 - r, a, b)

        def roll_scatter(x, d):
            q, r = divmod(d, 128)
            if r == 0:
                return pltpu.roll(x, q % wr, 1)
            a = pltpu.roll(pltpu.roll(x, q % wr, 1), r, 2)
            b = pltpu.roll(pltpu.roll(x, (q + 1) % wr, 1), r, 2)
            return jnp.where(lane >= r, a, b)

        t = pl.program_id(0)
        dt = scal_ref[0]
        row0 = t * tr

        cp = pltpu.make_async_copy(
            pos_hbm.at[:, pl.ds(row0, wr), :], pos_win, sem.at[0])
        cp.start()
        kcp = pltpu.make_async_copy(
            k_hbm.at[:, pl.ds(row0, wr), :], param_win.at[0], sem.at[1])
        kcp.start()
        rcp = pltpu.make_async_copy(
            rest_hbm.at[:, pl.ds(row0, wr), :], param_win.at[1], sem.at[2])
        rcp.start()
        cp.wait()
        kcp.wait()
        rcp.wait()

        pw = pos_win[0:3]                            # [3, WR, 128]
        fw = jnp.zeros_like(pw)                      # window-wide force
        for fi, d in enumerate(deltas):
            pr = roll_gather(pw, d)
            diff = pr - pw
            ln = jnp.sqrt(jnp.sum(diff * diff, axis=0))
            inv = jnp.where(ln > 0, 1.0 / jnp.where(ln > 0, ln, 1.0), 0.0)
            mag = param_win[0, fi] * (param_win[1, fi] - ln)
            f = (mag * inv) * diff
            fw = fw - f + roll_scatter(f, d)
        # extract the tile's rows (aligned slice) and add mass-level forces
        pos = pw[:, hr:hr + tr, :]
        f_acc = fw[:, hr:hr + tr, :] + cforce_ref[:]
        vel = vel_ref[:]
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

        not_fixed = 1.0 - fixed_ref[:]
        acc = f_acc * minv_ref[:]
        v2 = vel + acc * dt
        if clamp:
            vn = jnp.sqrt(jnp.sum(v2 * v2, axis=0))
            v2 = jnp.where(vn > 1.0, v2 / jnp.where(vn > 0, vn, 1.0), v2)
        v2 = v2 * not_fixed + vel * fixed_ref[:]
        opos_ref[:] = pos + v2 * dt * not_fixed
        ovel_ref[:] = v2
        oacc_ref[:] = acc * not_fixed

    return kernel


def build_tiled_chunk(shape: SceneShape):
    """Jitted chunk(state, n_steps): fori_loop of per-step tiled launches."""
    n = shape.n_masses
    h = _round_up(max(abs(d) for d in shape.stencil_deltas), 1024)
    t_size = _tile_size(h)
    n_tiles = -(-n // t_size)            # ceil: last tile covers padding
    n_t = n_tiles * t_size
    pad_n = n_t - n
    tr = t_size // 128
    w = t_size + 2 * h
    wr = w // 128
    kernel = _build_kernel(shape, t_size, h)
    n_planes, n_balls = max(shape.n_planes, 1), max(shape.n_balls, 1)
    nf = len(shape.stencil_deltas)
    nf_pad = _round_up(nf, 8)

    def blk3(i, s):
        return (0, i, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # scal
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # planes
            pl.BlockSpec(memory_space=pltpu.SMEM),   # balls
            pl.BlockSpec(memory_space=pltpu.ANY),    # pos (padded, HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),    # k   (padded, HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),    # rest(padded, HBM)
            pl.BlockSpec((3, tr, 128), blk3, memory_space=pltpu.VMEM),  # vel
            pl.BlockSpec((3, tr, 128), blk3, memory_space=pltpu.VMEM),  # cf
            pl.BlockSpec((1, tr, 128), blk3, memory_space=pltpu.VMEM),  # minv
            pl.BlockSpec((1, tr, 128), blk3, memory_space=pltpu.VMEM),  # fixed
        ],
        out_specs=[
            pl.BlockSpec((3, tr, 128), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tr, 128), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tr, 128), blk3, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, wr, 128), jnp.float32),          # pos window
            pltpu.VMEM((2, nf_pad, wr, 128), jnp.float32),  # k/rest windows
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )

    step_call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((3, n_t // 128, 128), jnp.float32)
                   for _ in range(3)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )

    @jax.jit
    def chunk(state: SimState, n_steps) -> SimState:
        m = state.masses
        k_eff = jnp.where(state.stencil.mask, state.stencil.k, 0.0)
        fpad = nf_pad - k_eff.shape[0]
        r3 = lambda x: x.reshape(x.shape[0], -1, 128)
        k_pad = r3(jnp.pad(k_eff, ((0, fpad), (h, h + pad_n))))
        rest_pad = r3(jnp.pad(state.stencil.rest,
                              ((0, fpad), (h, h + pad_n))))
        # tile-padding masses get minv=0 -> zero acceleration, inert
        minv = r3(jnp.pad((1.0 / m.m)[None, :], ((0, 0), (0, pad_n))))
        fixed = r3(jnp.pad(m.fixed.astype(m.pos.dtype)[None, :],
                           ((0, 0), (0, pad_n))))
        const_f = r3(jnp.pad(m.extern_force + m.m * state.g[:, None],
                             ((0, 0), (0, pad_n))))
        scal = state.dt.astype(jnp.float32)[None]
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

        def body(i, carry):
            pos, vel, _ = carry
            pos_pad = r3(jnp.pad(pos, ((0, 1), (h, h + pad_n))))
            vel_pad = r3(jnp.pad(vel, ((0, 0), (0, pad_n))))
            p2, v2, a2 = step_call(scal, planes, balls, pos_pad, k_pad,
                                   rest_pad, vel_pad, const_f, minv, fixed)
            flat = lambda x: x.reshape(3, n_t)[:, :n]
            return flat(p2), flat(v2), flat(a2)

        pos, vel, acc = jax.lax.fori_loop(
            0, n_steps, body, (m.pos, m.vel, m.acc))
        # the kernel zeroes fixed masses' acc each step; the reference
        # (massForcesAndUpdate early-return) and the VMEM kernel preserve the
        # prior value, so restore it once after the loop
        acc = jnp.where(m.fixed[None, :], m.acc, acc)

        dtn = jnp.asarray(n_steps, state.dt.dtype) * state.dt
        new_m = dataclasses.replace(
            m, pos=pos, vel=vel, acc=acc,
            T=m.T + jnp.where(m.fixed, 0.0, dtn))
        return dataclasses.replace(state, masses=new_m, t=state.t + dtn)

    return chunk
