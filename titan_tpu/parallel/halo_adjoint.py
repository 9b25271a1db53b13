"""Distributed fused adjoint: gradients across a device mesh.

Completes the adjoint story across all three execution tiers -- the
VMEM-resident kernel (ops/adjoint.py), the single-device grid-tiled
kernel (ops/adjoint_tiled.py), and this module: the SAME backward tile
kernel run per device shard inside ``shard_map``, exactly as
parallel/halo_tiled.py runs the forward tiled kernel per shard.

Why the gather-style transpose composes with halos unchanged: the
backward tile kernel (ops/adjoint_tiled.py) already computes every
gradient contribution to its own rows by GATHERING from a halo'd window
of the incoming cotangents and the traced state -- there is no
cross-tile scatter to exchange.  Distributed, the window pads are filled
with the neighbors' true rows instead of the global array's:

  - per BACKWARD STEP: two ``ppermute``s move the [9, HW] cotangent
    block edges (gpos, gvel, gacc) and the [6, HW] traced (pos, vel)
    edges between ring neighbors, HW = the backward's halo depth
    (2h Euler/Verlet, 4h RK2 -- ops/adjoint_tiled.py's analysis);
  - per SEGMENT: the same exchange, once, for the invariant planes
    (spring params are chunk-constant by the closed-form ACTUATED rest,
    the same property the distributed forward relies on).

The forward trace is a replay of the distributed forward itself
(per-step tiled kernel launches with fresh h-row halo exchanges,
bitwise the primal), storing each step's OWN block rows; the backward
re-derives the halo rows by exchange instead of storing them.  Per-spring
param gradients attach to the spring's own lane, owned by exactly one
shard, so bar outputs accumulate shard-locally with no collective.
Trace memory is sharded: segment * 6 * block * 4 bytes per device
(9 planes for glue scenes, below).

GLUE SCENES (magnet / remainder-spring forces, which the distributed
forward evaluates as per-step XLA glue through the kernel's
constant-force input -- halo_tiled.dist_glue_force): the same traced-cf
transpose as the single-device tiled adjoint (ops/adjoint_tiled.py),
D-way parallel.  The replay traces each step's TOTAL per-shard cf block
(and the replicated remainder-rest input); per backward step the tile
kernel emits that step's cf cotangent, which is routed through
``jax.vjp`` of the SAME per-shard glue function evaluated at the traced
values -- the glue's collectives transpose themselves (the pos/vel
``all_gather``'s cotangent comes back as a psum_scatter, landing each
shard's share of every other shard's force cotangent), per-mass magnet
param cotangents land block-sharded the same way, and the replicated
per-spring remainder params/rest-chain cotangents are ``psum``-reduced
(the rest-chain seed is masked to shard 0 so the replicated advance's
transpose is counted once).  RK2 GLUE scenes run the distributed form
of the single-device SPLIT backward (ops/adjoint_tiled.py): per step a
pass-2 tile kernel per shard transposes the second force pass and
emits the recomputed midpoint primal plus its raw cotangents, the
midpoint glue vjp runs through the per-shard glue, a SECOND cotangent
halo exchange feeds the pass-1 kernel, and the step-state glue vjp
finishes; the integrate transpose's pointwise fixed-mask pieces run
XLA-side, exactly as the single-device split.  Each split half needs
only a 2h window, so the exchange depth matches Euler/Verlet; the
trace is 12 planes (pos, vel, cf_a, cf_b) + the [seg, 2, S] per-pass
remainder-rest inputs.

Envelope (``halo_adjoint_reject_reason``): the distributed tiled
forward's envelope (parallel/halo_tiled.py) plus HW <= block (one-hop
neighbor exchange; real scenes satisfy this by construction since
block >= tile >= 4h).

Reference: the physics is computeSpringForces + massForcesAndUpdate
(sim.cu:1157-1200, 1285-1367); the reference is single-GPU and has no
gradient capability at all.
"""

from __future__ import annotations

import dataclasses
import functools as _functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Integrator
from ..ops.adjoint import assemble_ct
from ..ops.adjoint_tiled import (_bar_plan, _bwd_vmem_est,
                                 _BWD_VMEM_BUDGET, _halo_mult, _has_glue,
                                 _inv_plan, _make_bwd_call,
                                 _shrink_bwd_tile, _stage_flat,
                                 _tr_planes)
from ..ops.pallas_tiled import make_tiled_call, prep_flat_inputs
from ..state import SceneShape, SimState
from .halo_tiled import (_geometry, build_halo_tiled_chunk,
                         dist_glue_force, halo_tiled_reject_reason,
                         magnet_recv_plan)


def _geom_dist(shape: SceneShape, n_devices: int):
    """(h, hw, b, t_fwd, t_bwd): the distributed forward's geometry plus
    the backward's halo depth and (possibly smaller, block-dividing)
    tile."""
    h, b, t_fwd = _geometry(shape, n_devices)
    hw = _halo_mult(shape) * h
    t_bwd = _shrink_bwd_tile(shape, t_fwd, hw)
    return h, hw, b, t_fwd, t_bwd


def halo_adjoint_reject_reason(shape: SceneShape, n_devices: int):
    """None if the distributed adjoint accepts this scene on
    ``n_devices``, else a one-line reason."""
    r = halo_tiled_reject_reason(shape, n_devices)
    if r is not None:
        return r
    if not shape.config.persistent_extern_force:
        return "strict per-step extern_force mode"
    h, hw, b, t_fwd, t_bwd = _geom_dist(shape, n_devices)
    if hw > b:
        return (f"backward halo {hw} exceeds the per-device block {b} "
                "(one-hop neighbor exchange)")
    if _bwd_vmem_est(shape, t_bwd, hw) >= _BWD_VMEM_BUDGET:
        return ("backward tile window exceeds the VMEM budget even at "
                "the minimum tile")
    return None


def halo_adjoint_supported(shape: SceneShape, n_devices: int) -> bool:
    return halo_adjoint_reject_reason(shape, n_devices) is None


def _halo_adjoint_segment(shape: SceneShape, mesh: Mesh, seg: int,
                          axis: str = "shard"):
    """Build (and cache) the distributed custom_vjp segment.  Cached per
    (shape, mesh, seg, axis) -- jax Meshes hash by devices+axis names --
    so per-iteration grad_rollout(mesh=...) calls reuse one traced
    program (rationale in ops/adjoint.py's _adjoint_segment).
    TITAN_FMATH keys the build-time kernel math, and the monkeypatchable
    bindings pallas_tiled._tile_size / halo_tiled._tile_size (tests and
    the graft dryrun shrink them) and pl.pallas_call (interpret-mode
    patches) join the key so a patched build is never served a segment
    traced under the shipped geometry (functions key by identity)."""
    import os as _os

    from jax.experimental import pallas as _pl

    from ..ops import pallas_tiled as _pt
    from . import halo_tiled as _ht
    return _halo_adjoint_segment_cached(
        shape, mesh, seg, axis, _os.environ.get("TITAN_FMATH", ""),
        _pt._tile_size, _ht._tile_size, _pl.pallas_call)


@_functools.lru_cache(maxsize=16)
def _halo_adjoint_segment_cached(shape: SceneShape, mesh: Mesh, seg: int,
                                 axis: str, _fmath: str, _tile, _htile,
                                 _pcall):
    fwd_chunk = build_halo_tiled_chunk(shape, mesh, axis)
    n = shape.n_masses
    n_dev = mesh.shape[axis]
    h, hw, b, t_fwd, t_bwd = _geom_dist(shape, n_dev)
    n_dist = n_dev * b
    pad_n = n_dist - n
    n_tiles_f = b // t_fwd
    n_tiles_b = b // t_bwd
    offs, ni = _inv_plan(shape)
    boffs, nb = _bar_plan(shape)
    nf = len(shape.stencil_deltas)
    cfg = shape.config
    rk2 = cfg.integrator is Integrator.RK2
    verlet = cfg.integrator is Integrator.VERLET
    has_damping = shape.has_damping
    has_glue = _has_glue(shape)
    rk2_glue = has_glue and rk2
    np_tr = _tr_planes(shape)

    if rk2:
        call_a = make_tiled_call(shape, t_fwd, h, n_tiles_f, "rk2a")
        call_b = make_tiled_call(shape, t_fwd, h, n_tiles_f, "rk2b")
    else:
        step_call = make_tiled_call(shape, t_fwd, h, n_tiles_f, "single")
    if rk2_glue:
        bwd_call_b = _make_bwd_call(shape, t_bwd, hw, n_tiles_b, offs,
                                    ni, boffs, nb, mode="rk2b")
        bwd_call_a = _make_bwd_call(shape, t_bwd, hw, n_tiles_b, offs,
                                    ni, boffs, nb, mode="rk2a")
    else:
        bwd_call = _make_bwd_call(shape, t_bwd, hw, n_tiles_b, offs, ni,
                                  boffs, nb)
    to_prev = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    to_next = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def body_fn(inp):
        r3 = lambda x: x.reshape(x.shape[0], -1, 128)

        def ext(x, k):
            """[., B] -> [., k + B + k] with both ring neighbors' edge
            rows (the global array end is padded/masked, so the ring
            wrap contributes nothing -- halo_tiled.py's argument)."""
            head_from_next = jax.lax.ppermute(x[:, :k], axis, to_prev)
            tail_from_prev = jax.lax.ppermute(x[:, -k:], axis, to_next)
            return jnp.concatenate([tail_from_prev, x, head_from_next],
                                   axis=1)

        # forward-replay chunk constants (h halos, as the primal)
        param_hbm = r3(ext(inp["param"], h)) if "param" in inp else None
        mask_hbm = r3(ext(inp["bits"], h)) if "bits" in inp else None
        minv_t, fixed_t = r3(inp["minv"]), r3(inp["fixed"])
        cf_t = r3(inp["cf"])
        drag_t = r3(inp["drag"]) if "drag" in inp else None
        lc_t = r3(inp["lc"]) if "lc" in inp else None
        fparams, planes, balls = inp["fparams"], inp["planes"], inp["balls"]
        dt32, t032 = inp["scal0"][0], inp["scal0"][1]

        # glue constants, hoisted exactly like the distributed forward
        # (halo_tiled.build_halo_tiled_chunk -- the replay must be
        # bitwise the primal)
        my0 = jax.lax.axis_index(axis) * b
        plan = valid_loc = mag4 = mag_src = None
        if shape.has_magnets:
            valid_loc = inp["valid"][0]
            mag4 = jnp.stack([inp["mag_rad"][0], inp["mag_stiffness"][0],
                              inp["mag_maxf"][0], inp["mag_scale"][0]])
            mag_src = tuple(
                jax.lax.all_gather(x, axis, axis=0, tiled=True)
                for x in (mag4[0], mag4[3], valid_loc))
            plan = magnet_recv_plan(shape, b, valid_loc, mag4[2])
        sp_rep = inp.get("springs")

        def call_args(scal, pos_c, vel_c, acc_c=None, extra3=None,
                      cf_step=None):
            if has_damping:
                state_hbm = r3(jnp.concatenate([ext(pos_c, h),
                                                ext(vel_c, h)], axis=0))
            else:
                state_hbm = r3(ext(pos_c, h))
            args = [scal, planes, balls, fparams, state_hbm]
            if param_hbm is not None:
                args.append(param_hbm)
            if mask_hbm is not None:
                args.append(mask_hbm)
            if not has_damping:
                args.append(r3(vel_c))
            if acc_c is not None:
                args.append(r3(acc_c))
            args += [cf_t if cf_step is None else cf_step, minv_t, fixed_t]
            if extra3 is not None:
                args += [r3(x) for x in extra3]
            if drag_t is not None:
                args.append(drag_t)
            if lc_t is not None:
                args.append(lc_t)
            return args

        fl3 = lambda x: x.reshape(3, b)

        # ---- forward replay, writing this shard's (pos, vel) per step
        # -- plus, for glue scenes, the step's TOTAL cf block and the
        # replicated remainder-rest input -- (bitwise the distributed
        # primal: same kernel, same exchanges, same glue, same op order
        # -- halo_tiled.py's bitwise argument) ----
        def fbody(i, carry):
            pos, vel, acc, rem_rest, trace, rtrace = carry
            i32 = i.astype(jnp.float32)
            t_i = t032 + i32 * dt32
            cf_step = cf_flat = None
            rest_in = rem_rest
            if has_glue:
                extra, rem_rest = dist_glue_force(
                    shape, axis, b, my0, plan, inp["fixed"], valid_loc,
                    pos, vel, t_i, dt32, rem_rest, sp_rep, mag4, mag_src)
                cf_flat = inp["cf"] + extra
                cf_step = r3(cf_flat)
            if rk2:
                scal = jnp.stack([dt32, t_i, 2.0 * i32])
                ph, vh, v1 = call_a(*call_args(scal, pos, vel,
                                               cf_step=cf_step))
                ph, vh, v1 = fl3(ph), fl3(vh), fl3(v1)
                cf2 = None
                if has_glue:
                    # glue re-evaluated at the midpoint, advancing the
                    # remainder rest per pass (the primal's order); the
                    # backward re-linearizes each pass at its own rest
                    # INPUT, so both are traced
                    rest_mid = rem_rest
                    extra2, rem_rest = dist_glue_force(
                        shape, axis, b, my0, plan, inp["fixed"],
                        valid_loc, ph, vh, t_i + 0.5 * dt32, dt32,
                        rem_rest, sp_rep, mag4, mag_src)
                    cf_b_flat = inp["cf"] + extra2
                    cf2 = r3(cf_b_flat)
                    planes_i = jnp.concatenate(
                        [pos, vel, cf_flat, cf_b_flat], axis=0)
                    if shape.has_remainder:
                        rtrace = jax.lax.dynamic_update_slice(
                            rtrace, jnp.stack([rest_in, rest_mid])[None],
                            (i, 0, 0))
                else:
                    planes_i = jnp.concatenate([pos, vel], axis=0)
                scal2 = jnp.stack([dt32, t_i + 0.5 * dt32,
                                   2.0 * i32 + 1.0])
                p2, v2, a2 = call_b(*call_args(scal2, ph, vh,
                                               extra3=(pos, v1, vel),
                                               cf_step=cf2))
            else:
                if has_glue:
                    planes_i = jnp.concatenate([pos, vel, cf_flat],
                                               axis=0)
                    if shape.has_remainder:
                        # the step's rest INPUT (before the glue's
                        # actuation advance) -- the backward
                        # re-linearizes the glue at exactly this point
                        rtrace = jax.lax.dynamic_update_slice(
                            rtrace, rest_in[None], (i, 0))
                else:
                    planes_i = jnp.concatenate([pos, vel], axis=0)
                scal = jnp.stack([dt32, t_i, i32])
                p2, v2, a2 = step_call(*call_args(
                    scal, pos, vel, acc_c=acc if verlet else None,
                    cf_step=cf_step))
            trace = jax.lax.dynamic_update_slice(
                trace, planes_i[None], (i, 0, 0))
            return fl3(p2), fl3(v2), fl3(a2), rem_rest, trace, rtrace

        trace0 = jnp.zeros((seg, np_tr, b), jnp.float32)
        if shape.has_remainder:
            rem0 = inp["rem_rest"]
            rsh = ((seg, 2) if rk2 else (seg,)) + rem0.shape
            rtrace0 = jnp.zeros(rsh, rem0.dtype)
        else:
            rem0 = jnp.zeros((0,), jnp.float32)
            rtrace0 = jnp.zeros((seg, 0), jnp.float32)
        _, _, _, _, trace, rtrace = jax.lax.fori_loop(
            0, seg, fbody,
            (inp["pos"], inp["vel"], inp["acc"], rem0, trace0, rtrace0))

        # ---- reverse sweep: per step, exchange cotangent + trace halos
        # and run the backward tile kernel on this shard's windows ----
        inv_win = r3(ext(inp["inv"], hw))        # once per segment
        fx = inp["fixed"]                        # [1, b] move mask

        def glue_vjp_d(t_i, pos_c0, vel_c0, rest_e0, cfbar, chain_seed,
                       gl):
            """jax.vjp of one per-shard glue evaluation at its traced
            linearization point: the glue's collectives transpose
            themselves (module docstring).  Returns the pos/vel
            cotangent contributions [3, b], the psum-reduced rest-INPUT
            chain for the preceding pass/step, and the updated param
            accumulators."""
            args = [pos_c0, vel_c0]
            if shape.has_remainder:
                args += [rest_e0, sp_rep.k, sp_rep.damping,
                         sp_rep.omega, sp_rep.rate]
            if shape.has_magnets:
                args.append(mag4)

            def glue_d(pos_c, vel_c, *va):
                a = list(va)
                rest_e, sp = None, sp_rep
                if shape.has_remainder:
                    rest_e, k_e, damp_e, omega_e, rate_e = a[:5]
                    a = a[5:]
                    sp = dataclasses.replace(
                        sp_rep, k=k_e, damping=damp_e, omega=omega_e,
                        rate=rate_e)
                mag4_e = a[0] if shape.has_magnets else None
                # mag_src=None: gather the sources from mag4_e HERE
                # so their cotangents ride the all_gather transpose
                extra, new_rest = dist_glue_force(
                    shape, axis, b, my0, plan, inp["fixed"],
                    valid_loc, pos_c, vel_c, t_i, dt32, rest_e, sp,
                    mag4_e, mag_src=None)
                if shape.has_remainder:
                    return extra, new_rest
                return extra

            _, vjp_fn = jax.vjp(glue_d, *args)
            if shape.has_remainder:
                # seed the replicated rest-chain cotangent on shard 0
                # only: its transpose (the advance + rate terms) is
                # identical on every shard and the per-spring grads
                # are psum-reduced -- masking counts it exactly once
                seed = jnp.where(jax.lax.axis_index(axis) == 0,
                                 chain_seed, jnp.zeros_like(chain_seed))
                cts = vjp_fn((cfbar, seed))
            else:
                cts = vjp_fn(cfbar)
            new_chain = None
            if shape.has_remainder:
                # the chain feeds the next (earlier) pass's seed, so
                # reduce it every call; the param partials reduce once
                # at segment end
                new_chain = jax.lax.psum(cts[2], axis)
                gl = dict(gl, remp=gl["remp"] + jnp.stack(cts[3:7]))
            if shape.has_magnets:
                gl = dict(gl, mag=gl["mag"] + cts[-1])
            return cts[0], cts[1], new_chain, gl

        def bbody(j, carry):
            gp, gv, ga, bars, gl = carry
            s = seg - 1 - j
            sf = s.astype(jnp.float32)
            tr_s = jax.lax.dynamic_slice(trace, (s, 0, 0),
                                         (1, np_tr, b))[0]
            st_win = r3(ext(tr_s, hw))
            cot_win = r3(ext(jnp.concatenate([gp, gv, ga], axis=0), hw))
            scal = jnp.stack([dt32, t032 + sf * dt32, sf])
            gout, bars_s = bwd_call(scal, planes, balls, st_win, cot_win,
                                    inv_win)
            gout = gout.reshape(9, b)
            bars_s = bars_s.reshape(nb, b)
            gp, gv, ga = gout[0:3], gout[3:6], gout[6:9]
            if has_glue:
                # the step's cf cotangent, routed through jax.vjp of the
                # SAME per-shard glue at the traced linearization point
                cfbar = bars_s[boffs["cf"]:boffs["cf"] + 3]
                rest_s = None
                if shape.has_remainder:
                    rest_s = jax.lax.dynamic_slice(
                        rtrace, (s, 0), (1,) + rtrace.shape[1:])[0]
                gp_a, gv_a, chain, gl = glue_vjp_d(
                    t032 + sf * dt32, tr_s[0:3], tr_s[3:6], rest_s,
                    cfbar, gl["grem"] if shape.has_remainder else None,
                    gl)
                gp = gp + gp_a
                gv = gv + gv_a
                if shape.has_remainder:
                    gl = dict(gl, grem=chain)
            return gp, gv, ga, bars + bars_s, gl

        def bbody_rk2glue(j, carry):
            """Split RK2 backward, distributed (module docstring):
            pass-2 kernel -> midpoint glue vjp -> SECOND cotangent halo
            exchange -> pass-1 kernel -> step-state glue vjp; the
            integrate transpose's pointwise fixed-mask pieces run
            XLA-side, exactly as the single-device split
            (ops/adjoint_tiled.build_tiled_bwd.body_rk2glue)."""
            gp, gv, ga, bars, gl = carry
            s = seg - 1 - j
            sf = s.astype(jnp.float32)
            tr_s = jax.lax.dynamic_slice(trace, (s, 0, 0),
                                         (1, np_tr, b))[0]
            st_win = r3(ext(tr_s, hw))
            scal = jnp.stack([dt32, t032 + sf * dt32, sf])
            cot_win = r3(ext(jnp.concatenate([gp, gv, ga], axis=0), hw))
            outB, bars_b = bwd_call_b(scal, planes, balls, st_win,
                                      cot_win, inv_win)
            outB = outB.reshape(12, b)
            bars_b = bars_b.reshape(nb, b)
            pos_h, vel_h = outB[0:3], outB[3:6]
            gph, gvh = outB[6:9], outB[9:12]
            t_i = t032 + sf * dt32
            rest2 = None
            if shape.has_remainder:
                rest2 = jax.lax.dynamic_slice(
                    rtrace, (s, 0, 0), (1,) + rtrace.shape[1:])[0]
            cfbar_b = bars_b[boffs["cf"]:boffs["cf"] + 3]
            gp_b, gv_b, chain, gl = glue_vjp_d(
                t_i + 0.5 * dt32, pos_h, vel_h,
                rest2[1] if rest2 is not None else None, cfbar_b,
                gl["grem"] if shape.has_remainder else None, gl)
            gph = gph + gp_b
            gvh = gvh + gv_b
            cotA = r3(ext(jnp.concatenate([gph, gvh, gv], axis=0), hw))
            outA, bars_a = bwd_call_a(scal, planes, balls, st_win, cotA,
                                      inv_win)
            outA = outA.reshape(6, b)
            bars_a = bars_a.reshape(nb, b)
            gp_c, gv_c = outA[0:3], outA[3:6]
            cfbar_a = bars_a[boffs["cf"]:boffs["cf"] + 3]
            gp_a, gv_a, chain, gl = glue_vjp_d(
                t_i, tr_s[0:3], tr_s[3:6],
                rest2[0] if rest2 is not None else None, cfbar_a,
                chain, gl)
            if shape.has_remainder:
                gl = dict(gl, grem=chain)
            gp_new = gp + gph + gp_c + gp_a
            gv_new = gv * fx + gv_c + gv_a
            ga_new = ga * fx
            return gp_new, gv_new, ga_new, bars + bars_b + bars_a, gl

        gl0 = {}
        if shape.has_remainder:
            gl0["grem"] = inp["grest"]
            gl0["remp"] = jnp.zeros((4,) + inp["grest"].shape,
                                    jnp.float32)
        if shape.has_magnets:
            gl0["mag"] = jnp.zeros((4, b), jnp.float32)
        init = (inp["gpos"], inp["gvel"], inp["gacc"],
                jnp.zeros((nb, b), jnp.float32), gl0)
        step_body = bbody_rk2glue if rk2_glue else bbody
        gp, gv, ga, bars, gl = jax.lax.fori_loop(0, seg, step_body, init)
        outs = [gp, gv, ga, bars]
        if shape.has_remainder:
            outs += [gl["grem"], jax.lax.psum(gl["remp"], axis)]
        if shape.has_magnets:
            outs.append(gl["mag"])
        return tuple(outs)

    def bwd_run(state: SimState, gpos, gvel, gacc, grest=None):
        p = prep_flat_inputs(shape, state)
        st = _stage_flat(shape, state)
        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad_n)))
        m = state.masses

        sh = P(None, axis)
        rep = P()
        inp = {"pos": padf(m.pos.astype(jnp.float32)),
               "vel": padf(m.vel.astype(jnp.float32)),
               "acc": padf(m.acc.astype(jnp.float32)),
               "gpos": padf(gpos), "gvel": padf(gvel), "gacc": padf(gacc),
               "minv": padf(p["minv_flat"]),
               "fixed": padf(p["fixed_flat"]),
               "cf": padf(p["const_flat"]),
               "inv": padf(st["inv_flat"]),
               "fparams": p["fparams"], "planes": p["planes"],
               "balls": p["balls"],
               "scal0": jnp.stack([state.dt.astype(jnp.float32),
                                   state.t.astype(jnp.float32)])}
        specs = {k: sh for k in ("pos", "vel", "acc", "gpos", "gvel",
                                 "gacc", "minv", "fixed", "cf", "inv")}
        specs.update({"fparams": rep, "planes": rep, "balls": rep,
                      "scal0": rep})
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
        out_specs = [sh, sh, sh, sh]
        if shape.has_remainder:
            # fold endpoint validity while the arrays are still global,
            # exactly as the distributed forward chunk did -- the replay
            # and the vjp linearize the same glue
            springs = state.springs
            if not shape.all_valid:
                v = m.valid
                springs = dataclasses.replace(
                    springs,
                    valid=(springs.valid & v[springs.left]
                           & v[springs.right]))
            inp["springs"] = springs
            specs["springs"] = jax.tree_util.tree_map(lambda _: rep,
                                                      springs)
            inp["rem_rest"] = springs.rest
            specs["rem_rest"] = rep
            inp["grest"] = grest.astype(springs.rest.dtype)
            specs["grest"] = rep
            out_specs += [rep, rep]            # rest chain, param grads
        if shape.has_magnets:
            pad1 = lambda x: jnp.pad(x[None, :], ((0, 0), (0, pad_n)))
            for name, arr in (("valid", pad1(m.valid)),
                              ("mag_rad", pad1(m.mag_rad)),
                              ("mag_stiffness", pad1(m.mag_stiffness)),
                              ("mag_maxf", pad1(m.mag_maxf)),
                              ("mag_scale", pad1(m.mag_scale))):
                inp[name] = arr
                specs[name] = sh
            out_specs.append(sh)               # per-mass magnet grads

        res = jax.shard_map(
            body_fn, mesh=mesh, in_specs=(specs,),
            out_specs=tuple(out_specs), check_vma=False)(inp)
        gp, gv, ga, bars = res[:4]
        rest_res = res[4:]

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
            g["rest_chain"] = rest_res[0]
            remp = rest_res[1]
            g["k_e"], g["damp_e"], g["omega_e"], g["rate_e"] = remp
            rest_res = rest_res[2:]
        if shape.has_magnets:
            g["mag"] = rest_res[0][:, :n]
        return g

    @jax.custom_vjp
    def seg_fn(state):
        return fwd_chunk(state, jnp.int32(seg))

    def seg_fwd(state):
        return seg_fn(state), state

    def seg_bwd(s0, ct):
        g = bwd_run(s0, ct.masses.pos, ct.masses.vel, ct.masses.acc,
                    grest=(ct.springs.rest if shape.has_remainder
                           else None))
        return assemble_ct(shape, seg, s0, ct, g)

    seg_fn.defvjp(seg_fwd, seg_bwd)
    return seg_fn


def halo_adjoint_rollout(shape: SceneShape, state: SimState, mesh: Mesh,
                         n_steps: int, segment=None,
                         axis: str = "shard") -> SimState:
    """Differentiable distributed rollout: the forward is the
    distributed tiled chunk (parallel/halo_tiled.py); the backward runs
    the tiled backward kernel per shard with ppermuted halo windows,
    routing magnet/remainder glue cotangents through jax.vjp of the
    per-shard glue (module docstring).  Trace memory is
    segment * 6 * block * 4 bytes PER DEVICE (9 planes with glue)."""
    n_dev = mesh.shape[axis]
    r = halo_adjoint_reject_reason(shape, n_dev)
    if r is not None:
        raise ValueError(
            f"scene outside the distributed adjoint envelope: {r}")
    if n_steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")
    if segment is None:
        _, _, b, _, _ = _geom_dist(shape, n_dev)
        cap = max(1, int(1.5e9 // (4 * _tr_planes(shape) * b)))
        segment = next(s for s in range(min(n_steps, 64, cap), 0, -1)
                       if n_steps % s == 0)
    seg = segment
    if n_steps % seg != 0:
        raise ValueError(f"segment {seg} does not divide n_steps {n_steps}")
    seg_fn = _halo_adjoint_segment(shape, mesh, seg, axis)
    if n_steps == seg:
        return seg_fn(state)
    out, _ = jax.lax.scan(lambda s, _: (seg_fn(s), None), state, None,
                          length=n_steps // seg)
    return out
