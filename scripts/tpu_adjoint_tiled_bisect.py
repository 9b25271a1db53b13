#!/usr/bin/env python
"""Bisect the tiled-adjoint hardware mismatch.

Phase 1: single-tile scene, ONE backward-kernel launch, compared
BITWISE against an XLA replica of the identical window math
(backward_step under jnp_rolls on the same padded inputs).  A mismatch
here is in-kernel lowering; a match moves the suspect to multi-tile
windows or the XLA loop glue.

Phase 2: same bitwise replica per tile on a multi-tile scene.

Phase 3: end-to-end grads vs XLA at 1 step / few steps per scene size.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from titan_tpu import Simulation, SimConfig, Vec, diff
from titan_tpu.ops import adjoint_tiled as AT
from titan_tpu.ops.adjoint import backward_step, jnp_rolls, _make_P
from titan_tpu.state import xla_only_shape


def build(n=16):
    sim = Simulation(SimConfig(velocity_clamp=False,
                               host_store_dtype="float32"))
    sim.createLattice(Vec(0, 0, 1), Vec(4, 4, 4), n, n, n)
    sim.setAllSpringConstantValues(800.0)
    sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    st = sim._store
    st.rest[: st.n_springs] *= 1.03
    st.damping[: st.n_springs] = 12.0
    sim._T = 0.0
    sim._marshal()
    assert AT.tiled_adjoint_supported(sim._shape), \
        AT.tiled_adjoint_reject_reason(sim._shape)
    return sim


def kernel_vs_replica(sim, tag):
    """One bwd_call launch vs backward_step/jnp_rolls per tile window."""
    shape, state = sim._shape, sim._state
    h, hw, t_fwd, t_bwd, n_tiles, n_t = AT._geom(shape)
    offs, ni = AT._inv_plan(shape)
    boffs, nb = AT._bar_plan(shape)
    n = shape.n_masses
    twr = (n_t + 2 * hw) // 128
    wr = (t_bwd + 2 * hw) // 128
    tr = t_bwd // 128
    hwr = hw // 128
    n_tiles_b = n_t // t_bwd
    print(json.dumps({"geom": tag, "h": h, "hw": hw, "t_bwd": t_bwd,
                      "n_tiles_b": n_tiles_b, "twr": twr, "wr": wr}),
          flush=True)

    st = AT._stage(shape, state, hw, n_t)
    rng = np.random.RandomState(0)
    pad_n = n_t - n
    padf = lambda x: jnp.pad(jnp.asarray(x, jnp.float32),
                             ((0, 0), (0, pad_n)))
    gp = padf(rng.normal(0, 1, (3, n)))
    gv = padf(rng.normal(0, 1, (3, n)))
    ga = padf(rng.normal(0, 1, (3, n)))
    m = state.masses
    posf = jnp.pad(m.pos[:, :n].astype(jnp.float32), ((0, 0), (0, pad_n)))
    velf = jnp.pad(m.vel[:, :n].astype(jnp.float32), ((0, 0), (0, pad_n)))
    trace_s = jnp.pad(jnp.concatenate([posf, velf], axis=0),
                      ((0, 0), (hw, hw))).reshape(6, twr, 128)
    cot = jnp.pad(jnp.concatenate([gp, gv, ga], axis=0),
                  ((0, 0), (hw, hw))).reshape(9, twr, 128)
    dt32 = state.dt.astype(jnp.float32)
    scal = jnp.stack([dt32, jnp.float32(0.0), jnp.float32(0.0)])

    bwd_call = AT._make_bwd_call(shape, t_bwd, hw, n_tiles_b, offs, ni,
                                 boffs, nb)
    gout, bars = jax.jit(bwd_call)(scal, st["planes"], st["balls"],
                                   trace_s, cot, st["inv_hbm"])
    gout = np.asarray(jax.device_get(gout)).reshape(9, n_t)
    bars = np.asarray(jax.device_get(bars)).reshape(nb, n_t)

    # XLA replica, tile by tile
    inv_flat = np.asarray(jax.device_get(st["inv_hbm"])).reshape(
        ni, n_t + 2 * hw)
    tr_flat = np.asarray(jax.device_get(trace_s)).reshape(6, n_t + 2 * hw)
    cot_flat = np.asarray(jax.device_get(cot)).reshape(9, n_t + 2 * hw)
    nf = len(shape.stencil_deltas)

    def replica_tile(ti):
        lo = ti * t_bwd
        sl = lambda a: jnp.asarray(
            a[:, lo:lo + t_bwd + 2 * hw]).reshape(-1, wr, 128)
        w6, w9, wi = sl(tr_flat), sl(cot_flat), sl(inv_flat)

        def inv(name, count):
            o = offs[name]
            return wi[o:o + count]

        P = _make_P(
            shape, k_ref=inv("k", nf), rest_ref=inv("rest", nf),
            damp_ref=(inv("damping", nf) if shape.has_damping else None),
            minv=inv("minv", 1), fixed=inv("fixed", 1), cf=inv("cf", 3),
            drag=(inv("drag", 1) if shape.has_drag else None),
            plane_ref=np.asarray(jax.device_get(st["planes"])),
            ball_ref=np.asarray(jax.device_get(st["balls"])),
            dt=dt32)
        P["has_remainder"] = False
        P["has_magnets"] = False
        rg, rs = jnp_rolls(wr)
        gp_, gv_, ga_, bars_ = backward_step(
            w6[0:3], w6[3:6], w9[0:3], w9[3:6], w9[6:9], P, rg, rs,
            t_now=jnp.float32(0.0), s_idx=jnp.float32(0.0))
        c = slice(hwr, hwr + tr)
        out9 = jnp.concatenate([gp_[:, c], gv_[:, c], ga_[:, c]])
        bl = [bars_["cf"][:, c], bars_["minv"][:, c]]
        bl.append(jnp.stack([bars_["k"][fi][c] for fi in range(nf)]))
        bl.append(jnp.stack([bars_["rest"][fi][c] for fi in range(nf)]))
        if shape.has_damping:
            bl.append(jnp.stack([bars_["damping"][fi][c]
                                 for fi in range(nf)]))
        return (np.asarray(out9).reshape(9, t_bwd),
                np.asarray(jnp.concatenate(bl)).reshape(nb, t_bwd))

    worst = 0.0
    for ti in range(n_tiles_b):
        r9, rb = replica_tile(ti)
        k9 = gout[:, ti * t_bwd:(ti + 1) * t_bwd]
        kb = bars[:, ti * t_bwd:(ti + 1) * t_bwd]
        e9 = float(np.abs(r9 - k9).max())
        eb = float(np.abs(rb - kb).max())
        s9 = float(np.abs(r9).max()) or 1.0
        print(json.dumps({"tile": ti, "gout_abs_err": e9,
                          "gout_scale": s9, "bars_abs_err": eb}),
              flush=True)
        worst = max(worst, e9 / s9)
    return worst


def main():
    for n, tag in ((16, "1tile"), (40, "multitile")):
        sim = build(n)
        w = kernel_vs_replica(sim, tag)
        print(json.dumps({"phase1": tag, "worst_rel": w}), flush=True)


if __name__ == "__main__":
    main()
