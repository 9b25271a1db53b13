#!/usr/bin/env python
"""Hardware check: GLUE scenes in the tiled fused adjoint.

Magnet / remainder-spring forces run as per-step XLA glue through the
tiled kernel's constant-force input (ops/pallas_tiled.py); the adjoint
traces each step's TOTAL cf and routes its cotangent through jax.vjp of
the same glue (ops/adjoint_tiled.build_tiled_bwd).  This script checks,
on real Mosaic:

1. Gradient correctness vs jax.grad through the XLA step path on a 40^3
   lattice (64k masses, 4 tiles) with (a) cross-tile remainder links
   incl. actuated ones (per-spring k/rest/omega/rate grads), (b) shell +
   attract magnets spread across tiles (per-mass mag_* grads), and
   (c) both at once under Verlet.
2. fwd+bwd timing on a 60^3 + 2,000-cross-link scene: tiled glue adjoint
   vs diff.fast_rollout (tiled primal + XLA-recompute backward).

Short horizons (4 steps): the comparison crosses two forward
implementations (see tpu_adjoint_tiled_check.py's HORIZON NOTE).
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from titan_tpu import Simulation, SimConfig, Vec, diff
from titan_tpu.ops import adjoint_tiled
from titan_tpu.state import xla_only_shape


def build(n=40, cross=0, cross_actuated=False, magnets=False,
          integrator=None):
    cfg = dict(velocity_clamp=False, host_store_dtype="float32")
    if integrator:
        from titan_tpu import Integrator
        cfg["integrator"] = Integrator(integrator)
    sim = Simulation(SimConfig(**cfg))
    sim.createLattice(Vec(0, 0, 1), Vec(4, 4, 4), n, n, n)
    sim.setAllSpringConstantValues(800.0)
    nm = n * n * n
    if cross:
        # long-span links that bucket as remainder springs and cross
        # tile boundaries (span >> tile)
        rng = np.random.RandomState(3)
        for _ in range(cross):
            a = int(rng.randint(0, nm // 2))
            b = int(rng.randint(nm // 2, nm))
            sim.createSpring(sim.getMassByIndex(a), sim.getMassByIndex(b))
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    st = sim._store
    st.rest[: st.n_springs] *= 1.03        # pre-stress (CLAUDE.md trap)
    st.damping[: st.n_springs] = 12.0
    if cross_actuated:
        from titan_tpu import ACTUATED_CONTRACT, ACTUATED_EXPAND
        i0 = st.n_springs - cross
        half = cross // 2
        st.s_type[i0: i0 + half] = ACTUATED_EXPAND
        st.l_max[i0: i0 + half] = st.rest[i0: i0 + half] * 1.001
        st.rate[i0: i0 + half] = 0.6
        st.s_type[i0 + half: i0 + cross] = ACTUATED_CONTRACT
        st.l_min[i0 + half: i0 + cross] = st.rest[i0 + half: i0 + cross] * 0.5
        st.rate[i0 + half: i0 + cross] = 0.8
    if magnets:
        for i in (0, 3, nm // 4, nm // 2, 2 * nm // 3, nm - 40):
            st.mag_rad[i] = 0.35
            st.mag_stiffness[i] = 5.0
        for i in (0, 3, 9, nm // 4, nm // 4 + 10, nm // 2,
                  2 * nm // 3, 2 * nm // 3 + 13, nm - 40, nm - 30):
            st.mag_maxf[i] = 0.5
            st.mag_scale[i] = 1.0
    sim._T = 0.0
    sim._marshal()
    r = adjoint_tiled.tiled_adjoint_reject_reason(sim._shape)
    assert r is None, r
    return sim


def check(tag, sim, steps=4, seg=2, tol=2e-3):
    shape, state = sim._shape, sim._state
    rng = np.random.RandomState(0)
    n = sim._store.n_masses
    npad = state.masses.pos.shape[1]
    w = jnp.asarray(rng.normal(0, 1, (3, npad)),
                    jnp.float32).at[:, n:].set(0.0)
    wrest = (jnp.asarray(rng.normal(0, 1, state.springs.rest.shape),
                         jnp.float32) if shape.has_remainder else None)

    names, getters, setters = ["pos"], [lambda s: s.masses.pos], []

    def mk(rollout):
        def f(*args):
            s = state
            m = dataclasses.replace(s.masses, pos=args[0])
            i = 1
            if shape.has_magnets:
                m = dataclasses.replace(
                    m, mag_rad=args[i], mag_stiffness=args[i + 1],
                    mag_maxf=args[i + 2], mag_scale=args[i + 3])
                i += 4
            s = dataclasses.replace(s, masses=m)
            if shape.has_remainder:
                s = dataclasses.replace(
                    s, springs=dataclasses.replace(
                        s.springs, k=args[i], rest=args[i + 1],
                        omega=args[i + 2], rate=args[i + 3]))
            out = rollout(s)
            loss = jnp.sum(out.masses.pos * w)
            if wrest is not None:
                loss = loss + jnp.sum(out.springs.rest * wrest)
            return loss
        return f

    m, sp = state.masses, state.springs
    args = [m.pos]
    if shape.has_magnets:
        names += ["mag_rad", "mag_stiffness", "mag_maxf", "mag_scale"]
        args += [m.mag_rad, m.mag_stiffness, m.mag_maxf, m.mag_scale]
    if shape.has_remainder:
        names += ["k", "rest", "omega", "rate"]
        args += [sp.k, sp.rest, sp.omega, sp.rate]

    f_t = mk(lambda s: adjoint_tiled.tiled_adjoint_rollout(
        shape, s, steps, segment=seg))
    f_x = mk(lambda s: diff.rollout(xla_only_shape(shape), s, steps))
    idx = tuple(range(len(args)))
    gt = jax.jit(jax.grad(f_t, argnums=idx))(*args)
    gx = jax.jit(jax.grad(f_x, argnums=idx))(*args)
    rem_ok = (np.asarray(sp.valid & m.valid[sp.left] & m.valid[sp.right])
              if shape.has_remainder else None)
    vmask = np.asarray(m.valid)
    for name, a, x in zip(names, gt, gx):
        a, x = np.asarray(jax.device_get(a)), np.asarray(jax.device_get(x))
        if name == "pos":
            a, x = a[:, :n], x[:, :n]
        elif name.startswith("mag_"):
            a, x = a * vmask, x * vmask
        elif name in ("k", "rate"):
            a, x = a * rem_ok, x * rem_ok
        scale = max(np.abs(x).max(), 1e-8)
        err = float((np.abs(a - x) / scale).max())
        print(json.dumps({"check": f"tiled_glue[{tag}:{name}]",
                          "rel_maxabs_err": err}), flush=True)
        assert err < tol, (tag, name, err)


def timing():
    sim = build(n=60, cross=2000)
    shape, state = sim._shape, sim._state
    n_steps, seg = 200, 50

    def mk(rollout, steps):
        def f(pos0):
            s = dataclasses.replace(
                state, masses=dataclasses.replace(state.masses, pos=pos0))
            return jnp.sum(rollout(s, steps).masses.pos)
        return jax.jit(jax.grad(f))

    g_adj = mk(lambda s, st: adjoint_tiled.tiled_adjoint_rollout(
        shape, s, st, segment=seg), n_steps)
    runs = [("tiled_glue_adjoint", g_adj, n_steps)]
    try:
        g_fast = mk(lambda s, st: diff.fast_rollout(shape, s, st,
                                                    segment=10), 100)
        runs.append(("fast_xla_bwd", g_fast, 100))
    except Exception as e:                      # pragma: no cover
        print(json.dumps({"note": f"fast_rollout build failed: {e}"}))
    for tag, fn, steps in runs:
        try:
            out = fn(state.masses.pos)
            np.asarray(jax.device_get(out[0, 0]))      # sync
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                out = fn(state.masses.pos)
            np.asarray(jax.device_get(out[0, 0]))
            dt_ = (time.perf_counter() - t0) / reps
            print(json.dumps({
                "timing": f"tiled60_cross2000_{tag}",
                "fwd_bwd_steps_per_s": steps / dt_,
            }), flush=True)
        except Exception as e:                  # pragma: no cover
            print(json.dumps({"note": f"{tag} failed: {e!r}"}), flush=True)


def main():
    check("remainder", build(cross=64, cross_actuated=True))
    check("magnet", build(magnets=True))
    check("both_verlet", build(cross=64, magnets=True,
                               integrator="verlet"))
    # RK2 glue: the SPLIT backward (pass-2 kernel -> midpoint glue vjp
    # -> pass-1 kernel, ops/adjoint_tiled.py)
    check("both_rk2", build(cross=64, magnets=True, integrator="rk2"))
    timing()
    print("TILED glue adjoint hardware check OK", flush=True)


if __name__ == "__main__":
    main()
