#!/usr/bin/env python
"""Hardware check: GLUE scenes in the DISTRIBUTED adjoint (1-dev mesh).

The CPU suite proves multi-shard gradient flow for magnet/remainder glue
scenes (tests/test_halo_adjoint.py, 2- and 8-virtual-device meshes, vs
jax.grad of the XLA path); this script proves the same composed program
-- shard_map + per-shard trace replay (9 trace planes) + backward tile
kernel + per-step jax.vjp of the D-way glue with its collective
transposes -- compiles and runs on REAL Mosaic:

1. Gradient correctness vs jax.grad through the XLA step path on a 40^3
   lattice with (a) cross-half remainder links incl. actuated ones and
   (b) binned attract-mode magnets, (c) both under Verlet.
2. fwd+bwd timing on a 60^3 + 2,000-cross-link scene: distributed glue
   adjoint (1-dev mesh) vs the single-device tiled glue adjoint
   (wrapper + collective-transpose overhead at zero actual neighbors).

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

from jax.sharding import Mesh

from titan_tpu import Simulation, SimConfig, Vec, diff
from titan_tpu.ops import adjoint_tiled
from titan_tpu.parallel import halo_adjoint
from titan_tpu.state import xla_only_shape


def build(n=40, cross=0, cross_actuated=False, magnets=False,
          integrator=None):
    cfg = dict(velocity_clamp=False, host_store_dtype="float32")
    if integrator:
        from titan_tpu import Integrator
        cfg["integrator"] = Integrator(integrator)
    if magnets:
        # n^3 >= binned threshold already at 40^3; widen the cutoff so
        # lattice neighbors interact
        cfg.update(magnet_cutoff=0.6)
    sim = Simulation(SimConfig(**cfg))
    sim.createLattice(Vec(0, 0, 1), Vec(4, 4, 4), n, n, n)
    sim.setAllSpringConstantValues(800.0)
    nm = n * n * n
    if cross:
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
        st.l_min[i0 + half: i0 + cross] = st.rest[i0 + half:
                                                  i0 + cross] * 0.5
        st.rate[i0 + half: i0 + cross] = 0.8
    if magnets:
        for i in (0, 3, 9, nm // 4, nm // 4 + 10, nm // 2,
                  2 * nm // 3, 2 * nm // 3 + 13, nm - 40, nm - 30):
            st.mag_maxf[i] = 0.5
            st.mag_scale[i] = 1.0
    sim._T = 0.0
    sim._marshal()
    r = halo_adjoint.halo_adjoint_reject_reason(sim._shape, 1)
    assert r is None, r
    return sim


def check(tag, sim, mesh, steps=4, seg=2, tol=2e-3):
    shape, state = sim._shape, sim._state
    rng = np.random.RandomState(0)
    n = sim._store.n_masses
    npad = state.masses.pos.shape[1]
    w = jnp.asarray(rng.normal(0, 1, (3, npad)),
                    jnp.float32).at[:, n:].set(0.0)
    wrest = (jnp.asarray(rng.normal(0, 1, state.springs.rest.shape),
                         jnp.float32) if shape.has_remainder else None)

    names = ["pos"]
    m0, sp0 = state.masses, state.springs
    args = [m0.pos]
    if shape.has_magnets:
        names += ["mag_rad", "mag_stiffness", "mag_maxf", "mag_scale"]
        args += [m0.mag_rad, m0.mag_stiffness, m0.mag_maxf, m0.mag_scale]
    if shape.has_remainder:
        names += ["k", "rest", "omega", "rate"]
        args += [sp0.k, sp0.rest, sp0.omega, sp0.rate]

    def mk(rollout):
        def f(*a):
            s = state
            mm = dataclasses.replace(s.masses, pos=a[0])
            i = 1
            if shape.has_magnets:
                mm = dataclasses.replace(
                    mm, mag_rad=a[i], mag_stiffness=a[i + 1],
                    mag_maxf=a[i + 2], mag_scale=a[i + 3])
                i += 4
            s = dataclasses.replace(s, masses=mm)
            if shape.has_remainder:
                s = dataclasses.replace(
                    s, springs=dataclasses.replace(
                        s.springs, k=a[i], rest=a[i + 1],
                        omega=a[i + 2], rate=a[i + 3]))
            out = rollout(s)
            loss = jnp.sum(out.masses.pos * w)
            if wrest is not None:
                loss = loss + jnp.sum(out.springs.rest * wrest)
            return loss
        return f

    idx = tuple(range(len(args)))
    gt = jax.jit(jax.grad(mk(lambda s: halo_adjoint.halo_adjoint_rollout(
        shape, s, mesh, steps, segment=seg)), argnums=idx))(*args)
    gx = jax.jit(jax.grad(mk(lambda s: diff.rollout(
        xla_only_shape(shape), s, steps)), argnums=idx))(*args)
    rem_ok = (np.asarray(sp0.valid & m0.valid[sp0.left]
                         & m0.valid[sp0.right])
              if shape.has_remainder else None)
    vmask = np.asarray(m0.valid)
    for name, a, x in zip(names, gt, gx):
        a = np.asarray(jax.device_get(a))
        x = np.asarray(jax.device_get(x))
        if name == "pos":
            a, x = a[:, :n], x[:, :n]
        elif name.startswith("mag_"):
            a, x = a * vmask, x * vmask
        elif name in ("k", "rate"):
            a, x = a * rem_ok, x * rem_ok
        scale = max(np.abs(x).max(), 1e-8)
        err = float((np.abs(a - x) / scale).max())
        print(json.dumps({"check": f"halo_glue[{tag}:{name}]",
                          "rel_maxabs_err": err}), flush=True)
        assert err < tol, (tag, name, err)


def timing(mesh):
    sim = build(n=60, cross=2000)
    shape, state = sim._shape, sim._state
    n_steps, seg = 200, 50

    def mk(rollout):
        def f(pos0):
            s = dataclasses.replace(
                state, masses=dataclasses.replace(state.masses, pos=pos0))
            return jnp.sum(rollout(s).masses.pos)
        return jax.jit(jax.grad(f))

    g_d = mk(lambda s: halo_adjoint.halo_adjoint_rollout(
        shape, s, mesh, n_steps, segment=seg))
    g_s = mk(lambda s: adjoint_tiled.tiled_adjoint_rollout(
        shape, s, n_steps, segment=seg))
    for tag, fn in (("halo_glue_1dev", g_d), ("tiled_glue", g_s)):
        out = fn(state.masses.pos)
        np.asarray(jax.device_get(out[0, 0]))          # sync
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = fn(state.masses.pos)
        np.asarray(jax.device_get(out[0, 0]))
        dt_ = (time.perf_counter() - t0) / reps
        print(json.dumps({"timing": f"glue60_cross2000_{tag}",
                          "fwd_bwd_steps_per_s": n_steps / dt_}),
              flush=True)


def main():
    mesh = Mesh(np.array(jax.devices()[:1]), ("shard",))
    check("remainder", build(cross=64, cross_actuated=True), mesh)
    check("magnet", build(magnets=True), mesh)
    check("both_verlet", build(cross=64, magnets=True,
                               integrator="verlet"), mesh)
    # RK2 glue: the distributed SPLIT backward (pass-2 kernel ->
    # midpoint glue vjp -> second cotangent exchange -> pass-1 kernel
    # -> step glue vjp) on real Mosaic
    check("rk2_remainder", build(cross=64, cross_actuated=True,
                                 integrator="rk2"), mesh)
    check("rk2_both", build(cross=64, magnets=True,
                            integrator="rk2"), mesh)
    timing(mesh)
    print("HALO glue adjoint hardware check OK", flush=True)


if __name__ == "__main__":
    main()
