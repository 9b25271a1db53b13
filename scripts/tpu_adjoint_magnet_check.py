#!/usr/bin/env python
"""Hardware check: magnets in the fused adjoint kernel.

adjoint_rollout gradients (Mosaic kernels, dense in-VMEM pairwise
transpose) vs jax.grad through the XLA step path on the representative
magnet workload: a grid of truss-tetrahedron modules (6 magnet
RobotLinks each, the reference paper's robot module).  Covers pos/vel
flow through the pairwise sweep plus per-mass mag_rad/stiffness/maxf/
scale gradients, euler + rk2.  Ends with a fwd+bwd timing vs
diff.fast_rollout on the same scene.
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
from titan_tpu.models import truss_tetrahedron
from titan_tpu.ops import adjoint
from titan_tpu.state import xla_only_shape


def build(modules=4, integrator=None):
    cfg = dict(velocity_clamp=False, host_store_dtype="float32")
    if integrator:
        from titan_tpu import Integrator
        cfg["integrator"] = Integrator(integrator)
    sim = Simulation(SimConfig(**cfg))
    for mi in range(modules):
        truss_tetrahedron(sim, Vec(0.9 * mi, 0, 1.0))
    sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim._T = 0.0
    sim._marshal()
    assert sim._shape.has_magnets
    assert adjoint.adjoint_supported(sim._shape), \
        adjoint.adjoint_reject_reason(sim._shape)
    return sim


def check(tag, sim):
    shape, state = sim._shape, sim._state
    rng = np.random.RandomState(0)
    npad = state.masses.pos.shape[1]
    n = sim._store.n_masses
    wpos = jnp.asarray(rng.normal(0, 1, (3, npad)), jnp.float32
                       ).at[:, n:].set(0.0)
    wvel = jnp.asarray(rng.normal(0, 1, (3, npad)), jnp.float32
                       ).at[:, n:].set(0.0)

    def loss_fn(rollout):
        def f(pos0, vel0, mrad, mstiff, mmaxf, mscale):
            st = dataclasses.replace(
                state,
                masses=dataclasses.replace(
                    state.masses, pos=pos0, vel=vel0, mag_rad=mrad,
                    mag_stiffness=mstiff, mag_maxf=mmaxf,
                    mag_scale=mscale))
            out = rollout(st)
            return (jnp.sum(out.masses.pos * wpos)
                    + jnp.sum(out.masses.vel * wvel))
        return f

    f_adj = loss_fn(lambda s: adjoint.adjoint_rollout(shape, s, 40,
                                                      segment=20))
    f_xla = loss_fn(lambda s: diff.rollout(xla_only_shape(shape), s, 40))
    m = state.masses
    args = (m.pos, m.vel, m.mag_rad, m.mag_stiffness, m.mag_maxf,
            m.mag_scale)
    ga = jax.jit(jax.grad(f_adj, argnums=tuple(range(6))))(*args)
    gx = jax.jit(jax.grad(f_xla, argnums=tuple(range(6))))(*args)
    vmask = np.asarray(state.masses.valid)
    for name, a, x in zip(("pos", "vel", "mag_rad", "mag_stiffness",
                           "mag_maxf", "mag_scale"), ga, gx):
        a, x = np.asarray(a), np.asarray(x)
        if name in ("pos", "vel"):
            a, x = a[:, :n], x[:, :n]
        else:
            a, x = a * vmask, x * vmask
        scale = max(np.abs(x).max(), 1e-8)
        err = float((np.abs(a - x) / scale).max())
        print(json.dumps({"check": f"adjoint_magnet[{tag}:{name}]",
                          "rel_maxabs_err": err}), flush=True)
        assert err < 2e-3, (tag, name, err)


def timing():
    """One-process fwd+bwd A/B: adjoint vs fast_rollout on 16 modules."""
    sim = build(modules=16)
    shape, state = sim._shape, sim._state
    n_steps, seg = 400, 100

    def mk(rollout):
        def f(pos0):
            st = dataclasses.replace(
                state, masses=dataclasses.replace(state.masses, pos=pos0))
            out = rollout(st)
            return jnp.sum(out.masses.pos)
        return jax.jit(jax.grad(f))

    g_adj = mk(lambda s: adjoint.adjoint_rollout(shape, s, n_steps,
                                                 segment=seg))
    g_fast = mk(lambda s: diff.fast_rollout(shape, s, n_steps,
                                            segment=seg))
    for tag, fn in (("adjoint", g_adj), ("fast_xla_bwd", g_fast)):
        out = fn(state.masses.pos)
        np.asarray(jax.device_get(out[0, 0]))      # sync
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = fn(state.masses.pos)
        np.asarray(jax.device_get(out[0, 0]))
        dt_ = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "timing": f"magnet_{tag}",
            "fwd_bwd_steps_per_s": n_steps / dt_,
            "n_masses": int(sim._store.n_masses),
        }), flush=True)


def main():
    for tag in ("euler", "rk2"):
        check(tag, build(integrator=None if tag == "euler" else tag))
    timing()
    print("MAGNET adjoint hardware check OK", flush=True)


if __name__ == "__main__":
    main()
