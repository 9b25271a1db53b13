#!/usr/bin/env python
"""Tiled-adjoint bisect, phase 2/3 (phase 1: backward kernel bitwise OK).

2: trace replay vs chunk-stepped primal, bitwise, on hardware.
3: end-to-end grads vs XLA at 1 step (seg=1), then steps=4 (seg=2),
   by scene size.
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
from titan_tpu.ops import pallas_tiled
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
    return sim


def trace_check(sim, tag, seg=3):
    shape, state = sim._shape, sim._state
    n = shape.n_masses
    _, hw, _, _, _, n_t = AT._geom(shape)
    trace = jax.jit(
        lambda s: AT.build_tiled_trace(shape, seg)(s)[0])(state)
    trace = np.asarray(jax.device_get(trace)).reshape(seg, 6, n_t + 2 * hw)
    chunk = pallas_tiled.build_tiled_chunk(shape)
    s = state
    worst = 0.0
    for i in range(seg):
        got = trace[i][:, hw:hw + n]
        want = np.concatenate([
            np.asarray(jax.device_get(s.masses.pos))[:, :n],
            np.asarray(jax.device_get(s.masses.vel))[:, :n]])
        err = float(np.abs(got - want).max())
        worst = max(worst, err)
        s = chunk(s, 1)
    print(json.dumps({"phase2_trace": tag, "max_abs_err": worst}),
          flush=True)
    return worst


def e2e(sim, tag, steps, seg):
    shape, state = sim._shape, sim._state
    rng = np.random.RandomState(0)
    n = sim._store.n_masses
    npad = state.masses.pos.shape[1]
    w = jnp.asarray(rng.normal(0, 1, (3, npad)),
                    jnp.float32).at[:, n:].set(0.0)

    def mk(rollout):
        def f(pos0, k, rest):
            s = dataclasses.replace(
                state,
                masses=dataclasses.replace(state.masses, pos=pos0),
                stencil=dataclasses.replace(state.stencil, k=k,
                                            rest=rest))
            return jnp.sum(rollout(s).masses.pos * w)
        return f

    f_t = mk(lambda s: AT.tiled_adjoint_rollout(shape, s, steps,
                                                segment=seg))
    f_x = mk(lambda s: diff.rollout(xla_only_shape(shape), s, steps))
    m, stc = state.masses, state.stencil
    args = (m.pos, stc.k, stc.rest)
    gt = jax.jit(jax.grad(f_t, argnums=(0, 1, 2)))(*args)
    gx = jax.jit(jax.grad(f_x, argnums=(0, 1, 2)))(*args)
    for name, a, x in zip(("pos", "k", "rest"), gt, gx):
        a = np.asarray(jax.device_get(a))
        x = np.asarray(jax.device_get(x))
        if name == "pos":
            a, x = a[:, :n], x[:, :n]
        scale = max(np.abs(x).max(), 1e-8)
        err = float((np.abs(a - x) / scale).max())
        print(json.dumps({"phase3": f"{tag}[steps={steps},seg={seg}]",
                          "leaf": name, "rel_err": err}), flush=True)


def main():
    for n, tag in ((16, "16c"), (50, "50c")):
        sim = build(n)
        trace_check(sim, tag)
        e2e(sim, tag, 1, 1)
        e2e(sim, tag, 4, 2)


if __name__ == "__main__":
    main()
