#!/usr/bin/env python
"""Hardware check: ACTUATED_* springs in the fused adjoint kernel.

adjoint_rollout gradients (Mosaic kernels, closed-form actuated rest)
vs jax.grad through the XLA step path (iterative rest writeback) at
20^3, for pos/vel/rate/rest, euler + verlet + rk2 (RK2 actuates twice
per dt), including the mutated-rest OUTPUT cotangent chain (the loss
weighs out.stencil.rest).
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
from titan_tpu.ops import adjoint
from titan_tpu.state import xla_only_shape


def build(nx, integrator=None):
    cfg = dict(velocity_clamp=False, host_store_dtype="float32")
    if integrator:
        from titan_tpu import Integrator
        cfg["integrator"] = Integrator(integrator)
    sim = Simulation(SimConfig(**cfg))
    sim.createLattice(Vec(0, 0, 5), Vec(4, 4, 4), nx, nx, nx)
    sim.setAllSpringConstantValues(1000.0)
    st = sim._store
    st.damping[: st.n_springs] = 0.3
    st.rest[: st.n_springs] *= 1.03
    from titan_tpu import ACTUATED_CONTRACT, ACTUATED_EXPAND
    q = st.n_springs // 4
    # expanders whose stop count bites mid-horizon; contractors that
    # never reach their bound
    st.s_type[:q] = ACTUATED_EXPAND
    st.l_max[:q] = st.rest[:q] * 1.001
    st.rate[:q] = 0.6
    st.s_type[q: 2 * q] = ACTUATED_CONTRACT
    st.l_min[q: 2 * q] = st.rest[q: 2 * q] * 0.5
    st.rate[q: 2 * q] = 0.8
    sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim._T = 0.0
    sim._marshal()
    assert adjoint.adjoint_supported(sim._shape), \
        adjoint.adjoint_reject_reason(sim._shape)
    return sim


for tag in ("euler", "verlet", "rk2"):
    sim = build(20, integrator=None if tag == "euler" else tag)
    shape, state = sim._shape, sim._state
    rng = np.random.RandomState(0)
    npad = state.masses.pos.shape[1]
    n = sim._store.n_masses
    wpos = jnp.asarray(rng.normal(0, 1, (3, npad)), jnp.float32
                       ).at[:, n:].set(0.0)
    wvel = jnp.asarray(rng.normal(0, 1, (3, npad)), jnp.float32
                       ).at[:, n:].set(0.0)
    wrest = jnp.asarray(rng.normal(0, 1, state.stencil.rest.shape),
                        jnp.float32) * state.stencil.mask

    def loss_fn(rollout):
        def f(pos0, vel0, rate, rest):
            st = dataclasses.replace(
                state,
                masses=dataclasses.replace(state.masses, pos=pos0,
                                           vel=vel0),
                stencil=dataclasses.replace(state.stencil, rate=rate,
                                            rest=rest))
            out = rollout(st)
            return (jnp.sum(out.masses.pos * wpos)
                    + jnp.sum(out.masses.vel * wvel)
                    + jnp.sum(out.stencil.rest * wrest))
        return f

    f_adj = loss_fn(lambda s: adjoint.adjoint_rollout(shape, s, 40,
                                                      segment=20))
    f_xla = loss_fn(lambda s: diff.rollout(xla_only_shape(shape), s, 40))
    args = (state.masses.pos, state.masses.vel, state.stencil.rate,
            state.stencil.rest)
    ga = jax.jit(jax.grad(f_adj, argnums=(0, 1, 2, 3)))(*args)
    gx = jax.jit(jax.grad(f_xla, argnums=(0, 1, 2, 3)))(*args)
    msk = np.asarray(state.stencil.mask)
    for name, a, x in zip(("pos", "vel", "rate", "rest"), ga, gx):
        a, x = np.asarray(a), np.asarray(x)
        if name in ("pos", "vel"):
            a, x = a[:, :n], x[:, :n]
        else:
            a, x = a * msk, x * msk
        scale = max(np.abs(x).max(), 1e-8)
        err = float(np.max(np.abs(a - x)) / scale)
        print(json.dumps({"check": f"adjoint_actuated_20^3[{tag}:{name}]",
                          "rel_maxabs_err": err}), flush=True)
        assert err < 1e-3, (tag, name, err)
print("ACTUATED adjoint hardware check OK", flush=True)
