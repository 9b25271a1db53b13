#!/usr/bin/env python
"""Hardware check: per-mass local constraints in the fused adjoint kernel.

adjoint_rollout gradients (Mosaic kernels) vs jax.grad through the XLA
step path at 16^3 with all four local-constraint slot types (contact
planes incl. the friction-bearing 4-tuple record form, balls,
vel-mutating constraint planes and directions), euler + verlet + rk2.
Slot geometry/friction are not differentiated (like global plane/ball
geometry); the check covers pos/vel/k/rest gradients THROUGH the
constraint sweep, including the mutated-velocity cotangent threading.
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

from titan_tpu import (BALL, CONSTRAINT_PLANE, CONTACT_PLANE, DIRECTION,
                       Simulation, SimConfig, Vec, diff)
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
    # lattice masses live in [-2, 2]^2 x [3, 7]: the contact plane at
    # offset 5.0 starts active for the bottom half; the ball envelops a
    # corner region; constraint planes / directions act on any motion
    for i in range(24):
        sim.getMassByIndex(i).addConstraint(CONTACT_PLANE,
                                            Vec(0.1, 0.2, 1.0), 5.0)
    for i in range(24, 40):
        sim.getMassByIndex(i).addConstraint(BALL, Vec(0.5, 0.5, 4.0), 1.5)
    for i in range(40, 56):
        sim.getMassByIndex(i).addConstraint(CONSTRAINT_PLANE,
                                            Vec(0.2, 0.1, 1.0), 0.3)
    for i in range(56, 72):
        sim.getMassByIndex(i).addConstraint(DIRECTION, Vec(1.0, 0.2, 0.5),
                                            0.2)
    # friction-bearing contact planes (parallel/flat.set_env_plane's
    # 4-tuple record form)
    for i in range(72, 80):
        rec = sim._store.local_record(i)
        nv = np.array([0.05, 0.1, 1.0])
        rec.contact_planes.append((nv / np.linalg.norm(nv), 5.0, 0.3, 0.5))
    sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim._T = 0.0
    sim._marshal()
    assert adjoint.adjoint_supported(sim._shape), \
        adjoint.adjoint_reject_reason(sim._shape)
    assert any((sim._shape.cap_cp, sim._shape.cap_ball, sim._shape.cap_pl,
                sim._shape.cap_dir))
    return sim


def main():
    for tag in ("euler", "verlet", "rk2"):
        sim = build(16, integrator=None if tag == "euler" else tag)
        shape, state = sim._shape, sim._state
        rng = np.random.RandomState(0)
        npad = state.masses.pos.shape[1]
        n = sim._store.n_masses
        wpos = jnp.asarray(rng.normal(0, 1, (3, npad)), jnp.float32
                           ).at[:, n:].set(0.0)
        wvel = jnp.asarray(rng.normal(0, 1, (3, npad)), jnp.float32
                           ).at[:, n:].set(0.0)

        def loss_fn(rollout):
            def f(pos0, vel0, k, rest):
                st = dataclasses.replace(
                    state,
                    masses=dataclasses.replace(state.masses, pos=pos0,
                                               vel=vel0),
                    stencil=dataclasses.replace(state.stencil, k=k, rest=rest))
                out = rollout(st)
                return (jnp.sum(out.masses.pos * wpos)
                        + jnp.sum(out.masses.vel * wvel))
            return f

        f_adj = loss_fn(lambda s: adjoint.adjoint_rollout(shape, s, 40,
                                                          segment=20))
        f_xla = loss_fn(lambda s: diff.rollout(xla_only_shape(shape), s, 40))
        args = (state.masses.pos, state.masses.vel, state.stencil.k,
                state.stencil.rest)
        ga = jax.jit(jax.grad(f_adj, argnums=(0, 1, 2, 3)))(*args)
        gx = jax.jit(jax.grad(f_xla, argnums=(0, 1, 2, 3)))(*args)
        msk = np.asarray(state.stencil.mask)
        for name, a, x in zip(("pos", "vel", "k", "rest"), ga, gx):
            a, x = np.asarray(a), np.asarray(x)
            if name in ("pos", "vel"):
                a, x = a[:, :n], x[:, :n]
            else:
                a, x = a * msk, x * msk
            scale = max(np.abs(x).max(), 1e-8)
            rel = np.abs(a - x) / scale
            err = float(rel.max())
            # The comparison target is jax's own f32 vjp, which recomputes
            # nothing while the adjoint recomputes friction selects: on a
            # handful of friction-boundary masses the f32 select booleans
            # flip between two valid subgradients (f64 arbitration in
            # scripts/dbg_verlet_local.py showed the ADJOINT is the closer
            # of the two on every field).  Allow <=0.5% such stragglers
            # within a loose bound; everything else stays strict.
            frac = float((rel > 1e-3).mean())
            print(json.dumps({"check": f"adjoint_local_16^3[{tag}:{name}]",
                              "rel_maxabs_err": err,
                              "frac_over_strict": frac}), flush=True)
            assert err < 5e-2, (tag, name, err)
            assert frac <= 0.005, (tag, name, frac)
    print("LOCAL-CONSTRAINT adjoint hardware check OK", flush=True)


if __name__ == "__main__":
    main()
