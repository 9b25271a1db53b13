#!/usr/bin/env python
"""Diagnose the verlet+local-constraint adjoint mismatch: compare the
adjoint kernel's f32 grads AND jax.grad-of-XLA f32 grads against an f64
XLA ground truth on the tpu_adjoint_local_check scene.  If both f32
paths sit at comparable distance from the f64 truth, the mismatch is
f32 subgradient/rounding noise; if the adjoint is much farther, it's a
real transpose bug."""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import jax.experimental.pallas as pl

_orig = pl.pallas_call


def _interp(*a, **k):
    k["interpret"] = True
    k.pop("compiler_params", None)
    return _orig(*a, **k)


import titan_tpu.ops.adjoint as adjmod
import titan_tpu.ops.pallas_step as psmod

adjmod.pl.pallas_call = _interp
psmod.pl.pallas_call = _interp

import runpy

ns = runpy.run_path(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "tpu_adjoint_local_check.py"),
                    run_name="__not_main__")
build = ns["build"]

from titan_tpu import diff
from titan_tpu.ops import adjoint
from titan_tpu.state import xla_only_shape

STEPS = int(os.environ.get("STEPS", "40"))

sim = build(16, integrator="verlet")
shape, state = sim._shape, sim._state
rng = np.random.RandomState(0)
npad = state.masses.pos.shape[1]
n = sim._store.n_masses
wpos = jnp.asarray(rng.normal(0, 1, (3, npad)), jnp.float32
                   ).at[:, n:].set(0.0)
wvel = jnp.asarray(rng.normal(0, 1, (3, npad)), jnp.float32
                   ).at[:, n:].set(0.0)


def loss_fn(rollout, dtype):
    w1, w2 = wpos.astype(dtype), wvel.astype(dtype)

    def f(pos0, vel0, k, rest):
        st = jax.tree.map(
            lambda x: x.astype(dtype) if (hasattr(x, "dtype")
                                          and jnp.issubdtype(
                                              x.dtype, jnp.floating))
            else x, state)
        st = dataclasses.replace(
            st,
            masses=dataclasses.replace(st.masses, pos=pos0, vel=vel0),
            stencil=dataclasses.replace(st.stencil, k=k, rest=rest))
        out = rollout(st)
        return (jnp.sum(out.masses.pos * w1) + jnp.sum(out.masses.vel * w2))
    return f


args32 = (state.masses.pos, state.masses.vel, state.stencil.k,
          state.stencil.rest)
args64 = tuple(a.astype(jnp.float64) for a in args32)

f_adj = loss_fn(lambda s: adjoint.adjoint_rollout(shape, s, STEPS,
                                                  segment=20), jnp.float32)
f_x32 = loss_fn(lambda s: diff.rollout(xla_only_shape(shape), s, STEPS),
                jnp.float32)
f_x64 = loss_fn(lambda s: diff.rollout(xla_only_shape(shape), s, STEPS),
                jnp.float64)

ga = jax.jit(jax.grad(f_adj, argnums=(0, 1, 2, 3)))(*args32)
g32 = jax.jit(jax.grad(f_x32, argnums=(0, 1, 2, 3)))(*args32)
g64 = jax.jit(jax.grad(f_x64, argnums=(0, 1, 2, 3)))(*args64)

msk = np.asarray(state.stencil.mask)
for name, a, x, t in zip(("pos", "vel", "k", "rest"), ga, g32, g64):
    a, x, t = (np.asarray(v, np.float64) for v in (a, x, t))
    if name in ("pos", "vel"):
        a, x, t = a[:, :n], x[:, :n], t[:, :n]
    else:
        a, x, t = a * msk, x * msk, t * msk
    scale = max(np.abs(t).max(), 1e-8)
    err_adj = float(np.max(np.abs(a - t)) / scale)
    err_x32 = float(np.max(np.abs(x - t)) / scale)
    err_ax = float(np.max(np.abs(a - x)) / scale)
    # where is the adjoint-vs-x32 disagreement?
    d = np.abs(a - x) / scale
    idx = np.unravel_index(np.argmax(d), d.shape)
    print(json.dumps({"grad": name, "adj_vs_f64": err_adj,
                      "xla32_vs_f64": err_x32, "adj_vs_xla32": err_ax,
                      "argmax_mass": int(idx[-1]),
                      "n_big_vs_x32": int((d > 1e-3).sum())}), flush=True)
