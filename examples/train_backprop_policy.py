"""Train a neural-network controller by BACKPROP THROUGH THE SIMULATOR.

Short-horizon analytic policy gradients (the SHAC recipe): a tiny MLP
maps each environment's state to two vertical thrust commands (front
half / back half of a soft lattice), the commands enter the physics as
external forces, and the objective (forward travel minus control cost)
is differentiated THROUGH the rollout -- every segment runs
`diff.adjoint_rollout`, so both the forward physics and the hand-derived
backward sweep execute as fused VMEM Pallas kernels (ops/adjoint.py).
No reward estimation, no likelihood ratios: exact gradients of travel
w.r.t. policy weights.

The batch is flat-packed (parallel.replicate_scene): E environments are
ONE stencil scene, so the whole thing -- policy, physics, adjoint --
is a single jit program on one chip.

Locomotion must be DISCOVERED: thrust is vertical only, so the policy
has to rock the body and let plane friction rectify the motion into
forward travel (pushing sideways is not in the action space).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from titan_tpu import Simulation, SimConfig, Vec, diff
from titan_tpu.parallel import replicate_scene

ON_TPU = "TPU" in (jax.devices()[0].device_kind or "").upper()
if not ON_TPU:
    import jax.experimental.pallas as pl
    _orig = pl.pallas_call

    def _interp(*a, **k):
        k.pop("compiler_params", None)
        k["interpret"] = True
        return _orig(*a, **k)

    import titan_tpu.ops.adjoint as _adj
    import titan_tpu.ops.pallas_step as _ps
    _adj.pl.pallas_call = _interp
    _ps.pl.pallas_call = _interp

N_ENVS = int(os.environ.get("SHAC_ENVS", "8" if ON_TPU else "2"))
SEGMENTS = int(os.environ.get("SHAC_SEGMENTS", "10" if ON_TPU else "2"))
SEG_STEPS = int(os.environ.get("SHAC_SEG_STEPS", "40" if ON_TPU else "10"))
ITERS = int(os.environ.get("SHAC_ITERS", "40" if ON_TPU else "1"))
CTRL_COST = 0.01     # on the normalized (tanh) commands
LR = 0.02
HID = 32


def build():
    src = Simulation(SimConfig())
    body = src.createLattice(Vec(0, 0, 0.45), Vec(0.8, 0.8, 0.8), 3, 3, 3)
    body.setSpringConstants(2000.0)
    src._store.damping[: src._store.n_springs] = 1.0
    big, envs = replicate_scene(src, N_ENVS, spacing=Vec(4, 0, 0))
    big.createPlane(Vec(0, 0, 1), 0, 0.5, 0.7)
    big.setTimeStep(1e-3)
    big.setGlobalAcceleration(Vec(0, 0, -9.8))
    shape, state = diff.scene(big)
    assert diff.adjoint_supported(shape), diff.adjoint_reject_reason(shape)
    n_per = src._store.n_masses
    return shape, state, n_per


def main():
    shape, state, n_per = build()
    npad = state.masses.pos.shape[1]
    # per-env front/back masks from the initial layout (env e owns masses
    # [e*n, (e+1)*n); front = x below the env's own mean)
    pos0 = np.asarray(state.masses.pos)
    env_of = np.full(npad, -1, np.int32)
    front = np.zeros(npad, bool)
    for e in range(N_ENVS):
        lo, hi = e * n_per, (e + 1) * n_per
        env_of[lo:hi] = e
        front[lo:hi] = pos0[0, lo:hi] < pos0[0, lo:hi].mean()
    env_of = jnp.asarray(env_of)
    front = jnp.asarray(front)
    owned = env_of >= 0
    env_onehot = jnp.where(
        owned[None, :], (env_of[None, :]
                         == jnp.arange(N_ENVS)[:, None]), False)  # [E, npad]
    m_arr = state.masses.m
    x0 = (env_onehot @ state.masses.pos[0]) / n_per       # [E]

    def observe(st, i):
        p, v = st.masses.pos, st.masses.vel
        mean = lambda a: (env_onehot @ a) / n_per
        zf = (jnp.where(front, p[2], 0.0) @ env_onehot.T.astype(p.dtype)
              ) / (n_per / 2)
        zb = (jnp.where(owned & ~front, p[2], 0.0)
              @ env_onehot.T.astype(p.dtype)) / (n_per / 2)
        ph = 2 * jnp.pi * i / 8.0
        return jnp.stack([mean(v[0]), mean(v[2]), mean(p[2]),
                          zf - zb,
                          jnp.full((N_ENVS,), jnp.sin(ph)),
                          jnp.full((N_ENVS,), jnp.cos(ph))], axis=1)

    # thrust bound: 90% of each half-body's weight, so the policy can
    # genuinely unload/load the halves but not fly
    amax = 0.9 * float(np.asarray(m_arr)[:n_per].sum()) * 9.8 / 2.0

    def policy(params, obs):                              # obs [E, 6]
        h = jnp.tanh(obs @ params["w1"] + params["b1"])
        return jnp.tanh(h @ params["w2"] + params["b2"])  # [E, 2] in [-1,1]

    def apply_thrust(st, act):
        # act (normalized [E, 2]) -> vertical force amax*act spread over
        # each half's masses
        per_mass = amax * jnp.where(
            front, act[:, 0] @ env_onehot.astype(act.dtype),
            act[:, 1] @ env_onehot.astype(act.dtype)) / (n_per / 2)
        ext = jnp.zeros_like(st.masses.extern_force
                             ).at[2].set(jnp.where(owned, per_mass, 0.0))
        return dataclasses.replace(
            st, masses=dataclasses.replace(st.masses, extern_force=ext))

    def rollout_loss(params):
        def seg(st, i):
            obs = observe(st, i)
            act = policy(params, obs)
            st = apply_thrust(st, act)
            st = diff.adjoint_rollout(shape, st, SEG_STEPS,
                                      segment=SEG_STEPS)
            return st, jnp.sum(act * act)
        st, costs = jax.lax.scan(seg, state, jnp.arange(SEGMENTS))
        travel = (env_onehot @ st.masses.pos[0]) / n_per - x0   # [E]
        return (-jnp.mean(travel)
                + CTRL_COST * jnp.sum(costs) / (N_ENVS * SEGMENTS)), travel

    rng = np.random.RandomState(0)
    params = {
        "w1": jnp.asarray(rng.normal(0, 0.4, (6, HID)), jnp.float32),
        "b1": jnp.zeros((HID,), jnp.float32),
        "w2": jnp.asarray(rng.normal(0, 0.4, (HID, 2)), jnp.float32),
        "b2": jnp.zeros((2,), jnp.float32),
    }
    vg = jax.jit(jax.value_and_grad(rollout_loss, has_aux=True))

    mom = jax.tree.map(jnp.zeros_like, params)
    sec = jax.tree.map(jnp.zeros_like, params)
    b1, b2, eps = 0.9, 0.999, 1e-8
    for i in range(ITERS):
        (loss, travel), g = vg(params)
        mom = jax.tree.map(lambda m, x: b1 * m + (1 - b1) * x, mom, g)
        sec = jax.tree.map(lambda v, x: b2 * v + (1 - b2) * x * x, sec, g)
        t = i + 1
        params = jax.tree.map(
            lambda p, m, v: p - LR * (m / (1 - b1 ** t))
            / (jnp.sqrt(v / (1 - b2 ** t)) + eps), params, mom, sec)
        if i % 5 == 0 or i == ITERS - 1:
            print(f"iter {i:3d}  mean travel {float(jnp.mean(travel)):+.4f}"
                  f" m  loss {float(loss):+.5f}", flush=True)
    final = float(jnp.mean(travel))
    print(f"backprop-through-physics policy: mean travel {final:+.4f} m "
          f"over {SEGMENTS * SEG_STEPS} steps x {N_ENVS} envs", flush=True)
    assert np.isfinite(final)


if __name__ == "__main__":
    main()
