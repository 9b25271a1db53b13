"""Train a neural-network feedback controller by BACKPROP THROUGH THE
SIMULATOR.

Short-horizon analytic policy gradients (the SHAC recipe): a tiny MLP
maps each environment's state to a vertical thrust command, the command
enters the physics as an external force, and the objective is
differentiated THROUGH the rollout -- every segment runs
`diff.adjoint_rollout`, so both the forward physics and the hand-derived
backward sweep execute as fused VMEM Pallas kernels (ops/adjoint.py).
No reward estimation, no likelihood ratios: exact gradients of the
objective w.r.t. policy weights.

The task: each environment is a soft 3x3x3 lattice resting on a contact
plane, and each env has a DIFFERENT target hover height.  The policy
(shared weights across envs) must learn feedback control -- thrust up
when below target, back off as it approaches, fight gravity at the
setpoint -- purely from physics gradients.  Per-env targets mean a
constant output cannot solve it.

The batch is flat-packed (parallel.replicate_scene): E environments are
ONE stencil scene, so the whole thing -- policy, physics, adjoint --
is a single jit program on one chip.

Gradients are TRUNCATED at segment boundaries (stop_gradient on the
carried state).  Measured on hardware: full-horizon BPTT through
frictional contact is chaotic (the untruncated loss INCREASED under
Adam), and a locomotion-from-vertical-thrust variant of this example
converged to a NEGATIVE-travel stationary point -- the static-friction
hold branch has zero/misleading local derivatives, so finite rocking
improvements are invisible to infinitesimal gradients.  Discontinuous
contact tasks belong to the population-based trainers
(examples/train_es.py, examples/train_ppo.py); smooth objectives like
this one are where analytic physics gradients shine.
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
ITERS = int(os.environ.get("SHAC_ITERS", "60" if ON_TPU else "1"))
CTRL_COST = 1e-3     # on the normalized (tanh) command
LR = float(os.environ.get("SHAC_LR", "0.01"))
HID = 32


def build():
    # velocity_clamp (the reference's |v| <= 1 quirk) must be OFF: a
    # clamped velocity has ZERO gradient w.r.t. force, so once thrust
    # saturates the body rises at exactly 1 m/s and all policy gradients
    # die (measured: training froze at max thrust with the clamp on)
    src = Simulation(SimConfig(velocity_clamp=False))
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
    pos0 = np.asarray(state.masses.pos)
    env_of = np.full(npad, -1, np.int32)
    for e in range(N_ENVS):
        env_of[e * n_per: (e + 1) * n_per] = e
    env_of = jnp.asarray(env_of)
    owned = env_of >= 0
    env_onehot = jnp.where(
        owned[None, :], (env_of[None, :]
                         == jnp.arange(N_ENVS)[:, None]), False)  # [E, npad]
    m_arr = state.masses.m

    # per-env hover targets, spread so a constant policy output cannot
    # satisfy them (initial mean height is ~0.45 + 0.4 = 0.85? no: the
    # lattice spans z in [0.45, 1.25], mean ~0.85 at rest on the plane
    # after settling; targets ask for genuine lift)
    z0 = float((env_onehot[0] @ state.masses.pos[2]) / n_per)
    targets = jnp.asarray(z0 + 0.15 + 0.35 * np.arange(N_ENVS) /
                          max(N_ENVS - 1, 1), jnp.float32)       # [E]

    def mean_z(st):
        return (env_onehot @ st.masses.pos[2]) / n_per           # [E]

    def observe(st):
        p, v = st.masses.pos, st.masses.vel
        mz = (env_onehot @ p[2]) / n_per
        mvz = (env_onehot @ v[2]) / n_per
        return jnp.stack([mz, mvz, targets, targets - mz], axis=1)

    # thrust bound: 2x each env's weight, so the policy can lift and hover
    weight = float(np.asarray(m_arr)[:n_per].sum()) * 9.8
    amax = 2.0 * weight

    def policy(params, obs):                              # obs [E, 4]
        h = jnp.tanh(obs @ params["w1"] + params["b1"])
        return jnp.tanh(h @ params["w2"] + params["b2"])[:, 0]  # [E]

    def apply_thrust(st, act):
        # act (normalized [E]) -> vertical force amax*act spread evenly
        # over the env's masses
        per_mass = amax * (act @ env_onehot.astype(act.dtype)) / n_per
        ext = jnp.zeros_like(st.masses.extern_force
                             ).at[2].set(jnp.where(owned, per_mass, 0.0))
        return dataclasses.replace(
            st, masses=dataclasses.replace(st.masses, extern_force=ext))

    def rollout_loss(params):
        def seg(st, _):
            st = jax.lax.stop_gradient(st)
            obs = observe(st)
            act = policy(params, obs)
            st = apply_thrust(st, act)
            st = diff.adjoint_rollout(shape, st, SEG_STEPS,
                                      segment=SEG_STEPS)
            err = mean_z(st) - targets                          # [E]
            return st, (jnp.mean(err * err), jnp.mean(act * act))
        st, (errs, costs) = jax.lax.scan(seg, state, None, length=SEGMENTS)
        # steady-state objective: only the last few segment-ends count,
        # so the transient approach (reaching a far target takes time)
        # isn't traded against setpoint accuracy
        track = jnp.mean(errs[-max(SEGMENTS // 2, 1):])
        return track + CTRL_COST * jnp.mean(costs), (track, mean_z(st))

    rng = np.random.RandomState(0)
    params = {
        "w1": jnp.asarray(rng.normal(0, 0.4, (4, HID)), jnp.float32),
        "b1": jnp.zeros((HID,), jnp.float32),
        "w2": jnp.asarray(rng.normal(0, 0.4, (HID, 1)), jnp.float32),
        "b2": jnp.zeros((1,), jnp.float32),
    }
    vg = jax.jit(jax.value_and_grad(rollout_loss, has_aux=True))

    mom = jax.tree.map(jnp.zeros_like, params)
    sec = jax.tree.map(jnp.zeros_like, params)
    b1, b2, eps = 0.9, 0.999, 1e-8
    first = last = None
    for i in range(ITERS):
        (loss, (track, zf)), g = vg(params)
        if first is None:
            first = float(track)
        last = float(track)
        mom = jax.tree.map(lambda m, x: b1 * m + (1 - b1) * x, mom, g)
        sec = jax.tree.map(lambda v, x: b2 * v + (1 - b2) * x * x, sec, g)
        t = i + 1
        params = jax.tree.map(
            lambda p, m, v: p - LR * (m / (1 - b1 ** t))
            / (jnp.sqrt(v / (1 - b2 ** t)) + eps), params, mom, sec)
        if i % 5 == 0 or i == ITERS - 1:
            print(f"iter {i:3d}  tracking mse {float(track):.5f}  "
                  f"loss {float(loss):+.5f}", flush=True)
    if os.environ.get("SHAC_DEBUG"):
        def dbg(st, _):
            obs = observe(st)
            act = policy(params, obs)
            st = apply_thrust(st, act)
            st = diff.adjoint_rollout(shape, st, SEG_STEPS,
                                      segment=SEG_STEPS)
            return st, (act, mean_z(st))
        _, (acts, zs) = jax.lax.scan(dbg, state, None, length=SEGMENTS)
        np.set_printoptions(precision=3, suppress=True)
        print("acts per segment:\n", np.asarray(acts))
        print("mean z per segment:\n", np.asarray(zs))
    zf = np.asarray(zf)
    tg = np.asarray(targets)
    print("final heights vs targets:",
          " ".join(f"{z:.2f}/{t:.2f}" for z, t in zip(zf, tg)), flush=True)
    print(f"backprop-through-physics policy: tracking mse "
          f"{first:.5f} -> {last:.5f} over {ITERS} iters "
          f"({N_ENVS} envs x {SEGMENTS * SEG_STEPS} steps)", flush=True)
    assert np.isfinite(last)
    if ITERS >= 30:
        assert last < first * 0.5, "policy failed to improve"


if __name__ == "__main__":
    main()
