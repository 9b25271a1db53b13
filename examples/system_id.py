"""System identification THROUGH the physics: recover per-spring
stiffness from an observed trajectory.

The CUDA reference can only simulate forward; fitting material
parameters to data means wrapping it in a gradient-free outer loop.
Here the fused adjoint kernel (`diff.adjoint_rollout`, ops/adjoint.py)
makes the whole fit a first-order optimization ON the accelerator:

    k_true   (hidden, two-material beam)  --forward-->  observed pos_t
    k_hat    <- adam( d/dk  sum_t || pos_t(k_hat) - pos_t ||^2 )

The loss matches positions at every segment boundary (trajectory
matching, not final-state -- docs/GUIDE.md horizon guidance), and each
segment is one adjoint_rollout call, so BOTH passes of every segment
run fused VMEM Pallas kernels.  Gradients flow into `stencil.k`
per-spring-lane: the recovered stiffness field resolves the soft/stiff
split without ever being told two materials exist.

Run on TPU for the real fit (~60 Adam iterations); on CPU the same
script runs a tiny smoke-mode fit through interpret-mode kernels.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp

from titan_tpu import Simulation, SimConfig, Vec, diff

ON_TPU = "TPU" in (jax.devices()[0].device_kind or "").upper()
if not ON_TPU:
    # CPU demo/smoke mode: run the Pallas kernels in interpret mode
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

N = int(os.environ.get("SYSID_N", "10" if ON_TPU else "4"))
SEG = int(os.environ.get("SYSID_SEG", "50" if ON_TPU else "10"))
NSEG = int(os.environ.get("SYSID_NSEG", "6" if ON_TPU else "2"))
ITERS = int(os.environ.get("SYSID_ITERS", "60" if ON_TPU else "3"))
LR = 0.08


def build():
    """A beam fixed at the x==0 face, pre-stressed so it oscillates
    under gravity -- free vibration excites every spring family."""
    sim = Simulation(SimConfig(velocity_clamp=False,
                               host_store_dtype="float32"))
    sim.createBeam(Vec(0, 0, 2), Vec(2, 0.6, 0.6), N, max(3, N // 3),
                   max(3, N // 3))
    st = sim._store
    st.rest[: st.n_springs] *= 1.02          # pre-stress
    st.damping[: st.n_springs] = 2.0
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    return sim


def main():
    sim = build()
    shape, state = diff.scene(sim)
    assert diff.adjoint_supported(shape), diff.adjoint_reject_reason(shape)

    # hidden ground truth: soft lower half (k=600), stiff upper (k=1800),
    # split at the mean height of the valid masses
    z = state.masses.pos[2]
    valid = state.masses.valid
    z_mid = (jnp.sum(jnp.where(valid, z, 0.0)) / jnp.sum(valid))
    stiff = (z > z_mid)[None, :]             # [1, N] broadcast over families
    k_true = jnp.where(state.stencil.mask,
                       jnp.where(stiff, 1800.0, 600.0), 0.0)

    def segments(k, s0):
        """NSEG chained adjoint segments; returns stacked positions at
        each segment boundary ([NSEG, 3, N])."""
        s = dataclasses.replace(
            s0, stencil=dataclasses.replace(s0.stencil, k=k))
        outs = []
        for _ in range(NSEG):
            s = diff.adjoint_rollout(shape, s, SEG, segment=SEG)
            outs.append(s.masses.pos)
        return jnp.stack(outs)

    # observe the true system (forward only -- any path works; use the
    # same segments fn so observation times line up exactly)
    obs = jax.jit(lambda: segments(k_true, state))()

    vmask = state.masses.valid[None, None, :]

    def loss_fn(logk):
        k = jnp.exp(logk) * state.stencil.mask
        pred = segments(k, state)
        return jnp.mean(jnp.where(vmask, (pred - obs) ** 2, 0.0)) * 1e4

    loss_grad = jax.jit(jax.value_and_grad(loss_fn))

    # start from a uniform wrong guess (the observed beam's "spec sheet")
    logk = jnp.log(jnp.where(state.stencil.mask, 1000.0, 1.0))
    m = jnp.zeros_like(logk)
    v = jnp.zeros_like(logk)
    b1, b2, eps = 0.9, 0.999, 1e-8

    def k_err(logk):
        """Median relative stiffness error over springs that carry
        signal (valid lanes; unstrained lanes are unidentifiable)."""
        k = jnp.exp(logk)
        ok = state.stencil.mask & (k_true > 0)
        rel = jnp.where(ok, jnp.abs(k - k_true) / jnp.where(
            k_true > 0, k_true, 1.0), jnp.nan)
        return float(jnp.nanmedian(rel))

    loss0 = None
    for i in range(ITERS):
        loss, g = loss_grad(logk)
        if loss0 is None:
            loss0 = float(loss)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** (i + 1))
        vh = v / (1 - b2 ** (i + 1))
        logk = logk - LR * mh / (jnp.sqrt(vh) + eps)
        if i % 10 == 0 or i == ITERS - 1:
            print(f"iter {i:3d}  traj mse {float(loss):.6f}  "
                  f"median k err {k_err(logk) * 100:.1f}%", flush=True)

    loss_f = float(loss_grad(logk)[0])
    print(f"system id: loss {loss0:.6f} -> {loss_f:.6f} "
          f"({loss0 / max(loss_f, 1e-12):.1f}x), "
          f"median stiffness error {k_err(logk) * 100:.1f}%", flush=True)
    assert loss_f < loss0


if __name__ == "__main__":
    main()
