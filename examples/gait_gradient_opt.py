"""Gradient-based gait optimization THROUGH the physics.

The CUDA reference tunes gaits by hand or with gradient-free search; here
the breathing frequencies of every spring in a soft walker are optimized
by gradient DESCENT through the simulator itself: `diff.adjoint_rollout`
runs both the forward rollout and the hand-derived backward sweep as
fused VMEM Pallas kernels (ops/adjoint.py -- measured 8.1k fwd+bwd
steps/s at the 1M-spring bench scene on one v5e, 12.8x the XLA-recompute
backward), and `stencil.omega` is differentiable on that path.

    loss(omega) = -(mean forward travel after H steps)
    omega <- adam(omega, d loss / d omega)

Short horizons only (docs/GUIDE.md BPTT guidance): contact dynamics are
chaotic over thousands of steps; a few hundred works well.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp

from titan_tpu import Simulation, SimConfig, Vec, diff
from titan_tpu.models import walker

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

STEPS = int(os.environ.get("GAIT_STEPS", "400" if ON_TPU else "40"))
ITERS = int(os.environ.get("GAIT_ITERS", "25" if ON_TPU else "2"))
SEG = min(STEPS, 100)
LR = 0.4


def main():
    sim = Simulation(SimConfig())
    walker(sim, size=1.0, n=4, k=3000.0, omega=6.0)
    sim.createPlane(Vec(0, 0, 1), 0, 0.5, 0.7)     # friction plane
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    shape, state = diff.scene(sim)
    assert diff.adjoint_supported(shape), diff.adjoint_reject_reason(shape)

    valid = state.masses.valid
    nvalid = jnp.sum(valid)
    x0 = jnp.sum(jnp.where(valid, state.masses.pos[0], 0.0)) / nvalid

    def travel(omega):
        st = dataclasses.replace(
            state, stencil=dataclasses.replace(state.stencil, omega=omega))
        out = diff.adjoint_rollout(shape, st, STEPS, segment=SEG)
        x = jnp.sum(jnp.where(valid, out.masses.pos[0], 0.0)) / nvalid
        return x - x0

    loss_grad = jax.jit(jax.value_and_grad(lambda w: -travel(w)))

    omega = state.stencil.omega
    # plain Adam, on-device (no optax dependency needed for one tensor)
    m = jnp.zeros_like(omega)
    v = jnp.zeros_like(omega)
    b1, b2, eps = 0.9, 0.999, 1e-8

    for i in range(ITERS):
        loss, g = loss_grad(omega)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** (i + 1))
        vh = v / (1 - b2 ** (i + 1))
        omega = omega - LR * mh / (jnp.sqrt(vh) + eps)
        if i % 5 == 0 or i == ITERS - 1:
            print(f"iter {i:3d}  travel {-float(loss):+.5f} m  "
                  f"|grad| {float(jnp.linalg.norm(g)):.3e}", flush=True)

    final = float(travel(omega))
    base = float(travel(state.stencil.omega))
    print(f"travel over {STEPS} steps: baseline {base:+.5f} m -> "
          f"optimized {final:+.5f} m", flush=True)
    assert jnp.isfinite(final)


if __name__ == "__main__":
    main()
