"""Gradient-based gait optimization ACROSS a device mesh.

gait_gradient_opt.py tunes a soft walker's breathing frequencies by
gradient descent through the fused VMEM adjoint on ONE device.  This
example runs the same loop through the DISTRIBUTED adjoint
(parallel/halo_adjoint.py): `diff.grad_rollout(..., mesh=mesh)` shards
the forward tiled kernel AND the backward sweep across every device in
the mesh (per-step ppermuted halo exchanges, trace memory sharded), so
scenes too big for one chip's HBM train the same way -- the CUDA
reference is single-GPU and has no gradient capability at all
(sim.cu:1704-1841 is forward-only).

    loss(omega) = -(mean forward travel of a breathing centipede
                    lattice after H steps on a friction plane)
    omega <- adam(omega, d loss / d omega)

On real TPU hardware the mesh is whatever `jax.devices()` exposes; on
CPU (demo/smoke mode) the Pallas kernels run in interpret mode on a
2-virtual-device mesh with a shrunken tile so the example finishes in
seconds.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from titan_tpu import (ACTIVE_CONTRACT_THEN_EXPAND, SimConfig, Simulation,
                       Vec, diff)
from titan_tpu.parallel import halo_adjoint

ON_TPU = "TPU" in (jax.devices()[0].device_kind or "").upper()
if not ON_TPU:
    # CPU demo/smoke mode: interpret-mode kernels + a small tile so the
    # 240x6x6 demo scene spans both virtual devices (the same trick the
    # distributed test suites use)
    import jax.experimental.pallas as pl
    _orig = pl.pallas_call

    def _interp(*a, **k):
        k.pop("compiler_params", None)
        k["interpret"] = True
        return _orig(*a, **k)

    import titan_tpu.ops.adjoint_tiled as _adt
    import titan_tpu.ops.pallas_tiled as _pt
    import titan_tpu.parallel.halo_tiled as _ht
    _adt.pl.pallas_call = _interp
    _pt.pl.pallas_call = _interp
    _pt._tile_size = lambda h, shape=None: max(h, 4096)
    _ht._tile_size = _pt._tile_size

STEPS = int(os.environ.get("DIST_GAIT_STEPS", "400" if ON_TPU else "4"))
ITERS = int(os.environ.get("DIST_GAIT_ITERS", "15" if ON_TPU else "2"))
SEG = min(STEPS, 50)
LR = 0.4
NX = int(os.environ.get("DIST_GAIT_NX", "400" if ON_TPU else "240"))


def build():
    """A long breathing 'centipede' lattice on a friction plane: half
    the springs breathe (ACTIVE_CONTRACT_THEN_EXPAND), and travel
    emerges from the phase pattern the optimizer finds."""
    sim = Simulation(SimConfig(velocity_clamp=False,
                               host_store_dtype="float32"))
    sim.createLattice(Vec(0, 0, 0.6), Vec(10, 0.5, 0.5), NX, 6, 6)
    sim.setAllSpringConstantValues(3000.0)
    sim.createPlane(Vec(0, 0, 1), 0, 0.5, 0.7)
    sim.setTimeStep(1e-4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    st = sim._store
    half = st.n_springs // 2
    st.s_type[:half] = ACTIVE_CONTRACT_THEN_EXPAND
    st.omega[:half] = 6.0
    st.damping[: st.n_springs] = 10.0
    sim._T = 0.0
    sim._marshal()
    return sim


def main():
    n_dev = len(jax.devices())
    if not ON_TPU:
        n_dev = min(n_dev, 2)            # CPU smoke: 2 virtual devices
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:n_dev]), ("shard",))
    sim = build()
    shape, state = diff.scene(sim)
    r = halo_adjoint.halo_adjoint_reject_reason(shape, n_dev)
    assert r is None, r
    print(f"distributed gait opt: {sim._store.n_masses} masses, "
          f"{sim._store.n_springs} springs, {n_dev}-device mesh")

    valid = state.masses.valid
    nvalid = jnp.sum(valid)
    x0 = jnp.sum(jnp.where(valid, state.masses.pos[0], 0.0)) / nvalid

    def travel(omega):
        st = dataclasses.replace(
            state, stencil=dataclasses.replace(state.stencil, omega=omega))
        out = diff.grad_rollout(shape, st, STEPS, segment=SEG, mesh=mesh)
        x = jnp.sum(jnp.where(valid, out.masses.pos[0], 0.0)) / nvalid
        return x - x0

    loss_grad = jax.jit(jax.value_and_grad(lambda w: -travel(w)))

    omega = state.stencil.omega
    m = jnp.zeros_like(omega)
    v = jnp.zeros_like(omega)
    b1, b2, eps = 0.9, 0.999, 1e-8
    first = None
    for i in range(ITERS):
        loss, g = loss_grad(omega)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** (i + 1))
        vh = v / (1 - b2 ** (i + 1))
        omega = omega + LR * mh / (jnp.sqrt(vh) + eps)   # ascent on travel
        loss = float(jax.device_get(loss))
        if first is None:
            first = -loss
        print(f"iter {i:3d}  travel over {STEPS} steps = {-loss:+.6f} m",
              flush=True)
    print(f"optimized travel {first:+.6f} -> {-loss:+.6f} m "
          f"on the {n_dev}-device mesh")


if __name__ == "__main__":
    main()
