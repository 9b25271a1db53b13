"""TPU smoke: extended VMEM Pallas kernel (actuated + drag + deleted) vs the
XLA path, on the real chip.  A/B in one process per CLAUDE.md."""

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


def main():
    from titan_tpu import (ACTUATED_CONTRACT, ACTUATED_EXPAND, Simulation,
                           SimConfig, Vec)
    from titan_tpu.ops import pallas_step
    from titan_tpu.ops.step import build_step_fn

    sim = Simulation(SimConfig())
    sim.createLattice(Vec(0, 0, 2), Vec(1, 1, 1), 6, 6, 6)
    sim.setAllSpringConstantValues(800.0)
    st = sim._store
    s = st.n_springs
    third = s // 3
    st.s_type[:third] = ACTUATED_EXPAND
    st.l_max[:third] = st.rest[:third] * 1.2
    st.rate[:third] = 0.5
    st.s_type[third:2 * third] = ACTUATED_CONTRACT
    st.l_min[third:2 * third] = st.rest[third:2 * third] * 0.8
    st.rate[third:2 * third] = 0.5
    st.drag[: st.n_masses] = 0.2
    st.valid[5] = False
    sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    sim.setTimeStep(0.0001)
    sim._T = 0.0
    sim._marshal()

    assert pallas_step.pallas_supported(sim._shape), "scene not in envelope"
    print("envelope OK:", sim._shape.has_actuated, sim._shape.has_drag,
          sim._shape.all_valid, flush=True)

    chunk_p = pallas_step.build_pallas_chunk(sim._shape)
    step = build_step_fn(sim._shape)
    chunk_x = jax.jit(lambda st_, n: jax.lax.fori_loop(
        0, n, lambda i, x: step(x), st_))

    t0 = time.perf_counter()
    out_p = chunk_p(sim._state, jnp.int32(50))
    tp = float(jax.device_get(out_p.t))
    print(f"pallas compiled+ran: t={tp:.5f} ({time.perf_counter()-t0:.1f}s)",
          flush=True)
    t0 = time.perf_counter()
    out_x = chunk_x(sim._state, jnp.int32(50))
    tx = float(jax.device_get(out_x.t))
    print(f"xla    compiled+ran: t={tx:.5f} ({time.perf_counter()-t0:.1f}s)",
          flush=True)

    n = st.n_masses
    pp, px = jax.device_get((out_p.masses.pos, out_x.masses.pos))
    vp, vx = jax.device_get((out_p.masses.vel, out_x.masses.vel))
    rp, rx = jax.device_get((out_p.stencil.rest, out_x.stencil.rest))
    np.testing.assert_allclose(np.asarray(pp)[:, :n], np.asarray(px)[:, :n],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(vp)[:, :n], np.asarray(vx)[:, :n],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rp), np.asarray(rx),
                               atol=1e-6, rtol=1e-6)
    moved = float(np.abs(np.asarray(rp)
                         - np.asarray(jax.device_get(
                             sim._state.stencil.rest))).max())
    assert moved > 1e-4, "actuation did nothing on device"
    print(f"MATCH: pallas == xla on TPU; max |drest| = {moved:.5f}",
          flush=True)


if __name__ == "__main__":
    main()
