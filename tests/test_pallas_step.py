"""The fused Pallas chunk vs the XLA chunk: identical physics.

On CPU the kernel runs in Pallas interpret mode (slow but exact), so this
validates the TPU fast path without TPU hardware."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.ops import pallas_step
from titan_tpu.ops.step import build_chunk_fn


def _scene(clamp=True, friction=False, ball=False, fixed_face=False,
           extern=False, damping=0.0, integrator=None, breathing=False):
    from titan_tpu import Integrator, ACTIVE_CONTRACT_THEN_EXPAND
    cfg = dict(velocity_clamp=clamp)
    if integrator:
        cfg["integrator"] = Integrator(integrator)
    sim = Simulation(SimConfig(**cfg))
    if fixed_face:
        sim.createBeam(Vec(0, 0, 2), Vec(1, 1, 1), 4, 4, 4)
    else:
        sim.createLattice(Vec(0, 0, 2), Vec(1, 1, 1), 4, 4, 4)
    sim.setAllSpringConstantValues(800.0)
    if damping:
        sim._store.damping[: sim._store.n_springs] = damping
    if breathing:
        st = sim._store
        half = st.n_springs // 2
        st.s_type[:half] = ACTIVE_CONTRACT_THEN_EXPAND
        st.omega[:half] = 7.0
    if friction:
        sim.createPlane(Vec(0, 0, 1), 0, 0.4, 0.6)
    else:
        sim.createPlane(Vec(0, 0, 1), 0)
    if ball:
        sim.createBall(Vec(0, 0, 1.0), 0.6)
    if extern:
        sim.masses[0].setExternalForce(Vec(0.05, -0.02, 0.0))
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(0.0001)
    sim._T = 0.0
    sim._marshal()
    return sim


@pytest.mark.parametrize("variant", ["plain", "clamp_off", "friction",
                                     "ball", "beam", "extern", "damping",
                                     "verlet", "breathing"])
def test_pallas_matches_xla(variant, monkeypatch):
    kw = dict(clamp=variant != "clamp_off",
              friction=variant == "friction",
              ball=variant == "ball",
              fixed_face=variant == "beam",
              extern=variant == "extern",
              damping=0.5 if variant == "damping" else 0.0,
              integrator="verlet" if variant == "verlet" else None,
              breathing=variant == "breathing")
    sim = _scene(**kw)
    assert pallas_step.pallas_supported(sim._shape), "scene left the envelope"

    # force interpret mode on CPU
    import jax.experimental.pallas as pl
    orig_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig_call(*args, **kwargs)

    monkeypatch.setattr("titan_tpu.ops.pallas_step.pl.pallas_call",
                        interp_call)

    chunk_pallas = pallas_step.build_pallas_chunk(sim._shape)
    chunk_xla = build_chunk_fn(sim._shape)

    out_p = chunk_pallas(sim._state, jnp.int32(50))
    out_x = chunk_xla(sim._state, jnp.int32(50))

    # compare real masses only: the kernel lets padding slots integrate
    # (harmlessly: their springs have k=0), the XLA path freezes them
    n = sim._store.n_masses
    # f32: kernel and XLA path order float ops differently
    np.testing.assert_allclose(np.asarray(out_p.masses.pos)[:, :n],
                               np.asarray(out_x.masses.pos)[:, :n],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.masses.vel)[:, :n],
                               np.asarray(out_x.masses.vel)[:, :n],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.masses.T)[:n],
                               np.asarray(out_x.masses.T)[:n], atol=1e-7)
    assert float(out_p.t) == pytest.approx(float(out_x.t), abs=1e-7)


def test_envelope_rejections():
    # ACTUATED (rest-mutating) springs push the scene out of the envelope
    from titan_tpu import ACTUATED_EXPAND
    sim = _scene()
    st = sim._store
    st.s_type[: st.n_springs] = ACTUATED_EXPAND
    st.l_max[: st.n_springs] = 2.0
    st.rate[: st.n_springs] = 0.1
    sim._marshal()
    assert not pallas_step.pallas_supported(sim._shape)
    # so does a deleted mass
    sim2 = _scene()
    sim2._store.valid[0] = False
    sim2._marshal()
    assert not pallas_step.pallas_supported(sim2._shape)
