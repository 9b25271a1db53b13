"""Loud fallbacks: leaving a fast path must emit a warning that names the
envelope condition that failed (VERDICT r2 weak #4)."""

import logging

import numpy as np
import pytest

from titan_tpu import Integrator, Simulation, SimConfig, Vec
from titan_tpu.ops.pallas_step import pallas_reject_reason
from titan_tpu.ops.pallas_tiled import tiled_reject_reason
from titan_tpu.parallel import make_mesh
from titan_tpu.parallel.halo import halo_reject_reason


def _scene(**cfg):
    sim = Simulation(SimConfig(velocity_clamp=False, **cfg))
    sim.createLattice(Vec(0, 0, 3), Vec(8, 1, 1), 32, 4, 4)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.setTimeStep(1e-4)
    sim._T = 0.0
    sim._marshal()
    return sim


def test_reject_reasons_name_the_condition():
    ok = _scene()
    assert pallas_reject_reason(ok._shape) is None
    assert halo_reject_reason(ok._shape, 8) is None

    f64 = _scene(dtype="float64")
    assert "float64" in pallas_reject_reason(f64._shape)
    assert "float64" in tiled_reject_reason(f64._shape)

    rk2 = _scene(integrator=Integrator.RK2)
    assert halo_reject_reason(rk2._shape, 8) is None   # RK2 halo: round 3
    assert tiled_reject_reason(rk2._shape) is None     # RK2 tiled: round 3

    strict = _scene(persistent_extern_force=False)
    assert "extern_force" in halo_reject_reason(strict._shape, 8)
    assert "extern_force" in pallas_reject_reason(strict._shape)

    # a magnet scene beyond magnet_pallas_max names the knob
    mag = _scene(magnet_pallas_max=64)
    mag._store.mag_maxf[:4] = 1.0
    mag._store.mag_rad[:4] = 0.05
    mag._marshal()
    assert "magnet_pallas_max" in pallas_reject_reason(mag._shape)

    # non-divisible device count names the arithmetic
    assert "devices" in halo_reject_reason(ok._shape, 7)


def test_xla_fallback_warns_on_tpu(monkeypatch, caplog):
    """A scene outside both Pallas envelopes (f64 here) must log a WARNING
    naming both failed conditions when the TPU fast paths are available."""
    from titan_tpu.ops import step as step_mod
    monkeypatch.setattr(step_mod, "_on_tpu", lambda: True)
    sim = _scene(dtype="float64")
    with caplog.at_level(logging.WARNING, logger="titan_tpu"):
        step_mod.build_chunk_fn(sim._shape)
    msgs = [r.message for r in caplog.records if r.levelno >= logging.WARNING]
    assert any("XLA step path" in m and "float64" in m for m in msgs), msgs


def test_fast_path_does_not_warn(monkeypatch, caplog):
    from titan_tpu.ops import step as step_mod
    sim = _scene()
    with caplog.at_level(logging.WARNING, logger="titan_tpu"):
        step_mod.build_chunk_fn(sim._shape)
    assert not [r for r in caplog.records if r.levelno >= logging.WARNING]


def test_distribute_fallback_warns(caplog):
    """distribute() on a scene the halo path rejects (strict extern_force
    mode here) must warn with the condition; the designed binned-magnet
    fallback stays quiet."""
    sim = _scene(persistent_extern_force=False)
    with caplog.at_level(logging.WARNING, logger="titan_tpu"):
        sim.distribute(make_mesh(("shard",)))
    msgs = [r.message for r in caplog.records if r.levelno >= logging.WARNING]
    assert any("automatic SPMD" in m and "extern_force" in m
               for m in msgs), msgs

    caplog.clear()
    binned = Simulation(SimConfig(velocity_clamp=False,
                                  magnet_binned_threshold=2))
    binned.createLattice(Vec(0, 0, 3), Vec(8, 1, 1), 32, 4, 4)
    binned._store.mag_maxf[:4] = 1.0
    binned._store.mag_rad[:4] = 0.05
    binned.setTimeStep(1e-4)
    binned._T = 0.0
    binned._marshal()
    with caplog.at_level(logging.WARNING, logger="titan_tpu"):
        binned.distribute(make_mesh(("shard",)))
    assert not [r for r in caplog.records if r.levelno >= logging.WARNING]
