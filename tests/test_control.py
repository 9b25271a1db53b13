"""Control-plane tests: breakpoints, pause/resume, live parameter mutation,
dynamic topology edits at pause boundaries, stop semantics.

These exercise the reference's L4 control surface (sim.h:91-109,
SURVEY.md section 3.3) on the chunked-dispatch TPU runtime."""

import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec


def _free_fall_sim(**cfg):
    sim = Simulation(SimConfig(velocity_clamp=False, **cfg))
    m = sim.createMass(Vec(0, 0, 0))
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, -1.0))
    return sim, m


def test_breakpoint_pause_resume():
    sim, m = _free_fall_sim()
    sim.start()
    sim.pause(0.5)
    assert not sim.running()
    assert sim.time() == pytest.approx(0.5, abs=1e-6)
    sim.getAll()
    z_half = m.pos[2]
    assert z_half == pytest.approx(-0.5 * 0.25, abs=1e-3)
    sim.resume()
    assert sim.running()
    sim.pause(1.0)
    sim.getAll()
    assert m.pos[2] == pytest.approx(-0.5, abs=1e-3)
    sim.stop()


def test_multiple_breakpoints_in_order():
    sim, m = _free_fall_sim()
    sim.setBreakpoint(0.3)
    sim.setBreakpoint(0.1)
    sim.setBreakpoint(0.2)
    sim.start()
    for expect in (0.1, 0.2, 0.3):
        sim.waitForEvent()
        assert sim.time() == pytest.approx(expect, abs=1e-6)
        sim.resume()
    sim.pause(0.4)
    sim.stop()


def test_stop_semantics():
    sim, _ = _free_fall_sim()
    sim.start()
    sim.pause(0.1)
    sim.stop()
    with pytest.raises(RuntimeError):
        sim.createMass(Vec(0, 0, 0))
    with pytest.raises(RuntimeError):
        sim.setBreakpoint(1.0)
    with pytest.raises(RuntimeError):
        sim.resume()


def test_live_timestep_change():
    sim, m = _free_fall_sim()
    sim.start()
    sim.pause(0.1)
    sim.setTimeStep(0.001)  # 10x coarser
    sim.resume()
    sim.pause(0.5)
    sim.getAll()
    # trajectory stays analytic regardless of dt
    assert m.pos[2] == pytest.approx(-0.5 * 0.25, abs=1e-2)
    sim.stop()


def test_live_spring_constant_mutation():
    """North-star config 3: live k mutation via breakpoints."""
    sim = Simulation(SimConfig(velocity_clamp=False))
    m1 = sim.createMass(Vec(0, 0, 0))
    m2 = sim.createMass(Vec(1.5, 0, 0))
    s = sim.createSpring(m1, m2)
    s._rest = 1.0  # stretched -> oscillates
    s._k = 100.0
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(0.05)
    sim.get(s)
    s._k = 0.0  # kill the spring force
    sim.set(s)
    sim.getAll()
    v_before = np.array(list(sim.masses[0].vel))
    sim.resume()
    sim.pause(0.3)
    sim.getAll()
    v_after = np.array(list(sim.masses[0].vel))
    # no force anymore -> velocity unchanged
    np.testing.assert_allclose(v_after, v_before, atol=1e-5)
    sim.stop()


def test_create_mass_while_running_raises():
    sim, _ = _free_fall_sim()
    sim.start()
    with pytest.raises(RuntimeError):
        # creating while running is an error (reference sim.cu:235-237)
        sim.createMass(Vec(5, 5, 5))
    sim.pause(0.1)
    sim.stop()


def test_create_mass_after_start():
    sim, m = _free_fall_sim()
    sim.start()
    sim.pause(0.5)
    m2 = sim.createMass(Vec(5, 5, 5))
    sim.resume()
    sim.pause(1.0)
    sim.getAll()
    # old mass kept its in-flight trajectory (z = -t^2/2)
    assert m.pos[2] == pytest.approx(-0.5, abs=1e-3)
    # new mass fell from its own creation time (~0.5s of fall)
    dt_fall = 1.0 - 0.5
    assert m2.pos[2] == pytest.approx(5 - 0.5 * dt_fall ** 2, abs=2e-2)
    sim.stop()


def test_create_spring_after_start():
    sim = Simulation(SimConfig(velocity_clamp=False))
    m1 = sim.createMass(Vec(0, 0, 0))
    m2 = sim.createMass(Vec(2.0, 0, 0))
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(0.1)
    s = sim.createSpring(m1, m2)  # rest = current distance -> no force yet
    s._rest = 1.0
    s._k = 10.0  # now pulls them together
    s._damping = 2.0  # settle toward rest separation
    sim.resume()
    sim.pause(1.5)
    sim.getAll()
    sep = m2.pos[0] - m1.pos[0]
    assert sep == pytest.approx(1.0, abs=0.3)  # relaxed toward rest length
    sim.stop()


def test_delete_mass_and_spring():
    sim = Simulation(SimConfig(velocity_clamp=False))
    m1 = sim.createMass(Vec(0, 0, 0))
    m2 = sim.createMass(Vec(2.0, 0, 0))
    s = sim.createSpring(m1, m2)
    s._rest = 1.0
    s._k = 10.0
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(0.05)
    sim.deleteSpring(s)
    sim.getAll()
    v1 = np.array(list(m1.vel))
    sim.resume()
    sim.pause(0.5)
    sim.getAll()
    np.testing.assert_allclose(np.array(list(m1.vel)), v1, atol=1e-5)
    sim.stop()


def test_delete_mass_disables_its_springs():
    # compaction off: this test pins the SOFT-delete semantics (valid=False
    # freezes the mass and silences its springs); with the default
    # compaction the deleted mass is physically dropped at resume() and is
    # no longer observable (see test_compaction.py)
    sim = Simulation(SimConfig(velocity_clamp=False, compact_threshold=0.0))
    m1 = sim.createMass(Vec(0, 0, 0))
    m2 = sim.createMass(Vec(2.0, 0, 0))
    s = sim.createSpring(m1, m2)
    s._rest = 1.0
    s._k = 10.0
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(0.05)
    sim.deleteMass(m2)
    sim.resume()
    sim.pause(0.5)
    sim.getAll()
    pos2 = np.array(list(m2.pos))
    # deleted mass is frozen; spring exerts nothing (invalid endpoint)
    sim.resume()
    sim.pause(0.7)
    sim.getAll()
    np.testing.assert_allclose(np.array(list(m2.pos)), pos2, atol=1e-6)
    sim.stop()


def test_wait_is_deterministic():
    sim, m = _free_fall_sim()
    sim.start()
    times = []
    while sim.time() < 0.5:
        sim.wait(0.1)
        times.append(sim.time())
        sim.resume()
    sim.stop()
    np.testing.assert_allclose(times, [0.1, 0.2, 0.3, 0.4, 0.5], atol=1e-9)


def test_reset():
    sim, _ = _free_fall_sim()
    sim.start()
    sim.pause(0.1)
    sim.reset()
    assert len(sim.masses) == 0
    sim.createMass(Vec(0, 0, 0))
    sim.start()
    sim.pause(0.1)
    sim.stop()


def test_nan_detection():
    """check_finite=True turns divergence into a raised error (the reference
    silently propagates NaN; SURVEY.md section 5.3)."""
    from titan_tpu.runtime.simulation import SimulationDivergedError
    sim = Simulation(SimConfig(velocity_clamp=False, check_finite=True))
    m1 = sim.createMass(Vec(0, 0, 0))
    m2 = sim.createMass(Vec(1, 0, 0))
    s = sim.createSpring(m1, m2)
    s._k = 1e30  # absurd stiffness -> f32 overflow -> inf/NaN
    s._rest = 5.0  # stretched, so the force actually fires
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    sim.setTimeStep(0.1)
    with pytest.raises(SimulationDivergedError):
        sim.start()
        sim.pause(10.0)


def test_resume_after_divergence_raises():
    from titan_tpu.runtime.simulation import SimulationDivergedError
    sim = Simulation(SimConfig(velocity_clamp=False, check_finite=True))
    m1 = sim.createMass(Vec(0, 0, 0))
    m2 = sim.createMass(Vec(1, 0, 0))
    s = sim.createSpring(m1, m2)
    s._k = 1e30
    s._rest = 5.0
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    sim.setTimeStep(0.1)
    with pytest.raises(SimulationDivergedError):
        sim.start()
        sim.pause(10.0)
    with pytest.raises(SimulationDivergedError):
        sim.resume()


def test_setall_pushes_everything():
    sim = Simulation(SimConfig(velocity_clamp=False))
    m1 = sim.createMass(Vec(0, 0, 5))
    m2 = sim.createMass(Vec(1, 0, 5))
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, -1.0))
    sim.start()
    sim.pause(0.5)
    sim.getAll()
    # teleport everything from the host side, then push with setAll
    m1.pos = Vec(0, 0, 100.0)
    m2.pos = Vec(1, 0, 100.0)
    m1.vel = Vec(0, 0, 0)
    m2.vel = Vec(0, 0, 0)
    sim.setAll()
    sim.resume()
    sim.pause(1.0)
    sim.getAll()
    # fell 0.5^2/2 from the new height
    assert m1.pos[2] == pytest.approx(100 - 0.125, abs=1e-3)
    sim.stop()


def test_clear_global_constraints_mid_run():
    sim = Simulation(SimConfig(velocity_clamp=False))
    m = sim.createMass(Vec(0, 0, 0.5))
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.setTimeStep(0.0001)
    sim.setGlobalAcceleration(Vec(0, 0, -9.8))
    sim.start()
    sim.pause(1.0)
    sim.getAll()
    assert m.pos[2] > -0.1  # bouncing on the plane
    sim.clearConstraints()  # remove the floor (reference sim.cu:2290-2293)
    sim.resume()
    sim.pause(2.0)
    sim.getAll()
    # undamped penalty bounce leaves some upward velocity at t=1, but with
    # the floor gone the mass must end clearly below it
    assert m.pos[2] < -1.0
    sim.stop()


def test_damping_enabled_mid_run():
    """addDamping() on a scene traced with has_damping=False must take
    effect after set(): the stencil/Pallas paths skip damping math entirely
    unless the trace has it, so the push must trigger a re-marshal."""
    sim = Simulation(SimConfig(velocity_clamp=False))
    m1 = sim.createMass(Vec(0, 0, 0))
    m2 = sim.createMass(Vec(1.5, 0, 0))
    s = sim.createSpring(m1, m2)
    s._rest = 1.0
    s._k = 100.0
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(0.05)
    assert not sim._shape.has_damping
    sim.get(s)
    s.addDamping(8.0)  # heavily damped from here on
    sim.set(s)
    assert sim._shape.has_damping, "damping push did not re-marshal"
    sim.resume()
    sim.pause(3.0)
    sim.getAll()
    v1 = np.array(list(sim.masses[0].vel))
    v2 = np.array(list(sim.masses[1].vel))
    sim.stop()
    # undamped, the pair oscillates forever with |v| ~ 0.9 peak; damped it
    # settles to rest
    assert np.linalg.norm(v1) < 0.02 and np.linalg.norm(v2) < 0.02


def test_actuated_push_onto_breathing_trace():
    """Flipping a spring to ACTUATED_* on a scene already traced with
    has_breathing=True (but has_actuated=False) must re-marshal so the
    rest-mutation path is in the trace."""
    from titan_tpu import ACTIVE_CONTRACT_THEN_EXPAND, ACTUATED_EXPAND
    sim = Simulation(SimConfig(velocity_clamp=False))
    m1 = sim.createMass(Vec(0, 0, 0))
    m2 = sim.createMass(Vec(1.0, 0, 0))
    m3 = sim.createMass(Vec(2.0, 0, 0))
    s_active = sim.createSpring(m1, m2)
    s_pass = sim.createSpring(m2, m3)
    s_active.changeType(ACTIVE_CONTRACT_THEN_EXPAND, 5.0)
    sim.setGlobalAcceleration(Vec(0, 0, 0))
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(0.05)
    assert sim._shape.has_breathing and not sim._shape.has_actuated
    sim.get(s_pass)
    s_pass._type = ACTUATED_EXPAND
    s_pass._l_max = 2.0
    s_pass._rate = 1.0
    sim.set(s_pass)
    assert sim._shape.has_actuated, "ACTUATED push did not re-marshal"
    rest0 = s_pass._rest
    sim.resume()
    sim.pause(0.3)
    sim.get(s_pass)
    sim.stop()
    # rest grew at ~rate for 0.25 s
    assert s_pass._rest > rest0 + 0.2


def test_set_timestep_while_chunk_in_flight():
    """setTimeStep is live (no pause required); a dt update racing an
    in-flight chunk must not be lost at the worker's state writeback."""
    sim, m = _free_fall_sim()
    sim.start()
    sim.setBreakpoint(2.0)     # worker starts chunking toward 2.0
    sim.setTimeStep(0.001)     # likely lands while a chunk is in flight
    sim.waitForEvent()
    sim.getAll()
    z = m.pos[2]
    sim.stop()
    # free fall is dt-independent; if the dt update were lost, device state
    # and host time accounting diverge and z is far off the analytic value
    assert z == pytest.approx(-0.5 * 4.0, abs=2e-2)


def test_float32_host_store():
    """SimConfig.host_store_dtype=float32: full pipeline works and matches
    the f64-store trajectory at f32 tolerance."""
    def run(dtype):
        sim = Simulation(SimConfig(velocity_clamp=False,
                                   host_store_dtype=dtype))
        sim.createLattice(Vec(0, 0, 2), Vec(1, 1, 1), 3, 3, 3)
        sim.createPlane(Vec(0, 0, 1), 0)
        sim.setGlobalAcceleration(Vec(0, 0, -9.8))
        sim.setTimeStep(0.0001)
        sim.start()
        sim.pause(0.3)
        sim.getAll()
        out = sim._store.pos[:27].copy()
        assert sim._store.pos.dtype == np.dtype(dtype)
        sim.stop()
        return out

    np.testing.assert_allclose(run("float32"), run("float64"),
                               atol=1e-4, rtol=1e-4)


def test_worker_learns_step_rate():
    """The worker probes fresh chunk fns and learns steps/s so every
    dispatch stays under config.max_chunk_seconds (the tunneled-TPU
    runtime kills single dispatches past ~1 min; a slow magnet scene at
    max_chunk_steps used to crash the worker mid-soak)."""
    from titan_tpu import Simulation, SimConfig, Vec
    sim = Simulation(SimConfig())
    sim.createLattice(Vec(0, 0, 3), Vec(1, 1, 1), 4, 4, 4)
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.setTimeStep(1e-4)
    sim.start()
    sim.wait(0.05)          # 500 steps: probe chunks then rated chunks
    assert sim._rate is not None and sim._rate > 0
    assert abs(sim.time() - 0.05) < 1e-12   # exact-time semantics intact
    # round 4: an in-capacity createMass at a pause is a journaled row
    # push (runtime/incremental.py) -- the shape and therefore the
    # learned rate SURVIVE the resume (no re-probe).  The sim is ALREADY
    # paused after wait() (an extra pause(time()) here would push a
    # stale breakpoint that resume() pops into an instant re-pause,
    # making the next wait() a documented no-op)
    sim.createMass(Vec(0, 0, 5))
    sim.resume()
    assert sim._rate is not None     # journal path kept the chunk + rate
    sim.wait(0.02)
    assert abs(sim.time() - 0.07) < 1e-12
    # a full re-marshal (here: forced via the journal's escape hatch, the
    # path capacity overflow / bulk writes / compact() take) DOES reset
    # the probe state so the fresh chunk fn is re-rated
    sim.createMass(Vec(0, 0, 6))
    sim._journal.force_full = True
    sim.resume()
    assert sim._rate is None         # reset by the resume-time re-marshal
    sim.wait(0.01)
    assert sim._rate is not None and abs(sim.time() - 0.08) < 1e-12
    sim.stop()
