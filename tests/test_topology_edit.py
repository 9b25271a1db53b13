"""Incremental post-start topology edits (runtime/incremental.py).

Strategy: every test drives TWO identical simulations through the same
paused-time edit sequence; one resumes through the incremental row-surgery
path, the other is forced onto the full pull-everything + re-marshal path
(the round-3 behavior, itself pinned by the rest of the suite).  The
trajectories must match to f32-noise tolerance: the values pushed are
bitwise identical, but a full re-marshal re-orders stencil families by
popularity (builders.build_stencil_groups), so an edit that changes a
family's member count can reorder the force summation -- both orders are
correct, and they differ by ulps over these horizons.  Semantic errors
(a lost spring, a wrong rest length) show up at >= 1e-2 here.

Reference: /root/reference/src/sim.cu:224-341 (device-side createMass/
createSpring while started), sim.cu:343-564 (invalidate + compaction).
"""

import numpy as np
import pytest

from titan_tpu import SimConfig, Simulation, Vec
from titan_tpu.config import ACTUATED_EXPAND, CONTACT_PLANE


def build_scene(nx=4, actuated=False, magnets=False):
    sim = Simulation(SimConfig())
    sim.createLattice(Vec(0, 0, 5), Vec(1, 1, 1), nx, nx, nx)
    sim.createPlane(Vec(0, 0, 1), 0)
    if actuated:
        s = sim.springs[3]
        s._type = ACTUATED_EXPAND
        s._l_max = 2.0
        s._rate = 0.5
    if magnets:
        for i in (0, 7):
            m = sim.masses[i]
            m.max_mag_force = 2.0
            m.rad = 0.05
            m.mag_scale_factor = 1.0
    sim.setTimeStep(1e-4)
    return sim


def run_pair(edit_fn, scene_kwargs=None, t0=0.03, t1=0.05, edits=1):
    """Run the same edit sequence through both apply paths; return the
    two (pos, vel) snapshots after t0 + edits*(edit, t1)."""
    out = []
    for force_full in (False, True):
        sim = build_scene(**(scene_kwargs or {}))
        sim.start()
        sim.wait(t0)
        for _ in range(edits):
            edit_fn(sim)
            if force_full and sim._journal is not None:
                sim._journal.force_full = True
            sim.resume()
            sim.wait(t1)
        sim.getAll()
        n = sim._store.n_masses
        out.append((sim._store.pos[:n].copy(), sim._store.vel[:n].copy(),
                    sim._store.rest[:sim._store.n_springs].copy()))
        sim.stop()
    return out


def assert_pair_equal(out, atol=2e-5):
    (p1, v1, r1), (p2, v2, r2) = out
    np.testing.assert_allclose(p1, p2, atol=atol, rtol=0)
    np.testing.assert_allclose(v1, v2, atol=atol, rtol=0)
    np.testing.assert_allclose(r1, r2, atol=atol, rtol=0)


def test_create_remainder_spring_matches_full():
    """A new irregular spring (delta outside every family) flips
    has_remainder and lands in the rebuilt remainder subsystem."""
    def edit(sim):
        s = sim.createSpring(sim.masses[0], sim.masses[37])
        s._k = 500.0
    assert_pair_equal(run_pair(edit))


def test_create_spring_fills_freed_family_slot():
    """Delete a stencil spring, then create an identical one: the create
    must fill the freed (family, slot) lane, not grow the remainder."""
    def edit(sim):
        st = sim._store
        li, ri = int(st.left[10]), int(st.right[10])
        k, rest = float(st.k[10]), float(st.rest[10])
        sim.deleteSpring(sim.springs[10])
        s = sim.createSpring(sim.masses[li], sim.masses[ri])
        s._k = k
        s._rest = rest
    out = run_pair(edit)
    assert_pair_equal(out)


def test_fill_reuses_slot_without_remainder():
    sim = build_scene()
    sim.start()
    sim.wait(0.02)
    st = sim._store
    li, ri = int(st.left[10]), int(st.right[10])
    k, rest = float(st.k[10]), float(st.rest[10])
    sim.deleteSpring(sim.springs[10])
    s = sim.createSpring(sim.masses[li], sim.masses[ri])
    s._k = k
    s._rest = rest
    from titan_tpu.runtime.incremental import _try_incremental
    assert _try_incremental(sim)
    assert sim._rem_count == 0          # filled the family slot
    assert not sim._shape.has_remainder
    fi, sl = sim._sp_family[s._i], sim._sp_slot[s._i]
    assert fi >= 0 and sl == li
    sim.stop()


def test_delete_spring_matches_full():
    def edit(sim):
        sim.deleteSpring(sim.springs[20])
    assert_pair_equal(run_pair(edit))


def test_delete_mass_matches_full():
    """deleteMass flips all_valid; springs on the dead mass exert no
    force (reference sim.cu:1163 early-return)."""
    def edit(sim):
        sim.deleteMass(sim.masses[9])
    assert_pair_equal(run_pair(edit))


def test_create_mass_and_spring_matches_full():
    def edit(sim):
        m = sim.createMass(Vec(0.2, 0.2, 6.0))
        s = sim.createSpring(sim.masses[0], m)
        s._k = 200.0
    assert_pair_equal(run_pair(edit))


def test_repeated_edit_churn_matches_full():
    """Several pause/edit/resume rounds through the same journal path."""
    state = {"i": 0}

    def edit(sim):
        i = state["i"] % 3
        if i == 0:
            m = sim.createMass(Vec(0.5, 0.5, 5.5 + state["i"] * 0.1))
            sim.createSpring(sim.masses[2], m)
        elif i == 1:
            sim.deleteSpring(sim.springs[30 + state["i"]])
        else:
            s = sim.createSpring(sim.masses[1], sim.masses[42])
            s._k = 123.0
        state["i"] += 1

    # run_pair calls edit 2*edits times (once per sim); keep per-sim
    # sequences identical by resetting the counter between sims
    outs = []
    for force_full in (False, True):
        state["i"] = 0
        sim = build_scene()
        sim.start()
        sim.wait(0.02)
        for _ in range(4):
            edit(sim)
            if force_full and sim._journal is not None:
                sim._journal.force_full = True
            sim.resume()
            sim.wait(0.02)
        sim.getAll()
        n = sim._store.n_masses
        outs.append((sim._store.pos[:n].copy(), sim._store.vel[:n].copy(),
                     sim._store.rest[:sim._store.n_springs].copy()))
        sim.stop()
    assert_pair_equal(outs)


def test_actuated_rest_progress_preserved():
    """An unrelated paused edit must not rewind actuated rest lengths
    (the device-evolving field the incremental path pulls per row)."""
    def edit(sim):
        sim.deleteSpring(sim.springs[20])
    # SHORT post-edit horizon: the stiff-contact dynamics amplify the
    # family-reorder ulp chaotically (measured: identical rest, one-ulp
    # vel at 3 steps; ~1e-4 at 500 steps) -- same lesson as the round-3
    # cross-implementation grad checks under contact
    out = run_pair(edit, scene_kwargs={"actuated": True}, t1=0.005)
    assert_pair_equal(out)
    # and rest actually advanced beyond its start value
    sim = build_scene(actuated=True)
    r0 = float(sim._store.rest[3])
    sim.start()
    sim.wait(0.03)
    sim.deleteSpring(sim.springs[20])
    sim.resume()
    sim.wait(0.03)
    sim.getAll()
    assert float(sim._store.rest[3]) > r0 + 0.02
    sim.stop()


def test_feature_flip_new_spring_damping():
    """A new spring with damping on a damping-free trace retraces with
    has_damping=True through the incremental path."""
    def edit(sim):
        s = sim.createSpring(sim.masses[0], sim.masses[37])
        s._k = 300.0
        s._damping = 5.0
    out = run_pair(edit)
    assert_pair_equal(out)
    sim = build_scene()
    sim.start()
    sim.wait(0.02)
    s = sim.createSpring(sim.masses[0], sim.masses[37])
    s._damping = 5.0
    from titan_tpu.runtime.incremental import _try_incremental
    assert not sim._shape.has_damping
    assert _try_incremental(sim)
    assert sim._shape.has_damping
    sim.stop()


def test_attribute_write_while_dirty_applied_at_resume():
    """A host write to an UNTOUCHED row while the structure is dirty is
    journaled and applied at resume (round 3 applied it via the full
    re-marshal; the journal path must not lose it)."""
    sim = build_scene()
    sim.start()
    sim.wait(0.02)
    sim.createSpring(sim.masses[0], sim.masses[37])  # dirty
    # untouched-row write; stays under the reference's default velocity
    # clamp (|v| <= 1, sim.cu Euler+clamp) so one step can't erase it
    sim.masses[7].vel = Vec(0, 0, 0.5)
    sim.resume()
    sim.wait(1e-4)
    sim.getAll()
    # one step after resume: upward velocity must still dominate
    assert sim._store.vel[7, 2] > 0.3
    sim.stop()


def test_uniform_break_set_is_effective():
    """Regression (round-4 found bug): set() of one spring's k on a
    family-uniform scene must take effect even on traces that read one
    SMEM scalar per uniform family -- the push demotes the field."""
    sim = build_scene()
    sim.start()
    sim.wait(0.01)
    assert sim._shape.stencil_uniform[0]  # k uniform on a fresh lattice
    s = sim.springs[10]
    assert sim._sp_family[10] >= 0       # a stencil spring
    s._k = 1.0                            # ~zero stiffness
    sim.set(s)
    assert not sim._shape.stencil_uniform[0]
    # the weakened spring must actually weaken: compare endpoint distance
    # drift vs an unedited twin
    sim.resume()
    sim.wait(0.05)
    sim.getAll()
    st = sim._store
    li, ri = int(st.left[10]), int(st.right[10])
    d_edit = np.linalg.norm(st.pos[ri] - st.pos[li])

    sim2 = build_scene()
    sim2.start()
    sim2.wait(0.06)
    sim2.getAll()
    st2 = sim2._store
    d_ref = np.linalg.norm(st2.pos[ri] - st2.pos[li])
    assert abs(d_edit - float(st.rest[10])) != abs(d_ref - float(st2.rest[10]))
    sim.stop()
    sim2.stop()


def test_capacity_overflow_falls_back():
    """More creates than the padded slots -> full re-marshal, correct."""
    def edit(sim):
        for i in range(200):  # 64 masses padded to 128: overflow
            sim.createMass(Vec(2 + 0.01 * i, 2, 2))
    out = run_pair(edit)
    assert_pair_equal(out)


def test_local_constraint_add_at_pause():
    def edit(sim):
        sim.masses[0].addConstraint(CONTACT_PLANE, Vec(0, 0, 1), 4.0)
    assert_pair_equal(run_pair(edit))


def test_plane_add_at_pause():
    def edit(sim):
        sim.createPlane(Vec(0, 0, 1), -1.0)
    assert_pair_equal(run_pair(edit))


def test_retarget_spring_at_pause():
    """setLeft/setRight while paused re-places the spring (and, round-4
    fix: is no longer silently ignored when nothing else is dirty)."""
    def edit(sim):
        s = sim.springs[10]
        s.setMasses(sim.masses[0], sim.masses[37])
        s._rest = 0.8
    assert_pair_equal(run_pair(edit))


def test_magnet_scene_edit_matches_full():
    def edit(sim):
        sim.deleteSpring(sim.springs[12])
    out = run_pair(edit, scene_kwargs={"magnets": True})
    assert_pair_equal(out)


def test_compact_then_resume_matches_full():
    def edit(sim):
        sim.deleteMass(sim.masses[9])
        sim.compact()
    out = run_pair(edit)
    assert_pair_equal(out)


def test_one_spring_edit_cost_scales_with_rows_not_scene(monkeypatch):
    """The incremental path must not read back or re-stage O(scene)
    arrays for a one-spring edit.  Proxy on CPU: the apply must not call
    getAll (the full pull) and must not rebuild the mass state."""
    sim = build_scene(nx=6)
    sim.start()
    sim.wait(0.01)
    called = {"getAll": 0}
    orig = sim.getAll

    def spy():
        called["getAll"] += 1
        return orig()
    monkeypatch.setattr(sim, "getAll", spy)
    masses_before = sim._state.masses.pos
    sim.deleteSpring(sim.springs[10])
    from titan_tpu.runtime.incremental import _try_incremental
    assert _try_incremental(sim)
    assert called["getAll"] == 0
    # the big per-mass arrays were not re-staged (same device buffers)
    assert sim._state.masses.pos is masses_before
    sim.stop()


@pytest.mark.parametrize("seed", range(3))
def test_random_edit_interleaving_fuzz(seed):
    """Seeded random interleavings of every edit kind through the journal
    (round 4: the named tests cover single kinds; bursts mixing deletes,
    slot fills, remainder flips, param writes and plane adds in ONE
    journal exercise the plan/unfill/fill/retarget interactions).  Short
    post-edit horizons: family reorder under the forced-full path makes
    the comparison f32-ulp (module docstring)."""
    rng = np.random.RandomState(900 + seed)
    ops = []
    for _ in range(10):
        ops.append(rng.randint(0, 6))
    plan = {"made": []}

    def edit(sim):
        n0 = sim._store.n_masses
        for op in ops:
            if op == 0:
                sim.deleteSpring(sim.springs[int(rng.randint(0, 100))])
            elif op == 1:
                m = sim.createMass(Vec(rng.rand(), rng.rand(), 5.5))
                s = sim.createSpring(sim.masses[int(rng.randint(0, n0))], m)
                s._k = 77.0
            elif op == 2:
                s = sim.createSpring(sim.masses[int(rng.randint(0, 8))],
                                     sim.masses[int(rng.randint(40, 60))])
                s._k = 55.0
            elif op == 3:
                sp = sim.springs[int(rng.randint(0, 100))]
                sp._k = float(900 + rng.randint(0, 100))
                sim.set(sp)
            elif op == 4:
                sim.deleteMass(sim.masses[int(rng.randint(20, 40))])
            else:
                mm = sim.masses[int(rng.randint(0, n0))]
                mm.pos = Vec(rng.rand(), rng.rand(), 5.2)
                sim.set(mm)

    # one burst, then a second burst over the mutated scene (same RNG
    # stream both paths: re-seed per sim)
    outs = []
    for force_full in (False, True):
        rng = np.random.RandomState(900 + seed)
        for _ in range(10):
            rng.randint(0, 6)          # re-draw ops (same values)
        sim = build_scene(nx=5)
        sim.start()
        sim.wait(0.01)
        for _ in range(2):
            edit(sim)
            if force_full and sim._journal is not None:
                sim._journal.force_full = True
            sim.resume()
            sim.wait(0.004)
        sim.getAll()
        n = sim._store.n_masses
        outs.append((sim._store.pos[:n].copy(),
                     sim._store.vel[:n].copy(),
                     sim._store.rest[:sim._store.n_springs].copy()))
        sim.stop()
    assert_pair_equal(outs, atol=5e-5)


def _run_mesh_pair(edit_fn, edits=1, t0=0.03, t1=0.02):
    """The run_pair protocol on a 2-device mesh: the incremental leg must
    actually take the row-surgery path (asserted via a spy), the full leg
    is forced; trajectories must match to the family-reorder ulp
    tolerance."""
    import jax
    from jax.sharding import Mesh

    import titan_tpu.runtime.simulation as rsim
    from titan_tpu.runtime.incremental import apply_structural_edits

    mesh = Mesh(np.array(jax.devices()[:2]), ("shard",))
    out = []
    for force_full in (False, True):
        paths = []
        orig = rsim.apply_structural_edits

        def spy(sim):
            p = orig(sim)
            paths.append(p)
            return p

        rsim.apply_structural_edits = spy
        try:
            sim = build_scene()
            sim.distribute(mesh)
            sim.start()
            sim.wait(t0)
            for _ in range(edits):
                edit_fn(sim)
                if force_full and sim._journal is not None:
                    sim._journal.force_full = True
                sim.resume()
                sim.wait(t1)
            sim.getAll()
            n = sim._store.n_masses
            out.append((sim._store.pos[:n].copy(),
                        sim._store.vel[:n].copy(),
                        sim._store.rest[:sim._store.n_springs].copy()))
            assert len(sim._state.masses.pos.sharding.device_set) == 2
            sim.stop()
        finally:
            rsim.apply_structural_edits = orig
        expected = "full" if force_full else "incremental"
        assert paths and all(p == expected for p in paths), paths
    return out


def test_mesh_incremental_delete_matches_full():
    """Round 5: journaled row surgery on a mesh-sharded scene (the round-4
    mesh bailout is lifted) -- a spring delete lands as device surgery on
    the sharded arrays, no re-staging."""
    def edit(sim):
        sim.deleteSpring(sim.springs[10])
    assert_pair_equal(_run_mesh_pair(edit), atol=5e-5)


def test_mesh_incremental_create_matches_full():
    """A created remainder spring under a mesh: shape retrace + remainder
    rebuild through the distributed chunk cache, still no re-staging."""
    def edit(sim):
        s = sim.createSpring(sim.masses[0], sim.masses[37])
        s._k = 500.0
    assert_pair_equal(_run_mesh_pair(edit), atol=5e-5)


def test_mesh_incremental_chunk_cache_hit():
    """A shape-preserving edit on a mesh must reuse the SAME distributed
    chunk program (the _DIST_CHUNK_CACHE hit -- a rebuild would be a full
    retrace + device compile per edit cycle)."""
    import jax
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:2]), ("shard",))
    sim = build_scene()
    sim.distribute(mesh)
    sim.start()
    sim.wait(0.02)
    chunk_before = sim._chunk
    sim.masses[3].pos = Vec(0.1, 0.1, 5.2)   # row write
    sim.deleteSpring(sim.springs[10])        # mask-bit surgery, same shape
    from titan_tpu.runtime.incremental import _try_incremental
    assert _try_incremental(sim)
    assert sim._chunk is chunk_before
    sim.resume()
    sim.wait(0.01)
    sim.stop()


def test_uniform_break_while_structure_dirty():
    """r4 advisor (medium): a pure-param edit journaled while the
    structure is already dirty bypassed the uniform-family demotion
    (phase A only checked fills; _push_springs(_incremental=True) skips
    _check_uniform_break), silently leaving the tiled kernel on the
    stale SMEM family scalar.  The demotion must now happen in phase A
    for push rows too."""
    sim = build_scene()
    sim.start()
    sim.wait(0.01)
    assert sim._shape.stencil_uniform[0]          # fresh lattice: uniform k
    sim.deleteSpring(sim.springs[50])             # structure now dirty
    sim.springs[7]._k = 50.0                      # pure param edit
    from titan_tpu.runtime.incremental import _try_incremental
    assert _try_incremental(sim)
    assert not sim._shape.stencil_uniform[0], \
        "family-uniform k not demoted by a dirty-journal param edit"
    fam, slot = int(sim._sp_family[7]), int(sim._sp_slot[7])
    assert fam >= 0
    assert float(np.asarray(sim._state.stencil.k)[fam, slot]) == 50.0
    sim.resume()
    sim.wait(0.01)
    sim.stop()
