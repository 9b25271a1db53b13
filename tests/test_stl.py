"""STL parsing + voxelized import (reference stlparser.h + importFromSTL,
sim.cu:2085-2151).  Fixture meshes are generated in-test (binary STL)."""

import struct

import numpy as np
import pytest

from titan_tpu import Simulation, SimConfig, Vec
from titan_tpu.stl import parse_stl


def _write_binary_stl(path, tris):
    """tris: [F, 3, 3] float array."""
    tris = np.asarray(tris, dtype=np.float32)
    with open(path, "wb") as fh:
        fh.write(b"\x00" * 80)
        fh.write(struct.pack("<I", tris.shape[0]))
        for t in tris:
            n = np.cross(t[1] - t[0], t[2] - t[0])
            ln = np.linalg.norm(n)
            n = n / ln if ln > 0 else n
            fh.write(struct.pack("<3f", *n))
            for v in t:
                fh.write(struct.pack("<3f", *v))
            fh.write(struct.pack("<H", 0))


def _box_tris(lo, hi):
    """12 triangles of an axis-aligned box."""
    lo, hi = np.asarray(lo, float), np.asarray(hi, float)
    v = np.array([[lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
                  [hi[0], hi[1], lo[2]], [lo[0], hi[1], lo[2]],
                  [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
                  [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]]])
    quads = [(0, 3, 2, 1), (4, 5, 6, 7), (0, 1, 5, 4),
             (2, 3, 7, 6), (1, 2, 6, 5), (3, 0, 4, 7)]
    tris = []
    for a, b, c, d in quads:
        tris.append([v[a], v[b], v[c]])
        tris.append([v[a], v[c], v[d]])
    return np.array(tris)


def test_parse(tmp_path):
    p = str(tmp_path / "box.stl")
    _write_binary_stl(p, _box_tris([0, 0, 0], [2, 1, 1]))
    f = parse_stl(p)
    assert f.num_triangles == 12
    center, dims = f.bounding_box()
    np.testing.assert_allclose(center, [1, 0.5, 0.5])
    np.testing.assert_allclose(dims, [2, 1, 1])


def test_inside(tmp_path):
    p = str(tmp_path / "box.stl")
    _write_binary_stl(p, _box_tris([0, 0, 0], [2, 1, 1]))
    f = parse_stl(p)
    pts = np.array([[1.0, 0.5, 0.5],    # center: inside
                    [0.1, 0.1, 0.1],    # corner region: inside
                    [3.0, 0.5, 0.5],    # outside +x
                    [1.0, 0.5, 1.5],    # above
                    [-0.5, 0.5, 0.5]])  # outside -x
    got = f.inside(pts, num_rays=15)
    np.testing.assert_array_equal(got, [True, True, False, False, False])


def test_import_from_stl_box(tmp_path):
    p = str(tmp_path / "box.stl")
    _write_binary_stl(p, _box_tris([0, 0, 0], [1, 1, 1]))
    sim = Simulation(SimConfig(velocity_clamp=False))
    c = sim.importFromSTL(p, density=1.0, num_rays=7)
    # a solid box keeps essentially the full lattice
    assert len(c.masses) > 0
    assert len(c.springs) > 0
    # culled sites stay as structural holes (invalid rows); the container
    # and the valid mass count see only the kept ones
    st = sim._store
    assert int(np.count_nonzero(st.valid[:st.n_masses])) == len(c.masses)
    assert np.all(st.hole[:st.n_masses] == ~st.valid[:st.n_masses])
    # and the scene runs
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.setTimeStep(0.0001)
    sim.start()
    sim.pause(0.05)
    sim.getAll()
    assert np.all(np.isfinite(sim._store.pos[: sim._store.n_masses]))
    sim.stop()


def test_import_culls_outside(tmp_path):
    # an L-shaped solid: union of two boxes; lattice points in the missing
    # quadrant must be culled
    tris = np.concatenate([
        _box_tris([0, 0, 0], [2, 1, 1]),
        _box_tris([0, 0, 1], [1, 1, 2]),
    ])
    p = str(tmp_path / "ell.stl")
    _write_binary_stl(p, tris)
    sim = Simulation(SimConfig(velocity_clamp=False))
    c = sim.importFromSTL(p, density=3.0, num_rays=9)
    n_total = len(c.masses)
    assert 0 < n_total
    # the import scales to max-dim 10; the missing quadrant is
    # x > 5, z > 5 in import coordinates (pos z offset dimz)
    st = sim._store
    pos = st.pos[: st.n_masses]
    valid = st.valid[: st.n_masses]
    in_missing = (pos[:, 0] > 1.0) & (pos[:, 2] > 11.0) & valid
    assert in_missing.sum() == 0
    # the culled quadrant exists as holes, never as live masses
    assert np.any(st.hole[: st.n_masses])


def test_import_runs_on_stencil_fast_path(tmp_path):
    """Culled sites kept as index holes => spring deltas stay lattice
    strides => the import buckets FULLY into stencil families and is
    eligible for the fused VMEM kernel (no remainder, no gather path)."""
    from titan_tpu.ops.pallas_step import pallas_supported
    tris = np.concatenate([
        _box_tris([0, 0, 0], [2, 1, 1]),
        _box_tris([0, 0, 1], [1, 1, 2]),
    ])
    p = str(tmp_path / "ell.stl")
    _write_binary_stl(p, tris)
    sim = Simulation(SimConfig(velocity_clamp=False))
    sim.importFromSTL(p, density=3.0, num_rays=9)
    sim.createPlane(Vec(0, 0, 1), 0)
    sim.setTimeStep(0.0001)
    sim._T = 0.0
    sim._marshal()
    assert not sim._shape.has_remainder, "import left springs un-bucketed"
    assert len(sim._shape.stencil_deltas) <= 13
    assert pallas_supported(sim._shape)
    # holes survive a marshal with the default compact_threshold: they are
    # geometry, not garbage (compaction would break the deltas)
    st = sim._store
    assert np.any(st.hole[: st.n_masses])
    sim.start()
    sim.pause(0.03)
    sim.getAll()
    assert np.all(np.isfinite(st.pos[: st.n_masses][st.valid[: st.n_masses]]))
    sim.stop()
