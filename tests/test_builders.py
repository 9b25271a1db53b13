"""Topology builders vs a direct loop transcription of the reference's
Lattice construction (object.cu:235-296), used as the test oracle."""

import numpy as np
import pytest

from titan_tpu import builders


def _reference_lattice_springs(nx, ny, nz):
    """Oracle: the reference's per-cell emission loops, in Python."""

    def idx(i, j, k):
        return k + j * nz + i * ny * nz

    springs = []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                for l in range(2 if i != nx - 1 else 1):
                    for m in range(2 if j != ny - 1 else 1):
                        for n in range(2 if k != nz - 1 else 1):
                            if l != 0 or m != 0 or n != 0:
                                springs.append((idx(i, j, k),
                                                idx(i + l, j + m, k + n)))
                if k != nz - 1:
                    if j != ny - 1:
                        springs.append((idx(i, j, k + 1), idx(i, j + 1, k)))
                    if i != nx - 1:
                        springs.append((idx(i, j, k + 1), idx(i + 1, j, k)))
                    if j != ny - 1 and i != nx - 1:
                        springs.append((idx(i, j, k + 1), idx(i + 1, j + 1, k)))
                        springs.append((idx(i + 1, j, k + 1), idx(i, j + 1, k)))
                        springs.append((idx(i, j + 1, k + 1), idx(i + 1, j, k)))
                if j != ny - 1 and i != nx - 1:
                    springs.append((idx(i, j + 1, k), idx(i + 1, j, k)))
    return np.array(springs, dtype=np.int64)


@pytest.mark.parametrize("dims", [(2, 2, 2), (3, 3, 3), (5, 5, 5),
                                  (4, 2, 3), (1, 3, 3), (2, 1, 1)])
def test_lattice_springs_match_reference(dims):
    nx, ny, nz = dims
    oracle = _reference_lattice_springs(nx, ny, nz)
    left, right = builders.lattice_springs(nx, ny, nz)
    got = np.stack([left, right], axis=1)
    assert got.shape == oracle.shape
    np.testing.assert_array_equal(got, oracle)


def test_known_spring_counts():
    # counts documented in SURVEY.md section 2 (C14)
    assert builders.lattice_springs(5, 5, 5)[0].shape[0] == 1036
    assert builders.lattice_springs(10, 10, 10)[0].shape[0] == 10476
    assert builders.lattice_springs(20, 20, 20)[0].shape[0] == 93556


def test_lattice_positions():
    pos = builders.lattice_positions(np.array([0., 0., 5.]),
                                     np.array([4., 4., 4.]), 3, 3, 3)
    assert pos.shape == (27, 3)
    # mass order: k + j*nz + i*ny*nz; first mass at corner (-2, -2, 3)
    np.testing.assert_allclose(pos[0], [-2, -2, 3])
    # k advances fastest (z)
    np.testing.assert_allclose(pos[1], [-2, -2, 5])
    np.testing.assert_allclose(pos[3], [-2, 0, 3])
    np.testing.assert_allclose(pos[9], [0, -2, 3])
    np.testing.assert_allclose(pos[26], [2, 2, 7])


def test_cube():
    pos = builders.cube_positions(np.zeros(3), 2.0)
    assert pos.shape == (8, 3)
    np.testing.assert_allclose(pos[0], [-1, -1, -1])
    np.testing.assert_allclose(pos[7], [1, 1, 1])
    left, right = builders.cube_springs()
    assert left.shape[0] == 28


def test_incidence_roundtrip():
    # random topology: gather-mode accumulation must equal dense scatter
    rng = np.random.default_rng(0)
    n, s = 40, 100
    left = rng.integers(0, n, s)
    right = rng.integers(0, n, s)
    f = rng.normal(size=(3, s))
    inc_idx, inc_sign = builders.build_incidence(left, right, n, s)
    fpad = np.concatenate([f, np.zeros((3, 1))], axis=1)
    got = np.einsum("nd,cnd->cn", inc_sign, fpad[:, inc_idx])
    want = np.zeros((3, n))
    for i in range(s):
        want[:, right[i]] += f[:, i]
        want[:, left[i]] -= f[:, i]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_beam_fixed_mask():
    fixed = builders.beam_fixed_mask(3, 2, 2)
    assert fixed[:4].all() and not fixed[4:].any()


def test_momentum_util():
    from titan_tpu import Simulation, SimConfig, Vec
    from titan_tpu.testutil import momentum
    sim = Simulation(SimConfig(velocity_clamp=False))
    m = sim.createMass(Vec(1, 0, 0))
    m.vel = Vec(0, 2, 0)
    # linear p = m*v = (0, 0.2, 0); angular = p x pos = (0,0.2,0)x(1,0,0)
    # = (0*0-0*0, 0*1-0*0, 0*0-0.2*1) = (0, 0, -0.2); sum = (0, 0.2, -0.2)
    got = momentum(sim)
    assert abs(got[1] - 0.2) < 1e-12 and abs(got[2] + 0.2) < 1e-12
