import numpy as np

from titan_tpu import Vec, dot, cross


def test_ops():
    a = Vec(1, 2, 3)
    b = Vec(4, 5, 6)
    assert (a + b) == Vec(5, 7, 9)
    assert (b - a) == Vec(3, 3, 3)
    assert (2 * a) == Vec(2, 4, 6)
    assert (a / 2) == Vec(0.5, 1, 1.5)
    assert (-a) == Vec(-1, -2, -3)
    assert a[0] == 1 and a[2] == 3


def test_norm_dot_cross():
    a = Vec(3, 4, 0)
    assert a.norm() == 5
    assert dot(Vec(1, 0, 0), Vec(0, 1, 0)) == 0
    assert cross(Vec(1, 0, 0), Vec(0, 1, 0)) == Vec(0, 0, 1)


def test_inplace_view_writes_through():
    backing = np.array([1.0, 2.0, 3.0])
    v = Vec(backing)
    v += Vec(1, 1, 1)
    assert backing[0] == 2.0
    v[2] = 10
    assert backing[2] == 10.0
