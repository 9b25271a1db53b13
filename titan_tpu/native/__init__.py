"""Native (C++) host-side kernels, loaded via ctypes with numpy fallback.

Build happens lazily on first import: g++ -O3 -shared.  Everything here has
a pure-numpy equivalent in titan_tpu/builders.py and titan_tpu/stl.py; the
native path matters for very large scenes (100^3 lattice = 12.7M springs)
and dense STL voxelization.  Set TITAN_TPU_NO_NATIVE=1 to disable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "topology.cpp")
_SO = os.path.join(_HERE, "_titan_native.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("TITAN_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.titan_lattice_spring_count.restype = ctypes.c_int64
    lib.titan_lattice_spring_count.argtypes = [ctypes.c_int32] * 3
    lib.titan_lattice_springs.restype = ctypes.c_int64
    lib.titan_lattice_springs.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.titan_stl_inside.restype = None
    lib.titan_stl_inside.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return _lib


def lattice_springs(nx: int, ny: int, nz: int):
    """Native exact-order lattice topology, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    count = lib.titan_lattice_spring_count(nx, ny, nz)
    left = np.empty(count, dtype=np.int32)
    right = np.empty(count, dtype=np.int32)
    written = lib.titan_lattice_springs(
        nx, ny, nz,
        left.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        right.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    assert written == count
    return left, right


def stl_inside(tris: np.ndarray, pts: np.ndarray, num_rays: int,
               seed: int = 1):
    """Native ray-casting inside test, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    tris = np.ascontiguousarray(tris, dtype=np.float64)
    pts = np.ascontiguousarray(pts, dtype=np.float64)
    out = np.zeros(pts.shape[0], dtype=np.uint8)
    lib.titan_stl_inside(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), tris.shape[0],
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), pts.shape[0],
        num_rays, seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.astype(bool)
