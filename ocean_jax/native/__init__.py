"""ctypes bindings for the native (C++) mesh-topology builder.

Replaces dolfin's C++ mesh core for setup-time topology extraction
(SURVEY §2.2). Compiled on first use with g++ (no pybind11 in the image —
plain C ABI via ctypes); every entry point has a pure-numpy fallback in
``ocean_jax.mesh.structured``, and both paths produce bit-identical
numbering (asserted in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "meshgen.cpp")
_LIB = os.path.join(_HERE, "_libmeshgen.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                    < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ocean_build_topology.restype = ctypes.c_int
    lib.ocean_build_topology.argtypes = [
        i64p, ctypes.c_int64, i64p, i64p, i64p, i64p, i64p]
    lib.ocean_build_triangulation.restype = ctypes.c_int
    lib.ocean_build_triangulation.argtypes = [
        ctypes.c_int64, ctypes.c_int64, f64p, f64p, u8p, ctypes.c_int,
        f64p, i64p, i64p, i64p, i64p]
    _lib = lib
    return _lib


def _ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def build_topology(cells: np.ndarray):
    """Native edge/facet extraction. Returns (edges, cell_edges,
    bf_cells, bf_local, bf_vertices) or None if the library is missing."""
    lib = load()
    if lib is None:
        return None
    cells = np.ascontiguousarray(cells, dtype=np.int64)
    nc = cells.shape[0]
    edges = np.empty((3 * nc, 2), dtype=np.int64)
    cell_edges = np.empty((nc, 3), dtype=np.int64)
    bf = np.empty((3 * nc, 4), dtype=np.int64)
    ne = np.zeros(1, dtype=np.int64)
    nbf = np.zeros(1, dtype=np.int64)
    rc = lib.ocean_build_topology(
        _ptr(cells, ctypes.c_int64), nc,
        _ptr(edges, ctypes.c_int64), _ptr(cell_edges, ctypes.c_int64),
        _ptr(bf, ctypes.c_int64), _ptr(ne, ctypes.c_int64),
        _ptr(nbf, ctypes.c_int64))
    if rc != 0:
        return None
    ne, nbf = int(ne[0]), int(nbf[0])
    bf = bf[:nbf]
    return (edges[:ne], cell_edges, bf[:, 0], bf[:, 1], bf[:, 2:4])


def build_triangulation(xs: np.ndarray, ys: np.ndarray, active: np.ndarray,
                        diagonal: str):
    """Native structured triangulation. Returns (vertices, cells,
    square_to_cell) or None."""
    lib = load()
    if lib is None:
        return None
    ny, nx = active.shape
    xs = np.ascontiguousarray(xs, dtype=np.float64)
    ys = np.ascontiguousarray(ys, dtype=np.float64)
    act = np.ascontiguousarray(active, dtype=np.uint8)
    vertices = np.empty(((nx + 1) * (ny + 1), 2), dtype=np.float64)
    cells = np.empty((2 * nx * ny, 3), dtype=np.int64)
    s2c = np.empty((ny, nx, 2), dtype=np.int64)
    nv = np.zeros(1, dtype=np.int64)
    nc = np.zeros(1, dtype=np.int64)
    rc = lib.ocean_build_triangulation(
        nx, ny, _ptr(xs, ctypes.c_double), _ptr(ys, ctypes.c_double),
        _ptr(act, ctypes.c_uint8), 1 if diagonal == "right" else 0,
        _ptr(vertices, ctypes.c_double), _ptr(cells, ctypes.c_int64),
        _ptr(s2c, ctypes.c_int64), _ptr(nv, ctypes.c_int64),
        _ptr(nc, ctypes.c_int64))
    if rc != 0:
        return None
    return vertices[:int(nv[0])].copy(), cells[:int(nc[0])].copy(), s2c
