"""ctypes binding for the native C++ mesh kit (native/meshkit.cpp).

The reference's mesh pipeline is native C (src/trimesh.c: OBJ loading,
boundary detection, P1 FEM LBO assembly src/trimesh.c:1470-1610); this is
the framework's native equivalent for the host/setup-time path. Loads
native/libmeshkit.so if present (auto-building it once via `make -C native`
when a compiler is available); every entry point returns None when the
library is unavailable, and geom/trimesh.py falls back to its vectorized
NumPy implementation — which doubles as the test oracle for these routines
(tests/test_native_mesh.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libmeshkit.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_REPO_ROOT, "native", "meshkit.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["make", "-C", os.path.join(_REPO_ROOT, "native")],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_f64p = ctypes.POINTER(ctypes.c_double)
    lib.meshkit_lbo_fem.restype = ctypes.c_int64
    lib.meshkit_lbo_fem.argtypes = [
        c_f64p, ctypes.c_int64, c_i64p, ctypes.c_int64,
        c_i64p, c_i64p, c_f64p, c_f64p,
    ]
    lib.meshkit_obj_count.restype = ctypes.c_int64
    lib.meshkit_obj_count.argtypes = [ctypes.c_char_p, c_i64p, c_i64p]
    lib.meshkit_obj_read.restype = ctypes.c_int64
    lib.meshkit_obj_read.argtypes = [ctypes.c_char_p, c_f64p, c_i64p]
    lib.meshkit_boundary_edges.restype = ctypes.c_int64
    lib.meshkit_boundary_edges.argtypes = [c_i64p, ctypes.c_int64, c_i64p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def lbo_fem_native(verts: np.ndarray, faces: np.ndarray):
    """P1 FEM LBO element triplets via the native kit.

    Returns (rows, cols, Lvals, Mvals) flat triplet arrays (9 per face), or
    None if the native library is unavailable or the mesh is degenerate.
    """
    lib = _load()
    if lib is None:
        return None
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    faces = np.ascontiguousarray(faces, dtype=np.int64)
    nf = len(faces)
    rows = np.empty(9 * nf, dtype=np.int64)
    cols = np.empty(9 * nf, dtype=np.int64)
    Lv = np.empty(9 * nf, dtype=np.float64)
    Mv = np.empty(9 * nf, dtype=np.float64)
    rc = lib.meshkit_lbo_fem(
        _f64p(verts), len(verts), _i64p(faces), nf,
        _i64p(rows), _i64p(cols), _f64p(Lv), _f64p(Mv),
    )
    if rc != 0:
        return None
    return rows, cols, Lv, Mv


def load_obj_native(path: str):
    """Parse an OBJ file via the native kit. Returns (verts, faces) or None."""
    lib = _load()
    if lib is None:
        return None
    bpath = os.fsencode(path)
    nv = ctypes.c_int64(0)
    nf = ctypes.c_int64(0)
    if lib.meshkit_obj_count(bpath, ctypes.byref(nv), ctypes.byref(nf)) != 0:
        return None
    verts = np.empty((nv.value, 3), dtype=np.float64)
    faces = np.empty((nf.value, 3), dtype=np.int64)
    if lib.meshkit_obj_read(bpath, _f64p(verts), _i64p(faces)) != 0:
        return None
    return verts, faces


def boundary_edges_native(faces: np.ndarray):
    """Boundary edges (ne, 2) via the native kit, or None."""
    lib = _load()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, dtype=np.int64)
    nf = len(faces)
    out = np.empty((3 * nf, 2), dtype=np.int64)
    count = lib.meshkit_boundary_edges(_i64p(faces), nf, _i64p(out))
    if count < 0:
        return None
    return out[:count].copy()
