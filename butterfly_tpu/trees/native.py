"""ctypes binding for the native C++ tree builder (native/treekit.cpp).

Loads native/libtreekit.so if present (build with `make -C native`),
auto-building it once if a compiler is available. `build_point_tree_native`
returns the same (perm, node table) contract the NumPy builder produces;
PointTree uses it transparently when available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libtreekit.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_REPO_ROOT, "native", "treekit.cpp")
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
    lib.treekit_build.restype = ctypes.c_int64
    lib.treekit_build.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # points
        ctypes.c_int64,  # n
        ctypes.c_int32,  # d
        ctypes.c_int64,  # leaf_size
        ctypes.c_int32,  # max_depth
        ctypes.POINTER(ctypes.c_int64),  # perm
        ctypes.POINTER(ctypes.c_int64),  # node_parent
        ctypes.POINTER(ctypes.c_int32),  # node_depth
        ctypes.POINTER(ctypes.c_int64),  # node_i0
        ctypes.POINTER(ctypes.c_int64),  # node_i1
        ctypes.POINTER(ctypes.c_int32),  # node_octant
        ctypes.POINTER(ctypes.c_double),  # node_lo
        ctypes.POINTER(ctypes.c_double),  # node_hi
        ctypes.c_int64,  # max_nodes
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def build_point_tree_native(points: np.ndarray, leaf_size: int, max_depth: int):
    """Run the native builder. Returns (perm, nodes) where nodes is a dict of
    flat arrays (parent, depth, i0, i1, octant, lo, hi) in discovery order,
    or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, dtype=np.float64)
    n, d = points.shape
    perm = np.arange(n, dtype=np.int64)
    # worst-case node count: every split produces >= 2 children and leaves
    # hold >= 1 point -> < 2n nodes; pad generously
    max_nodes = 4 * n + 16
    parent = np.empty(max_nodes, dtype=np.int64)
    depth = np.empty(max_nodes, dtype=np.int32)
    i0 = np.empty(max_nodes, dtype=np.int64)
    i1 = np.empty(max_nodes, dtype=np.int64)
    octant = np.empty(max_nodes, dtype=np.int32)
    lo = np.empty((max_nodes, 3), dtype=np.float64)
    hi = np.empty((max_nodes, 3), dtype=np.float64)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    count = lib.treekit_build(
        ptr(points, ctypes.c_double), n, d, leaf_size, max_depth,
        ptr(perm, ctypes.c_int64),
        ptr(parent, ctypes.c_int64), ptr(depth, ctypes.c_int32),
        ptr(i0, ctypes.c_int64), ptr(i1, ctypes.c_int64),
        ptr(octant, ctypes.c_int32),
        ptr(lo, ctypes.c_double), ptr(hi, ctypes.c_double),
        max_nodes,
    )
    if count < 0:
        return None
    return perm, {
        "parent": parent[:count].copy(),
        "depth": depth[:count].copy(),
        "i0": i0[:count].copy(),
        "i1": i1[:count].copy(),
        "octant": octant[:count].copy(),
        "lo": lo[:count].copy(),
        "hi": hi[:count].copy(),
    }
