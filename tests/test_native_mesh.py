"""Native C++ mesh kit vs the NumPy oracle (native/meshkit.cpp).

Mirrors the reference's test style — every fast path is validated against a
slow exact counterpart (SURVEY.md §4) — here the vectorized NumPy
implementations in geom/trimesh.py are the oracle for the native kit.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from butterfly_tpu.geom import native as gn
from butterfly_tpu.geom.trimesh import Trimesh, icosphere

pytestmark = pytest.mark.skipif(
    not gn.native_available(), reason="native meshkit not built"
)


def _python_lbo(mesh: Trimesh):
    """Force the NumPy fallback path regardless of the native library."""
    import unittest.mock as mock

    with mock.patch.object(gn, "_lib", None), mock.patch.object(
        gn, "_tried", True
    ):
        return mesh.lbo_fem()


def _python_boundary(mesh: Trimesh):
    import unittest.mock as mock

    with mock.patch.object(gn, "_lib", None), mock.patch.object(
        gn, "_tried", True
    ):
        return mesh.boundary_edges()


def test_lbo_fem_native_matches_numpy():
    mesh = icosphere(2)
    Ln, Mn = mesh.lbo_fem()  # native path (skipif guarantees availability)
    Lp, Mp = _python_lbo(mesh)
    assert sp.issparse(Ln) and sp.issparse(Mn)
    assert abs(Ln - Lp).max() < 1e-12
    assert abs(Mn - Mp).max() < 1e-12
    # stiffness rows sum to zero, mass rows sum to vertex areas > 0
    assert np.abs(np.asarray(Ln.sum(axis=1))).max() < 1e-10
    assert np.asarray(Mn.sum(axis=1)).min() > 0


def test_lbo_fem_native_open_mesh():
    # one flat triangle pair with a boundary
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], dtype=np.float64
    )
    faces = np.array([[0, 1, 2], [1, 3, 2]], dtype=np.int64)
    mesh = Trimesh(verts, faces)
    Ln, Mn = mesh.lbo_fem()
    Lp, Mp = _python_lbo(mesh)
    assert abs(Ln - Lp).max() < 1e-13
    assert abs(Mn - Mp).max() < 1e-13


def test_boundary_edges_native_matches_numpy():
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], dtype=np.float64
    )
    faces = np.array([[0, 1, 2], [1, 3, 2]], dtype=np.int64)
    mesh = Trimesh(verts, faces)
    bn = mesh.boundary_edges()
    bp = _python_boundary(mesh)
    assert sorted(map(tuple, bn)) == sorted(map(tuple, bp))
    # closed surface has no boundary
    assert len(icosphere(1).boundary_edges()) == 0


def test_obj_roundtrip_native(tmp_path):
    mesh = icosphere(1)
    path = str(tmp_path / "sphere.obj")
    mesh.save_obj(path)
    loaded = Trimesh.from_obj(path)  # native parser
    assert loaded.num_verts == mesh.num_verts
    assert loaded.num_faces == mesh.num_faces
    assert np.allclose(loaded.verts, mesh.verts, atol=1e-12)
    assert np.array_equal(loaded.faces, mesh.faces)


def test_obj_native_quads_and_slashes(tmp_path):
    # quad fan-triangulation + v/vt/vn face syntax + negative indices
    path = str(tmp_path / "quad.obj")
    with open(path, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n")
        f.write("f 1/1/1 2/2/2 3/3/3 4/4/4\n")
        f.write("f -4 -3 -2\n")
    got = gn.load_obj_native(path)
    assert got is not None
    verts, faces = got
    assert verts.shape == (4, 3)
    # quad -> 2 triangles, plus the negative-index triangle
    assert faces.shape == (3, 3)
    assert faces.tolist() == [[0, 1, 2], [0, 2, 3], [0, 1, 2]]
