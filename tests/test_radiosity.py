"""View-factor assembly + visibility + radiosity solve.

Reference parity targets: midpoint-rule view factors
(src/mat_csr_real.c:387-405), Embree-style visibility filtering
(src/trimesh.c:1632-1690), CSR container (examples/radiosity/radiosity.c:22).
"""

import numpy as np
import scipy.sparse as sp

from butterfly_tpu.geom.trimesh import Trimesh, icosphere
from butterfly_tpu.geom.visibility import ray_hits_any, segment_occluded
from butterfly_tpu.models.radiosity import (
    RadiosityModel,
    view_factor_matrix,
    view_factor_tile,
)


def _reference_view_factor(mesh, i, j):
    """Scalar transcription of integrateViewFactorMidpointRule
    (src/mat_csr_real.c:387-405) as the golden oracle."""
    cent, norm, area = (
        mesh.face_centroids(), mesh.face_normals(), mesh.face_areas()
    )
    dp = cent[i] - cent[j]
    dot_src = norm[i] @ dp
    dot_tgt = -norm[j] @ dp
    r2 = dp @ dp
    return area[j] * max(0.0, dot_src) * max(0.0, dot_tgt) / (
        np.pi * r2 * r2
    )


def _two_plates(gap=1.0):
    """Two parallel unit squares across `gap`. Windings follow the
    reference's sign convention (dp = p_src - p_tgt,
    src/mat_csr_real.c:397-400): a pair contributes when each normal has a
    positive dot with the offset TOWARD its own side — i.e. normals facing
    away from the gap, as on an outward-normal convex body."""
    v = np.array([
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],          # z=0
        [0, 0, gap], [1, 0, gap], [1, 1, gap], [0, 1, gap],  # z=gap
    ], dtype=np.float64)
    f = np.array([
        [0, 2, 1], [0, 3, 2],          # bottom, normal -z (away from gap)
        [4, 5, 6], [4, 6, 7],          # top, normal +z (away from gap)
    ])
    return Trimesh(v, f)


def test_view_factor_matches_reference_formula(rng):
    mesh = icosphere(1)
    F = view_factor_matrix(mesh, sparse=False)
    nf = mesh.num_faces
    for _ in range(25):
        i, j = rng.integers(0, nf, 2)
        want = 0.0 if i == j else _reference_view_factor(mesh, int(i), int(j))
        assert abs(F[i, j] - want) < 1e-12 * max(1.0, abs(want))


def test_view_factor_csr_and_backface():
    mesh = _two_plates()
    F = view_factor_matrix(mesh)
    assert sp.issparse(F)
    Fd = F.toarray()
    # facing plates see each other; coplanar faces don't (cosine = 0)
    assert Fd[0, 2] > 0 and Fd[2, 0] > 0
    assert Fd[0, 1] == 0 and Fd[2, 3] == 0
    # reciprocity: A_i F_ij == A_j F_ji (equal-area faces here)
    a = mesh.face_areas()
    np.testing.assert_allclose(a[0] * Fd[0, 2], a[2] * Fd[2, 0], rtol=1e-12)


def test_visibility_blocks_occluded_pairs():
    mesh = _two_plates(gap=2.0)
    # a third plate between them blocks the sightline
    v3 = np.array([[-1, -1, 1], [2, -1, 1], [2, 2, 1], [-1, 2, 1]],
                  dtype=np.float64)
    verts = np.vstack([mesh.verts, v3])
    faces = np.vstack([mesh.faces, [[8, 9, 10], [8, 10, 11]]])
    blocked = Trimesh(verts, faces)
    occ = segment_occluded(blocked, [0], [2])
    assert occ[0]
    # without the blocker the pair is visible
    occ0 = segment_occluded(mesh, [0], [2])
    assert not occ0[0]
    # occlusion-aware assembly zeroes the blocked entry
    Fv = view_factor_matrix(blocked, occlusion=True, sparse=False)
    assert Fv[0, 2] == 0.0


def test_ray_hits_any_basic():
    tris = np.array([[[0, 0, 0.5], [1, 0, 0.5], [0, 1, 0.5]]])
    orig = np.array([[0.2, 0.2, 0.0], [5.0, 5.0, 0.0]])
    dirs = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    hits = ray_hits_any(orig, dirs, tris)
    assert hits[0] and not hits[1]


def test_radiosity_solve_converges():
    # outward-normal sphere: under the reference's sign convention every
    # face pair on a convex body contributes (n_i . (p_i - p_j) > 0)
    mesh = icosphere(1)
    model = RadiosityModel(mesh, rho=0.4)
    E = np.zeros(mesh.num_faces)
    E[0] = 1.0
    B, iters = model.solve(E, tol=1e-12)
    # fixed point: B = E + rho*F B
    resid = B - (E + 0.4 * np.asarray(model.apply_F(B)))
    assert np.linalg.norm(resid) < 1e-8
    assert B[0] >= 1.0 and np.all(B >= -1e-12)
