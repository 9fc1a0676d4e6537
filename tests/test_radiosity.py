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


def test_culled_visibility_matches_brute_force(rng):
    """Octree-culled occlusion (the Embree-BVH analogue,
    src/trimesh.c:460-490) agrees ray-for-ray with the dense tiles on a
    random occluder field."""
    from butterfly_tpu.geom.visibility import CulledVisibility

    # random small triangles scattered in the unit cube
    F = 400
    c = rng.random((F, 1, 3))
    tris = (c + 0.08 * (rng.random((F, 3, 3)) - 0.5)).astype(np.float64)
    B = 300
    orig = rng.random((B, 3))
    dst = rng.random((B, 3))
    dirs = dst - orig
    skip = rng.integers(-1, F, (B, 2)).astype(np.int32)

    want = ray_hits_any(orig, dirs, tris, skip_idx=skip)
    cv = CulledVisibility(tris, leaf_size=32)
    got = cv.ray_hits_any(orig, dirs, skip_idx=skip)
    assert cv.num_groups > 4  # culling structure actually partitioned
    np.testing.assert_array_equal(got, want)

    # rays that never leave an empty corner touch zero groups
    far_o = np.full((8, 3), 10.0)
    far_d = np.tile(np.array([[0.0, 0.0, 1.0]]), (8, 1))
    assert not cv.ray_hits_any(far_o, far_d).any()


def test_culled_segment_occluded_on_mesh():
    """The mesh-level query gives identical answers culled and brute-force,
    and caches the culled structure on the mesh."""
    mesh = _two_plates(gap=2.0)
    v3 = np.array([[-1, -1, 1], [2, -1, 1], [2, 2, 1], [-1, 2, 1]],
                  dtype=np.float64)
    verts = np.vstack([mesh.verts, v3])
    faces = np.vstack([mesh.faces, [[8, 9, 10], [8, 10, 11]]])
    blocked = Trimesh(verts, faces)
    src = np.array([0, 0, 1, 2])
    tgt = np.array([2, 3, 3, 0])
    brute = segment_occluded(blocked, src, tgt, culled=False)
    culled = segment_occluded(blocked, src, tgt, culled=True)
    np.testing.assert_array_equal(culled, brute)
    assert hasattr(blocked, "_culled_vis")
