"""Multiple-scattering BIE: several ellipse scatterers, block Kapur-Rokhlin
corrections, butterfly system, GMRES — field checked against exact interior
sources (reference parity: examples/multiple_scattering)."""

import numpy as np
import pytest

from butterfly_tpu.fac import helm2 as fac_helm2
from butterfly_tpu.geom import Ellipse, sample_poisson_disk
from butterfly_tpu.ops.helm2 import Helm2, LayerPot
from butterfly_tpu.ops.linalg import solve_gmres
from butterfly_tpu.ops.linop import Diag, Identity, Product, Scaled, Sum
from butterfly_tpu.ops.quadrature import kr_block_correction
from butterfly_tpu.trees import Quadtree


@pytest.fixture(scope="module")
def scattering():
    """Three ellipses with poisson-disk centers; combined boundary geometry
    (reference: multiple_scattering_context.c setup)."""
    rng = np.random.default_rng(5)
    centers = sample_poisson_disk((0, 0), (1, 1), 0.45, rng=rng)[:3]
    assert len(centers) == 3
    k = 25.0
    per_boundary = 512
    X, N, W, offsets = [], [], [], [0]
    for c in centers:
        a, b = 0.12, 0.08 + 0.02 * rng.random()
        e = Ellipse(a, b, tuple(c), rng.random() * np.pi)
        Xe, Te, Ne, we = e.sample_linspaced(per_boundary)
        X.append(Xe)
        N.append(Ne)
        W.append(we)
        offsets.append(offsets[-1] + per_boundary)
    X = np.concatenate(X)
    N = np.concatenate(N)
    W = np.concatenate(W)
    helm_sp = Helm2(k=k, layer_pot=LayerPot.PV_NORMAL_DERIV_SINGLE)
    helm_s = Helm2(k=k, layer_pot=LayerPot.SINGLE)
    # interior sources, one per scatterer
    x_src = centers
    targets = np.array([[3.0, 3.0], [-2.5, 3.2], [3.1, -2.6], [-2.8, -2.9]])
    rhs = helm_sp.kernel_matrix(x_src, X, None, N).sum(axis=1)

    def kernel_ij(i, j):
        return helm_sp.kernel_matrix(X[j : j + 1], X[i : i + 1], None,
                                     N[i : i + 1])[0, 0]

    return dict(X=X, N=N, W=W, offsets=offsets, helm_sp=helm_sp,
                helm_s=helm_s, x_src=x_src, targets=targets, rhs=rhs,
                kernel_ij=kernel_ij)


def test_multiple_scattering_butterfly_solve(scattering):
    s = scattering
    n = len(s["X"])
    tree = Quadtree(s["X"], leaf_size=32, normals=s["N"])
    perm = tree.perm
    A_bf = fac_helm2.make_multilevel(s["helm_sp"], tree, tree)
    corr = kr_block_correction(6, n, s["offsets"], s["kernel_ij"], perm=perm)
    sys = Sum(
        [
            Product([Sum([A_bf, corr]), Diag(s["W"][perm])]),
            Scaled(0.5, Identity(n, dtype=np.complex128)),
        ]
    )
    res = solve_gmres(sys, s["rhs"][perm], tol=1e-10, max_iter=300)
    assert res.converged
    sigma = np.empty_like(res.x)
    sigma[perm] = res.x
    u = s["helm_s"].kernel_matrix(s["X"], s["targets"]) @ (s["W"] * sigma)
    u_exact = s["helm_s"].kernel_matrix(s["x_src"], s["targets"]).sum(axis=1)
    rel = np.linalg.norm(u - u_exact) / np.linalg.norm(u_exact)
    assert rel < 1e-4, f"multi-scatterer field rel err {rel:.3e}"


def test_block_correction_handles_per_boundary_wraparound(scattering):
    """The KR correction must wrap within each boundary, never across
    scatterers (reference: bfQuadKrApplyBlockCorrection per-block periodic
    indexing, src/quadrature.c:82-95)."""
    s = scattering
    n = len(s["X"])
    corr = kr_block_correction(6, n, s["offsets"], s["kernel_ij"])
    C = corr.materialize()
    offs = s["offsets"]
    # no coupling between different boundaries
    for bi in range(3):
        for bj in range(3):
            if bi == bj:
                continue
            blk = C[offs[bi] : offs[bi + 1], offs[bj] : offs[bj + 1]]
            assert np.all(blk == 0)
    # each diagonal block has 2*order nonzeros per row
    blk = C[offs[0] : offs[1], offs[0] : offs[1]]
    assert np.all((np.abs(blk) > 0).sum(axis=1) == 12)
