"""End-to-end Helmholtz BIE solve: butterfly vs dense vs exact field.

Parity with the reference's flagship example (examples/simple/helm2_bie.c):
assemble the second-kind S' integral equation with Kapur-Rokhlin correction
and trapezoid weights, solve densely and with the butterfly-factorized
operator via GMRES, and check the reconstructed exterior field against the
exact interior-source solution.
"""

import numpy as np
import pytest

from butterfly_tpu.fac import helm2 as fac_helm2
from butterfly_tpu.geom import Ellipse
from butterfly_tpu.ops.helm2 import Helm2, LayerPot
from butterfly_tpu.ops.linalg import solve_gmres
from butterfly_tpu.ops.linop import Diag, Identity, Perm, Product, Scaled, Sum
from butterfly_tpu.ops.quadrature import kr_correction
from butterfly_tpu.trees import Quadtree

KR_ORDER = 6


@pytest.fixture(scope="module")
def bie():
    n = 1024
    k = 20.0
    e = Ellipse(1.0, 0.6, (0.0, 0.0), 0.1)
    X, T, N, w = e.sample_linspaced(n)
    helm_sp = Helm2(k=k, layer_pot=LayerPot.PV_NORMAL_DERIV_SINGLE)
    helm_s = Helm2(k=k, layer_pot=LayerPot.SINGLE)

    # interior source and exterior evaluation targets
    x_src = np.array([[0.1, -0.05]])
    theta = np.linspace(0, 2 * np.pi, 13)[:-1]
    targets = np.stack([3.0 * np.cos(theta), 2.5 * np.sin(theta)], axis=1)

    # RHS: normal derivative of the source field on the boundary
    rhs = helm_sp.kernel_matrix(x_src, X, None, N)[:, 0]

    def kernel_ij(i, j):
        return helm_sp.kernel_matrix(X[j : j + 1], X[i : i + 1], None,
                                     N[i : i + 1])[0, 0]

    return dict(
        n=n, k=k, X=X, N=N, w=w, helm_sp=helm_sp, helm_s=helm_s,
        x_src=x_src, targets=targets, rhs=rhs, kernel_ij=kernel_ij,
    )


@pytest.fixture(scope="module")
def dense_solution(bie):
    n, X, N, w = bie["n"], bie["X"], bie["N"], bie["w"]
    A = bie["helm_sp"].kernel_matrix(X, X, None, N)
    corr = kr_correction(KR_ORDER, n, bie["kernel_ij"])
    A = A + corr.materialize()
    A = A * w[None, :]
    A = A + 0.5 * np.eye(n)
    sigma = np.linalg.solve(A, bie["rhs"])
    return A, sigma


def _field(bie, sigma):
    """Evaluate the single-layer potential at the exterior targets."""
    S = bie["helm_s"].kernel_matrix(bie["X"], bie["targets"])
    return S @ (bie["w"] * sigma)


def test_dense_bie_reproduces_exact_field(bie, dense_solution):
    _, sigma = dense_solution
    u = _field(bie, sigma)
    u_exact = bie["helm_s"].kernel_matrix(bie["x_src"], bie["targets"])[:, 0]
    rel = np.linalg.norm(u - u_exact) / np.linalg.norm(u_exact)
    assert rel < 1e-5, f"dense field rel err {rel:.3e}"


def test_butterfly_bie_end_to_end(bie, dense_solution):
    """Butterfly system + GMRES matches the dense LU solution and the exact
    field (reference: helm2_bie.c:131-207)."""
    n, X, N, w = bie["n"], bie["X"], bie["N"], bie["w"]
    A_dense, sigma_dense = dense_solution

    tree = Quadtree(X, leaf_size=32, normals=N)
    perm = tree.perm
    A_bf = fac_helm2.make_multilevel(bie["helm_sp"], tree, tree)
    corr = kr_correction(KR_ORDER, n, bie["kernel_ij"], perm=perm)
    sys = Sum(
        [
            Product([Sum([A_bf, corr]), Diag(w[perm])]),
            Scaled(0.5, Identity(n, dtype=np.complex128)),
        ]
    )

    # butterfly system matvec == dense system matvec (in tree order)
    x = np.random.default_rng(0).standard_normal(n) + 0j
    y_bf = sys.matvec(x[perm])
    y_dense = (A_dense @ x)[perm]
    rel_mvp = np.linalg.norm(y_bf - y_dense) / np.linalg.norm(y_dense)
    assert rel_mvp < 1e-9, f"system MVP rel err {rel_mvp:.3e}"

    res = solve_gmres(sys, bie["rhs"][perm], tol=1e-10, max_iter=200)
    assert res.converged, f"GMRES residuals {res.residuals[-1]:.3e}"
    sigma_bf = np.empty_like(res.x)
    sigma_bf[perm] = res.x  # back to original ordering

    rel_sigma = np.linalg.norm(sigma_bf - sigma_dense) / np.linalg.norm(sigma_dense)
    assert rel_sigma < 1e-7, f"density rel err {rel_sigma:.3e}"

    u = _field(bie, sigma_bf)
    u_exact = bie["helm_s"].kernel_matrix(bie["x_src"], bie["targets"])[:, 0]
    rel = np.linalg.norm(u - u_exact) / np.linalg.norm(u_exact)
    assert rel < 1e-5, f"butterfly field rel err {rel:.3e}"


def test_kr_correction_improves_accuracy(bie):
    """Without the KR correction the trapezoid rule stalls at low order —
    the correction must visibly improve the field accuracy."""
    n, X, N, w = bie["n"], bie["X"], bie["N"], bie["w"]
    A_raw = bie["helm_sp"].kernel_matrix(X, X, None, N) * w[None, :] + 0.5 * np.eye(n)
    sigma_raw = np.linalg.solve(A_raw, bie["rhs"])
    u_exact = bie["helm_s"].kernel_matrix(bie["x_src"], bie["targets"])[:, 0]
    rel_raw = np.linalg.norm(_field(bie, sigma_raw) - u_exact) / np.linalg.norm(u_exact)

    A_corr = bie["helm_sp"].kernel_matrix(X, X, None, N)
    A_corr += kr_correction(KR_ORDER, n, bie["kernel_ij"]).materialize()
    A_corr = A_corr * w[None, :] + 0.5 * np.eye(n)
    sigma_corr = np.linalg.solve(A_corr, bie["rhs"])
    rel_corr = np.linalg.norm(_field(bie, sigma_corr) - u_exact) / np.linalg.norm(u_exact)
    assert rel_corr < rel_raw / 10, (
        f"KR correction must help: raw {rel_raw:.3e}, corrected {rel_corr:.3e}"
    )


def test_kr_accum_correction_matches_explicit(bie):
    """The matrix-free accumulate corrector (reference:
    bfQuadKrAccumCorrection, src/quadrature.c:51-73) must reproduce the
    explicit sparse correction exactly, both standalone and composed with an
    arbitrary apply callable."""
    from butterfly_tpu.ops.quadrature import kr_accum_correction

    n = bie["n"]
    rng = np.random.default_rng(3)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)

    corr = kr_correction(KR_ORDER, n, bie["kernel_ij"])
    accum = kr_accum_correction(KR_ORDER, n, bie["kernel_ij"])
    want = corr.materialize() @ x
    got = accum.apply(x)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-12

    # composed with a matrix-free operator apply (the accumulate use case:
    # corrected-apply == dense-corrected apply)
    A = bie["helm_sp"].kernel_matrix(bie["X"], bie["X"], None, bie["N"])
    corrected_apply = accum.wrap(lambda v: A @ v)
    want_full = (A + corr.materialize()) @ x
    got_full = corrected_apply(x)
    assert np.linalg.norm(got_full - want_full) / np.linalg.norm(want_full) < 1e-12

    # batched RHS path
    X2 = rng.standard_normal((n, 3)) + 1j * rng.standard_normal((n, 3))
    want_b = corr.materialize() @ X2
    got_b = accum.apply(X2)
    assert np.linalg.norm(got_b - want_b) / np.linalg.norm(want_b) < 1e-12


def test_kr_accum_correction_permuted_and_blocks(bie):
    """Tree-permuted accumulate corrector matches the permuted Coo; the
    multi-boundary (block) form matches kr_block_correction."""
    from butterfly_tpu.ops.quadrature import (
        kr_accum_correction,
        kr_block_correction,
    )

    n = bie["n"]
    rng = np.random.default_rng(4)
    perm = rng.permutation(n)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)

    corr_p = kr_correction(KR_ORDER, n, bie["kernel_ij"], perm=perm)
    accum_p = kr_accum_correction(KR_ORDER, n, bie["kernel_ij"], perm=perm)
    want = corr_p.materialize() @ x
    got = accum_p.apply(x)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-12

    offsets = [0, n // 2, n]
    corr_b = kr_block_correction(KR_ORDER, n, offsets, bie["kernel_ij"])
    accum_b = kr_accum_correction(KR_ORDER, n, bie["kernel_ij"],
                                  offsets=offsets)
    want_b = corr_b.materialize() @ x
    got_b = accum_b.apply(x)
    assert np.linalg.norm(got_b - want_b) / np.linalg.norm(want_b) < 1e-12
