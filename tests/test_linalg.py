"""GMRES + eigenband solvers vs dense ground truth.

The eigenband test mirrors the reference's one numerical golden test
(tests/test_linalg.c:18-77): compute an interior eigenband of a generalized
problem with BOTH strategies and compare against a dense eigensolve.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from butterfly_tpu.ops.linalg import (
    get_eigenband,
    get_max_eigenvalue,
    get_shifted_eigs,
    solve_gmres,
)


def test_gmres_real(rng):
    n = 80
    A = np.eye(n) * 4 + 0.5 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    res = solve_gmres(A, b, tol=1e-12)
    assert res.converged
    np.testing.assert_allclose(A @ res.x, b, atol=1e-9)


def test_gmres_complex(rng):
    n = 60
    A = np.eye(n) * (2 + 1j) + 0.3 * (
        rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    )
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    res = solve_gmres(A, b, tol=1e-12)
    assert res.converged
    np.testing.assert_allclose(A @ res.x, b, atol=1e-9)


def test_gmres_operator_and_preconditioner(rng):
    """GMRES on a matrix-free callable with a left preconditioner — the
    butterflied-operator use case (reference: bfSolveGMRES works on any
    BfMat incl. MatFunc/MatProduct)."""
    n = 100
    d = 1.0 + rng.random(n) * 100  # badly scaled diagonal
    A = np.diag(d) + 0.1 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    matvec = lambda v: A @ v
    plain = solve_gmres(matvec, b, tol=1e-10, max_iter=60)
    precond = solve_gmres(matvec, b, tol=1e-10, max_iter=60, M=lambda v: v / d)
    assert precond.converged
    assert precond.num_iter <= plain.num_iter
    np.testing.assert_allclose(A @ precond.x, b, atol=1e-7)


def test_gmres_reports_nonconvergence(rng):
    n = 50
    A = rng.standard_normal((n, n))  # indefinite, hard
    b = rng.standard_normal(n)
    res = solve_gmres(A, b, tol=1e-14, max_iter=3)
    assert not res.converged
    assert res.num_iter == 3


@pytest.fixture(scope="module")
def lap_problem():
    """1-D FEM-style generalized problem (L, M) with known eigenstructure."""
    n = 200
    h = 1.0 / (n + 1)
    L = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)) / h
    M = sp.diags([1.0 / 6, 4.0 / 6, 1.0 / 6], [-1, 0, 1], shape=(n, n)) * h
    dense_vals = np.sort(
        np.real(np.linalg.eigvals(np.linalg.solve(M.toarray(), L.toarray())))
    )
    return L.tocsc(), M.tocsc(), dense_vals


def test_max_eigenvalue(lap_problem):
    L, M, dense_vals = lap_problem
    lam = get_max_eigenvalue(L, M)
    np.testing.assert_allclose(lam, dense_vals[-1], rtol=1e-6)


def test_shifted_eigs(lap_problem):
    L, M, dense_vals = lap_problem
    sigma = float(dense_vals[10] * 1.001)
    vals, vecs = get_shifted_eigs(L, M, sigma, 5)
    # the 5 closest to sigma, sorted
    want = dense_vals[np.argsort(np.abs(dense_vals - sigma))[:5]]
    np.testing.assert_allclose(np.sort(vals), np.sort(want), rtol=1e-8)
    # residual check L v = lam M v
    r = L @ vecs - (M @ vecs) * vals
    assert np.abs(r).max() < 1e-6


@pytest.mark.parametrize("method", ["doubling", "covering"])
def test_eigenband(lap_problem, method):
    """(reference parity: tests/test_linalg.c runs both DOUBLING and
    COVERING on the same band and checks eigenvalues/eigenvectors)."""
    L, M, dense_vals = lap_problem
    lam0, lam1 = float(dense_vals[5] - 1), float(dense_vals[14] + 1)
    want = dense_vals[(dense_vals >= lam0) & (dense_vals < lam1)]
    vals, vecs = get_eigenband(L, M, lam0, lam1, method=method)
    np.testing.assert_allclose(vals, want, rtol=1e-8)
    r = L @ vecs - (M @ vecs) * vals
    assert np.abs(r).max() < 1e-6


def test_eigenband_half_open(lap_problem):
    """(-inf, lam) bands are what the LBO streamer feeds first
    (reference: getBracketFromNode, src/lbo.c:41-68)."""
    L, M, dense_vals = lap_problem
    lam1 = float(dense_vals[7] + 1)
    vals, vecs = get_eigenband(L, M, -np.inf, lam1, method="doubling")
    want = dense_vals[dense_vals < lam1]
    np.testing.assert_allclose(vals, want, rtol=1e-8)
