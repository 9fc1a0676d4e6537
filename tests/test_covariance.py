"""Covariance operators: Chebyshev path vs compressed-eigenbasis path vs
exact dense ground truth (reference parity: exact_cov_test / fast_cov_test,
examples/covariance)."""

import numpy as np
import pytest
import scipy.linalg as sla

from butterfly_tpu.geom.trimesh import icosphere
from butterfly_tpu.models.covariance import (
    CompressedCovariance,
    chebyshev_covariance_apply,
    matern_density,
    squared_exponential_density,
)
from butterfly_tpu.models.lbo import compress_lbo_eigenfunctions
from butterfly_tpu.ops.cheb import ChebFit, cheb_matvec
from butterfly_tpu.ops.eval_tree import EvalTree


def test_chebfit_accuracy():
    f = lambda x: np.exp(-(x**2)) * np.cos(3 * x)
    fit = ChebFit(f, -2.0, 3.0, 48)
    assert fit.max_error(f) < 1e-12


def test_cheb_matvec_matches_dense_function(rng):
    """p(S) w via the recurrence == dense eigendecomposition apply."""
    n = 60
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.sort(rng.random(n)) * 5.0
    S = (Q * lam) @ Q.T
    f = lambda x: np.exp(-0.5 * x)
    cheb = ChebFit(f, 0.0, 5.0, 48)
    w = rng.standard_normal(n)
    got = cheb_matvec(lambda v: S @ v, cheb, w)
    want = (Q * f(lam)) @ (Q.T @ w)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_eval_tree_hankel():
    """Fast piecewise-Chebyshev Hankel evaluation (reference:
    examples/tree_evaluator/test_hankel_evaluator.c)."""
    import scipy.special as ss

    f = lambda x: ss.jv(0, x)
    tree = EvalTree(f, 0.5, 200.0, tol=1e-12, order=16)
    assert tree.num_leaves > 4
    x = np.linspace(0.5, 200.0, 4001)
    assert np.abs(tree(x) - f(x)).max() < 1e-11
    with pytest.raises(Exception):
        tree(np.array([300.0]))


@pytest.fixture(scope="module")
def cov_setup():
    mesh = icosphere(2)
    L, M = mesh.lbo_fem()
    lam, Phi = sla.eigh(L.toarray(), M.toarray())
    lam = np.maximum(lam, 0.0)
    return mesh, L, M, lam, Phi


def test_chebyshev_covariance_vs_exact(cov_setup, rng):
    mesh, L, M, lam, Phi = cov_setup
    gamma = squared_exponential_density(kappa=0.05)
    w = rng.standard_normal(mesh.num_verts)
    got = chebyshev_covariance_apply(L, M, gamma, w, float(lam[-1]), order=160)
    # exact: C w with Phi M-orthonormal => C = Phi g(Lam) Phi^T M? The
    # operator gamma(M^{-1}L) acts as Phi g(Lam) Phi^{-1} with
    # Phi^{-1} = Phi^T M.
    want = Phi @ (gamma(lam) * (Phi.T @ (M @ w)))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-9, f"cheb covariance rel err {rel:.3e}"


def test_compressed_covariance_vs_exact(cov_setup, rng):
    mesh, L, M, lam, Phi = cov_setup
    comp = compress_lbo_eigenfunctions(mesh, tol=1e-10, col_tree_depth=2)
    cov = CompressedCovariance(comp)
    gamma = matern_density(kappa=0.5, nu=2.0)
    w = rng.standard_normal(mesh.num_verts)
    got = cov.apply(gamma, w)
    want = Phi @ (gamma(lam) * (Phi.T @ w))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-6, f"compressed covariance rel err {rel:.3e}"


def test_gp_sampling_covariance(cov_setup, rng):
    """Sample covariance of z = Phi g^{1/2} omega converges to C."""
    mesh, L, M, lam, Phi = cov_setup
    comp = compress_lbo_eigenfunctions(mesh, tol=1e-10, col_tree_depth=2)
    cov = CompressedCovariance(comp)
    gamma = squared_exponential_density(kappa=0.1)
    ns = 4000
    omega = rng.standard_normal((mesh.num_verts, ns))
    Z = cov.sample(gamma, omega)
    C_emp = Z @ Z.T / ns
    C_true = Phi @ (gamma(lam)[:, None] * Phi.T)
    rel = np.linalg.norm(C_emp - C_true) / np.linalg.norm(C_true)
    assert rel < 0.2, f"sample covariance rel err {rel:.3f}"
