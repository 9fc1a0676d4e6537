"""Fast direct solver + randomized middle-out sampling vs dense ground truth."""

import numpy as np
import pytest

from butterfly_tpu.fac.middle_out import sample_middle_out_butterfly
from butterfly_tpu.fac.solver import FastDirectSolver
from butterfly_tpu.geom import Ellipse
from butterfly_tpu.ops.helm2 import Helm2, LayerPot
from butterfly_tpu.trees import Quadtree


def test_middle_out_low_rank_operator(rng):
    """Sampled factorization of a blockwise low-rank operator."""
    m = n = 256
    nb = 4
    # build R with per-block rank 6 structure
    blocks = []
    for i in range(nb):
        row = []
        for j in range(nb):
            row.append(
                rng.standard_normal((m // nb, 6)) @ rng.standard_normal((6, n // nb))
            )
        blocks.append(row)
    R = np.block(blocks)
    offs = np.arange(nb + 1) * (m // nb)
    op = sample_middle_out_butterfly(
        lambda v: R @ v, lambda v: R.conj().T @ v, offs, offs, rank=24, rng=rng
    )
    rel = np.linalg.norm(op.materialize() - R) / np.linalg.norm(R)
    assert rel < 1e-8, f"middle-out rel err {rel:.3e}"


def test_middle_out_complex(rng):
    m = n = 128
    R = (rng.standard_normal((m, 8)) + 1j * rng.standard_normal((m, 8))) @ (
        rng.standard_normal((8, n)) + 1j * rng.standard_normal((8, n))
    )
    offs = np.array([0, 64, 128])
    op = sample_middle_out_butterfly(
        lambda v: R @ v, lambda v: R.conj().T @ v, offs, offs, rank=16,
        dtype=np.complex128, rng=rng,
    )
    rel = np.linalg.norm(op.materialize() - R) / np.linalg.norm(R)
    assert rel < 1e-8


@pytest.fixture(scope="module")
def helm_system():
    """A second-kind BIE system matrix in quadtree order."""
    n, k = 1024, 15.0
    X, T, N, w = Ellipse(1.0, 0.6, (0.0, 0.0), 0.2).sample_linspaced(n)
    helm = Helm2(k=k, layer_pot=LayerPot.PV_NORMAL_DERIV_SINGLE)
    tree = Quadtree(X, leaf_size=32, normals=N)
    P = tree.perm
    A = helm.kernel_matrix(X, X, None, N) * w[None, :] + 0.5 * np.eye(n)
    return A[np.ix_(P, P)]


def test_fds_solve_matches_dense(helm_system, rng):
    A = helm_system
    n = A.shape[0]
    fds = FastDirectSolver(A, base_size=128, tol=1e-12)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x = fds.solve(b)
    x_true = np.linalg.solve(A, b)
    rel = np.linalg.norm(x - x_true) / np.linalg.norm(x_true)
    assert rel < 1e-8, f"fds rel err {rel:.3e}"
    # compressed storage should beat raw dense LU storage
    assert fds.nbytes() < A.nbytes


def test_fds_multiple_rhs(helm_system, rng):
    A = helm_system
    fds = FastDirectSolver(A, base_size=128, tol=1e-12)
    B = rng.standard_normal((A.shape[0], 3)) + 0j
    X = fds.solve(B)
    np.testing.assert_allclose(A @ X, B, atol=1e-7)


def test_fds_operator_first_never_materializes(helm_system, rng):
    """Operator-first build: A only reachable through matmat/rmatmat +
    small blocks; no extracted dense block may exceed the cutoff (the
    o(N^2)-memory witness)."""
    from butterfly_tpu.fac.solver import DenseAccess

    A = helm_system
    n = A.shape[0]

    class CountingAccess(DenseAccess):
        max_block = 0

        def block(self, i0, i1, j0, j1):
            CountingAccess.max_block = max(
                CountingAccess.max_block, (i1 - i0) * (j1 - j0)
            )
            return super().block(i0, i1, j0, j1)

    acc = CountingAccess(A)
    fds = FastDirectSolver(acc, base_size=128, tol=1e-12, rank=64)
    b = rng.standard_normal(n) + 0j
    x = fds.solve(b)
    res = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    assert res < 1e-6, f"sampled-reflector residual {res:.3e}"
    assert CountingAccess.max_block <= fds.cutoff
    assert fds.max_dense_block_entries <= fds.cutoff
    assert fds.max_dense_block_entries < n * n // 8


def test_fds_tree_splits(helm_system, rng):
    """Split positions from tree-node spans (reference:
    get_block_inds_for_split, fast_direct_solver.py:169-204)."""
    from butterfly_tpu.trees import uniform_tree

    A = helm_system
    n = A.shape[0]
    tree = uniform_tree(n, 2, 3)
    fds = FastDirectSolver(A, tree=tree, base_size=128, tol=1e-12, rank=64)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x = fds.solve(b)
    res = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    assert res < 1e-6


def test_fds_spd_system(rng):
    """Generic SPD system (covariance-style) solves to machine precision."""
    n = 512
    x = np.sort(rng.random(n))
    A = np.exp(-((x[:, None] - x[None, :]) ** 2) / 0.1**2) + 0.1 * np.eye(n)
    fds = FastDirectSolver(A, base_size=64, tol=1e-13)
    b = rng.standard_normal(n)
    xs = fds.solve(b)
    rel = np.linalg.norm(A @ xs - b) / np.linalg.norm(b)
    assert rel < 1e-9


def test_device_solver_matches_host_and_refines():
    """DeviceSolver (fac/device_solve.py): the unrolled device substitution
    matches the host solve at f32 grade, and mixed-precision refinement
    reaches f64-grade residuals (reference solve walk:
    fast_direct_solver.py:752-762)."""
    from butterfly_tpu.fac.device_solve import DeviceSolver
    from butterfly_tpu.fac.solver import FastDirectSolver

    rng = np.random.default_rng(3)
    n = 768
    # smooth real kernel (compressible off-diagonal blocks, the regime the
    # middle-out sampler targets) + identity shift: well-conditioned
    x = np.sort(rng.uniform(0.0, 1.0, n))
    A = np.exp(-((x[:, None] - x[None, :]) ** 2) / 0.01) + 2.0 * np.eye(n)
    fds = FastDirectSolver(A, base_size=128, tol=1e-10, rank=48)
    b = rng.standard_normal((n, 3))
    x_host = fds.solve(b)
    ds = DeviceSolver(fds)
    x_dev = np.asarray(ds.solve(b.astype(np.float32)), np.float64)
    rel = np.linalg.norm(x_dev - x_host) / np.linalg.norm(x_host)
    assert rel < 5e-4, f"f32 device solve rel {rel:.2e}"
    x_ref = ds.solve_refined(b, matmat=lambda X: A @ X, iters=3)
    res = np.linalg.norm(A @ x_ref - b) / np.linalg.norm(b)
    assert res < 1e-10, f"refined residual {res:.2e}"
