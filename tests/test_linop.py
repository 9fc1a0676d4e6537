"""Unit tests for the structured-operator oracle algebra.

Pattern follows the reference's strongest test idea: every structured
operator is compared against its dense materialization (SURVEY.md §4).
"""

import numpy as np
import pytest

from butterfly_tpu.ops import (
    BlockCoo,
    BlockDense,
    BlockDiag,
    Dense,
    Diag,
    Diff,
    FuncOp,
    Givens,
    Identity,
    Perm,
    Product,
    Scaled,
    Sum,
    Zero,
)
from butterfly_tpu.utils.errors import IncompatibleShapeError


def _check_against_dense(op, rng, rtol=1e-12):
    """Check matmat/rmatmat/transpose/adjoint against materialize()."""
    m, n = op.shape
    A = op.materialize()
    assert A.shape == (m, n)

    X = rng.standard_normal((n, 3))
    if np.iscomplexobj(A):
        X = X + 1j * rng.standard_normal((n, 3))
    np.testing.assert_allclose(op.matmat(X), A @ X, rtol=rtol, atol=1e-12)

    x = X[:, 0]
    np.testing.assert_allclose(op.matvec(x), A @ x, rtol=rtol, atol=1e-12)

    Y = rng.standard_normal((m, 2))
    if np.iscomplexobj(A):
        Y = Y + 1j * rng.standard_normal((m, 2))
    np.testing.assert_allclose(op.rmatmat(Y), np.conj(A).T @ Y, rtol=rtol, atol=1e-12)

    np.testing.assert_allclose(op.T.materialize(), A.T, rtol=rtol, atol=1e-12)
    np.testing.assert_allclose(op.H.materialize(), np.conj(A).T, rtol=rtol, atol=1e-12)


def test_dense(rng):
    _check_against_dense(Dense(rng.standard_normal((5, 7))), rng)


def test_dense_complex(rng):
    A = rng.standard_normal((4, 6)) + 1j * rng.standard_normal((4, 6))
    _check_against_dense(Dense(A), rng)


def test_diag_square(rng):
    _check_against_dense(Diag(rng.standard_normal(6)), rng)


def test_diag_rect(rng):
    _check_against_dense(Diag(rng.standard_normal(4), shape=(7, 4)), rng)
    _check_against_dense(Diag(rng.standard_normal(4), shape=(4, 7)), rng)


def test_identity_zero(rng):
    _check_against_dense(Identity(5), rng)
    _check_against_dense(Zero((4, 6)), rng)
    assert Identity(5).nbytes() == 0


def test_perm(rng):
    p = rng.permutation(8)
    op = Perm(p)
    _check_against_dense(op, rng)
    x = rng.standard_normal(8)
    np.testing.assert_allclose(op.matvec(x), x[p])
    # inverse undoes it
    np.testing.assert_allclose(op.inverse().matvec(op.matvec(x)), x)


def test_givens(rng):
    c, s = np.cos(0.3), np.sin(0.3)
    _check_against_dense(Givens(5, 1, 3, c, s), rng)
    # rotation is orthogonal
    G = Givens(5, 1, 3, c, s).materialize()
    np.testing.assert_allclose(G @ G.T, np.eye(5), atol=1e-14)


def test_product(rng):
    A = Dense(rng.standard_normal((4, 5)))
    B = Dense(rng.standard_normal((5, 3)))
    C = Dense(rng.standard_normal((3, 6)))
    op = Product([A, B, C])
    _check_against_dense(op, rng)
    np.testing.assert_allclose(
        op.materialize(), A.data @ B.data @ C.data, rtol=1e-12
    )
    with pytest.raises(IncompatibleShapeError):
        Product([A, C])


def test_sum_diff_scaled(rng):
    A = Dense(rng.standard_normal((4, 5)))
    B = Dense(rng.standard_normal((4, 5)))
    _check_against_dense(Sum([A, B]), rng)
    _check_against_dense(Diff(A, B), rng)
    _check_against_dense(Scaled(2.5, A), rng)
    _check_against_dense(A + B - Scaled(0.5, A), rng)
    np.testing.assert_allclose((A - B).materialize(), A.data - B.data)


def test_funcop(rng):
    A = rng.standard_normal((6, 4))
    op = FuncOp((6, 4), lambda X: A @ X, lambda Y: A.T @ Y)
    _check_against_dense(op, rng)


def test_block_diag(rng):
    blocks = [Dense(rng.standard_normal((3, 2))), Dense(rng.standard_normal((2, 4))),
              Identity(3)]
    op = BlockDiag(blocks)
    assert op.shape == (8, 9)
    _check_against_dense(op, rng)


def test_block_coo(rng):
    # 2x3 block grid with blocks at (0,0), (1,1), (0,2)
    row_offsets = np.array([0, 3, 5])
    col_offsets = np.array([0, 2, 4, 7])
    blocks = [
        Dense(rng.standard_normal((3, 2))),
        Dense(rng.standard_normal((2, 2))),
        Dense(rng.standard_normal((3, 3))),
    ]
    op = BlockCoo(row_offsets, col_offsets, [0, 1, 0], [0, 1, 2], blocks)
    assert op.shape == (5, 7)
    _check_against_dense(op, rng)
    with pytest.raises(IncompatibleShapeError):
        BlockCoo(row_offsets, col_offsets, [0], [0], [Dense(np.zeros((2, 2)))])


def test_block_dense(rng):
    grid = [
        [Dense(rng.standard_normal((3, 2))), Dense(rng.standard_normal((3, 4)))],
        [Zero((2, 2)), Dense(rng.standard_normal((2, 4)))],
    ]
    op = BlockDense(grid)
    assert op.shape == (5, 6)
    _check_against_dense(op, rng)


def test_block_dense_concat(rng):
    a = Dense(rng.standard_normal((3, 4)))
    b = Dense(rng.standard_normal((2, 4)))
    col = BlockDense.from_col([a, b])
    assert col.shape == (5, 4)
    np.testing.assert_allclose(col.materialize(), np.vstack([a.data, b.data]))
    c = Dense(rng.standard_normal((3, 2)))
    row = BlockDense.from_row([a, c])
    assert row.shape == (3, 6)
    np.testing.assert_allclose(row.materialize(), np.hstack([a.data, c.data]))


def test_nested_structure(rng):
    """A butterfly-shaped nest: Product of BlockDiag and BlockCoo."""
    psi = BlockDiag([Dense(rng.standard_normal((4, 3))) for _ in range(2)])
    w_row_offsets = np.array([0, 3, 6])
    w_col_offsets = np.array([0, 2, 4])
    w = BlockCoo(
        w_row_offsets, w_col_offsets, [0, 0, 1, 1], [0, 1, 0, 1],
        [Dense(rng.standard_normal((3, 2))) for _ in range(4)],
    )
    op = Product([psi, w])
    assert op.shape == (8, 4)
    _check_against_dense(op, rng)
    assert op.nbytes() == psi.nbytes() + w.nbytes()


def test_vector_and_matrix_operands_roundtrip(rng):
    op = Dense(rng.standard_normal((4, 5)))
    x = rng.standard_normal(5)
    assert op.matvec(x).shape == (4,)
    X = rng.standard_normal((5, 2))
    assert op.matmat(X).shape == (4, 2)
    with pytest.raises(IncompatibleShapeError):
        op.matvec(rng.standard_normal(6))
