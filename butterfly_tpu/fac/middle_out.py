"""Randomized middle-out butterfly sampling of matrix-free operators.

Replacement for the reference's randomized reflector compression
(sample_middle_out_butterfly,
examples/fast_direct_solver/fast_direct_solver.py:404-607): compress an
operator R accessible only through (r)matvecs into

    R  ~=  blkdiag(U_i) . C . blkdiag(V_j)^T

by Gaussian sketching: Y = R Omega gives per-row-block column bases U_i,
Z = R^T Xi gives per-col-block bases V_j, and the middle coupling blocks are
recovered by least squares against the sketches (reference: lstsq middle
blocks, fast_direct_solver.py:557). The result is the
MatBlockDiag . MatBlockCoo . MatBlockDiag^T structure of the reference
(fast_direct_solver.py:601-607), expressed in the LinOp algebra.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from butterfly_tpu.ops.linop import BlockDense, BlockDiag, Dense, LinOp, Product
from butterfly_tpu.utils.errors import check
from butterfly_tpu.utils.prng import host_rng

__all__ = ["sample_middle_out_butterfly"]


def _orth_basis(Y: np.ndarray, tol: float) -> np.ndarray:
    """Numerical-rank orthonormal basis of the columns of Y."""
    if Y.shape[1] == 0:
        return np.zeros((Y.shape[0], 0))
    U, s, _ = np.linalg.svd(Y, full_matrices=False)
    if s.size == 0 or s[0] == 0:
        return U[:, :0]
    r = max(int(np.sum(s >= tol * s[0])), 1)
    return U[:, :r]


def sample_middle_out_butterfly(
    matvec: Callable[[np.ndarray], np.ndarray],
    rmatvec: Callable[[np.ndarray], np.ndarray],
    row_offsets: Sequence[int],
    col_offsets: Sequence[int],
    rank: int,
    oversample: int = 10,
    tol: float = 1e-10,
    dtype=np.float64,
    rng: np.random.Generator | None = None,
) -> LinOp:
    """Compress R (shape implied by the offsets) into U . C . V^T.

    row_offsets / col_offsets: block boundaries of the row/col partitions
    (from tree levels). `rank` is the per-block rank budget; the sketch width
    is num_blocks * rank + oversample on each side.
    """
    if rng is None:
        rng = host_rng()
    row_offsets = np.asarray(row_offsets)
    col_offsets = np.asarray(col_offsets)
    m, n = int(row_offsets[-1]), int(col_offsets[-1])
    nrb, ncb = len(row_offsets) - 1, len(col_offsets) - 1
    check(rank >= 1, "rank must be positive")

    p_cols = min(n, ncb * rank + oversample)
    p_rows = min(m, nrb * rank + oversample)

    iscomplex = np.issubdtype(np.dtype(dtype), np.complexfloating)

    def randn(*shape):
        X = rng.standard_normal(shape)
        if iscomplex:
            X = X + 1j * rng.standard_normal(shape)
        return X.astype(dtype)

    # Column sketches -> row-block bases U_i  (reference: linOp@Omega
    # sketches, fast_direct_solver.py:512)
    Omega = randn(n, p_cols)
    Y = np.stack([np.asarray(matvec(Omega[:, k])) for k in range(p_cols)], axis=1)
    U = [
        _orth_basis(Y[row_offsets[i] : row_offsets[i + 1]], tol)[:, :rank]
        for i in range(nrb)
    ]

    # Row sketches -> col-block bases V_j
    Xi = randn(m, p_rows)
    Z = np.stack([np.asarray(rmatvec(Xi[:, k])) for k in range(p_rows)], axis=1)
    V = [
        _orth_basis(Z[col_offsets[j] : col_offsets[j + 1]], tol)[:, :rank]
        for j in range(ncb)
    ]

    # Middle blocks by least squares: for each row block i,
    #   U_i^T Y|_i = [C_i1 ... C_incb] . G,  G = stack_j(V_j^H Omega_j)
    # (reference: lstsq middle blocks, fast_direct_solver.py:557).
    G = np.concatenate(
        [
            np.conj(V[j]).T @ Omega[col_offsets[j] : col_offsets[j + 1]]
            for j in range(ncb)
        ],
        axis=0,
    )
    v_ranks = [V[j].shape[1] for j in range(ncb)]
    v_starts = np.concatenate([[0], np.cumsum(v_ranks)])
    C_grid: list[list[LinOp]] = []
    for i in range(nrb):
        lhs = np.conj(U[i]).T @ Y[row_offsets[i] : row_offsets[i + 1]]
        Ci, *_ = np.linalg.lstsq(G.T, lhs.T, rcond=None)
        Ci = Ci.T  # (r_i, sum v_ranks)
        C_grid.append(
            [Dense(Ci[:, v_starts[j] : v_starts[j + 1]]) for j in range(ncb)]
        )

    U_op = BlockDiag([Dense(u) for u in U])
    C_op = BlockDense(C_grid)
    Vt_op = BlockDiag([Dense(np.conj(v).T) for v in V])
    return Product([U_op, C_op, Vt_op])
