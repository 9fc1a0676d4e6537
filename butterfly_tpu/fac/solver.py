"""Hierarchical-LU fast direct solver.

Replacement for the reference's prototype fast direct solver
(examples/fast_direct_solver/fast_direct_solver.py, 859 LoC): recursive
block LU over a spatial bisection of the index set,

    A = [[A11, A12], [A21, A22]],   S = A22 - A21 A11^{-1} A12,

where A11 is factorized recursively (dense LU at the base,
fast_direct_solver.py:609-637), the off-diagonal blocks are stored
compressed, the reflector A21 A11^{-1} A12 is either formed by solves or
compressed matrix-free with randomized middle-out butterfly sampling
(fac/middle_out.py <- fast_direct_solver.py:404-607), and the Schur
complement is the lazy difference the recursion continues on
(MatDiff, fast_direct_solver.py:702). The solve is block forward/backward
substitution (reference: _Mul, fast_direct_solver.py:752-762):

    x1' = A11^{-1} b1
    x2  = S^{-1} (b2 - A21 x1')
    x1  = x1' - A11^{-1} (A12 x2)
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as sla

from butterfly_tpu.fac.middle_out import sample_middle_out_butterfly
from butterfly_tpu.ops.linop import Dense, Diff, LinOp, aslinop
from butterfly_tpu.ops.svd import truncated_svd
from butterfly_tpu.trees.tree import TreeNode
from butterfly_tpu.utils.errors import check
from butterfly_tpu.utils.logging import log_debug

__all__ = ["FastDirectSolver"]


def _compress_offdiag(B: np.ndarray, tol: float) -> LinOp:
    """Store an off-diagonal block compressed when the SVD pays off."""
    U, s, Vt, truncated = truncated_svd(B, tol)
    if truncated and (U.nbytes + Vt.nbytes) < B.nbytes:
        from butterfly_tpu.ops.linop import Product

        return Product([Dense(U * s), Dense(Vt)])
    return Dense(B.copy())


class _DenseLU:
    """Base-case factorization (reference: DenseLu,
    fast_direct_solver.py:609-637)."""

    def __init__(self, A: np.ndarray):
        self._lu = sla.lu_factor(A)
        self.shape = A.shape

    def solve(self, b: np.ndarray) -> np.ndarray:
        return sla.lu_solve(self._lu, b)

    def nbytes(self) -> int:
        return self._lu[0].nbytes + self._lu[1].nbytes


class FastDirectSolver:
    """Hierarchical LU of a (tree-ordered) system matrix.

    Parameters:
      A: dense ndarray in TREE ORDER (the caller permutes; reference feeds
        the quadtree-permuted system the same way).
      split_points: bisection cut positions per level — e.g. from quadtree
        level-2 node spans (reference: get_block_inds_for_split,
        fast_direct_solver.py:169-204) or simple halving.
      base_size: below this, dense LU.
      tol: off-diagonal/reflector compression tolerance.
      reflector: "solve" forms A21 A11^{-1} A12 by direct solves;
        "sampled" compresses it matrix-free with randomized middle-out
        butterfly sampling.
    """

    def __init__(
        self,
        A: np.ndarray,
        base_size: int = 256,
        tol: float = 1e-10,
        reflector: str = "solve",
        sample_rank: int = 32,
        num_sample_blocks: int = 4,
    ):
        A = np.asarray(A)
        check(A.ndim == 2 and A.shape[0] == A.shape[1], "A must be square")
        self.shape = A.shape
        self.tol = tol
        self.base_size = base_size
        self.reflector = reflector
        self.sample_rank = sample_rank
        self.num_sample_blocks = num_sample_blocks
        self._root = self._build(A, 0)

    # -- construction ----------------------------------------------------

    def _build(self, A: np.ndarray, depth: int):
        n = A.shape[0]
        if n <= self.base_size:
            return _DenseLU(A)
        m = n // 2  # long-axis bisection analogue on contiguous tree order
        A11, A12 = A[:m, :m], A[:m, m:]
        A21, A22 = A[m:, :m], A[m:, m:]
        lu1 = self._build(A11, depth + 1)
        A12_c = _compress_offdiag(A12, self.tol)
        A21_c = _compress_offdiag(A21, self.tol)

        if self.reflector == "sampled":
            # matrix-free reflector access (reference: the MatProduct
            # reflector + sketch matvecs, fast_direct_solver.py:690,512)
            matvec = lambda v: A21_c.matvec(_solve(lu1, A12_c.matvec(v)))
            rmatvec = lambda v: A12_c.rmatmat(_solve_h(lu1, A21_c.rmatmat(v)))
            nb = min(self.num_sample_blocks, max(1, (n - m) // 32))
            offs = np.linspace(0, n - m, nb + 1).astype(np.int64)
            R = sample_middle_out_butterfly(
                matvec, rmatvec, offs, offs, self.sample_rank,
                dtype=A.dtype,
            )
            S_op = Diff(aslinop(A22.copy()), R)
            S = S_op.materialize()
        else:
            R = A21_c.matmat(_solve(lu1, A12_c.materialize()))
            S = A22 - R
        lu2 = self._build(S, depth + 1)
        log_debug("fds depth %d: n=%d split=%d", depth, n, m)
        return _HlNode(m, lu1, lu2, A12_c, A21_c)

    # -- solve -----------------------------------------------------------

    def solve(self, b: np.ndarray) -> np.ndarray:
        b = np.asarray(b)
        return _solve(self._root, b)

    def nbytes(self) -> int:
        def rec(node):
            if isinstance(node, _DenseLU):
                return node.nbytes()
            return (
                node.A12.nbytes() + node.A21.nbytes()
                + rec(node.lu1) + rec(node.lu2)
            )

        return rec(self._root)


class _HlNode:
    __slots__ = ("m", "lu1", "lu2", "A12", "A21")

    def __init__(self, m, lu1, lu2, A12, A21):
        self.m, self.lu1, self.lu2, self.A12, self.A21 = m, lu1, lu2, A12, A21


def _solve(node, b: np.ndarray) -> np.ndarray:
    if isinstance(node, _DenseLU):
        return node.solve(b)
    m = node.m
    x1t = _solve(node.lu1, b[:m])
    x2 = _solve(node.lu2, b[m:] - node.A21.matmat(x1t))
    x1 = x1t - _solve(node.lu1, node.A12.matmat(x2))
    return np.concatenate([x1, x2], axis=0)


def _solve_h(node, b: np.ndarray) -> np.ndarray:
    """Solve with the adjoint factorization (for rmatvec sketches):
    A^H = [[A11^H, A21^H], [A12^H, A22^H]] has the same recursive shape."""
    if isinstance(node, _DenseLU):
        return sla.lu_solve(node._lu, np.conj(b), trans=1).conj()
    m = node.m
    x1t = _solve_h(node.lu1, b[:m])
    x2 = _solve_h(node.lu2, b[m:] - node.A12.rmatmat(x1t))
    x1 = x1t - _solve_h(node.lu1, node.A21.rmatmat(x2))
    return np.concatenate([x1, x2], axis=0)
