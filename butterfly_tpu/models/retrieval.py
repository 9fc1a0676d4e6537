"""Butterfly-compressed embedding retrieval.

The flagship application (BASELINE.json configs[1,2]): an n x d embedding
table stored as structured factors instead of dense rows —

    T  ~=  Psi @ V            (one-level: block-diagonal row basis)
    T  ~=  B @ V              (deep: Psi upgraded to a UniformButterfly)

where Psi is a uniform block-diagonal (NB, s, rank) factor from per-row-block
truncated SVDs and V stacks the right factors. The reference's analogue is
the algebraic fac engine compressing row blocks by truncated SVD
(getPsiAndW, src/fac.c:717-777); here blocks are uniform so every operation
is ONE batched MXU einsum:

- `score(queries)`: scores = Psi @ (V @ q) — batched block GEMMs.
- `lookup(ids)`: row gather INTO the factors + fused block matvec
  (one (rank, d) gemv per id instead of materializing the table).
- `topk(queries, k)`: scoring + on-chip jax.lax.top_k.
- `train_step`: factors are differentiable; distillation against the exact
  table refines them (used to deepen with a butterfly).

Accuracy gate (BASELINE): recall@100 vs exact dense scoring at parity —
tested in tests/test_retrieval.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from butterfly_tpu.utils.errors import InvalidArgumentsError, check

__all__ = ["CompressedTable", "compress_table", "exact_topk"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CompressedTable:
    """Uniform blocked low-rank table: T[i] ~= Psi[blk(i), pos(i)] @ V[blk(i)].

    Psi: (NB, s, rank)  — per-block row basis (left factors, U*S from SVD)
    V:   (NB, rank, d)  — per-block right factors (V^T)
    """

    Psi: jnp.ndarray
    V: jnp.ndarray

    def __post_init__(self):
        check(self.Psi.ndim == 3 and self.V.ndim == 3, "bad factor ranks",
              InvalidArgumentsError)
        check(self.Psi.shape[0] == self.V.shape[0]
              and self.Psi.shape[2] == self.V.shape[1],
              "Psi/V shapes incompatible", InvalidArgumentsError)

    # pytree protocol -----------------------------------------------------
    def tree_flatten(self):
        return (self.Psi, self.V), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # properties ----------------------------------------------------------
    @property
    def num_rows(self) -> int:
        return self.Psi.shape[0] * self.Psi.shape[1]

    @property
    def dim(self) -> int:
        return self.V.shape[2]

    @property
    def rank(self) -> int:
        return self.Psi.shape[2]

    def nbytes(self) -> int:
        return self.Psi.nbytes + self.V.nbytes

    # ops -----------------------------------------------------------------
    def score(self, queries: jnp.ndarray) -> jnp.ndarray:
        """Scores of every row against every query: (n, q).

        queries: (q, d). Two batched einsums; both ride the MXU.
        """
        mid = jnp.einsum("brd,qd->brq", self.V, queries.astype(self.V.dtype),
                         preferred_element_type=jnp.float32)
        out = jnp.einsum("bsr,brq->bsq", self.Psi, mid.astype(self.Psi.dtype),
                         preferred_element_type=jnp.float32)
        NB, s, q = out.shape
        return out.reshape(NB * s, q)

    def lookup(self, ids: jnp.ndarray) -> jnp.ndarray:
        """Reconstruct embedding rows for `ids`: gather into the factors and
        apply the per-id fused block matvec (BASELINE: 'lookup is a gather
        into butterfly factors followed by fused block-matvec')."""
        s = self.Psi.shape[1]
        blk = ids // s
        pos = ids % s
        u = self.Psi[blk, pos]  # (m, rank) — coarse per-id gather
        v = self.V[blk]  # (m, rank, d)
        return jnp.einsum("mr,mrd->md", u, v, preferred_element_type=jnp.float32)

    def topk(self, queries: jnp.ndarray, k: int):
        """(values, indices) of the top-k rows per query: (q, k) each."""
        scores = self.score(queries)  # (n, q)
        return jax.lax.top_k(scores.T, k)

    def materialize(self) -> jnp.ndarray:
        """Dense (n, d) table (oracle for tests)."""
        out = jnp.einsum("bsr,brd->bsd", self.Psi, self.V,
                         preferred_element_type=jnp.float32)
        return out.reshape(self.num_rows, self.dim)


def compress_table(
    table: np.ndarray,
    rank: int,
    block_rows: int = 128,
    dtype=jnp.float32,
) -> CompressedTable:
    """Compress a dense (n, d) table by per-row-block truncated SVD with a
    UNIFORM rank (the MXU-friendly analogue of the reference's tol-adaptive
    getPsiAndW truncation, src/fac.c:680-714; uniformity is the
    padding/bucketing decision SURVEY.md §7 calls the central trade)."""
    table = np.asarray(table)
    n, d = table.shape
    check(n % block_rows == 0, "n must be divisible by block_rows",
          InvalidArgumentsError)
    check(rank <= min(block_rows, d), "rank too large", InvalidArgumentsError)
    NB = n // block_rows
    blocks = table.reshape(NB, block_rows, d)
    # batched SVD on host (setup time, f64)
    U, S, Vt = np.linalg.svd(blocks.astype(np.float64), full_matrices=False)
    Psi = (U[:, :, :rank] * S[:, None, :rank]).astype(np.float32)
    V = Vt[:, :rank, :].astype(np.float32)
    return CompressedTable(jnp.asarray(Psi, dtype=dtype), jnp.asarray(V, dtype=dtype))


def exact_topk(table: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    """Host oracle: exact dense top-k indices (q, k)."""
    scores = queries @ table.T  # (q, n)
    return np.argsort(-scores, axis=1)[:, :k]


def recall_at_k(pred_idx: np.ndarray, true_idx: np.ndarray) -> float:
    """Mean fraction of true top-k recovered (strict set recall)."""
    hits = 0
    for p, t in zip(pred_idx, true_idx):
        hits += len(set(p.tolist()) & set(t.tolist()))
    return hits / true_idx.size


def recall_with_tolerance(
    pred_idx: np.ndarray,
    true_scores: np.ndarray,
    k: int,
    tol: float = 1e-3,
) -> float:
    """Tolerance recall@k: a predicted id counts as a hit if its TRUE score is
    within `tol * score_range` of the k-th best true score. This is the
    standard ANN-benchmark treatment of near-ties: strict set recall is
    ill-posed when many rows score within numerical noise of the cutoff.

    true_scores: (q, n) exact scores; pred_idx: (q, k) predicted ids.
    """
    q = true_scores.shape[0]
    hits = 0
    for i in range(q):
        s = true_scores[i]
        cutoff = np.partition(s, -k)[-k]
        eps = tol * (s.max() - s.min())
        hits += int(np.sum(s[pred_idx[i]] >= cutoff - eps))
    return hits / (q * k)


@partial(jax.jit, static_argnames=("lr",))
def train_step(ct: CompressedTable, rows: jnp.ndarray, ids: jnp.ndarray,
               lr: float = 1e-2):
    """One distillation step: fit the compressed factors to exact table rows
    (refines compression / supports downstream fine-tuning). Returns
    (new_table, loss)."""

    def loss_fn(ct):
        rec = ct.lookup(ids)
        return jnp.mean((rec - rows) ** 2)

    loss, g = jax.value_and_grad(loss_fn)(ct)
    new = jax.tree_util.tree_map(lambda p, gg: p - lr * gg, ct, g)
    return new, loss
