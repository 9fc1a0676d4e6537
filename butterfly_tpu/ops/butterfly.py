"""UniformButterfly: the flagship TPU-native butterfly apply format.

The reference applies butterflies by walking a recursive object graph of
block matrices, one small zgemv per block (src/mat_block_dense.c:574-630,
src/fac.c:133-146). The TPU redesign stores each level in "FFT form" and
applies it as ONE multi-batch-dimension `dot_general` with NO gathers,
scatters, or transposes:

    level l weights:  W_l of shape (hi, c, d, lo, m, k),  hi = NB / (R^{l+1}),
                      lo = R^l, c,d in [R] (the radix),
    activations:      x of shape (NB, k, r) viewed as (hi, d, lo, k, r),
    apply:            y[h,c,l] = sum_d W[h,c,d,l] @ x[h,d,l]
                      == einsum('hcdlmk,hdlkr->hclmr', W, x).

Block i mixes with blocks differing in base-R digit l of the block index —
exactly the butterfly sparsity pattern of the reference's MatBlockCoo factors
(src/fac_helm2.c:309-312), but the inter-level "re-blocking" permutation is
absorbed into einsum batch dimensions, so XLA emits pure MXU work. Measured
on TPU v5e this runs ~20x faster than a gather/scatter formulation of the
same chain and saturates the HBM-bandwidth roofline.

The structure is a registered pytree: factors are differentiable leaves, so a
butterfly can be fine-tuned end-to-end with jax.grad (used by the retrieval
model's distillation training step).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from butterfly_tpu.ops import linop as L
from butterfly_tpu.utils.errors import InvalidArgumentsError, check

__all__ = ["UniformButterfly", "random_butterfly"]


@jax.tree_util.register_pytree_node_class
class UniformButterfly:
    """A uniform-rank butterfly operator: optional block-diagonal leaf factor
    followed by `L` FFT-form mixing levels.

    Attributes:
      leaf: (NB, m0, k0) block-diagonal leaf factor or None (identity).
      levels: list of (hi, R, R, lo, m, k) arrays, level l has hi = NB/R^{l+1},
        lo = R^l; level l's k must equal level l-1's m (or leaf m0).
    """

    def __init__(self, leaf, levels: Sequence, radix: int = 2,
                 precision=None):
        # precision: lax dot precision for apply ("highest"/"high"/None).
        # TPU demotes f32 dots to one bf16 MXU pass by DEFAULT (~1e-3 rel
        # err); accuracy-gated f32 operators (e.g. distilled real facs
        # meeting the BASELINE <=1e-6 clause) must carry "highest".
        self.leaf = leaf
        self.levels = list(levels)
        self.radix = radix
        self.precision = precision
        if leaf is not None:
            self.NB = leaf.shape[0]
            k_in = leaf.shape[2]
            m_prev = leaf.shape[1]
        else:
            check(len(self.levels) > 0, "butterfly needs at least one factor")
            W0 = self.levels[0]
            self.NB = W0.shape[0] * W0.shape[1] * W0.shape[3]
            k_in = W0.shape[5]
            m_prev = k_in
        for l, W in enumerate(self.levels):
            hi, c, d, lo, m, k = W.shape
            check(c == radix and d == radix, "level radix mismatch")
            check(hi * radix * lo == self.NB, f"level {l} shape inconsistent")
            check(lo == radix**l, f"level {l} lo must be radix^l")
            check(k == m_prev, f"level {l} input rank {k} != previous output {m_prev}")
            m_prev = m
        self.m_out = m_prev
        self.k_in = k_in
        self.shape = (self.NB * self.m_out, self.NB * self.k_in)

    # -- pytree protocol (factors are differentiable leaves) -------------

    def tree_flatten(self):
        return (self.leaf, self.levels), (self.radix, self.precision)

    @classmethod
    def tree_unflatten(cls, aux, children):
        leaf, levels = children
        return cls(leaf, levels, radix=aux[0], precision=aux[1])

    # -- apply -----------------------------------------------------------

    def apply(self, x):
        """Apply to x of shape (n,) or (n, r); jit-friendly."""
        x = jnp.asarray(x)
        was_vec = x.ndim == 1
        if was_vec:
            x = x[:, None]
        r = x.shape[1]
        cur = x.reshape(self.NB, self.k_in, r)
        if self.leaf is not None:
            cur = jnp.einsum(
                "bmk,bkr->bmr", self.leaf, cur.astype(self.leaf.dtype),
                preferred_element_type=cur.dtype if cur.dtype in (jnp.float32, jnp.float64, jnp.complex64, jnp.complex128) else jnp.float32,
                precision=self.precision,
            )
        R = self.radix
        for l, W in enumerate(self.levels):
            hi, _, _, lo, m, k = W.shape
            c5 = cur.reshape(hi, R, lo, k, r)
            y = jnp.einsum(
                "hcdlmk,hdlkr->hclmr", W, c5.astype(W.dtype),
                preferred_element_type=jnp.float32
                if W.dtype == jnp.bfloat16
                else W.dtype,
                precision=self.precision,
            )
            cur = y.reshape(self.NB, m, r)
        out = cur.reshape(self.NB * self.m_out, r)
        return out[:, 0] if was_vec else out

    def __call__(self, x):
        return self.apply(x)

    def matmat(self, X):
        """Batched multi-RHS apply (alias for solver interop)."""
        return self.apply(X)

    # -- introspection ---------------------------------------------------

    @property
    def num_levels(self) -> int:
        return len(self.levels)

    def nbytes(self) -> int:
        total = self.leaf.nbytes if self.leaf is not None else 0
        return total + sum(W.nbytes for W in self.levels)

    def flops_per_col(self) -> int:
        """Useful multiply-add flops (x2) per RHS column."""
        total = 0
        if self.leaf is not None:
            NB, m, k = self.leaf.shape
            total += 2 * NB * m * k
        for W in self.levels:
            hi, c, d, lo, m, k = W.shape
            total += 2 * hi * c * d * lo * m * k
        return total

    def astype(self, dtype) -> "UniformButterfly":
        leaf = None if self.leaf is None else self.leaf.astype(dtype)
        return UniformButterfly(
            leaf, [W.astype(dtype) for W in self.levels], self.radix,
            precision=self.precision,
        )

    # -- oracle conversion ----------------------------------------------

    def to_linop(self) -> L.LinOp:
        """Equivalent host LinOp (BlockDiag/BlockCoo chain) for testing."""
        R = self.radix
        factors: list[L.LinOp] = []
        if self.leaf is not None:
            leaf = np.asarray(self.leaf, dtype=np.float64)
            factors.append(L.BlockDiag([L.Dense(leaf[i]) for i in range(self.NB)]))
        for W in self.levels:
            Wn = np.asarray(W, dtype=np.float64)
            hi, _, _, lo, m, k = Wn.shape
            row_offsets = np.arange(self.NB + 1) * m
            col_offsets = np.arange(self.NB + 1) * k
            row_inds, col_inds, blocks = [], [], []
            for h in range(hi):
                for c in range(R):
                    for ll in range(lo):
                        i = (h * R + c) * lo + ll
                        for d in range(R):
                            j = (h * R + d) * lo + ll
                            row_inds.append(i)
                            col_inds.append(j)
                            blocks.append(L.Dense(Wn[h, c, d, ll]))
            factors.append(
                L.BlockCoo(row_offsets, col_offsets, row_inds, col_inds, blocks)
            )
        return L.Product(list(reversed(factors)))


def random_butterfly(
    num_blocks: int,
    block: int,
    num_levels: int | None = None,
    radix: int = 2,
    dtype=jnp.float32,
    key=None,
    with_leaf: bool = True,
) -> UniformButterfly:
    """A random orthonormal-ish uniform butterfly (scaled so products neither
    explode nor vanish): NB=num_blocks leaf blocks of size `block`."""
    check(num_blocks >= radix, "need at least radix blocks", InvalidArgumentsError)
    max_levels = int(round(math.log(num_blocks, radix)))
    check(radix**max_levels == num_blocks, "num_blocks must be a power of radix",
          InvalidArgumentsError)
    if num_levels is None:
        num_levels = max_levels
    check(num_levels <= max_levels, "too many levels", InvalidArgumentsError)
    if key is None:
        key = jax.random.key(0)

    keys = jax.random.split(key, num_levels + 1)
    leaf = None
    if with_leaf:
        leaf = jax.random.normal(
            keys[0], (num_blocks, block, block), dtype=jnp.float32
        ) / np.sqrt(block)
        leaf = leaf.astype(dtype)
    levels = []
    for l in range(num_levels):
        hi, lo = num_blocks // radix ** (l + 1), radix**l
        W = jax.random.normal(
            keys[l + 1], (hi, radix, radix, lo, block, block), dtype=jnp.float32
        ) / np.sqrt(radix * block)
        levels.append(W.astype(dtype))
    return UniformButterfly(leaf, levels, radix)
