"""Distill ANY butterfly-compressible operator into a UniformButterfly.

The streaming factorizer (fac/streamer.py) and the analytic Helmholtz engine
(fac/helm2.py) produce *ragged* factorizations — data-dependent ranks per
block, exactly like the reference's BfFac output (include/bf/fac.h:33-42).
Ragged plans apply through ops/packed.py as a handful of batched GEMMs per
stage, but the flagship fused Pallas kernel (ops/pallas_butterfly.py) and the
explicit-exchange sharded apply (parallel/shmap_butterfly.py) both require
the UNIFORM FFT-form format. This module closes that gap: it re-compresses a
real operator directly into fixed-rank FFT form via the standard
complementary-low-rank merge recursion — the same nested-basis idea as the
reference's randomized middle-out sampler
(examples/fast_direct_solver/fast_direct_solver.py:404-607) and the
merge-and-split core (src/fac.c:1080-1294), but with every level emitted as
one dense (hi, R, R, lo, r, r) tensor instead of a ragged block graph.

Construction (host, float64, setup-time):

  state t: for every pair (row node w at depth t, col node C at depth L-t)
  we hold a row basis U[w,C] (|w| x r) with Phi[w, C] ~= U[w,C] @ coef,
  where coef = the r activation values the butterfly carries for that pair.

  - leaf: truncated SVD of each column block Phi[:, c] ~= (U S) V^T; the
    leaf factor stores V^T (r x cs); the SCALED basis B = U S seeds the
    recursion (row node = root). Scaling matters: carrying S in the basis
    makes every later truncation rank directions by actual data magnitude
    instead of by how often a direction is duplicated across siblings.
  - level t: merge col siblings (d = 0, 1) and split the row node into its
    children (new output digit c): the stacked scaled basis
    T = [B[w,c0]|child rows, B[w,c1]|child rows] spans Phi[w_child, C]'s
    column space; its rank-r truncated SVD T ~= (U' S') G gives the new
    scaled basis B' = U' S' and the orthonormal r x 2r transfer matrix G
    that becomes the level weight.
  - last level: no re-truncation — the weight is T itself, i.e. the output
    rows.

Block-index bookkeeping: the col path enters the block index naturally, so
the OUTPUT block order is the bit-reversed row-block order — the classic FFT
decimation reordering. `DistilledButterfly.row_perm` carries the
permutation, mirroring how every reference tree owns a domain<->tree BfPerm
(include/bf/tree.h:30-39): apply() returns rows in butterfly order and
`apply_permuted` / consumers gather through row_perm when canonical order
matters.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import numpy as np

from butterfly_tpu.ops.butterfly import UniformButterfly
from butterfly_tpu.ops.linop import LinOp
from butterfly_tpu.utils.errors import InvalidArgumentsError, check

__all__ = [
    "DistilledButterfly",
    "distill_butterfly",
    "distill_butterfly_batch",
    "distill_butterfly_device",
    "interleaved_real_op",
]


def interleaved_real_op(A) -> "LinOp":
    """Real (2n, 2m) view of a complex operator with Re/Im INTERLEAVED per
    index: row 2i = Re row i, row 2i+1 = Im row i (same for columns).

    Interleaving (rather than stacking halves) keeps every contiguous index
    range spatially coherent, so each complementary (row node, col node)
    block is the local 2x2 embedding of the corresponding complex block and
    its rank is exactly 2x the complex rank — the butterfly property
    survives and the embedded operator distills like a real one. This is
    how the Helmholtz multilevel apply (reference zgemv hot chain,
    src/mat_dense_complex.c:1072) reaches the fused real-only Pallas kernel.
    """
    from butterfly_tpu.ops.linop import FuncOp

    n, m = A.shape

    def matmat(X):
        X = np.asarray(X)
        z = X[0::2] + 1j * X[1::2]
        y = A.matmat(z)
        out = np.empty((2 * n, X.shape[1]))
        out[0::2] = y.real
        out[1::2] = y.imag
        return out

    return FuncOp((2 * n, 2 * m), matmat, dtype=np.float64)


def stacked_to_interleaved(M):
    """Re-index a STACKED real embedding ([Re; Im] halves, the packed-plan
    convention) into the INTERLEAVED one (row 2i = Re_i, row 2i+1 = Im_i)
    on whatever device M lives on. Interleaving restores spatial coherence
    of contiguous index ranges, which the distillation's complementary-rank
    property needs (see interleaved_real_op)."""
    import jax.numpy as jnp

    n2, m2 = M.shape
    n, m = n2 // 2, m2 // 2
    rp = np.empty(n2, np.int32)
    rp[0::2] = np.arange(n)
    rp[1::2] = n + np.arange(n)
    cp = np.empty(m2, np.int32)
    cp[0::2] = np.arange(m)
    cp[1::2] = m + np.arange(m)
    return jnp.take(jnp.take(M, jnp.asarray(rp), axis=0),
                    jnp.asarray(cp), axis=1)


def _svd(T: np.ndarray):
    """SVD with a gesvd fallback (gesdd occasionally fails to converge on
    rank-deficient stacked bases — same LAPACK caveat the reference hits via
    LAPACKE_zgesvd, src/mat_dense_complex.c:1550)."""
    try:
        return np.linalg.svd(T, full_matrices=False)
    except np.linalg.LinAlgError:
        import scipy.linalg

        return scipy.linalg.svd(T, full_matrices=False,
                                lapack_driver="gesvd")


def _svd_scaled(T: np.ndarray):
    """(U*s, s, Vt) of a tall (h, w) matrix via the (w, w) Gram
    eigendecomposition — BLAS3 GEMM + small eigh instead of a tall
    bidiagonalization, 3-10x faster for the distillation's h >> w merge
    stacks. Squares the condition number, so singular values below
    ~sqrt(eps_f64)*sigma_max (~1e-8 rel) come back noisy; the distillation
    only needs directions above its truncation tolerance, which is far
    coarser. Falls back to full SVD for near-square inputs where Gram has no
    advantage. Returns the SCALED left basis U*s (what the distillation
    carries) directly."""
    h, w = T.shape
    if h < 4 * w:
        U, s, Vt = _svd(T)
        return U * s, s, Vt
    M = T.T @ T
    evals, V = np.linalg.eigh(M)           # ascending
    s = np.sqrt(np.maximum(evals[::-1], 0.0))
    V = V[:, ::-1]
    return T @ V, s, V.T


# Below this relative tolerance the Gram trick's squared conditioning makes
# dropped-singular-value reports noise (see _svd_scaled docstring); the
# distillation then switches to the full bidiagonalization SVD.
_GRAM_TOL_FLOOR = 1e-7


def _svd_full_scaled(T: np.ndarray):
    """Same contract as _svd_scaled but always via the full SVD — used when
    the caller's truncation tolerance is below the Gram trick's ~1e-8
    accuracy floor (ADVICE r3: tol < 1e-7 made max_sv_discarded and the
    adaptive-rank termination unreliable)."""
    U, s, Vt = _svd(T)
    return U * s, s, Vt


def _revbits(x: int, nbits: int) -> int:
    y = 0
    for _ in range(nbits):
        y = (y << 1) | (x & 1)
        x >>= 1
    return y


@dataclasses.dataclass
class DistilledButterfly:
    """A UniformButterfly + the row-block permutation tying it to the
    original operator: bf.apply(x)[g*bs:(g+1)*bs] reproduces the rows of
    original block revbits(g), i.e.  A[row_perm] @ x == bf.apply(x)."""

    bf: UniformButterfly
    row_perm: np.ndarray       # (n,) butterfly-row -> original-row index
    rank: int
    max_sv_discarded: float    # max singular value dropped by any truncation
    sigma_max: float = 0.0     # largest leaf singular value (scale estimate)

    @property
    def shape(self):
        return self.bf.shape

    def apply(self, x):
        """Apply in butterfly row order (rows permuted by row_perm)."""
        return self.bf.apply(x)

    def apply_canonical(self, x):
        """Apply and restore the original row order (one device gather)."""
        import jax.numpy as jnp

        y = self.bf.apply(x)
        inv = np.empty_like(self.row_perm)
        inv[self.row_perm] = np.arange(self.row_perm.size)
        return jnp.take(y, jnp.asarray(inv), axis=0)

    def nbytes(self) -> int:
        return self.bf.nbytes()


def _col_block(A, j0: int, j1: int) -> np.ndarray:
    """Dense (n, j1-j0) column block of an ndarray or LinOp (for a
    compressed LinOp this is a cheap fac apply to unit columns)."""
    if isinstance(A, np.ndarray):
        return np.asarray(A[:, j0:j1], dtype=np.float64)
    n, m = A.shape
    E = np.zeros((m, j1 - j0))
    E[np.arange(j0, j1), np.arange(j1 - j0)] = 1.0
    return np.asarray(A.matmat(E), dtype=np.float64)


def distill_butterfly(
    A,
    num_blocks: int,
    rank: int | None = None,
    dtype=np.float32,
    tol: float = 1e-6,
) -> DistilledButterfly:
    """Compress a real (n, m) operator into a rank-`rank` UniformButterfly
    with `num_blocks` blocks (power of 2; n and m divisible by it).

    A may be a dense ndarray or any real LinOp (e.g. a streamed
    PartialFac's as_linop() — re-compressing an already-compressed operator
    costs one cheap fac apply per column block).

    rank=None picks the rank adaptively: start at leaf width + 16 and
    double the margin until every truncation's dropped singular value is
    below tol * (largest leaf singular value) — the same
    relative-truncation criterion as the streamer's truncated_svd
    (reference: bfTruncSpecGetNumTerms, src/linalg.c:26-35). The column
    blocks of A are fetched once and cached across adaptive retries (for a
    compressed LinOp each fetch is a fac apply — the dominant setup cost).
    """
    n, m = A.shape
    NB = num_blocks
    check(NB >= 2 and (NB & (NB - 1)) == 0,
          "num_blocks must be a power of 2", InvalidArgumentsError)
    check(n % NB == 0 and m % NB == 0,
          f"n={n}, m={m} must divide num_blocks={NB}", InvalidArgumentsError)
    if isinstance(A, LinOp):
        check(not np.issubdtype(A.dtype, np.complexfloating),
              "distill_butterfly is real-only (embed complex ops first)",
              InvalidArgumentsError)
    cs = m // NB
    cols = [_col_block(A, c * cs, (c + 1) * cs) for c in range(NB)]
    if rank is None:
        margin = 16
        while True:
            d = _distill_from_cols(cols, n, m, NB, cs + margin, dtype,
                                   tol=tol)
            if (d.max_sv_discarded <= tol * max(d.sigma_max, 1e-300)
                    or cs + margin >= min(n, m)):
                return d
            margin *= 2
    return _distill_from_cols(cols, n, m, NB, rank, dtype, tol=tol)


def _distill_from_cols(
    cols: list, n: int, m: int, NB: int, rank: int, dtype,
    tol: float = 1e-6,
) -> DistilledButterfly:
    L = int(round(math.log2(NB)))
    cs, bs = m // NB, n // NB
    r = rank
    check(r >= 1, "rank must be >= 1", InvalidArgumentsError)
    svd_scaled = _svd_scaled if tol >= _GRAM_TOL_FLOOR else _svd_full_scaled

    max_dropped = 0.0
    sigma_max = 0.0

    # ---- leaf: per col block, Phi[:, c] ~= U_c @ Vt_c ------------------
    leaf = np.zeros((NB, r, cs))
    U = []  # state t=0: U[g] is (n, r), g = col leaf index
    for c in range(NB):
        # carry the SCALED basis B = U diag(s) so later truncations rank
        # directions by actual data magnitude; the emitted factor is the
        # orthonormal part
        US, s, Vt = svd_scaled(cols[c])
        if s.size:
            sigma_max = max(sigma_max, float(s[0]))
        k = min(r, s.size)
        if s.size > k:
            max_dropped = max(max_dropped, float(s[k]))
        leaf[c, :k, :] = Vt[:k]
        Ug = np.zeros((n, r))
        Ug[:, :k] = US[:, :k]
        U.append(Ug)

    # ---- levels --------------------------------------------------------
    levels = []
    for t in range(L):
        hi, lo = NB // 2 ** (t + 1), 2 ** t
        rows_w = n // 2 ** t       # rows per row node at depth t
        half = rows_w // 2
        last = t == L - 1
        m_out = bs if last else r
        W = np.zeros((hi, 2, 2, lo, m_out, r))
        U_new = [None] * NB
        del rows_w  # U[g] is already restricted to its row node's rows
        for h in range(hi):
            for ll in range(lo):
                g0 = (h * 2 + 0) * lo + ll
                g1 = (h * 2 + 1) * lo + ll
                for b in (0, 1):             # row child = output digit c
                    sl = slice(b * half, (b + 1) * half)
                    T = np.concatenate([U[g0][sl], U[g1][sl]], axis=1)
                    if last:
                        # final level: weights ARE the output rows
                        W[h, b, 0, ll] = T[:, :r]
                        W[h, b, 1, ll] = T[:, r:]
                        continue
                    US, s, Vt = svd_scaled(T)
                    k = min(r, s.size)
                    if s.size > k:
                        max_dropped = max(max_dropped, float(s[k]))
                    G = Vt[:k]                        # (k, 2r) orthonormal
                    W[h, b, 0, ll, :k, :] = G[:, :r]
                    W[h, b, 1, ll, :k, :] = G[:, r:]
                    Un = np.zeros((half, r))
                    Un[:, :k] = US[:, :k]             # scaled basis
                    g_out = (h * lo * 2) + b * lo + ll  # == h*2^{t+1}+b*2^t+ll
                    U_new[g_out] = Un
        if not last:
            U = U_new
        levels.append(W)

    # output block g holds original row block revbits(g)
    row_perm = np.concatenate([
        np.arange(_revbits(g, L) * bs, (_revbits(g, L) + 1) * bs)
        for g in range(NB)
    ])

    import jax.numpy as jnp

    # "highest" dot precision: TPU's DEFAULT demotes f32 matmuls to one
    # bf16 MXU pass (~1e-3 rel err), which would swamp the distillation's
    # own truncation error and break the BASELINE <=1e-6 clause.
    bf = UniformButterfly(
        jnp.asarray(leaf.astype(dtype)),
        [jnp.asarray(W.astype(dtype)) for W in levels],
        radix=2,
        precision="highest",
    )
    return DistilledButterfly(
        bf=bf, row_perm=row_perm, rank=r, max_sv_discarded=max_dropped,
        sigma_max=sigma_max,
    )


def distill_butterfly_batch(
    M: np.ndarray,
    num_blocks: int,
    rank: int,
    dtype=np.float32,
    workers: int | None = None,
) -> DistilledButterfly:
    """HOST float64 batched distillation: same contract as
    `distill_butterfly_device` — M is a (B, n, m) batch of same-shape
    operators, the batch folds into the block axis, and the result is ONE
    UniformButterfly applying block-diag(M_b) with log2(num_blocks) levels.

    Why this exists next to the device version: the device distillation runs
    its QR/SVD cascade in f32, whose orthogonalization noise floors the
    distilled apply at ~1e-4..1e-5 relative error (measured; the partition
    plan's 3.4e-6 Helmholtz rel err traced to it). Here every factor is
    computed in f64 and only the final weights quantize to `dtype`, so the
    distilled apply reaches the f32-storage floor (~1e-7) — the BASELINE
    accuracy clause's budget. The per-pair SVDs at each level are
    independent, so they run on a thread pool (LAPACK releases the GIL);
    reference analogue: the truncated-SVD cascade of the merge-and-split
    core, src/fac.c:867-1049, which is also host LAPACK.
    """
    from concurrent.futures import ThreadPoolExecutor

    M = np.asarray(M, np.float64)
    if M.ndim == 2:
        M = M[None]
    B, n, m = M.shape
    NB = num_blocks
    check(NB >= 2 and (NB & (NB - 1)) == 0,
          "num_blocks must be a power of 2", InvalidArgumentsError)
    check(n % NB == 0 and m % NB == 0,
          f"n={n}, m={m} must divide num_blocks={NB}", InvalidArgumentsError)
    L = int(round(math.log2(NB)))
    cs, bs = m // NB, n // NB
    NBt = B * NB
    r = int(rank)
    check(r >= 1, "rank must be >= 1", InvalidArgumentsError)

    stats = {"dropped": 0.0, "sigma": 0.0}
    pool = ThreadPoolExecutor(max_workers=workers or min(8, NBt))

    # ---- leaf ----------------------------------------------------------
    leaf = np.zeros((NBt, r, cs))
    U = [None] * NBt

    def do_leaf(g):
        b, c = divmod(g, NB)
        US, s, Vt = _svd_scaled(M[b][:, c * cs:(c + 1) * cs])
        k = min(r, s.size)
        Ug = np.zeros((n, r))
        Ug[:, :k] = US[:, :k]
        return g, Vt[:k], Ug, (float(s[0]) if s.size else 0.0), (
            float(s[k]) if s.size > k else 0.0)

    for g, Vtk, Ug, smax, sdrop in pool.map(do_leaf, range(NBt)):
        leaf[g, :Vtk.shape[0], :] = Vtk
        U[g] = Ug
        stats["sigma"] = max(stats["sigma"], smax)
        stats["dropped"] = max(stats["dropped"], sdrop)

    # ---- levels (pairing identical to the device impl: batch members
    # occupy contiguous NB-groups of g, and with only L levels the merge
    # pairs never cross a member boundary) ------------------------------
    levels = []
    for t in range(L):
        hi, lo = NBt // 2 ** (t + 1), 2 ** t
        rows = n // 2 ** t
        half = rows // 2
        last = t == L - 1
        m_out = bs if last else r
        W = np.zeros((hi, 2, 2, lo, m_out, r))
        U_new = [None] * NBt

        def do_pair(args):
            h, ll, b_ = args
            g0 = (h * 2 + 0) * lo + ll
            g1 = (h * 2 + 1) * lo + ll
            sl = slice(b_ * half, (b_ + 1) * half)
            T = np.concatenate([U[g0][sl], U[g1][sl]], axis=1)
            if last:
                return (h, b_, ll, T[:, :r], T[:, r:], None, None, 0.0)
            US, s, Vt = _svd_scaled(T)
            k = min(r, s.size)
            G = Vt[:k]
            Un = np.zeros((half, r))
            Un[:, :k] = US[:, :k]
            g_out = (h * lo * 2) + b_ * lo + ll
            dropped = float(s[k]) if s.size > k else 0.0
            return (h, b_, ll, G[:, :r], G[:, r:], Un, g_out, dropped)

        tasks = [(h, ll, b_) for h in range(hi) for ll in range(lo)
                 for b_ in (0, 1)]
        for h, b_, ll, W0, W1, Un, g_out, dropped in pool.map(
                do_pair, tasks):
            if last:
                W[h, b_, 0, ll] = W0
                W[h, b_, 1, ll] = W1
                continue
            k = W0.shape[0]
            W[h, b_, 0, ll, :k, :] = W0
            W[h, b_, 1, ll, :k, :] = W1
            U_new[g_out] = Un
            stats["dropped"] = max(stats["dropped"], dropped)
        if not last:
            U = U_new
        levels.append(W)
    pool.shutdown()

    import jax.numpy as jnp

    bf = UniformButterfly(
        jnp.asarray(leaf.astype(dtype)),
        [jnp.asarray(W.astype(dtype)) for W in levels],
        radix=2,
        precision="highest",
    )
    sub_perm = _row_perm_for(NB, bs)
    row_perm = np.concatenate([b * n + sub_perm for b in range(B)])
    return DistilledButterfly(
        bf=bf, row_perm=row_perm, rank=r,
        max_sv_discarded=stats["dropped"], sigma_max=stats["sigma"],
    )


def _row_perm_for(NB: int, bs: int) -> np.ndarray:
    L = int(round(math.log2(NB)))
    return np.concatenate([
        np.arange(_revbits(g, L) * bs, (_revbits(g, L) + 1) * bs)
        for g in range(NB)
    ])


def distill_butterfly_device(
    M,
    num_blocks: int,
    rank: int,
    dtype=None,
) -> DistilledButterfly:
    """See _distill_device_impl; M may also be a BATCH (B, n, m) of
    same-shape operators — the batch folds into the block axis (independent
    sub-butterflies concatenate along every level's `hi` axis) and the
    result is ONE UniformButterfly applying block-diag(M_b), with only
    log2(num_blocks) levels. This is how a partition's many same-class
    butterfly blocks run as a single fused apply (fac/partition.py)."""
    return _distill_device_impl(M, num_blocks, rank, dtype)


def _distill_device_impl(
    M,
    num_blocks: int,
    rank: int,
    dtype=None,
) -> DistilledButterfly:
    """Device-resident distillation: same complementary-low-rank merge
    recursion as `distill_butterfly`, but every step — column-block QR,
    stacked-basis QR, small SVDs, basis updates — runs as ONE batched XLA
    op per level on the TPU. The input is a dense (n, m) device array, or a
    BATCH (B, n, m) of same-shape operators folded into the block axis
    (the result applies block-diag(M_b) with log2(num_blocks) levels).
    Nothing round-trips through the host, which matters on hosts whose CPU
    or transfer link is orders of magnitude slower than the chip (the
    reference has no analogue: its whole factorization IS host BLAS,
    src/fac.c:717-777).

    Numerics: f32 with HIGHEST dot precision; tall factors go through QR
    (never a Gram square), so the singular-value noise floor is
    ~1e-6*sigma_max — the distilled apply meets ~1e-6 relative error
    against the input operator, not better. Use the host (f64) path when
    deeper accuracy is required and the host can afford it.

    Shape-stable compilation: every level's stacked-basis batch is padded
    to n/2 rows so ALL levels share one QR and one SVD executable (first
    call compiles ~4 kernels total, reused for any same-shape distill).
    """
    import jax
    import jax.numpy as jnp

    M = jnp.asarray(M, dtype=dtype or jnp.float32)
    if M.ndim == 2:
        M = M[None]
    B, n, m = M.shape
    NB = num_blocks
    check(NB >= 2 and (NB & (NB - 1)) == 0,
          "num_blocks must be a power of 2", InvalidArgumentsError)
    check(n % NB == 0 and m % NB == 0,
          f"n={n}, m={m} must divide num_blocks={NB}", InvalidArgumentsError)
    L = int(round(math.log2(NB)))
    cs, bs = m // NB, n // NB
    NBt = B * NB                                # total leaf blocks
    r = int(rank)
    check(r >= 1, "rank must be >= 1", InvalidArgumentsError)
    check(n % 2 == 0, "n must be even", InvalidArgumentsError)
    hp = jax.lax.Precision.HIGHEST

    @functools.partial(jax.jit, static_argnames=("k",))
    def _leaf(Md, k):
        C = jnp.transpose(Md.reshape(B, n, NB, cs), (0, 2, 1, 3)).reshape(
            NBt, n, cs)
        Q, R = jnp.linalg.qr(C, mode="reduced")
        U_, s, Vt = jnp.linalg.svd(R, full_matrices=False)
        leaf = jnp.zeros((NBt, r, cs), Md.dtype).at[:, :k, :].set(
            Vt[:, :k, :])
        US = jnp.einsum("bnc,bck->bnk", Q, U_[:, :, :k] * s[:, None, :k],
                        precision=hp)
        U0 = jnp.zeros((NBt, n, r), Md.dtype).at[:, :, :k].set(US)
        dropped = s[:, k].max() if cs > k else jnp.zeros((), Md.dtype)
        return leaf, U0, s[:, 0].max(), dropped

    k_leaf = min(r, cs)
    leaf, U, sigma_max, max_dropped = _leaf(M, k_leaf)

    h_pad = n // 2  # fixed QR height => one executable for every level

    @jax.jit
    def _merge(T):
        """T: (NBt, h_pad, 2r) zero-padded stacks -> (G, US, dropped)."""
        Q, R = jnp.linalg.qr(T, mode="reduced")
        U_, s, Vt = jnp.linalg.svd(R, full_matrices=False)
        G = Vt[:, :r, :]                               # (NBt, r, 2r)
        US = jnp.einsum("bhw,bwk->bhk", Q, U_[:, :, :r] * s[:, None, :r],
                        precision=hp)                  # (NBt, h_pad, r)
        return G, US, s[:, r:].max() if s.shape[1] > r else jnp.zeros(
            (), T.dtype)

    levels = []
    for t in range(L):
        hi, lo = NBt // 2 ** (t + 1), 2 ** t
        rows = n // 2 ** t
        half = rows // 2
        last = t == L - 1
        # U indexed by g=(h*2+d)*lo+ll; build T[h,b,ll] = (half, (d,r))
        T = jnp.transpose(
            U.reshape(hi, 2, lo, 2, half, r), (0, 3, 2, 4, 1, 5)
        ).reshape(NBt, half, 2 * r)
        if last:
            m_out = bs  # == half
            W = jnp.transpose(
                T.reshape(hi, 2, lo, m_out, 2, r), (0, 1, 4, 2, 3, 5)
            )
            levels.append(W)
            break
        Tp = (T if half == h_pad
              else jnp.pad(T, ((0, 0), (0, h_pad - half), (0, 0))))
        G, US, dropped = _merge(Tp)
        max_dropped = jnp.maximum(max_dropped, dropped)
        W = jnp.transpose(
            G.reshape(hi, 2, lo, r, 2, r), (0, 1, 4, 2, 3, 5)
        )
        levels.append(W)
        U = US[:, :half, :]

    bf = UniformButterfly(leaf, levels, radix=2, precision="highest")
    sub_perm = _row_perm_for(NB, bs)
    row_perm = np.concatenate([b * n + sub_perm for b in range(B)])
    return DistilledButterfly(
        bf=bf,
        row_perm=row_perm,
        rank=r,
        max_sv_discarded=float(max_dropped),
        sigma_max=float(sigma_max),
    )
