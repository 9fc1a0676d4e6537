"""Fused multi-level butterfly apply: a Pallas TPU kernel.

Why this kernel exists
----------------------
The einsum path (ops/butterfly.py, UniformButterfly.apply) emits one
dot_general per butterfly level. XLA keeps each level's GEMMs on the MXU, but
the activation tensor makes a full HBM round trip per level: for a depth-L
butterfly the traffic is  weights + 2·L·activations.  The speed of light is
weights + 2·activations (read the input once, write the output once, keep
everything else in VMEM) — this is the roofline bench.py measures against.

This kernel closes most of that gap by fusing `fuse` consecutive levels into
ONE pass over HBM. A pass over levels [l0, l0+k) partitions the NB block rows
into groups of R^k blocks that mix only among themselves across those k
levels (the blocks whose indices differ in base-R digits l0..l0+k-1 — the
butterfly pattern, reference: block index structure of the MatBlockCoo
factors, src/fac_helm2.c:309-312 and src/fac.c:835). Each Pallas program:

  1. DMAs one group's activation tile (R^k·blk × r_tile) HBM -> VMEM,
  2. applies the k levels back-to-back as MXU dot_generals entirely in VMEM,
  3. DMAs the result back.

Activation traffic drops from 2·L to 2·ceil(L/k) HBM round trips while the
weight traffic stays exactly one read per weight byte. The block-diagonal
leaf factor is fused into the first pass for free (it is digit-local).

Grid order is (group, low, r_tile) with the r_tile axis innermost: Pallas
skips re-fetching an input block when its index map output is unchanged
between consecutive grid steps, so the (1/loG/r-invariant) weight blocks are
DMA'd once per group instead of once per grid cell.

Weight layout: at plan-build time each level's (hi, R, R, lo, m, k) tensor is
re-arranged (once, on device) into a per-pass layout
(hiG, loG, R^{k-1-t}, R^t, R·m, R·k) whose trailing 2D matrices fuse the
radix mixing into one MXU matmul — the BlockSpec index maps carry the whole
butterfly exchange and the kernel body sees only dense static-shape 2D tiles
(Mosaic lowers rank<=2 contractions to the MXU).

Ranks may VARY ACROSS LEVELS (uniform within a level): level l maps k_l-row
blocks to m_l-row blocks with k_l == m_{l-1}. This is what lets REAL
factorized operators — distilled to FFT form by fac/distill.py, where the
leaf is (NB, r, cs) and the last level emits (bs, r) blocks — run through
this kernel instead of falling back to per-level einsums.

Everything here is static-shape, f32/bf16-accumulate-f32, and falls back to
the einsum path for cases the kernel does not cover (complex dtypes, ragged
ranks within a level, tiny problems).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from butterfly_tpu.utils.errors import InvalidArgumentsError, check

__all__ = ["FusedButterflyPlan", "fused_apply"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Mosaic scoped-VMEM budget we request per kernel (v5e/v5p chips have 128 MB
# physical VMEM; leave headroom for Mosaic's own scratch).
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _pass_vmem_bytes(dims: Sequence[tuple[int, int]], R: int, r_tile: int,
                     leaf_dims: "tuple[int, int] | None",
                     wbytes: int = 4) -> int:
    """Estimated VMEM for one fused pass applying levels with (m, k) in
    `dims` (plus an optional (m0, k0) leaf): double-buffered weight windows
    + activation in/out tiles."""
    k = len(dims)
    Rk = R ** k
    weights = sum(
        R ** (k - 1 - t) * R ** t * (R * m) * (R * kk) * wbytes
        for t, (m, kk) in enumerate(dims)
    )
    if leaf_dims is not None:
        weights += Rk * leaf_dims[0] * leaf_dims[1] * wbytes
    blk_in = leaf_dims[1] if leaf_dims is not None else dims[0][1]
    blk_out = dims[-1][0] if dims else leaf_dims[0]
    acts = Rk * (blk_in + blk_out) * r_tile * 4  # f32 activations
    return 2 * (weights + acts)  # double buffering


def max_fuse(R: int, blk: int, r_tile: int, has_leaf: bool,
             budget: int = _VMEM_LIMIT_BYTES, wbytes: int = 4) -> int:
    """Deepest per-pass fusion whose VMEM estimate fits the budget
    (uniform-rank case; the plan builder evaluates varying ranks directly)."""
    k = 1
    while _pass_vmem_bytes([(blk, blk)] * (k + 1), R, r_tile,
                           (blk, blk) if has_leaf else None,
                           wbytes) <= budget:
        k += 1
    return k


@dataclasses.dataclass(frozen=True)
class _PassMeta:
    """Static topology of one fused pass (hashable; closed over by jit)."""

    k: int           # number of levels fused in this pass
    hiG: int         # NB / R^(l0+k)
    loG: int         # R^l0
    dims: tuple      # ((m, k) per level in this pass)
    blk_in: int      # rows per block entering the pass
    blk_out: int     # rows per block leaving the pass
    has_leaf: bool   # pass 0 also applies the block-diagonal leaf factor
    leaf_dims: tuple | None  # (m0, k0) when has_leaf
    precision: object = None  # lax dot precision for the in-kernel matmuls


@dataclasses.dataclass(frozen=True)
class _PlanMeta:
    NB: int
    R: int
    r_tile: int
    passes: tuple  # tuple[_PassMeta, ...]
    interpret: bool
    act_dtype: object


def _pass_kernel(meta: _PassMeta, R: int, r_tile: int, *refs):
    """Kernel body: apply `meta.k` butterfly levels to one group tile.

    The group's R^k activation blocks live as a static list of 2D
    (blk, r_tile) register tiles; every level is a statically-unrolled set of
    plain 2D matmuls (Mosaic lowers only rank<=2 contractions to the MXU),
    with the butterfly mixing expressed as concatenate-along-sublanes +
    static slices.
    """
    x_ref, w_refs, o_ref = refs[0], refs[1:-1], refs[-1]
    Rk = R ** meta.k
    dt = o_ref.dtype
    tiles = [x_ref[0, g, 0, :, :] for g in range(Rk)]
    wi = 0
    if meta.has_leaf:
        wdt = w_refs[0].dtype
        for g in range(Rk):
            tiles[g] = jnp.dot(
                w_refs[0][0, 0, g], tiles[g].astype(wdt),
                preferred_element_type=jnp.float32,
                precision=meta.precision,
            ).astype(dt)
        wi = 1
    for t, (m_t, k_t) in enumerate(meta.dims):
        U, V = R ** (meta.k - 1 - t), R ** t
        W = w_refs[wi + t]  # (1, 1, U, V, R*m_t, R*k_t)
        new = [None] * Rk
        for u in range(U):
            for v in range(V):
                a_in = jnp.concatenate(
                    [tiles[(u * R + d) * V + v] for d in range(R)], axis=0
                ).astype(W.dtype)  # (R*k_t, r_tile); bf16 weights -> bf16 in
                y = jnp.dot(
                    W[0, 0, u, v], a_in, preferred_element_type=jnp.float32,
                    precision=meta.precision,
                ).astype(dt)  # rows = (c, m_t)
                for c in range(R):
                    new[(u * R + c) * V + v] = y[c * m_t:(c + 1) * m_t, :]
        tiles = new
    for g in range(Rk):
        o_ref[0, g, 0, :, :] = tiles[g]


def _make_pass_call(meta: _PassMeta, R: int, r_tile: int, r_pad: int,
                    act_dtype, interpret: bool):
    """Build the pallas_call for one fused pass."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Rk = R ** meta.k
    grid = (meta.hiG, meta.loG, r_pad // r_tile)

    in_spec = pl.BlockSpec(
        (1, Rk, 1, meta.blk_in, r_tile),
        lambda a, c, j: (a, 0, c, 0, j),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, Rk, 1, meta.blk_out, r_tile),
        lambda a, c, j: (a, 0, c, 0, j),
        memory_space=pltpu.VMEM,
    )
    w_specs = []
    if meta.has_leaf:
        m0, k0 = meta.leaf_dims
        w_specs.append(
            pl.BlockSpec(
                (1, 1, Rk, m0, k0),
                lambda a, c, j: (a, c, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    for t, (m_t, k_t) in enumerate(meta.dims):
        U, V = R ** (meta.k - 1 - t), R ** t
        w_specs.append(
            pl.BlockSpec(
                (1, 1, U, V, R * m_t, R * k_t),
                lambda a, c, j: (a, c, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )

    flops = 2 * meta.hiG * meta.loG * r_pad * (
        sum(R ** meta.k * R * m * k for m, k in meta.dims)
        + (Rk * meta.leaf_dims[0] * meta.leaf_dims[1] if meta.has_leaf else 0)
    )
    weight_elems = meta.hiG * meta.loG * (
        sum(R ** meta.k * R * m * k for m, k in meta.dims)
        + (Rk * meta.leaf_dims[0] * meta.leaf_dims[1] if meta.has_leaf else 0)
    )
    act_elems = meta.hiG * Rk * meta.loG * (
        meta.blk_in + meta.blk_out) * r_pad // 2

    kernel = functools.partial(_pass_kernel, meta, R, r_tile)
    # Deep fused passes legitimately hold several weight levels plus the
    # activation group in VMEM at once; raise Mosaic's conservative scoped-
    # vmem default (16 MB) toward the chip's physical VMEM so fuse >= 4
    # compiles (v5e/v5p have 128 MB).
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec] + w_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(
            (meta.hiG, Rk, meta.loG, meta.blk_out, r_pad), act_dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (weight_elems + 2 * act_elems),
            transcendentals=0,
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )


def _apply_fused(meta: _PlanMeta, params, x):
    """Jit target: params = (leafp or None, [[Wp_t ...] per pass]), x (n, r)."""
    leafp, pass_weights = params
    n, r = x.shape
    r_pad = _round_up(max(r, 128), meta.r_tile)
    if r_pad != r:
        x = jnp.pad(x, ((0, 0), (0, r_pad - r)))
    cur = x.astype(meta.act_dtype)
    for p, pm in enumerate(meta.passes):
        Rk = meta.R ** pm.k
        cur = cur.reshape(pm.hiG, Rk, pm.loG, pm.blk_in, r_pad)
        ws = list(pass_weights[p])
        if pm.has_leaf:
            ws = [leafp] + ws
        call = _make_pass_call(
            pm, meta.R, meta.r_tile, r_pad, meta.act_dtype, meta.interpret
        )
        cur = call(cur, *ws)
    out = cur.reshape(-1, r_pad)
    return out[:, :r]


class FusedButterflyPlan:
    """Executable fused-pass form of a UniformButterfly.

    Requires level-uniform ranks (each level one (m, k); different levels
    may differ — the distilled-real-fac case) and a real dtype. Use
    `UniformButterfly.apply` for anything else.
    """

    def __init__(self, bf, fuse: int = 3, r_tile: int = 256,
                 interpret: bool | None = None, act_dtype=None,
                 precision=None):
        R = bf.radix
        # inherit the butterfly's own dot precision (distilled real facs
        # carry "highest" so the f32 accuracy clause survives the kernel)
        if precision is None:
            precision = getattr(bf, "precision", None)
        prec = None if precision is None else jax.lax.Precision(precision)
        check(not np.issubdtype(np.dtype(bf.levels[0].dtype if bf.levels
                                         else bf.leaf.dtype),
                                np.complexfloating),
              "fused plan is real-only", InvalidArgumentsError)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"

        Lv = bf.num_levels
        max_k = int(round(math.log(bf.NB, R)))
        level_dims = [(int(W.shape[4]), int(W.shape[5])) for W in bf.levels]
        leaf_dims = (
            None if bf.leaf is None
            else (int(bf.leaf.shape[1]), int(bf.leaf.shape[2]))
        )
        wbytes = jnp.dtype(bf.levels[0].dtype).itemsize if bf.levels else 4

        # pass sizes: greedy — extend the current pass while the VMEM
        # estimate fits the budget and the fuse/addressable-depth caps allow
        fuse = max(1, min(fuse, max_k))
        sizes = []
        l0 = 0
        while l0 < Lv:
            k = 1
            while (
                l0 + k < Lv
                and k < fuse
                and l0 + k + 1 <= max_k
                and _pass_vmem_bytes(
                    level_dims[l0:l0 + k + 1], R, r_tile,
                    leaf_dims if l0 == 0 else None, wbytes,
                ) <= _VMEM_LIMIT_BYTES
            ):
                k += 1
            sizes.append(k)
            l0 += k

        # Activations live in HBM between passes at act_dtype (each level's
        # MXU matmul still accumulates in f32 inside VMEM). bf16 halves the
        # inter-pass activation traffic — for a bandwidth-bound apply that is
        # a direct speedup at ~3 decimal digits of per-pass rounding.
        act_dtype = jnp.dtype(act_dtype or jnp.float32)
        check(act_dtype in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)),
              "act_dtype must be float32 or bfloat16", InvalidArgumentsError)
        passes = []
        pass_weights = []
        l0 = 0
        for p, k in enumerate(sizes):
            hiG = bf.NB // R ** (l0 + k)
            loG = R ** l0
            ws = []
            for t in range(k):
                l = l0 + t
                W = jnp.asarray(bf.levels[l])  # (hi, R, R, lo, m, kk)
                m_t, k_t = level_dims[l]
                U, V = R ** (k - 1 - t), R ** t
                # (hiG*U, R, R, V*loG, m, kk)
                #   -> (hiG, loG, U, V, (c, m), (d, kk)) fused 2D mixing mats
                # (device-side transpose: avoids a host round trip of the
                # full weight set at plan-build time)
                Wr = W.reshape(hiG, U, R, R, V, loG, m_t, k_t)
                Wp = jnp.transpose(Wr, (0, 5, 1, 4, 2, 6, 3, 7)).reshape(
                    hiG, loG, U, V, R * m_t, R * k_t
                )
                ws.append(jax.block_until_ready(Wp))
            has_leaf = p == 0 and bf.leaf is not None
            blk_in = (
                leaf_dims[1] if has_leaf
                else (level_dims[l0][1] if k else bf.k_in)
            )
            blk_out = level_dims[l0 + k - 1][0]
            passes.append(
                _PassMeta(k=k, hiG=hiG, loG=loG,
                          dims=tuple(level_dims[l0:l0 + k]),
                          blk_in=blk_in, blk_out=blk_out,
                          has_leaf=has_leaf,
                          leaf_dims=leaf_dims if has_leaf else None,
                          precision=prec)
            )
            pass_weights.append(ws)
            l0 += k

        leafp = None
        if bf.leaf is not None:
            Rk0 = R ** sizes[0]
            hiG0, loG0 = bf.NB // Rk0, 1
            m0, k0 = leaf_dims
            leafn = jnp.asarray(bf.leaf).reshape(hiG0, Rk0, loG0, m0, k0)
            leafp = jax.block_until_ready(
                jnp.transpose(leafn, (0, 2, 1, 3, 4))
            )

        self.NB, self.radix = bf.NB, R
        self.blk = bf.k_in
        self.shape = bf.shape
        self.num_passes = len(sizes)
        self._params = (leafp, pass_weights)
        meta = _PlanMeta(
            NB=bf.NB, R=R, r_tile=r_tile, passes=tuple(passes),
            interpret=interpret, act_dtype=act_dtype,
        )
        self._meta = meta
        self._apply_jit = jax.jit(functools.partial(_apply_fused, meta))

    def apply(self, x):
        """Apply to (n,) or (n, r)."""
        x = jnp.asarray(x)
        was_vec = x.ndim == 1
        if was_vec:
            x = x[:, None]
        y = self._apply_jit(self._params, x)
        return y[:, 0] if was_vec else y

    def __call__(self, x):
        return self.apply(x)

    def nbytes(self) -> int:
        leafp, pws = self._params
        total = 0 if leafp is None else leafp.nbytes
        return total + sum(w.nbytes for ws in pws for w in ws)


def fused_apply(bf, x, fuse: int = 3, r_tile: int = 256):
    """One-shot fused apply (builds and caches nothing; prefer the plan)."""
    return FusedButterflyPlan(bf, fuse=fuse, r_tile=r_tile).apply(x)
