"""The packed device runtime: LinOp trees -> level-synchronous batched GEMMs.

This is the TPU replacement for the reference's interpreted apply path, where
every matvec walks a recursive object graph making one tiny BLAS call per
block (reference: bfMatBlockDenseMulVec src/mat_block_dense.c:574-630,
MatProduct apply src/fac.c:133-146 — SURVEY.md §3.2 identifies this stack as
the metric-critical path). Here the graph is flattened ONCE at pack time into
a `StagePlan`:

- every leaf dense block becomes a GEMM *unit* with global gather (input) and
  scatter-add (output) index ranges;
- every Identity/Diag/Perm block becomes a *scale unit* (gather, multiply,
  scatter) with no FLOPs;
- units are scheduled into *stages* (factor k of a Product chain runs at
  stage k; different chains of a multilevel factorization overlap stages);
- within a (stage, output-buffer) group, units are *bucketed* by padded block
  shape: one bucket = one batched (B, m, k) x (B, k, r) einsum on the MXU;
- the inter-level butterfly re-blocking is carried entirely by the gather /
  scatter index tables — XLA sees static indices and fuses the gathers into
  the GEMMs.

Apply is a single jit-compiled function per plan: ~#levels batched GEMMs,
no Python in the loop, no dynamic shapes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from butterfly_tpu.ops import linop as L
from butterfly_tpu.utils.errors import NotImplementedButterflyError, check

__all__ = ["StagePlan", "pack", "PackedApplyStats"]


# ---------------------------------------------------------------------------
# Flattening: LinOp tree -> chains of single-stage factors of units
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _GemmUnit:
    data: np.ndarray  # (m, k) dense block
    in_off: int  # offset into the chain-stage input vector
    out_off: int  # offset into the chain-stage output vector


@dataclasses.dataclass
class _ScaleUnit:
    weights: np.ndarray  # (L,) elementwise weights; in/out are index ARRAYS
    in_idx: np.ndarray  # (L,) chain-stage-relative input indices
    out_idx: np.ndarray  # (L,) chain-stage-relative output indices


@dataclasses.dataclass
class _Factor:
    in_dim: int
    out_dim: int
    gemms: list[_GemmUnit]
    scales: list[_ScaleUnit]


@dataclasses.dataclass
class _Chain:
    i0: int  # global output row offset
    j0: int  # global input col offset
    factors: list[_Factor]  # applied first-to-last


def _single_stage(op: L.LinOp, scale: complex | float = 1.0) -> _Factor:
    """Flatten `op` into ONE stage of units; raises if impossible."""
    m, n = op.shape
    f = _Factor(in_dim=n, out_dim=m, gemms=[], scales=[])

    def add(sub: L.LinOp, i0: int, j0: int, s) -> None:
        if isinstance(sub, L.Scaled):
            add(sub.op, i0, j0, s * sub.alpha)
        elif isinstance(sub, L.Dense):
            data = sub.data if s == 1.0 else s * sub.data
            f.gemms.append(_GemmUnit(np.asarray(data), j0, i0))
        elif isinstance(sub, L.Identity):
            k = sub.shape[0]
            f.scales.append(
                _ScaleUnit(
                    np.full(k, s), np.arange(j0, j0 + k), np.arange(i0, i0 + k)
                )
            )
        elif isinstance(sub, L.Diag):
            k = sub.diag.size
            f.scales.append(
                _ScaleUnit(
                    s * sub.diag, np.arange(j0, j0 + k), np.arange(i0, i0 + k)
                )
            )
        elif isinstance(sub, L.Perm):
            k = sub.perm.size
            f.scales.append(
                _ScaleUnit(np.full(k, s), j0 + sub.perm, i0 + np.arange(k))
            )
        elif isinstance(sub, L.Zero):
            pass
        elif isinstance(sub, L.BlockDiag):
            for kk, b in enumerate(sub.blocks):
                add(b, i0 + int(sub.row_offsets[kk]), j0 + int(sub.col_offsets[kk]), s)
        elif isinstance(sub, L.BlockCoo):
            for kk, b in enumerate(sub.blocks):
                bi, bj = int(sub.row_inds[kk]), int(sub.col_inds[kk])
                add(b, i0 + int(sub.row_offsets[bi]), j0 + int(sub.col_offsets[bj]), s)
        elif isinstance(sub, L.BlockDense):
            for bi, row in enumerate(sub.grid):
                for bj, b in enumerate(row):
                    add(
                        b,
                        i0 + int(sub.row_offsets[bi]),
                        j0 + int(sub.col_offsets[bj]),
                        s,
                    )
        else:
            raise NotImplementedButterflyError(
                f"cannot pack {type(sub).__name__} as a single stage"
            )

    add(op, 0, 0, scale)
    return f


def _expand_product(op: L.LinOp) -> list[L.LinOp]:
    """Application-order factor list with nested Products inlined."""
    if isinstance(op, L.Product):
        out: list[L.LinOp] = []
        for f in reversed(op.factors):
            out.extend(_expand_product(f))
        return out
    return [op]


def _flatten(op: L.LinOp, i0: int, j0: int, chains: list[_Chain],
             scale: complex | float = 1.0) -> None:
    """Flatten into chains (multi-stage leaf paths positioned at (i0, j0))."""
    if isinstance(op, L.Scaled):
        _flatten(op.op, i0, j0, chains, scale * op.alpha)
    elif isinstance(op, L.Product):
        factors = _expand_product(op)  # application order, nested flattened
        staged = []
        for idx, f in enumerate(factors):
            # fold the scalar into the first factor only
            staged.append(_single_stage(f, scale if idx == 0 else 1.0))
        chains.append(_Chain(i0, j0, staged))
    elif isinstance(op, L.BlockDense):
        for bi, row in enumerate(op.grid):
            for bj, b in enumerate(row):
                _flatten(
                    b,
                    i0 + int(op.row_offsets[bi]),
                    j0 + int(op.col_offsets[bj]),
                    chains,
                    scale,
                )
    elif isinstance(op, L.BlockDiag):
        for kk, b in enumerate(op.blocks):
            _flatten(
                b, i0 + int(op.row_offsets[kk]), j0 + int(op.col_offsets[kk]),
                chains, scale,
            )
    elif isinstance(op, L.BlockCoo):
        for kk, b in enumerate(op.blocks):
            bi, bj = int(op.row_inds[kk]), int(op.col_inds[kk])
            _flatten(
                b, i0 + int(op.row_offsets[bi]), j0 + int(op.col_offsets[bj]),
                chains, scale,
            )
    elif isinstance(op, L.Sum):
        for t in op.terms:
            _flatten(t, i0, j0, chains, scale)
    elif isinstance(op, L.Diff):
        _flatten(op.a, i0, j0, chains, scale)
        _flatten(op.b, i0, j0, chains, -scale)
    else:
        # single-stage leaf (Dense / Identity / Diag / Perm / Zero / nested
        # block-of-dense)
        chains.append(_Chain(i0, j0, [_single_stage(op, scale)]))


# ---------------------------------------------------------------------------
# Bucketing and the executable plan
# ---------------------------------------------------------------------------


def _round_up(x: int, align: int) -> int:
    if x <= align:
        # small dims: next power of two, at least 1
        p = 1
        while p < x:
            p <<= 1
        return p
    return -(-x // align) * align


@dataclasses.dataclass
class _GemmBucket:
    """Every GEMM unit reads/writes a CONTIGUOUS row range of its buffer, so
    a bucket carries per-block START offsets, not per-row index tables: the
    gather is a vmapped dynamic_slice of (k_pad, r) windows and the scatter
    is a windowed scatter-add of (m_pad, r) windows — block-granular DMA
    instead of row-granular gather (measured ~30x faster on TPU). Padded
    window rows read neighbor data times ZERO weight columns / write zero
    rows, so correctness needs only zeroed tail padding on every buffer."""

    weights: jnp.ndarray  # (B, m_pad, k_pad) padded, pad entries zero
    in_start: jnp.ndarray  # (B,) int32 row starts into the read buffer
    out_start: jnp.ndarray  # (B,) int32 row starts into the write buffer
    read_buf: int
    write_buf: int
    flops_real: int  # unpadded useful flops per RHS column (x2 for mul-add)


@dataclasses.dataclass
class _ScaleBucket:
    weights: jnp.ndarray  # (L,)
    in_idx: jnp.ndarray  # (L,) int32
    out_idx: jnp.ndarray  # (L,) int32
    read_buf: int
    write_buf: int


@dataclasses.dataclass
class PackedApplyStats:
    num_stages: int
    num_gemm_buckets: int
    num_scale_buckets: int
    useful_flops_per_col: int  # 2*m*k summed over gemm units
    padded_flops_per_col: int
    weight_bytes: int
    padding_waste: float  # 1 - useful/padded


class StagePlan:
    """Executable packed form of a LinOp: buffers + bucketed stages.

    `real_embed`: map a complex operator onto REAL buffers via the standard
    2x2 embedding — every buffer of size S becomes [Re; Im] of size 2S and a
    complex block Z = A + iB becomes four real GEMM units (A, -B, B, A) wired
    between the halves. Complex matmul is UNIMPLEMENTED on the TPU backend
    (measured: c64 einsum -> "TPU backend error (Unimplemented)"), so this is
    how the Helmholtz apply (the reference's zgemv hot loop,
    src/mat_dense_complex.c:1072) rides the MXU. Flop accounting stays exact:
    4 real (m, k) units = 8mk flops = one complex madd's true cost.
    Default: auto (embed iff the op is complex and the backend is TPU).
    """

    def __init__(self, op: L.LinOp, dtype=None, block_align: int = 128,
                 real_embed: bool | None = None):
        m, n = op.shape
        self.shape = (m, n)
        op_complex = np.issubdtype(op.dtype, np.complexfloating)
        if dtype is None:
            dtype = jnp.complex64 if op_complex else jnp.float32
        dtype = jnp.dtype(dtype)
        if real_embed is None:
            real_embed = (
                np.issubdtype(dtype, np.complexfloating)
                and jax.default_backend() == "tpu"
            )
        self.real_embed = bool(real_embed) and np.issubdtype(
            dtype, np.complexfloating
        )
        if self.real_embed:
            # compute in the matching real dtype; split/recombine at the edges
            self._io_dtype = dtype
            dtype = jnp.dtype(np.zeros(0, dtype).real.dtype)
        self.dtype = dtype

        chains: list[_Chain] = []
        _flatten(op, 0, 0, chains)
        num_stages = max(len(c.factors) for c in chains)

        # Assign global offsets for each chain's intermediate vectors.
        # Buffer 0 is the input (size n); buffer t in 1..num_stages-1 holds
        # intermediates of chains still in flight; the OUTPUT buffer is
        # addressed separately (write_buf == -1 means output).
        buf_sizes = [n] + [0] * (num_stages - 1)
        chain_offsets: list[list[int]] = []  # per chain: offset of stage-t input
        for c in chains:
            offs = [c.j0]  # stage-0 input is the global input at j0
            for t in range(1, len(c.factors)):
                offs.append(buf_sizes[t])
                buf_sizes[t] += c.factors[t].in_dim
            chain_offsets.append(offs)
        # Collect units with global indices (original, un-embedded buffers).
        raw_gemms: list[tuple] = []  # (t, write_buf, data, in_base, out_base)
        raw_scales: list[tuple] = []  # (t, write_buf, weights, in_idx, out_idx)
        for c, offs in zip(chains, chain_offsets):
            last = len(c.factors) - 1
            for t, f in enumerate(c.factors):
                in_base = offs[t]
                write_buf = -1 if t == last else t + 1
                out_base = c.i0 if t == last else offs[t + 1]
                for u in f.gemms:
                    raw_gemms.append(
                        (t, write_buf, u.data, in_base + u.in_off,
                         out_base + u.out_off)
                    )
                for u in f.scales:
                    raw_scales.append(
                        (t, write_buf, u.weights, in_base + u.in_idx,
                         out_base + u.out_idx)
                    )

        if self.real_embed:
            # Buffer convention: size-S complex buffer -> size-2S real buffer
            # holding [Re; Im]. Complex Z = A + iB becomes the 2x2 real block
            # [[A, -B], [B, A]]: four (m, k) units between the halves (real
            # data keeps just the two diagonal copies).
            def in_half(t):
                return buf_sizes[t]

            def out_half(wb):
                return m if wb == -1 else buf_sizes[wb]

            eg, es = [], []
            for (t, wb, data, jb, ib) in raw_gemms:
                si, so = in_half(t), out_half(wb)
                A = np.ascontiguousarray(data.real)
                eg.append((t, wb, A, jb, ib))
                eg.append((t, wb, A, si + jb, so + ib))
                if np.issubdtype(data.dtype, np.complexfloating):
                    B = np.ascontiguousarray(data.imag)
                    if np.any(B):
                        eg.append((t, wb, -B, si + jb, ib))
                        eg.append((t, wb, B, jb, so + ib))
            for (t, wb, w, iix, oix) in raw_scales:
                si, so = in_half(t), out_half(wb)
                wr = np.ascontiguousarray(np.asarray(w).real)
                es.append((t, wb, wr, iix, oix))
                es.append((t, wb, wr, si + iix, so + oix))
                if np.issubdtype(np.asarray(w).dtype, np.complexfloating):
                    wi = np.ascontiguousarray(np.asarray(w).imag)
                    if np.any(wi):
                        es.append((t, wb, -wi, si + iix, oix))
                        es.append((t, wb, wi, iix, so + oix))
            raw_gemms, raw_scales = eg, es
            buf_sizes = [2 * s for s in buf_sizes]
            m = 2 * m

        self.buf_sizes = buf_sizes
        self.out_size = m

        # Bucket by (stage, write buffer, padded shape).
        gemm_groups: dict[tuple, list] = {}
        scale_groups: dict[tuple, list] = {}
        for (t, write_buf, data, jbase, ibase) in raw_gemms:
            mm, kk = data.shape
            key = (
                t,
                write_buf,
                _round_up(mm, block_align),
                _round_up(kk, block_align),
            )
            gemm_groups.setdefault(key, []).append((data, jbase, ibase))
        for (t, write_buf, w, iix, oix) in raw_scales:
            scale_groups.setdefault((t, write_buf), []).append((w, iix, oix))

        # Materialize buckets (device arrays). Gather/scatter windows may run
        # up to (k_pad - 1) / (m_pad - 1) rows past a buffer's logical end, so
        # every buffer gets a zeroed tail of at least that many rows (the tail
        # also provides the scale units' zero/dump slot row).
        self._gemm_buckets: list[_GemmBucket] = []
        self._scale_buckets: list[_ScaleBucket] = []
        tails: dict[int, int] = {}  # buffer id (-1 = output) -> tail rows
        useful = 0
        padded = 0
        weight_bytes = 0
        for (t, wb, mp, kp), units in sorted(gemm_groups.items()):
            B = len(units)
            W = np.zeros((B, mp, kp), dtype=self.dtype)
            in_start = np.zeros(B, dtype=np.int32)
            out_start = np.zeros(B, dtype=np.int32)
            fl = 0
            for b, (data, jbase, ibase) in enumerate(units):
                mm, kk = data.shape
                W[b, :mm, :kk] = data
                in_start[b] = jbase
                out_start[b] = ibase
                fl += 2 * mm * kk
            tails[t] = max(tails.get(t, 1), kp)
            tails[wb] = max(tails.get(wb, 1), mp)
            useful += fl
            padded += 2 * B * mp * kp
            weight_bytes += W.nbytes
            self._gemm_buckets.append(
                _GemmBucket(
                    jnp.asarray(W), jnp.asarray(in_start),
                    jnp.asarray(out_start), t, wb, fl,
                )
            )
        for (t, wb), units in sorted(scale_groups.items()):
            wts = np.concatenate([np.asarray(w) for w, _, _ in units])
            iix = np.concatenate([np.asarray(i) for _, i, _ in units])
            oix = np.concatenate([np.asarray(o) for _, _, o in units])
            self._scale_buckets.append(
                _ScaleBucket(
                    jnp.asarray(wts.astype(self.dtype)),
                    jnp.asarray(iix.astype(np.int32)),
                    jnp.asarray(oix.astype(np.int32)),
                    t, wb,
                )
            )

        self.stats = PackedApplyStats(
            num_stages=num_stages,
            num_gemm_buckets=len(self._gemm_buckets),
            num_scale_buckets=len(self._scale_buckets),
            useful_flops_per_col=useful,
            padded_flops_per_col=padded,
            weight_bytes=weight_bytes,
            padding_waste=1.0 - useful / max(padded, 1),
        )
        self.num_stages = num_stages
        # CRITICAL TPU detail: weights and index tables are passed as jit
        # ARGUMENTS, never closure constants — XLA:TPU compiles embedded
        # constant gathers to a pathological path ~400x slower (measured).
        meta = _PlanMeta(
            num_stages=num_stages,
            buf_sizes=tuple(self.buf_sizes),
            buf_tails=tuple(
                tails.get(t, 1) for t in range(len(self.buf_sizes))
            ),
            out_size=self.out_size,
            out_tail=tails.get(-1, 1),
            dtype=self.dtype,
            gemm_meta=tuple(
                (b.read_buf, b.write_buf) for b in self._gemm_buckets
            ),
            scale_meta=tuple(
                (b.read_buf, b.write_buf) for b in self._scale_buckets
            ),
        )
        self._params = (
            [(b.weights, b.in_start, b.out_start) for b in self._gemm_buckets],
            [(b.weights, b.in_idx, b.out_idx) for b in self._scale_buckets],
        )
        self._apply_jit = jax.jit(partial(_apply_plan, meta))

    def _zero_slot(self, read_buf: int) -> int:
        return self.buf_sizes[read_buf]

    def _dump_slot(self, write_buf: int) -> int:
        return self.out_size if write_buf == -1 else self.buf_sizes[write_buf]

    # -- application ----------------------------------------------------

    def __call__(self, x):
        """Apply to (n,) or (n, r); jit-compiled, cached per input shape."""
        if self.real_embed:
            # complex in/out lives on the host (the TPU backend has no
            # complex dtypes at all); the device sees stacked [Re; Im].
            x = np.asarray(x)
            was_vec = x.ndim == 1
            if was_vec:
                x = x[:, None]
            xr = np.concatenate([x.real, x.imag], axis=0)
            yr = np.asarray(self.apply_stacked(xr))
            mh = self.shape[0]
            y = (yr[:mh] + 1j * yr[mh:]).astype(self._io_dtype)
            return y[:, 0] if was_vec else y
        x = jnp.asarray(x)
        was_vec = x.ndim == 1
        if was_vec:
            x = x[:, None]
        y = self._apply_jit(self._params, x)
        return y[:, 0] if was_vec else y

    def apply_stacked(self, xr):
        """Device-resident apply in stacked-real form: (2n, r) -> (2m, r).

        For real_embed plans only — lets iterative solvers (GMRES sketches,
        scoring loops) stay on device across complex applies.
        """
        check(self.real_embed, "apply_stacked requires a real_embed plan")
        xr = jnp.asarray(xr)
        was_vec = xr.ndim == 1
        if was_vec:
            xr = xr[:, None]
        y = self._apply_jit(self._params, xr)
        return y[:, 0] if was_vec else y

    def matmat(self, X):
        """Batched multi-RHS apply (alias of __call__ for solver interop)."""
        return self(X)

    def materialize(self) -> np.ndarray:
        """Dense matrix of the packed op (for oracle tests)."""
        dt = self._io_dtype if self.real_embed else self.dtype
        return np.asarray(self(np.eye(self.shape[1], dtype=dt)))


@dataclasses.dataclass(frozen=True)
class _PlanMeta:
    """Static plan topology captured by the jit closure (hashable, no arrays)."""

    num_stages: int
    buf_sizes: tuple
    buf_tails: tuple
    out_size: int
    out_tail: int
    dtype: object
    gemm_meta: tuple  # ((read_buf, write_buf), ...)
    scale_meta: tuple


def _gather_windows(buf, starts, kp):
    """(B,) starts -> (B, kp, r) contiguous row windows of buf."""
    r = buf.shape[1]
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(buf, (s, jnp.int32(0)), (kp, r))
    )(starts)


def _scatter_add_windows(buf, starts, upd):
    """buf[starts[b]:starts[b]+mp] += upd[b] for every block b (overlaps
    accumulate; windows are in-bounds by the buffer-tail construction)."""
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,),
    )
    return jax.lax.scatter_add(
        buf, starts[:, None], upd, dnums,
        indices_are_sorted=False, unique_indices=False,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _apply_plan(meta: _PlanMeta, params, x: jnp.ndarray) -> jnp.ndarray:
    """The staged executor; all arrays arrive as traced jit arguments."""
    gemm_params, scale_params = params
    r = x.shape[1]
    dt = meta.dtype
    # buffers carry a zeroed tail (window slack + the scale zero/dump row)
    bufs: list = [None] * len(meta.buf_sizes)
    bufs[0] = jnp.concatenate(
        [x.astype(dt), jnp.zeros((meta.buf_tails[0], r), dtype=dt)], axis=0
    )
    out = jnp.zeros((meta.out_size + meta.out_tail, r), dtype=dt)

    for t in range(meta.num_stages):
        # allocate the NEXT intermediate buffer lazily as an accumulator
        if t + 1 < len(meta.buf_sizes) and bufs[t + 1] is None:
            bufs[t + 1] = jnp.zeros(
                (meta.buf_sizes[t + 1] + meta.buf_tails[t + 1], r), dtype=dt
            )
        for (read_buf, write_buf), (W, in_start, out_start) in zip(
            meta.gemm_meta, gemm_params
        ):
            if read_buf != t:
                continue
            kp = W.shape[2]
            g = _gather_windows(bufs[t], in_start, kp)  # (B, kp, r)
            y = jnp.einsum("bmk,bkr->bmr", W, g, preferred_element_type=dt)
            if write_buf == -1:
                out = _scatter_add_windows(out, out_start, y)
            else:
                bufs[write_buf] = _scatter_add_windows(
                    bufs[write_buf], out_start, y
                )
        for (read_buf, write_buf), (w, in_idx, out_idx) in zip(
            meta.scale_meta, scale_params
        ):
            if read_buf != t:
                continue
            vals = jnp.take(bufs[t], in_idx, axis=0) * w[:, None]
            if write_buf == -1:
                out = out.at[out_idx].add(vals)
            else:
                bufs[write_buf] = bufs[write_buf].at[out_idx].add(vals)
    return out[: meta.out_size]


def pack(op: L.LinOp, dtype=None, block_align: int = 128,
         real_embed: bool | None = None) -> StagePlan:
    """Compile a LinOp into its packed device plan."""
    return StagePlan(op, dtype=dtype, block_align=block_align,
                     real_embed=real_embed)
