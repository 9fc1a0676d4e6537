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


def _flatten(op: L.LinOp, i0: int, j0: int, chains: list[_Chain],
             scale: complex | float = 1.0) -> None:
    """Flatten into chains (multi-stage leaf paths positioned at (i0, j0))."""
    if isinstance(op, L.Scaled):
        _flatten(op.op, i0, j0, chains, scale * op.alpha)
    elif isinstance(op, L.Product):
        factors = [f for f in reversed(op.factors)]  # application order
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
    weights: jnp.ndarray  # (B, m, k) padded
    in_idx: jnp.ndarray  # (B, k) int32 into read buffer (pad -> zero slot)
    out_idx: jnp.ndarray  # (B, m) int32 into write buffer (pad -> dump slot)
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
    """Executable packed form of a LinOp: buffers + bucketed stages."""

    def __init__(self, op: L.LinOp, dtype=None, block_align: int = 128):
        m, n = op.shape
        self.shape = (m, n)
        if dtype is None:
            dtype = (
                jnp.complex64 if np.issubdtype(op.dtype, np.complexfloating)
                else jnp.float32
            )
        self.dtype = jnp.dtype(dtype)

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
        self.buf_sizes = buf_sizes
        self.out_size = m

        # Collect units with global indices, keyed for bucketing.
        gemm_groups: dict[tuple, list] = {}
        scale_groups: dict[tuple, list] = {}
        for c, offs in zip(chains, chain_offsets):
            last = len(c.factors) - 1
            for t, f in enumerate(c.factors):
                in_base = offs[t]
                write_buf = -1 if t == last else t + 1
                out_base = c.i0 if t == last else offs[t + 1]
                for u in f.gemms:
                    mm, kk = u.data.shape
                    key = (
                        t,
                        write_buf,
                        _round_up(mm, block_align),
                        _round_up(kk, block_align),
                    )
                    gemm_groups.setdefault(key, []).append(
                        (u.data, in_base + u.in_off, out_base + u.out_off)
                    )
                for u in f.scales:
                    key = (t, write_buf)
                    scale_groups.setdefault(key, []).append(
                        (u.weights, in_base + u.in_idx, out_base + u.out_idx)
                    )

        # Materialize buckets (device arrays). Padded gather rows point at a
        # trailing zero slot of the read buffer; padded scatter rows point at
        # a trailing dump slot of the write buffer.
        self._gemm_buckets: list[_GemmBucket] = []
        self._scale_buckets: list[_ScaleBucket] = []
        useful = 0
        padded = 0
        weight_bytes = 0
        for (t, wb, mp, kp), units in sorted(gemm_groups.items()):
            B = len(units)
            W = np.zeros((B, mp, kp), dtype=self.dtype)
            in_idx = np.full((B, kp), self._zero_slot(t), dtype=np.int32)
            out_idx = np.full((B, mp), self._dump_slot(wb), dtype=np.int32)
            fl = 0
            for b, (data, jbase, ibase) in enumerate(units):
                mm, kk = data.shape
                W[b, :mm, :kk] = data
                in_idx[b, :kk] = np.arange(jbase, jbase + kk)
                out_idx[b, :mm] = np.arange(ibase, ibase + mm)
                fl += 2 * mm * kk
            useful += fl
            padded += 2 * B * mp * kp
            weight_bytes += W.nbytes
            self._gemm_buckets.append(
                _GemmBucket(
                    jnp.asarray(W), jnp.asarray(in_idx), jnp.asarray(out_idx),
                    t, wb, fl,
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
            out_size=self.out_size,
            dtype=self.dtype,
            gemm_meta=tuple(
                (b.read_buf, b.write_buf) for b in self._gemm_buckets
            ),
            scale_meta=tuple(
                (b.read_buf, b.write_buf) for b in self._scale_buckets
            ),
        )
        self._params = (
            [(b.weights, b.in_idx, b.out_idx) for b in self._gemm_buckets],
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
        x = jnp.asarray(x)
        was_vec = x.ndim == 1
        if was_vec:
            x = x[:, None]
        y = self._apply_jit(self._params, x)
        return y[:, 0] if was_vec else y

    def materialize(self) -> np.ndarray:
        """Dense matrix of the packed op (for oracle tests)."""
        return np.asarray(self(jnp.eye(self.shape[1], dtype=self.dtype)))


@dataclasses.dataclass(frozen=True)
class _PlanMeta:
    """Static plan topology captured by the jit closure (hashable, no arrays)."""

    num_stages: int
    buf_sizes: tuple
    out_size: int
    dtype: object
    gemm_meta: tuple  # ((read_buf, write_buf), ...)
    scale_meta: tuple


def _apply_plan(meta: _PlanMeta, params, x: jnp.ndarray) -> jnp.ndarray:
    """The staged executor; all arrays arrive as traced jit arguments."""
    gemm_params, scale_params = params
    r = x.shape[1]
    dt = meta.dtype
    zero_row = jnp.zeros((1, r), dtype=dt)
    # buffers[t] has a trailing zero/dump slot row
    bufs: list = [None] * len(meta.buf_sizes)
    bufs[0] = jnp.concatenate([x.astype(dt), zero_row], axis=0)
    out = jnp.zeros((meta.out_size + 1, r), dtype=dt)

    for t in range(meta.num_stages):
        # allocate the NEXT intermediate buffer lazily as an accumulator
        if t + 1 < len(meta.buf_sizes) and bufs[t + 1] is None:
            bufs[t + 1] = jnp.zeros((meta.buf_sizes[t + 1] + 1, r), dtype=dt)
        for (read_buf, write_buf), (W, in_idx, out_idx) in zip(
            meta.gemm_meta, gemm_params
        ):
            if read_buf != t:
                continue
            g = jnp.take(bufs[t], in_idx, axis=0)  # (B, k, r)
            y = jnp.einsum("bmk,bkr->bmr", W, g, preferred_element_type=dt)
            B, mp, _ = W.shape
            upd = y.reshape(B * mp, r)
            idx = out_idx.reshape(B * mp)
            if write_buf == -1:
                out = out.at[idx].add(upd)
            else:
                bufs[write_buf] = bufs[write_buf].at[idx].add(upd)
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
    return out[:-1]


def pack(op: L.LinOp, dtype=None, block_align: int = 128) -> StagePlan:
    """Compile a LinOp into its packed device plan."""
    return StagePlan(op, dtype=dtype, block_align=block_align)
