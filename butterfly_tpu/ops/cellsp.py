"""Block-sparse cell matmul: the partition apply's assembly kernel.

The reference applies a multilevel partition by walking a recursive block
graph, one small zgemv per block (src/mat_block_dense.c:574-630). The first
TPU ports of that walk materialized per-block gathers and scatter-adds
through HBM; measured on a v5e, the index traffic alone cost 3-4x the
operator's own compute (14 ms of an 18 ms apply at n=4096) because every
gathered copy is written+reread and every scatter is a read-modify-write.

This kernel removes that traffic structurally instead of re-granularizing
it:

  * the OUTPUT lives in VMEM for the whole pass and is written to HBM
    exactly once per r-tile — there is no scatter;
  * each cell reads its input tile straight from the source buffer through
    a scalar-prefetched BlockSpec index map — there is no gathered copy;
    consecutive cells sharing a tile fetch it once (cells are sorted by
    source position);
  * weights stream through VMEM once (their own HBM read is the floor).

A *cell* is one contribution  y[dst : dst+GM] += W @ src[blk*GK : +GK]
(kind 0, a 128x128 MXU matmul) or  y[dst : dst+GM] += src[...] (kind 1, a
VPU add used to assemble butterfly-kernel outputs, including their
bit-reversal block permutation, without fake identity matmuls). `dst` is an
arbitrary 8-aligned row offset — callers place true (un-padded) block rows
by embedding the residual shift into the weight tile, so weights carry no
row-snapping inflation.

Multiple input buffers are supported (buffer 0 is x; buffers 1.. are
butterfly-class outputs): every buffer has its own carry-last index array,
so inactive buffers never re-DMA, and the kernel branches on the cell's
source id. Measured (scratch/cellproto.py, v5e): 23.4 TFLOP/s f32-HIGHEST
on a 3000-cell plan vs 6.6 for the einsum+scatter formulation — 0.73 of the
chip's dense f32-HP peak.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from butterfly_tpu.utils.errors import InvalidArgumentsError, check

__all__ = ["CellPlan", "GM", "GK"]

GM = 128  # output rows per cell
GK = 128  # input rows per cell (= source block granularity)

# Mosaic scoped-VMEM request (v5e/v5p have 128 MB physical VMEM).
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024
# resident-output budget: leave room for weight/x double buffering and the
# possibility of Mosaic holding two output windows across an r-tile flush
_OUT_BUDGET_BYTES = 40 * 1024 * 1024
# scalar-prefetch arrays live in SMEM (1 MB per core); budget half of it,
# counted in int32 elements across the (6 + n_bufs) per-cell arrays — a
# kernel over the full 65k plan (140k cells) wanted 3.8 MB of SMEM, so the
# plan splits into per-band-group SEGMENTS under this cap
_SEG_CELL_CAP = (512 * 1024) // 4


@dataclasses.dataclass
class Cell:
    """One contribution to the output.

    dst: output row offset (must be 0 mod 8).
    src_buf: input buffer index.
    src_blk: GK-row block index into that buffer.
    w: (GM, GK) float32 weight tile; None for a plain add (GM == GK); or
       ("dev", stack_id, tile_idx) referencing a tile of one of the
       device-resident stacks passed to CellPlan(dev_tiles=...) — used when
       weights are produced ON the device (fetching them to host first
       would crawl through this box's ~3 MB/s device->host tunnel).
    """

    dst: int
    src_buf: int
    src_blk: int
    w: "np.ndarray | tuple | None"


@dataclasses.dataclass(frozen=True)
class _CellMeta:
    n_out_pad: int
    n_bufs: int
    T: int
    r_tile: int
    n_bands: int
    band_rows: int   # Hb; each band block holds Hb + GM rows (overlap)
    interpret: bool
    precision: object


def _cell_kernel(meta: _CellMeta, *refs):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    nb = meta.n_bufs
    # prefetch refs: band, newband, dst, widx, src, kind, cc_0..cc_{nb-1}
    band_ref, newb_ref, dst_ref, widx_ref, src_ref, kind_ref = refs[0:6]
    del band_ref, widx_ref  # consumed by the index maps, not the body
    w_ref = refs[6 + nb]
    bufs = refs[7 + nb:7 + 2 * nb]
    o_ref = refs[-1]

    t = pl.program_id(1)

    @pl.when(newb_ref[t] == 1)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    # dst is band-local and stored divided by 8 so Mosaic can statically
    # prove the store offset is sublane-aligned (f32 sublane = 8 rows)
    d = dst_ref[t] * 8
    sb = src_ref[t]
    kind = kind_ref[t]
    for i in range(nb):
        @pl.when((sb == i) & (kind == 0))
        def _(i=i):
            acc = jnp.dot(
                w_ref[0], bufs[i][...],
                preferred_element_type=jnp.float32,
                precision=meta.precision,
            )
            o_ref[0, pl.ds(d, GM), :] += acc

        @pl.when((sb == i) & (kind == 1))
        def _(i=i):
            o_ref[0, pl.ds(d, GM), :] += bufs[i][...]


def _round_r(r_tile: int, r: int) -> int:
    """Padded r for a given block r_tile: narrow inputs stay narrow (one
    r_tile-sized or smaller tile) instead of padding to a full r_tile."""
    r_pad = -(-max(r, 128) // 128) * 128
    if r_pad > r_tile:
        r_pad = -(-r_pad // r_tile) * r_tile
    return r_pad


def _cell_call(meta: _CellMeta, r_pad: int):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = meta.n_bufs
    rt = min(meta.r_tile, r_pad)
    Hb = meta.band_rows

    def w_map(j, t, band, newb, dst, widx, src, kind, *ccs):
        return (widx[t], 0, 0)

    def buf_map(i):
        def m(j, t, band, newb, dst, widx, src, kind, *ccs):
            return (ccs[i][t], j)
        return m

    def o_map(j, t, band, newb, dst, widx, src, kind, *ccs):
        return (band[t], 0, j)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6 + nb,
        grid=(r_pad // rt, meta.T),
        in_specs=[pl.BlockSpec((1, GM, GK), w_map)]
        + [pl.BlockSpec((GK, rt), buf_map(i)) for i in range(nb)],
        out_specs=pl.BlockSpec((1, Hb + GM, rt), o_map),
    )
    compiler_params = None
    if not meta.interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        )
    import jax.numpy as jnp

    return pl.pallas_call(
        functools.partial(_cell_kernel, meta),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (meta.n_bands, Hb + GM, r_pad), jnp.float32),
        compiler_params=compiler_params,
        interpret=meta.interpret,
    )


def _apply_cells(seg_metas, meta: _CellMeta, params, bufs, r_pad: int):
    """bufs: list of (n_i_pad, r_pad) f32 arrays (pre-padded). Runs one
    kernel per segment (shared weight stack), concatenates the band
    outputs, folds the overlaps, and returns (n_out_pad, r_pad)."""
    import jax.numpy as jnp

    W = params["W"]
    outs = []
    for meta_s, seg in zip(seg_metas, params["segs"]):
        call = _cell_call(meta_s, r_pad)
        outs.append(call(*seg, W, *bufs))  # (n_bands_s, Hb + GM, r_pad)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    Hb, nB = meta.band_rows, meta.n_bands
    main = out[:, :Hb, :].reshape(nB * Hb, r_pad)
    if nB > 1:
        # fold each band's GM-row overlap tail into the next band's head
        idx = ((jnp.arange(1, nB)[:, None]) * Hb
               + jnp.arange(GM)[None, :]).reshape(-1)
        main = main.at[idx].add(out[:-1, Hb:, :].reshape(-1, r_pad))
    return main[: meta.n_out_pad]


class CellPlan:
    """Executable block-sparse cell program.

    buf_rows[i] gives the row count of input buffer i; each is padded up to
    a GK multiple by the caller (`pad_rows`). The output has `n_out` rows
    (padded internally; `apply` slices back).
    """

    def __init__(self, n_out: int, buf_rows, cells, r_tile: int | None = None,
                 interpret: bool | None = None, precision=None,
                 dev_tiles=None):
        import jax
        import jax.numpy as jnp

        check(len(cells) > 0, "CellPlan needs at least one cell",
              InvalidArgumentsError)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        prec = jax.lax.Precision(precision) if precision is not None else None
        dev_tiles = list(dev_tiles or [])

        self.n_out = n_out
        # +GM margin: a dst near the end may write into the pad rows;
        # member windows may also overhang the true output end
        n_out_pad = -(-(max([n_out] + [c.dst for c in cells]) + GM)
                      // GM) * GM
        if r_tile is None:
            r_tile = 512
        self.buf_rows = list(buf_rows)
        self.buf_rows_pad = [-(-b // GK) * GK for b in buf_rows]
        nb = len(buf_rows)

        # merge matmul cells landing on the same (dst, src) position —
        # adjacent blocks sharing a 128-boundary region produce them
        merged: dict = {}
        out: list = []
        for c in cells:
            if c.w is None or isinstance(c.w, tuple):
                out.append(c)
                continue
            key = (c.dst, c.src_buf, c.src_blk)
            if key in merged and not isinstance(out[merged[key]].w, tuple):
                prev = out[merged[key]]
                out[merged[key]] = Cell(c.dst, c.src_buf, c.src_blk,
                                        prev.w + c.w)
            else:
                merged[key] = len(out)
                out.append(c)
        cells = out

        # ---- output bands ------------------------------------------------
        # The resident band block is (Hb + GM, r_tile) f32; bands overlap
        # by GM rows so a cell never splits, and the overlap tails fold
        # into the next band after the kernel. Hb is bounded by BOTH the
        # VMEM budget and — via halving until no band holds more than
        # _SEG_CELL_CAP cells — the 1 MB SMEM that holds the scalar-
        # prefetch arrays (a 65k Helmholtz plan has 140k cells; one kernel
        # with all of them wanted 3.8 MB of SMEM).
        cap = max(GM, (_OUT_BUDGET_BYTES // (r_tile * 4) - GM) // GM * GM)
        Hb = min(cap, n_out_pad)
        seg_cap = _SEG_CELL_CAP // (6 + nb)
        while Hb > GM:
            counts: dict = {}
            nbands_try = -(-n_out_pad // Hb)
            for c in cells:
                b_ = min(c.dst // Hb, nbands_try - 1)
                counts[b_] = counts.get(b_, 0) + 1
            if max(counts.values()) <= seg_cap:
                break
            Hb = max(GM, (Hb // 2) // GM * GM)
        n_bands = -(-n_out_pad // Hb)

        # every band needs at least one cell (its first cell zero-inits the
        # resident block); give empty bands a zero filler
        covered = {min(c.dst // Hb, n_bands - 1) for c in cells}
        for b in range(n_bands):
            if b not in covered:
                cells.append(Cell(dst=b * Hb, src_buf=0, src_blk=0,
                                  w=np.zeros((GM, GK), np.float32)))

        # sort by (band, src_buf, src_blk) => bands are contiguous grid
        # runs (each output block is visited once) and within a band each
        # buffer's tiles stream in order, so consecutive same-tile cells
        # are fetched once
        order = sorted(
            range(len(cells)),
            key=lambda i: (min(cells[i].dst // Hb, n_bands - 1),
                           cells[i].src_buf, cells[i].src_blk))
        cells = [cells[i] for i in order]
        T = len(cells)
        band = np.empty(T, np.int32)
        newb = np.empty(T, np.int32)
        dst = np.empty(T, np.int32)
        src = np.empty(T, np.int32)
        kind = np.empty(T, np.int32)
        widx = np.empty(T, np.int32)
        ccs = np.zeros((nb, T), np.int32)
        wlist = []
        dev_refs = []  # (t, stack_id, tile_idx) resolved after host stack
        self._flops = 0
        for t, c in enumerate(cells):
            check(c.dst % 8 == 0, "cell dst must be 8-aligned",
                  InvalidArgumentsError)
            check(0 <= c.src_buf < nb, "cell src_buf out of range",
                  InvalidArgumentsError)
            check(c.dst + GM <= n_out_pad,
                  "cell dst beyond padded output", InvalidArgumentsError)
            check(
                (c.src_blk + 1) * GK <= self.buf_rows_pad[c.src_buf],
                "cell src_blk beyond padded buffer", InvalidArgumentsError)
            b_ = min(c.dst // Hb, n_bands - 1)
            band[t] = b_
            newb[t] = 1 if (t == 0 or band[t - 1] != b_) else 0
            # band-local dst, divided by 8 (kernel multiplies back so
            # Mosaic can prove sublane alignment)
            dst[t] = (c.dst - b_ * Hb) // 8
            src[t] = c.src_buf
            if c.w is None:
                kind[t] = 1
                widx[t] = widx[t - 1] if t else 0  # carry-last: no DMA
            elif isinstance(c.w, tuple):
                check(len(c.w) == 3 and c.w[0] == "dev",
                      "device tile ref must be ('dev', stack, idx)",
                      InvalidArgumentsError)
                kind[t] = 0
                dev_refs.append((t, c.w[1], c.w[2]))
                self._flops += 2 * GM * GK
            else:
                kind[t] = 0
                check(c.w.shape == (GM, GK), "weight tile must be (GM, GK)",
                      InvalidArgumentsError)
                widx[t] = len(wlist)
                wlist.append(np.asarray(c.w, np.float32))
                self._flops += 2 * GM * GK
            # carry-last per-buffer tile index
            for i in range(nb):
                ccs[i, t] = (c.src_blk if c.src_buf == i
                             else (ccs[i, t - 1] if t else 0))
        if not wlist:  # kernel requires a weight operand
            wlist.append(np.zeros((GM, GK), np.float32))
        Wh = np.stack(wlist)
        # resolve device tile refs: the final weight stack is
        # [host tiles | dev stack 0 | dev stack 1 | ...], concatenated on
        # the device so produced-on-device weights never visit the host
        stack_base = [Wh.shape[0]]
        for sdev in dev_tiles:
            check(sdev.ndim == 3 and sdev.shape[1:] == (GM, GK),
                  "dev_tiles stacks must be (n, GM, GK)",
                  InvalidArgumentsError)
            stack_base.append(stack_base[-1] + sdev.shape[0])
        for t, sid, tidx in dev_refs:
            check(0 <= sid < len(dev_tiles), "dev stack id out of range",
                  InvalidArgumentsError)
            check(0 <= tidx < dev_tiles[sid].shape[0],
                  "dev tile index out of range", InvalidArgumentsError)
            widx[t] = stack_base[sid] + tidx

        # ---- segments: consecutive band groups, each its own kernel call
        # with its own (SMEM-bounded) prefetch arrays; all segments share
        # the weight stack and their band outputs concatenate before the
        # overlap fold
        band_ranges = []  # per-band [t_start, t_end) in the sorted order
        t = 0
        for b in range(n_bands):
            ts = t
            while t < T and int(band[t]) == b:
                t += 1
            band_ranges.append((ts, t))  # non-empty (fillers guarantee)
        seg_bounds = []  # (t0, t1, b0, b1) half-open
        s0, bseg0, count = 0, 0, 0
        for b, (ts, te) in enumerate(band_ranges):
            if count and count + (te - ts) > seg_cap:
                seg_bounds.append((s0, ts, bseg0, b))
                s0, bseg0, count = ts, b, 0
            count += te - ts
        seg_bounds.append((s0, T, bseg0, n_bands))
        self._seg_metas = []
        seg_params = []
        for (s0, s1, bb0, bb1) in seg_bounds:
            Ts = s1 - s0
            self._seg_metas.append(_CellMeta(
                n_out_pad=n_out_pad, n_bufs=nb, T=Ts, r_tile=r_tile,
                n_bands=bb1 - bb0, band_rows=Hb,
                interpret=interpret, precision=prec,
            ))
            nb_arr = newb[s0:s1].copy()
            nb_arr[0] = 1
            seg_params.append((
                jnp.asarray(band[s0:s1] - bb0), jnp.asarray(nb_arr),
                jnp.asarray(dst[s0:s1]), jnp.asarray(widx[s0:s1]),
                jnp.asarray(src[s0:s1]), jnp.asarray(kind[s0:s1]),
            ) + tuple(jnp.asarray(ccs[i, s0:s1]) for i in range(nb)))

        self._meta = _CellMeta(
            n_out_pad=n_out_pad, n_bufs=nb, T=T, r_tile=r_tile,
            n_bands=n_bands, band_rows=Hb,
            interpret=interpret, precision=prec,
        )
        Wd = jnp.asarray(Wh)
        if dev_tiles:
            Wd = jnp.concatenate(
                [Wd] + [s.astype(jnp.float32) for s in dev_tiles], axis=0)
            dev_tiles.clear()  # free the pre-concat stacks (HBM transient)
        self.params = {"W": Wd, "segs": seg_params}
        self.num_cells = T
        self.num_segments = len(seg_bounds)
        self.num_matmul_cells = len(wlist) + len(dev_refs)
        self._nbytes = int(Wd.shape[0]) * GM * GK * 4

    # ---- functional apply (safe to close over meta inside jit) ----------

    def apply_padded(self, params, bufs, r_pad: int):
        """bufs already padded to (buf_rows_pad[i], r_pad); returns the
        padded output (n_out_pad, r_pad). Jit-friendly."""
        return _apply_cells(self._seg_metas, self._meta, params, bufs,
                            r_pad)

    def pad_rows(self, i: int, buf):
        import jax.numpy as jnp

        pad = self.buf_rows_pad[i] - buf.shape[0]
        return buf if pad == 0 else jnp.pad(buf, ((0, pad), (0, 0)))

    def round_r(self, r: int) -> int:
        return _round_r(self._meta.r_tile, r)

    def apply(self, bufs):
        """Convenience: takes unpadded bufs (n_i, r), returns (n_out, r)."""
        import jax.numpy as jnp

        r = bufs[0].shape[1]
        r_pad = self.round_r(r)
        padded = []
        for i, b in enumerate(bufs):
            b = self.pad_rows(i, b)
            if r_pad != r:
                b = jnp.pad(b, ((0, 0), (0, r_pad - r)))
            padded.append(b)
        y = self.apply_padded(self.params, padded, r_pad)
        return y[: self.n_out, :r]

    def flops_per_col(self) -> int:
        return self._flops

    def nbytes(self) -> int:
        return self._nbytes


def cells_from_dense_block(W, i0: int, j0: int, out_cells: list) -> None:
    """Decompose one dense block (nr, nc) at row/col offset (i0, j0) into
    GM x GK cells appended to `out_cells`. The sub-8 row shift is embedded
    into the weight tiles, so `dst` stays 8-aligned with at most 7 rows of
    zero padding — no 128-row snapping inflation."""
    W = np.asarray(W, np.float32)
    nr, nc = W.shape
    shift_r = i0 % 8
    dst0 = i0 - shift_r
    c0 = j0 // GK
    shift_c = j0 % GK
    nrch = -(-(shift_r + nr) // GM)
    ncch = -(-(shift_c + nc) // GK)
    P = np.zeros((nrch * GM, ncch * GK), np.float32)
    P[shift_r:shift_r + nr, shift_c:shift_c + nc] = W
    for rch in range(nrch):
        for cch in range(ncch):
            tile = P[rch * GM:(rch + 1) * GM, cch * GK:(cch + 1) * GK]
            if not tile.any():
                continue
            out_cells.append(Cell(dst=dst0 + rch * GM, src_buf=0,
                                  src_blk=c0 + cch, w=tile))
