"""Partition-aware device apply for multilevel (HODLR-butterfly) operators.

The reference's multilevel Helmholtz factorization is a recursive partition
(facHelm2MakeMultilevel_rec, src/fac_helm2.c:806-941): dense blocks where
target and source overlap, single butterflies where they are separated.
Its apply walks that recursive graph one tiny zgemv at a time
(src/mat_block_dense.c:574-630) — and a direct port of that walk to the TPU
is gather/scatter-bound (measured: 0.03 of the op's speed of light through
the generic bucketed StagePlan).

A SELF-interaction operator cannot be distilled into one uniform butterfly
(near-diagonal blocks are not complementary-low-rank — exactly why the
reference partitions), so this module compiles the partition itself into a
fixed, shallow device program:

  1. flatten the operator into positioned chains (ops/packed.py _flatten);
  2. dense (near-field) chains: pad into 2-3 canonical tile classes and
     upload as one batched (B, m, k) GEMM per class — the weights are the
     chains' own host arrays, interleaved-real-embedded if complex;
  3. butterfly (product) chains: pad into canonical square classes, slice
     each block from a dense DEVICE materialization of the operator
     (fac/uniformize.py materialize_on_device — no host round trip),
     zero-mask the padding, and batch-distill every class into ONE
     UniformButterfly (fac/distill.py distill_butterfly_device with a
     batch: independent blocks concatenate along the `hi` axis);
  4. apply = per class: one row gather of x, one batched GEMM or one
     einsum butterfly apply, one scatter-add into y (+1 dump row for
     padding). Everything else is static-shape MXU work inside one jit.

Complex operators ride the interleaved 2x2 real embedding throughout
(row/col 2i = Re_i, 2i+1 = Im_i), so a complex chain block at complex
offset (i0, j0) occupies real rows [2*i0, 2*i0+2nr) — contiguity survives.
"""

from __future__ import annotations

import dataclasses
import functools


import numpy as np

from butterfly_tpu.ops import packed as packed_mod
from butterfly_tpu.ops.linop import LinOp
from butterfly_tpu.utils.errors import InvalidArgumentsError, check
from butterfly_tpu.utils.logging import log_info

__all__ = ["PartitionPlan", "partition_apply_plan"]


def _interleave_embed(Z: np.ndarray) -> np.ndarray:
    """(2m, 2k) interleaved real embedding of a complex (m, k) block."""
    m, k = Z.shape
    R = np.empty((2 * m, 2 * k), np.float32)
    R[0::2, 0::2] = Z.real
    R[0::2, 1::2] = -Z.imag
    R[1::2, 0::2] = Z.imag
    R[1::2, 1::2] = Z.real
    return R


def _materialize_chain(chain) -> np.ndarray:
    """Dense (nr, nc) matrix of one positioned chain: multiply its pure-GEMM
    factors on the host (f64/c128 BLAS). A butterfly chain's factors are
    each a few small blocks, so this costs exactly the block's own flops —
    no basis columns are pushed through the whole operator."""
    cur = None
    for f in chain.factors:
        dts = [u.data.dtype for u in f.gemms] + [
            u.weights.dtype for u in f.scales]
        dt = np.result_type(*dts) if dts else np.float64
        out = np.zeros((f.out_dim, f.in_dim), dt)
        for u in f.gemms:
            d = np.asarray(u.data)
            out[u.out_off:u.out_off + d.shape[0],
                u.in_off:u.in_off + d.shape[1]] += d
        for u in f.scales:
            # ScaleUnits (Identity/Diag/Perm) are scatter-scaled entries
            out[u.out_idx, u.in_idx] += u.weights
        cur = out if cur is None else out @ cur
    return cur


def _extract_block_batches(members, npad: int, complex_: bool):
    """(B, npad, npad) interleaved-real block batch for one butterfly
    class, WITHOUT materializing the full dense operator: each member's
    chain is multiplied out on the host at its own (small) cost and
    embedded/padded in place. This is what lets the partition plan scale
    past ~16k points — a full device materialization is O(N^2) HBM (68 GB
    at n=65536 complex), while the block batches are O(sum of block areas).
    Upload is cheap on this box (~500 MB/s); it is device->host fetches
    that are slow, and this path performs none."""
    import jax
    import jax.numpy as jnp

    W = np.zeros((len(members), npad, npad), np.float32)
    for bi, b in enumerate(members):
        Z = _materialize_chain(b.chain)
        Zr = _interleave_embed(Z) if complex_ else np.asarray(Z, np.float32)
        W[bi, :Zr.shape[0], :Zr.shape[1]] = Zr
    return jax.block_until_ready(jnp.asarray(W))


@dataclasses.dataclass
class _Blk:
    i0: int      # real row offset
    j0: int      # real col offset
    nr: int      # real rows (true)
    nc: int      # real cols (true)
    rmax: int = 0  # max unit rank of the source chain (pre-embedding)
    chain: object = None  # the positioned factor chain (for materialization)


def _size_classes(sizes, tiles, extend: bool = False):
    """Map each size to the smallest tile >= size. With extend=True, sizes
    beyond the last tile get a synthesized tile (next multiple of 128) —
    used for dense classes, where a batched GEMM works at any size; the
    butterfly tile list stays closed (oversized blocks take the per-block
    stage-plan path instead)."""
    out = []
    for s in sizes:
        for t in tiles:
            if s <= t:
                out.append(t)
                break
        else:
            if extend:
                # 128-grain: big near-field fallback blocks dominate device
                # bytes (7.2 GB logged at 65k with 512-grain padding); finer
                # tiles halve the padding at the cost of a few more classes
                out.append(-(-s // 128) * 128)
            else:
                raise InvalidArgumentsError(
                    f"block size {s} exceeds largest tile {tiles[-1]}")
    return out


class PartitionPlan:
    """Executable partition apply. `params` is a pytree (pass it to the
    jitted `apply_with`); `apply(x)` is the convenience wrapper."""

    def __init__(self, op: LinOp, rank=None, rank_margin: int = 12,
                 dense_tiles=(64, 96, 128, 192, 256, 384, 512, 768, 1024,
                              1536, 2048, 3072, 4096),
                 bf_tiles=(256, 512, 1024),
                 materialize_chunk: int = 256,
                 dense_materialize_limit_bytes: int = 2 << 30):
        import jax
        import jax.numpy as jnp

        from butterfly_tpu.fac.distill import (
            _row_perm_for,
            distill_butterfly_device,
            stacked_to_interleaved,
        )
        from butterfly_tpu.fac.uniformize import materialize_on_device
        from butterfly_tpu.ops.packed import pack

        self._complex = bool(np.issubdtype(op.dtype, np.complexfloating))
        mul = 2 if self._complex else 1
        n_c, m_c = op.shape
        self.shape = (n_c, m_c)
        self.n2, self.m2 = n_c * mul, m_c * mul

        chains: list = []
        packed_mod._flatten(op, 0, 0, chains)
        dense_blks: list[tuple[_Blk, np.ndarray]] = []
        bf_blks: list[_Blk] = []
        for c in chains:
            nr_c = c.factors[-1].out_dim
            nc_c = c.factors[0].in_dim
            blk = _Blk(mul * c.i0, mul * c.j0, mul * nr_c, mul * nc_c)
            f0 = c.factors[0]
            # the offset guard keeps a single-GEMM unit sitting at a nonzero
            # offset (a block operator with one dense sub-block) out of the
            # dense fast path, where its placement would be dropped
            if (len(c.factors) == 1 and len(f0.gemms) == 1 and not f0.scales
                    and f0.gemms[0].in_off == 0 and f0.gemms[0].out_off == 0):
                Z = f0.gemms[0].data
                W = (_interleave_embed(Z) if self._complex
                     else np.asarray(Z, np.float32))
                dense_blks.append((blk, W))
            else:
                # unit rank proxy: min dim for GEMMs, entry count for scale
                # units (a ScaleUnit is a scaled sub-permutation, rank = L)
                blk.rmax = max(
                    [min(u.data.shape) for f in c.factors for u in f.gemms]
                    + [u.weights.size for f in c.factors for u in f.scales]
                )
                blk.chain = c
                bf_blks.append(blk)

        # oversized butterfly blocks (top partition levels are ~N/4 wide —
        # far beyond the largest distill tile) each apply through their OWN
        # packed stage plan with index-mapped gather/scatter; the chain's
        # product structure is preserved, nothing is densified
        mega_blks = [b for b in bf_blks if max(b.nr, b.nc) > bf_tiles[-1]]
        bf_blks = [b for b in bf_blks if max(b.nr, b.nc) <= bf_tiles[-1]]
        if mega_blks:
            log_info("partition: %d oversized butterfly blocks apply via "
                     "their own stage plans", len(mega_blks))

        # butterfly blocks whose distill rank would hit the npad//2 cap
        # cannot actually compress at their class size — distilling them
        # anyway silently truncates (measured ~2e-6 rel err at high
        # wavenumber). Route those to the dense classes: a batched GEMM at
        # full rank is both exact and faster than a fake butterfly.
        if bf_blks:
            keys0 = _size_classes([max(b.nr, b.nc) for b in bf_blks],
                                  bf_tiles)
            keep = []
            for b, npad0 in zip(bf_blks, keys0):
                if rank is None and (mul * b.rmax + rank_margin
                                     >= npad0 // 2):
                    Z = _materialize_chain(b.chain)
                    W = (_interleave_embed(Z) if self._complex
                         else np.asarray(Z, np.float32))
                    dense_blks.append((b, W))
                else:
                    keep.append(b)
            if len(keep) != len(bf_blks):
                log_info("partition: %d uncompressible butterfly blocks "
                         "routed to dense classes",
                         len(bf_blks) - len(keep))
            bf_blks = keep

        log_info("partition: %d dense blocks, %d butterfly blocks",
                 len(dense_blks), len(bf_blks))

        def _hbm_mb():
            try:
                st = jax.local_devices()[0].memory_stats()
                return st.get("bytes_in_use", 0) / 1e6
            except Exception:
                return -1.0

        params = {"dense": [], "bf": []}
        self._bf_meta = []
        self._bf_fns = []  # static fused-kernel apply fns, one per class
        self._flops = 0
        self._nbytes = 0
        dump = self.n2  # scatter target for padded output rows

        # ---- dense classes (weights come straight from the host chains) --
        if dense_blks:
            keys = [
                (mt, kt)
                for (b, _), mt, kt in zip(
                    dense_blks,
                    _size_classes([b.nr for b, _ in dense_blks],
                                  dense_tiles, extend=True),
                    _size_classes([b.nc for b, _ in dense_blks],
                                  dense_tiles, extend=True),
                )
            ]
            for cls in sorted(set(keys)):
                mt, kt = cls
                members = [dw for dw, k in zip(dense_blks, keys) if k == cls]
                B = len(members)
                W = np.zeros((B, mt, kt), np.float32)
                in_idx = np.full((B, kt), self.m2, np.int32)
                out_idx = np.full((B, mt), dump, np.int32)
                for bi, (blk, Wb) in enumerate(members):
                    W[bi, :blk.nr, :blk.nc] = Wb
                    in_idx[bi, :blk.nc] = blk.j0 + np.arange(blk.nc)
                    out_idx[bi, :blk.nr] = blk.i0 + np.arange(blk.nr)
                params["dense"].append((
                    jnp.asarray(W),
                    jnp.asarray(np.minimum(in_idx, self.m2 - 1)),
                    jnp.asarray(out_idx),
                ))
                self._flops += 2 * B * mt * kt
                self._nbytes += W.nbytes
                log_info("partition: dense class %s x%d", cls, B)
            log_info("partition: dense classes resident, HBM %.0f MB",
                     _hbm_mb())

        # ---- butterfly classes (sliced from the device materialization) --
        if bf_blks:
            # full dense materialization is the fast path while it fits
            # HBM comfortably; past that, each block's chain is multiplied
            # out host-side (O(sum of block areas) memory, no device fetch)
            full_ok = (self.n2 * self.m2 * 4
                       <= dense_materialize_limit_bytes)
            M = None
            if full_ok:
                plan_p = pack(op, block_align=64,
                              real_embed=True if self._complex else None)
                M = materialize_on_device(plan_p, chunk=materialize_chunk)
                if self._complex:
                    M = stacked_to_interleaved(M)
                M = jax.block_until_ready(M)
            else:
                log_info("partition: host chain materialization "
                         "(dense would be %.1f GB)",
                         self.n2 * self.m2 * 4 / 2**30)

            sizes = [max(b.nr, b.nc) for b in bf_blks]
            keys = _size_classes(sizes, bf_tiles)
            class_groups = []
            for cls in sorted(set(keys)):
                cls_members = [b for b, k in zip(bf_blks, keys) if k == cls]
                # chunk a class so its (B, npad, npad) batch and the device
                # distillation's intermediates stay ~1 GB (a 65k-point run
                # RESOURCE_EXHAUSTED with one multi-thousand-member batch)
                gmax = max(1, (1 << 30) // (cls * cls * 4))
                for g0 in range(0, len(cls_members), gmax):
                    class_groups.append((cls, cls_members[g0:g0 + gmax]))
            for cls, members in class_groups:
                B = len(members)
                npad = cls
                NB_sub = max(2, npad // 128)
                if M is not None:
                    # slice + zero-mask each member into the padded batch
                    r_off = jnp.asarray([b.i0 for b in members], jnp.int32)
                    c_off = jnp.asarray([b.j0 for b in members], jnp.int32)
                    r_len = jnp.asarray([b.nr for b in members], jnp.int32)
                    c_len = jnp.asarray([b.nc for b in members], jnp.int32)

                    @jax.jit
                    def _slice_batch(M, r_off, c_off, r_len, c_len):
                        ar = jnp.arange(npad)
                        ri = jnp.minimum(r_off[:, None] + ar[None, :],
                                         M.shape[0] - 1)
                        ci = jnp.minimum(c_off[:, None] + ar[None, :],
                                         M.shape[1] - 1)
                        S = M[ri[:, :, None], ci[:, None, :]]
                        mask = ((ar[None, :, None] < r_len[:, None, None])
                                & (ar[None, None, :] < c_len[:, None, None]))
                        return jnp.where(mask, S, 0.0)

                    Mb = _slice_batch(M, r_off, c_off, r_len, c_len)
                else:
                    Mb = _extract_block_batches(
                        members, npad, self._complex)
                if rank is None:
                    # embedded rank = mul x the fac's own max block rank,
                    # plus margin for the distill's coarser pairings
                    # (margin 32 measured dropped ~1e-7 — an order tighter
                    # than the fac's own 1e-6 grade; 12 trades that slack
                    # for ~2x fewer level flops at these small MXU tiles)
                    rmax = max(b.rmax for b in members)
                    rk = min(mul * rmax + rank_margin, npad // 2)
                    rk = max(8, (rk + 7) // 8 * 8)
                else:
                    rk = rank
                dist = distill_butterfly_device(Mb, NB_sub, rank=rk)
                bs = npad // NB_sub
                sub_perm = _row_perm_for(NB_sub, bs)
                in_idx = np.minimum(
                    np.concatenate([b.j0 + np.arange(npad) for b in members]),
                    self.m2 - 1).astype(np.int32)
                out_idx = np.concatenate([
                    np.where(sub_perm < b.nr, b.i0 + sub_perm, dump)
                    for b in members
                ]).astype(np.int32)
                # the class applies through the fused Pallas kernel: all
                # levels back-to-back in VMEM, one HBM pass per group —
                # measured ~2x over per-level einsums at these small ranks
                from butterfly_tpu.ops.pallas_butterfly import (
                    FusedButterflyPlan,
                    _apply_fused,
                )

                fplan = FusedButterflyPlan(dist.bf, fuse=8, r_tile=256)
                self._bf_fns.append(
                    functools.partial(_apply_fused, fplan._meta))
                params["bf"].append((
                    fplan._params, jnp.asarray(in_idx),
                    jnp.asarray(out_idx)))
                self._bf_meta.append(
                    {"cls": cls, "B": B, "NB_sub": NB_sub, "rank": rk,
                     "dropped": dist.max_sv_discarded,
                     "sigma": dist.sigma_max})
                self._flops += dist.bf.flops_per_col()
                self._nbytes += dist.bf.nbytes()
                log_info("partition: bf class %d x%d NB=%d rank=%d "
                         "dropped=%.2e (HBM %.0f MB)", cls, B, NB_sub, rk,
                         dist.max_sv_discarded, _hbm_mb())
            del M

        # ---- oversized butterfly blocks: one packed stage plan each ------
        self._mega = []
        if mega_blks:
            from butterfly_tpu.ops.linop import Scaled as _Scaled

            for b in mega_blks:
                c = b.chain
                check(c is not None and c.src is not None,
                      "oversized block lost its source operator")
                sub = (c.src if c.src_scale == 1.0
                       else _Scaled(c.src_scale, c.src))
                sp = pack(sub, real_embed=True if self._complex else None,
                          precision="highest")
                nr_c, nc_c = sub.shape
                if self._complex:
                    # interleaved global index <-> the sub-plan's stacked
                    # [Re; Im] layout
                    in_idx = np.concatenate([
                        b.j0 + 2 * np.arange(nc_c),
                        b.j0 + 2 * np.arange(nc_c) + 1])
                    out_idx = np.concatenate([
                        b.i0 + 2 * np.arange(nr_c),
                        b.i0 + 2 * np.arange(nr_c) + 1])
                else:
                    in_idx = b.j0 + np.arange(nc_c)
                    out_idx = b.i0 + np.arange(nr_c)
                self._mega.append((sp, jnp.asarray(in_idx, jnp.int32),
                                   jnp.asarray(out_idx, jnp.int32)))
                self._flops += 2 * sp.stats.padded_flops_per_col
                self._nbytes += sp.stats.weight_bytes

        self.params = params
        n2 = self.n2
        hp = jax.lax.Precision.HIGHEST
        has_mega = bool(self._mega)

        def apply_with(params, x):
            """x: (n2, r) interleaved real, TREE index order. Covers the
            tiled classes only — plans with oversized blocks must go
            through apply()/apply_device (their sub-plans cannot be nested
            in an outer jit: the remote TPU compiler rejects the combined
            program)."""
            check(not has_mega,
                  "this plan has oversized blocks; use apply()/"
                  "apply_device(), not the jittable apply_with")
            y = jnp.zeros((n2 + 1, x.shape[1]), x.dtype)
            for W, in_idx, out_idx in params["dense"]:
                xa = jnp.take(x, in_idx.reshape(-1), axis=0).reshape(
                    in_idx.shape[0], in_idx.shape[1], x.shape[1])
                ya = jnp.einsum("bmk,bkr->bmr", W, xa, precision=hp)
                y = y.at[out_idx.reshape(-1)].add(
                    ya.reshape(-1, x.shape[1]))
            for fn, (bfp, in_idx, out_idx) in zip(
                    self._bf_fns, params["bf"]):
                xa = jnp.take(x, in_idx, axis=0)
                ya = fn(bfp, xa)
                y = y.at[out_idx].add(ya)
            return y[:n2]

        def tiled_with(params, x):
            y = jnp.zeros((n2 + 1, x.shape[1]), x.dtype)
            for W, in_idx, out_idx in params["dense"]:
                xa = jnp.take(x, in_idx.reshape(-1), axis=0).reshape(
                    in_idx.shape[0], in_idx.shape[1], x.shape[1])
                ya = jnp.einsum("bmk,bkr->bmr", W, xa, precision=hp)
                y = y.at[out_idx.reshape(-1)].add(
                    ya.reshape(-1, x.shape[1]))
            for fn, (bfp, in_idx, out_idx) in zip(
                    self._bf_fns, params["bf"]):
                xa = jnp.take(x, in_idx, axis=0)
                ya = fn(bfp, xa)
                y = y.at[out_idx].add(ya)
            return y[:n2]

        self.apply_with = apply_with
        self._apply_jit = jax.jit(tiled_with)
        self._gather = jax.jit(
            lambda x, idx: jnp.take(x, idx, axis=0))
        self._scatter_add = jax.jit(
            lambda y, idx, v: y.at[idx].add(v.astype(y.dtype)))

    # -- conveniences ----------------------------------------------------

    def apply_device(self, x):
        """Full apply as device arrays: the tiled-class jit plus each
        oversized block's own stage plan (composed at the Python level —
        dispatches pipeline; only the final consumer synchronizes)."""
        import jax.numpy as jnp

        x = jnp.asarray(x)
        y = self._apply_jit(self.params, x)
        for sp, in_idx, out_idx in self._mega:
            ys = sp._apply_jit(sp._params, self._gather(x, in_idx))
            y = self._scatter_add(y, out_idx, ys)
        return y

    def apply(self, x):
        return self.apply_device(x)

    def apply_complex(self, Z):
        """Complex (n, r) in, complex (n, r) out (host convenience)."""
        import numpy as _np

        Z = _np.asarray(Z)
        x = _np.empty((2 * Z.shape[0], Z.shape[1]), _np.float32)
        x[0::2], x[1::2] = Z.real, Z.imag
        y = _np.asarray(self.apply(x), dtype=_np.float64)
        return y[0::2] + 1j * y[1::2]

    def flops_per_col(self) -> int:
        """Executed (padded) flops per RHS column of the device program."""
        return self._flops

    def nbytes(self) -> int:
        return self._nbytes


def partition_apply_plan(op: LinOp, rank=None, **kw) -> PartitionPlan:
    """Compile a multilevel partition operator (e.g. fac/helm2.py
    make_multilevel output) into its batched device apply."""
    return PartitionPlan(op, rank=rank, **kw)
