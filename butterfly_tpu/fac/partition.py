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


def _extract_block_batches(plan_p, members, npad: int, complex_: bool,
                           col_budget: int = 1024):
    # col_budget 1024: the bucketed plan apply fails TPU compilation at
    # 2048 columns (compile-helper HTTP 500, a VMEM/tiling limit); 1024
    # compiles and keeps the basis batches reasonably wide.
    """(B, npad, npad) interleaved-real sub-blocks of the operator behind
    `plan_p` (a real_embed StagePlan), WITHOUT materializing the full dense
    matrix: basis columns for a few members at a time are pushed through
    the device apply and only each member's own row window is gathered out.

    This is what lets the partition plan scale past ~16k points — the full
    device materialization is O(N^2) HBM (68 GB at n=65536 complex), while
    the block batches are O(sum of block areas) (~GBs).

    Index bookkeeping: interleaved index j (row 2i = Re_i, 2i+1 = Im_i)
    maps to the stacked plan's index j//2 + (j%2)*half. Applying the
    stacked plan to the basis vector of stacked column index gives exactly
    the interleaved embedding's column (the [[Re,-Im],[Im,Re]] structure
    emerges from pure-real / pure-imaginary unit inputs).
    """
    import jax
    import jax.numpy as jnp

    if complex_:
        n2s, m2s = 2 * plan_p.shape[0], 2 * plan_p.shape[1]
    else:
        n2s, m2s = plan_p.shape
    half_in = m2s // 2
    half_out = n2s // 2

    def int2stk(j, half):
        return j // 2 + (j % 2) * half

    G = max(1, col_budget // npad)

    # three separate jitted steps, NOT one nested jit around the plan
    # apply: inlining the whole bucketed stage program into an outer jit
    # broke the remote TPU compiler (HTTP 500 in the compile helper)
    @jax.jit
    def make_basis(in_idx, in_ok):
        basis = jnp.zeros((m2s, in_idx.shape[0]), jnp.float32)
        return basis.at[in_idx, jnp.arange(in_idx.shape[0])].set(in_ok)

    @jax.jit
    def gather_rows(Y, out_idx, out_ok):
        Yg = Y.reshape(n2s, -1, npad).transpose(1, 0, 2)  # (G, n2s, npad)
        S = jax.vmap(lambda y, r: jnp.take(y, r, axis=0))(Yg, out_idx)
        return S * out_ok[:, :, None]

    def extract(params, in_idx, in_ok, out_idx, out_ok):
        Y = plan_p._apply_jit(params, make_basis(in_idx, in_ok))
        return gather_rows(Y, out_idx, out_ok)

    out = []
    ar = np.arange(npad)
    for g0 in range(0, len(members), G):
        grp = members[g0:g0 + G]
        in_idx = np.zeros((G, npad), np.int32)
        in_ok = np.zeros((G, npad), np.float32)
        out_idx = np.zeros((G, npad), np.int32)
        out_ok = np.zeros((G, npad), np.float32)
        for gi, b in enumerate(grp):
            jj = np.minimum(b.j0 + ar, m2s - 1)
            ii = np.minimum(b.i0 + ar, n2s - 1)
            in_idx[gi] = int2stk(jj, half_in) if complex_ else jj
            out_idx[gi] = int2stk(ii, half_out) if complex_ else ii
            in_ok[gi] = (ar < b.nc).astype(np.float32)
            out_ok[gi] = (ar < b.nr).astype(np.float32)
        S = extract(plan_p._params, jnp.asarray(in_idx.reshape(-1)),
                    jnp.asarray(in_ok.reshape(-1)), jnp.asarray(out_idx),
                    jnp.asarray(out_ok))
        out.append(S[: len(grp)])
    return jax.block_until_ready(jnp.concatenate(out, axis=0))


@dataclasses.dataclass
class _Blk:
    i0: int      # real row offset
    j0: int      # real col offset
    nr: int      # real rows (true)
    nc: int      # real cols (true)
    rmax: int = 0  # max unit rank of the source chain (pre-embedding)


def _size_classes(sizes, tiles):
    """Map each size to the smallest tile >= size (last tile = catch-all)."""
    out = []
    for s in sizes:
        for t in tiles:
            if s <= t:
                out.append(t)
                break
        else:
            raise InvalidArgumentsError(
                f"block size {s} exceeds largest tile {tiles[-1]}")
    return out


class PartitionPlan:
    """Executable partition apply. `params` is a pytree (pass it to the
    jitted `apply_with`); `apply(x)` is the convenience wrapper."""

    def __init__(self, op: LinOp, rank=None, rank_margin: int = 12,
                 dense_tiles=(64, 96, 128, 192, 256, 384, 512),
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
                check(not any(f.scales for f in c.factors),
                      "partition plan expects pure-GEMM chains")
                blk.rmax = max(
                    min(u.data.shape) for f in c.factors for u in f.gemms
                )
                bf_blks.append(blk)

        log_info("partition: %d dense blocks, %d butterfly blocks",
                 len(dense_blks), len(bf_blks))

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
                    _size_classes([b.nr for b, _ in dense_blks], dense_tiles),
                    _size_classes([b.nc for b, _ in dense_blks], dense_tiles),
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

        # ---- butterfly classes (sliced from the device materialization) --
        if bf_blks:
            plan_p = pack(op, block_align=64,
                          real_embed=True if self._complex else None)
            # full dense materialization is the fast path while it fits
            # HBM comfortably; past that, blocks are extracted batch-wise
            # through the device apply (O(sum of block areas) memory)
            full_ok = (self.n2 * self.m2 * 4
                       <= dense_materialize_limit_bytes)
            M = None
            if full_ok:
                M = materialize_on_device(plan_p, chunk=materialize_chunk)
                if self._complex:
                    M = stacked_to_interleaved(M)
                M = jax.block_until_ready(M)
            else:
                log_info("partition: blockwise extraction "
                         "(dense would be %.1f GB)",
                         self.n2 * self.m2 * 4 / 2**30)

            sizes = [max(b.nr, b.nc) for b in bf_blks]
            keys = _size_classes(sizes, bf_tiles)
            for cls in sorted(set(keys)):
                members = [b for b, k in zip(bf_blks, keys) if k == cls]
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
                        plan_p, members, npad, self._complex)
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
                         "dropped=%.2e", cls, B, NB_sub, rk,
                         dist.max_sv_discarded)
            del M

        self.params = params
        n2 = self.n2
        hp = jax.lax.Precision.HIGHEST

        def apply_with(params, x):
            """x: (n2, r) interleaved real, TREE index order."""
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
        self._apply_jit = jax.jit(apply_with)

    # -- conveniences ----------------------------------------------------

    def apply(self, x):
        import jax.numpy as jnp

        return self._apply_jit(self.params, jnp.asarray(x))

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
