"""Microbench: row gather/scatter vs coarse alternatives on the TPU, plus
device-f32 vs host-f64 distill accuracy on one partition class."""
import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from butterfly_tpu.utils.cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    n2, r = 8194, 1024
    x = jax.block_until_ready(
        jax.random.normal(jax.random.key(0), (n2, r), jnp.float32))
    _summ = jax.jit(lambda a: jnp.sum(a))

    def timer(name, fn, *args):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jfn(*args)
        jax.block_until_ready(out)
        c = time.perf_counter() - t0

        def rep(K):
            t = time.perf_counter()
            outs = [jfn(*args) for _ in range(int(K))]
            float(_summ(outs[-1][0] if isinstance(outs[-1], tuple)
                        else outs[-1]))
            return time.perf_counter() - t
        rep(2), rep(12)
        t1 = min(rep(2) for _ in range(3))
        t2 = min(rep(12) for _ in range(3))
        per = (t2 - t1) / 10
        log(f"  {name}: {per*1e3:.2f} ms (compile {c:.1f}s)")
        return per

    rng = np.random.default_rng(0)

    # --- 1. row gather, 218k rows (the current path) --------------------
    nrows = 218_000
    idx = jnp.asarray(rng.integers(0, n2, nrows), jnp.int32)
    timer("row gather 218k", lambda x, i: jnp.take(x, i, axis=0), x, idx)

    # --- 2. contiguous-chunk gather: 218k rows as 1700 chunks of 128 ----
    nch = nrows // 128
    starts = jnp.asarray(rng.integers(0, n2 - 128, nch), jnp.int32)

    def chunk_gather(x, st):
        def get(s):
            return jax.lax.dynamic_slice(x, (s, 0), (128, r))
        return jax.vmap(get)(st)

    timer("chunk gather 1700x128", chunk_gather, x, starts)

    # --- 2b. same via take with computed 2D index -----------------------
    def chunk_take(x, st):
        ii = st[:, None] + jnp.arange(128)[None, :]
        return jnp.take(x, ii.reshape(-1), axis=0).reshape(nch, 128, r)

    timer("chunk take(flat idx)", chunk_take, x, starts)

    # --- 3. row scatter-add 218k rows ------------------------------------
    vals = jax.block_until_ready(
        jax.random.normal(jax.random.key(1), (nrows, r), jnp.float32))

    def row_scatter(x, i, v):
        y = jnp.zeros((n2 + 1, r), jnp.float32)
        return y.at[i].add(v)

    timer("row scatter-add 218k", row_scatter, x, idx, vals)

    # --- 4. chunk scatter-add: 1700 chunks of 128 (at[2d].add) ----------
    vch = vals[:nch * 128].reshape(nch, 128, r)

    def chunk_scatter(st, v):
        y = jnp.zeros((n2 + 1, r), jnp.float32)
        ii = st[:, None] + jnp.arange(128)[None, :]
        return y.at[ii.reshape(-1)].add(v.reshape(-1, r))

    timer("chunk scatter(flat idx)", chunk_scatter, starts, vch)

    # --- 5. aligned cell gather: take on reshaped (cells, 128, r) -------
    xc = x[:8192].reshape(64, 128, r)
    cidx = jnp.asarray(rng.integers(0, 64, nch), jnp.int32)
    timer("aligned cell gather", lambda xc, i: jnp.take(xc, i, axis=0),
          xc, cidx)

    # --- 6. aligned cell scatter-add ------------------------------------
    def cell_scatter(i, v):
        y = jnp.zeros((65, 128, r), jnp.float32)
        return y.at[i].add(v)

    timer("aligned cell scatter", cell_scatter, cidx, vch)

    # --- 7. segment-sum assembly ----------------------------------------
    def seg(v, i):
        return jax.ops.segment_sum(v.reshape(-1, r),
                                   (i[:, None] * 128
                                    + jnp.arange(128)[None, :]).reshape(-1),
                                   num_segments=n2 + 1)

    timer("segment_sum 218k rows", seg, vch, starts)

    # ===== accuracy: device f32 distill vs host f64 =====================
    log("accuracy experiment:")
    from butterfly_tpu.fac.distill import (
        distill_butterfly, distill_butterfly_device)

    # butterfly-compressible test matrix: 1024x1024 oscillatory kernel
    npad, NB = 1024, 8
    t = (np.arange(npad) + 0.5) / npad
    s = (np.arange(npad) + 0.5) / npad
    Z = np.cos(2 * np.pi * 140 * np.outer(t, s)) / npad
    Zd = jnp.asarray(Z, jnp.float32)

    for rank in (64, 96):
        dd = distill_butterfly_device(Zd, NB, rank=rank)
        xs = rng.standard_normal((npad, 8)).astype(np.float32)
        got = np.asarray(dd.apply(xs), np.float64)
        want = Z[dd.row_perm] @ xs
        rel_dev = np.linalg.norm(got - want) / np.linalg.norm(want)
        dh = distill_butterfly(Z, NB, rank=rank)
        goth = np.asarray(dh.apply(xs), np.float64)
        wanth = Z[dh.row_perm] @ xs
        rel_host = np.linalg.norm(goth - wanth) / np.linalg.norm(wanth)
        log(f"  rank={rank}: device f32 rel={rel_dev:.2e}  "
            f"host f64 rel={rel_host:.2e}  "
            f"(dropped dev {dd.max_sv_discarded:.1e} "
            f"host {dh.max_sv_discarded:.1e})")


if __name__ == "__main__":
    main()
