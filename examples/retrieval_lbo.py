"""Deep butterfly retrieval on a REAL LBO eigenvector table at scale.

VERDICT r2 item 4: demonstrate the deep table on its claimed home turf — a
real Laplace-Beltrami eigenvector matrix (the reference's own compression
workload: src/lbo.c:70-150, examples/lbo/bf_lbo.c:343-348) at n >= 65k —
and score it through the fused/batched device apply at >= 10k queries/s.

Pipeline:
  icosphere(7) mesh (163,842 verts) -> FEM LBO -> k lowest eigenvectors
  -> octree row order (the reference's bf_lbo row-tree choice)
  -> three formats, all recall-checked against exact dense scoring:
       one_level   compress_table          (uniform blocked SVD)
       deep        compress_table_deep     (streamer -> packed StagePlan)
       deep_fused  distill -> fused Pallas (uniform FFT form)

Usage:
  python examples/retrieval_lbo.py --phi /tmp/lbo_phi1024.npy \
      --out RETRIEVAL_r03.json            # on the TPU box
  python examples/retrieval_lbo.py --synthetic --interpret   # CPU smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(fn, k1, k2, reps=3):
    fn(k1), fn(k2)
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); fn(k1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fn(k2); t2s.append(time.perf_counter() - t0)
    return (np.median(t2s) - np.median(t1s)) / (k2 - k1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phi", default=None, help=".npy eigenvector matrix")
    ap.add_argument("--subdiv", type=int, default=7)
    ap.add_argument("--num-eigs", type=int, default=1024)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--rank-one-level", type=int, default=48)
    ap.add_argument("--rank-fused", type=int, default=None)
    ap.add_argument("--exact-topk", action="store_true",
                    help="exact lax.top_k instead of TPU approx_max_k")
    ap.add_argument("--deep-tol", type=float, default=1e-3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--synthetic", action="store_true",
                    help="small DCT table instead of the LBO solve (CPU CI)")
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode (CPU)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    from butterfly_tpu.fac.distill import distill_butterfly
    from butterfly_tpu.models.retrieval import (
        compress_table,
        compress_table_deep,
        recall_at_k,
    )
    from butterfly_tpu.ops.pallas_butterfly import FusedButterflyPlan
    from butterfly_tpu.trees import Octree

    # ---- table --------------------------------------------------------
    if args.synthetic:
        n, d = 4096, 256
        x = (np.arange(n) + 0.5) / n
        Phi = (np.cos(np.pi * np.outer(x, np.arange(d)))
               * np.sqrt(2.0 / n)).astype(np.float32)
        operm = np.arange(n)
    else:
        from butterfly_tpu.geom.trimesh import icosphere

        mesh = icosphere(args.subdiv)
        if args.phi and os.path.exists(args.phi):
            Phi = np.load(args.phi).astype(np.float32)
            log(f"loaded Phi {Phi.shape} from {args.phi}")
        else:
            import scipy.sparse.linalg as spla

            L, M = mesh.lbo_fem()
            t0 = time.time()
            lam, Phi = spla.eigsh(L, k=args.num_eigs, M=M, sigma=0.0,
                                  which="LM")
            log(f"eigsh k={args.num_eigs}: {time.time()-t0:.0f} s")
            Phi = Phi.astype(np.float32)
        # octree row order (reference: bf_lbo's octree row tree,
        # examples/lbo/bf_lbo.c:223)
        operm = Octree(mesh.verts, leaf_size=64).perm
    n, d = Phi.shape
    Phi = Phi[operm]
    # scale rows to unit RMS so scores are O(1)
    Phi *= np.sqrt(n / max(np.linalg.norm(Phi) ** 2, 1e-30)) * np.sqrt(d)

    # pad rows so every block format divides evenly
    NBpad = 256 if n > 16384 else 16
    n_pad = -(-n // NBpad) * NBpad
    if n_pad != n:
        Phi = np.concatenate(
            [Phi, np.zeros((n_pad - n, d), np.float32)], axis=0)
    log(f"table: {n} rows (padded {n_pad}) x {d}, "
        f"dense {Phi.nbytes/1e6:.0f} MB")
    dense_mb = n_pad * d * 4 / 1e6

    rng = np.random.default_rng(0)
    q = args.queries
    Q = rng.standard_normal((q, d)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    t0 = time.time()
    exact_scores = Q @ Phi.T                       # (q, n_pad) host oracle
    true100 = np.argsort(-exact_scores, axis=1)[:, :100]
    log(f"exact scoring oracle: {time.time()-t0:.1f} s")

    results = []
    dev = str(jax.devices()[0])
    use_approx = (not args.exact_topk) and jax.default_backend() == "tpu"

    def top100(scores_qn):
        # approx_max_k: the TPU's native fast top-k (bitonic partial
        # reduction, ~0.95 recall contract); strict recall below measures
        # the end-to-end effect against the exact oracle honestly
        if use_approx:
            return jax.lax.approx_max_k(scores_qn, 100)
        return jax.lax.top_k(scores_qn, 100)

    def timed_qps(run, label):
        """run(k) executes k chained score+topk steps on device."""
        t = slope(run, 2, 8)
        qps = q / t
        log(f"{label}: {t*1e3:.2f} ms/batch ({qps:,.0f} q/s)")
        return qps

    # ---- one-level baseline ------------------------------------------
    t0 = time.time()
    ct = compress_table(Phi, rank=args.rank_one_level, block_rows=128,
                        svd_dtype=np.float32)
    log(f"one-level setup {time.time()-t0:.1f} s")
    Qd = jnp.asarray(Q)

    @jax.jit
    def run_ct(ct, Q0, k):
        def body(i, carry):
            Qc, acc = carry
            vals, idx = ct.topk(Qc, 100, approx=use_approx)
            return Qc * (1.0 + 1e-30 * jnp.sum(vals)), acc + idx[0, 0]
        _, acc = jax.lax.fori_loop(0, k, body, (Q0, jnp.int32(0)))
        return acc

    qps_ct = timed_qps(lambda k: int(run_ct(ct, Qd, k)), "one_level")
    _, idx_ct = ct.topk(Qd, 100, approx=use_approx)
    rec_ct = recall_at_k(np.asarray(idx_ct), true100)
    mb_ct = ct.nbytes() / 1e6
    results.append({
        "format": "one_level", "n": n, "d": d,
        "rank": args.rank_one_level, "mb": round(mb_ct, 1),
        "dense_mb": round(dense_mb, 1),
        "compression_ratio": round(mb_ct / dense_mb, 3),
        "queries_per_s": int(qps_ct),
        "recall_at_100_strict": round(rec_ct, 4), "device": dev,
    })
    log(json.dumps(results[-1]))

    # ---- deep (streamer -> packed StagePlan) --------------------------
    t0 = time.time()
    dt = compress_table_deep(Phi, tol=args.deep_tol, col_depth=3,
                             row_leaf=128)
    log(f"deep setup {time.time()-t0:.1f} s; "
        f"logical {dt.nbytes_logical()/1e6:.1f} MB, "
        f"device {dt.nbytes()/1e6:.1f} MB, "
        f"buckets {dt.plan.stats.num_gemm_buckets}")
    fn_dt = dt.plan._apply_jit

    @jax.jit
    def run_dt(params, Q0, k):
        def body(i, carry):
            Qc, acc = carry
            scores = fn_dt(params, Qc.T)            # (n, q)
            vals, idx = top100(scores.T)
            return Qc * (1.0 + 1e-30 * jnp.sum(vals)), acc + idx[0, 0]
        _, acc = jax.lax.fori_loop(0, k, body, (Q0, jnp.int32(0)))
        return acc

    qps_dt = timed_qps(lambda k: int(run_dt(dt.plan._params, Qd, k)),
                       "deep_packed")
    _, idx_dt = dt.topk(Qd, 100, approx=use_approx)
    rec_dt = recall_at_k(np.asarray(idx_dt), true100)
    mb_dt = dt.nbytes_logical() / 1e6
    results.append({
        "format": "deep_butterfly", "n": n, "d": d,
        "tol": args.deep_tol, "mb_logical": round(mb_dt, 1),
        "mb_device": round(dt.nbytes() / 1e6, 1),
        "dense_mb": round(dense_mb, 1),
        "compression_ratio": round(mb_dt / dense_mb, 3),
        "vs_one_level_storage": round(mb_dt / mb_ct, 3),
        "queries_per_s": int(qps_dt),
        "recall_at_100_strict": round(rec_dt, 4), "device": dev,
    })
    log(json.dumps(results[-1]))

    # ---- deep fused (distill -> Pallas) -------------------------------
    t0 = time.time()
    # largest power of two <= n_pad/1024 that divides both dims (n_pad is
    # only guaranteed divisible by powers of two up to NBpad)
    NBf = 1 << max(4, int(np.log2(max(16, n_pad // 1024))))
    while NBf > 2 and (n_pad % NBf or d % NBf or d // NBf < 2):
        NBf //= 2
    rank_fused = args.rank_fused or min(d // NBf + 64, d)
    dist = distill_butterfly(dt.fac.as_linop(), NBf, rank=rank_fused,
                             dtype=np.float32)
    plan = FusedButterflyPlan(dist.bf, fuse=8, r_tile=256,
                              interpret=args.interpret)
    log(f"fused setup {time.time()-t0:.1f} s; NB={NBf} rank={dist.rank} "
        f"{dist.nbytes()/1e6:.1f} MB")
    from butterfly_tpu.ops.pallas_butterfly import _apply_fused
    import functools

    fn_fp = functools.partial(_apply_fused, plan._meta)

    @jax.jit
    def run_fp(params, Q0, k):
        def body(i, carry):
            Qc, acc = carry
            scores = fn_fp(params, Qc.T)            # (n, q) butterfly order
            vals, idx = top100(scores.T)
            return Qc * (1.0 + 1e-30 * jnp.sum(vals)), acc + idx[0, 0]
        _, acc = jax.lax.fori_loop(0, k, body, (Q0, jnp.int32(0)))
        return acc

    qps_fp = timed_qps(lambda k: int(run_fp(plan._params, Qd, k)),
                       "deep_fused")
    scores_bf = np.asarray(plan.apply(np.asarray(Qd).T))
    idx_bf = np.argsort(-scores_bf.T, axis=1)[:, :100]
    idx_fp = dist.row_perm[idx_bf]                 # butterfly -> table rows
    rec_fp = recall_at_k(idx_fp, true100)
    mb_fp = dist.nbytes() / 1e6
    results.append({
        "format": "deep_fused", "n": n, "d": d,
        "rank": dist.rank, "mb": round(mb_fp, 1),
        "dense_mb": round(dense_mb, 1),
        "compression_ratio": round(mb_fp / dense_mb, 3),
        "queries_per_s": int(qps_fp),
        "recall_at_100_strict": round(rec_fp, 4), "device": dev,
    })
    log(json.dumps(results[-1]))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        log(f"wrote {args.out}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
