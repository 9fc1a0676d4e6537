"""Butterfly-compressed embedding retrieval on TPU.

The flagship TPU workload (BASELINE configs[1,2]): compress an embedding
table, score query batches against it on the MXU, take top-k on chip, and
report recall@100 vs exact dense scoring plus throughput.

Usage: python examples/retrieval.py [--n 131072] [--d 128] [--rank 32]
"""

import argparse
import os
import sys

import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from butterfly_tpu.models.retrieval import (
        compress_table, exact_topk, recall_at_k, recall_with_tolerance,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--rank", type=int, default=32)
    ap.add_argument("--queries", type=int, default=256)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    n, d = args.n, args.d
    # structured rows (smooth latent) + popularity-skewed norms
    z = np.sort(rng.random(n))
    comps = np.stack([np.cos(2 * np.pi * (j + 1) * z + rng.random() * 6)
                      for j in range(16)])
    table = comps.T @ rng.standard_normal((16, d))
    table += 0.001 * rng.standard_normal((n, d))
    table *= (1.0 + rng.pareto(2.0, n)).clip(None, 50.0)[:, None]

    t0 = time.time()
    ct = compress_table(table, rank=args.rank, block_rows=128)
    print(f"compressed {n}x{d} table: "
          f"{table.astype(np.float32).nbytes/1e6:.0f} MB -> "
          f"{ct.nbytes()/1e6:.1f} MB [{time.time()-t0:.1f}s]")

    q = rng.standard_normal((args.queries, d)).astype(np.float32)
    topk = jax.jit(lambda c, q: c.topk(q, 100))
    vals, idx = topk(ct, jnp.asarray(q))
    jax.block_until_ready(vals)
    t0 = time.time()
    vals, idx = topk(ct, jnp.asarray(q))
    jax.block_until_ready(vals)
    dt = time.time() - t0
    print(f"scoring+top-100 for {args.queries} queries: {dt*1e3:.1f} ms "
          f"({args.queries/dt:.0f} queries/s)")

    true_scores = q @ table.T
    strict = recall_at_k(np.asarray(idx), exact_topk(table, q, 100))
    tolr = recall_with_tolerance(np.asarray(idx), true_scores, 100, tol=1e-3)
    print(f"recall@100: strict {strict:.4f}, tolerance {tolr:.4f}")


if __name__ == "__main__":
    main()
