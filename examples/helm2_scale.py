"""Large-N Helmholtz butterfly: setup cost, device apply, GMRES solve.

VERDICT r3 item 5 / reference parity with the multiple-scattering collector
grid (examples/multiple_scattering/collect_multiple_scattering_data.py:10-13,
k in logspace up to 250k points): factorize the 2D Helmholtz S' operator on
an ellipse at n >= 65536 with points-per-wavelength held fixed (k grows with
n), run the compressed apply on the TPU through the packed stage plan, check
rel err against a dense row-subset oracle, and solve the second-kind BIE
with GMRES.

The packed StagePlan is the memory-scalable apply (weights = the fac's own
blocks, no dense materialization); the partition plan (fac/partition.py)
remains the small-N turbo until its block-wise materialization lands.

Usage:
  python examples/helm2_scale.py --sizes 16384 65536 --out HELM2_SCALE_r04.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_one(n: int, ppw: float, leaf: int, queries: int = 64):
    import jax
    import jax.numpy as jnp

    from butterfly_tpu.fac import helm2 as fac_helm2
    from butterfly_tpu.geom import Ellipse
    from butterfly_tpu.ops.helm2 import Helm2, LayerPot
    from butterfly_tpu.fac.partition import partition_apply_plan
    from butterfly_tpu.ops.linalg import solve_gmres
    from butterfly_tpu.ops.linop import FuncOp
    from butterfly_tpu.trees import Quadtree

    ell = Ellipse(1.0, 0.7, (0.0, 0.0), 0.3)
    X, _, Nrm, w = ell.sample_linspaced(n)
    perimeter = float(np.sum(w))
    k = 2 * np.pi * n / (ppw * perimeter)
    # exterior-Dirichlet combined field D - i*k*S: resonance-free, so
    # GMRES converges at every wavenumber (S'-alone stalled near interior
    # resonances at k~75: 300 iters, rel res 8e-3)
    helm = Helm2(k=k, layer_pot=LayerPot.COMBINED_FIELD,
                 alpha=-1j * k, beta=1.0)
    rec = {"n": n, "k": round(k, 1), "ppw": ppw}
    log(f"n={n}: k={k:.1f} (ppw={ppw})")

    t0 = time.time()
    tree = Quadtree(X, leaf_size=leaf, normals=Nrm)
    A = fac_helm2.make_multilevel(helm, tree, tree)
    rec["setup_fac_s"] = round(time.time() - t0, 1)
    log(f"  fac setup: {rec['setup_fac_s']} s")

    t0 = time.time()
    # partition plan: chain-materialized butterfly classes + batched device
    # distillation — the O(sum-of-block-areas) path (the generic packed
    # StagePlan's gather buffer is ~2200x n rows at these wavenumbers and
    # OOMs HBM at n=16384)
    plan = partition_apply_plan(
        A, rank_margin=32,  # 96 tripled every class's weight bytes for no
        # accuracy gain: the ~1.7e-6 rel err is the f32 weight-quantization
        # floor (identical at margins 32 and 96), not distill truncation
        # large-N tile ladder: mid-size separated blocks distill as
        # butterfly classes; only the top partition levels (few blocks)
        # take the per-block stage-plan path — 668 per-block plans at the
        # default 1024 cap was a compile storm and exhausted HBM
        bf_tiles=(256, 512, 1024, 2048, 4096))
    rec["setup_plan_s"] = round(time.time() - t0, 1)
    rec["weights_mb"] = round(plan.nbytes() / 1e6, 1)
    rec["dense_mb"] = round(n * n * 16 / 1e6, 1)
    rec["compression_ratio"] = round(plan.nbytes() / (n * n * 16), 4)
    log(f"  plan: {rec['setup_plan_s']} s, {rec['weights_mb']} MB "
        f"({rec['compression_ratio']:.4f} of dense c128)")

    # ---- device apply throughput (dispatch-chained slope; NO fori) ------
    r = queries
    x0 = jax.random.normal(jax.random.key(0), (2 * n, r), jnp.float32)
    summ = jax.jit(lambda a: jnp.sum(a))
    normz = jax.jit(lambda y: y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30))

    # apply_device composes the tiled-class jit with each oversized
    # block's own stage plan at the Python level (they cannot nest in one
    # jit on this box); dispatches pipeline, the scalar fetch synchronizes
    def step(c):
        return normz(plan.apply_device(c))

    float(summ(step(x0)))

    def rep(K):
        cur = x0
        t = time.perf_counter()
        for _ in range(int(K)):
            cur = step(cur)
        float(summ(cur))
        return time.perf_counter() - t

    rep(2), rep(8)
    t2 = min(rep(2) for _ in range(3))
    t8 = min(rep(8) for _ in range(3))
    per = (t8 - t2) / 6
    flops = plan.flops_per_col() * r
    rec["apply_ms"] = round(per * 1e3, 2)
    rec["apply_tflops"] = round(flops / per / 1e12, 2)
    log(f"  apply r={r}: {per*1e3:.2f} ms -> {rec['apply_tflops']} TFLOP/s")

    # ---- accuracy vs dense oracle (row subset) --------------------------
    rng = np.random.default_rng(0)
    zs = rng.standard_normal((n, 2)) + 1j * rng.standard_normal((n, 2))
    got = plan.apply_complex(zs)
    sub = rng.choice(n, 96, replace=False)
    Xp, Np = X[tree.perm], Nrm[tree.perm]
    Kd = helm.kernel_matrix(Xp, Xp[sub], Np, None)
    want = Kd @ zs
    rel = float(np.linalg.norm(got[sub] - want) / np.linalg.norm(want))
    rec["rel_err_vs_dense"] = float(f"{rel:.2e}")
    log(f"  rel err vs dense (96-row oracle): {rel:.2e}")

    # ---- GMRES on the second-kind BIE -----------------------------------
    # system: (I/2 + (D - ikS)_w) sigma = u_inc of an interior source —
    # the combined-field analogue of the reference flagship example
    # (examples/simple/helm2_bie.c:162-175).
    x_src = np.array([[0.1, -0.05]])
    from butterfly_tpu.ops.helm2 import Helm2 as _H
    rhs = _H(k=k, layer_pot=LayerPot.SINGLE).kernel_matrix(x_src, Xp)[:, 0]
    wp = w[tree.perm]

    def sys_matmat(V):
        # pad single-RHS GMRES matvecs to the already-compiled width r:
        # the plan's (tiled jit + per-oversized-block) executables would
        # otherwise all recompile at width 1 (~150 compiles; measured 968 s
        # of a 23-iteration solve at n=16384)
        V = np.ascontiguousarray(V)
        k_true = V.shape[1]
        if k_true < r:
            V = np.concatenate(
                [V, np.zeros((V.shape[0], r - k_true), V.dtype)], axis=1)
        out = np.asarray(plan.apply_complex(wp[:, None] * V))[:, :k_true]
        return out + 0.5 * V[:, :k_true]

    sysop = FuncOp((n, n), sys_matmat, dtype=np.complex128)
    t0 = time.time()
    res = solve_gmres(sysop, rhs, tol=1e-8, max_iter=300, restart=80)
    rec["gmres_s"] = round(time.time() - t0, 1)
    rec["gmres_iters"] = int(res.num_iter)
    rec["gmres_rel_res"] = float(f"{res.residuals[-1]:.2e}")
    rec["gmres_converged"] = bool(res.converged)
    log(f"  GMRES: {res.num_iter} iters, rel res "
        f"{res.residuals[-1]:.1e}, {rec['gmres_s']} s")
    rec["device"] = str(jax.devices()[0])
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[16384, 65536])
    ap.add_argument("--ppw", type=float, default=64.0)
    ap.add_argument("--leaf", type=int, default=64)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rows = []
    for n in args.sizes:
        rows.append(run_one(n, args.ppw, args.leaf))
        print(json.dumps(rows[-1]), flush=True)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
