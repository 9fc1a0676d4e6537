"""Flagship benchmark: butterfly-compressed operator apply on one TPU chip.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "extra": ...}

value        = useful TFLOP/s of the best bf16 butterfly apply (padding
               excluded).
vs_baseline  = (value / bf16 dense-matmul peak measured on THIS chip) / 0.70.
               >= 1.0 means the BASELINE north star as written — "compressed
               matvec at >=70% of the dense-matmul MXU roofline per chip" —
               is met outright.

BASELINE clause split (VERDICT r2 item 5): the bf16 lines are THROUGHPUT
lines (rel err ~1e-3, reported); the ACCURACY clause "rel-err <=1e-6 vs
dense" is carried by the f32 lines, which run at HIGHEST dot precision
(TPU demotes default-precision f32 matmuls to one bf16 MXU pass — a
default-precision f32 number cannot honestly claim the 1e-6 clause).
`extra.clauses` states which line meets which clause.

DRIVER-BUDGET CONTRACT (VERDICT r2 item 1 — round 2 recorded nothing
because bench.py outlived the driver's timeout):
  - wall budget BUTTERFLY_BENCH_BUDGET_S (default 420 s); every section
    checks the remaining budget before starting and is skipped (with a
    stderr note + extra.skipped entry) if it cannot fit;
  - a daemon watchdog prints the headline JSON from whatever has been
    measured ~20 s before the budget expires, even if the main thread is
    blocked inside a TPU compile RPC (observed: remote compiles can stall
    for minutes on this box; network waits release the GIL);
  - exactly one JSON line is ever printed (first of watchdog/main wins).

Sections (each guarded):
  R  chip rooflines: bf16 dense peak, f32-HIGHEST dense peak, HBM BW
  B  bf16 deep chain (flagship throughput; reference hot path analogue:
     the product apply of src/fac.c:133-146 on a depth-10 butterfly)
  C  bf16 compute-bound chain (MXU-roofline probe, single fused pass)
  A  f32-HIGHEST deep chain (accuracy-precision flagship)
  D  REAL streamed factorization (fac/streamer.py) distilled to FFT form
     (fac/distill.py) and applied through the fused Pallas kernel at
     r=256 — the reference's metric-critical apply, measured with its
     dense ground truth (src/fac.c:133-146; src/mat_dense_complex.c:1072)
  E  multilevel Helmholtz operator (fac/helm2.py) through the partition
     apply (near-field batched GEMM + per-class batched distilled
     butterflies), rel err vs the complex host oracle

Timing uses one jitted fori_loop body with a DYNAMIC trip count: one
executable serves both chain lengths, and the slope (t(K2)-t(K1))/(K2-K1)
cancels the ~25 ms tunnel dispatch/fetch latency.
"""

import json
import os
import signal
import sys
import threading
import time

import numpy as np

T0 = time.perf_counter()
BUDGET_S = float(os.environ.get("BUTTERFLY_BENCH_BUDGET_S", "420"))
_printed = threading.Event()
extra = {"skipped": []}
state = {"best_bf16": 0.0, "peak_bf16": 0.0, "f32_tflops": 0.0,
         "f32_sol": 0.0}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def elapsed():
    return time.perf_counter() - T0


def remaining():
    return BUDGET_S - elapsed()


def emit(tag):
    """Print the single headline JSON line (first caller wins)."""
    if _printed.is_set():
        return
    _printed.set()
    extra["elapsed_s"] = round(elapsed(), 1)
    extra["budget_s"] = BUDGET_S
    extra["emitted_by"] = tag
    clauses = {}
    if "bf16_deep_tflops" in extra or "bf16_cb_tflops" in extra:
        clauses["throughput_bf16"] = (
            "headline value; rel err ~1e-3 (bf16_deep_rel_err)"
        )
    if "real_fac_rel_err" in extra and extra["real_fac_rel_err"] <= 1e-6:
        clauses["accuracy_f32_1e-6"] = (
            "met by the REAL streamed fac at f32-HIGHEST "
            f"(rel {extra['real_fac_rel_err']:.1e})"
        )
    extra["clauses"] = clauses
    if state["best_bf16"] > 0 and state["peak_bf16"] > 0:
        result = {
            "metric": "butterfly_apply_bf16_tflops",
            "value": round(state["best_bf16"], 2),
            "unit": "TFLOP/s",
            "vs_baseline": round(
                state["best_bf16"] / state["peak_bf16"] / 0.70, 3),
            "extra": extra,
        }
    elif state["f32_tflops"] > 0:
        result = {
            "metric": "butterfly_apply_f32_hp_tflops",
            "value": round(state["f32_tflops"], 2),
            "unit": "TFLOP/s",
            "vs_baseline": round(state["f32_sol"] / 0.70, 3),
            "extra": extra,
        }
    else:
        result = {"metric": "incomplete", "value": 0.0, "unit": "TFLOP/s",
                  "vs_baseline": 0.0, "extra": extra}
    print(json.dumps(result), flush=True)


def _watchdog():
    lead = 20.0
    while not _printed.is_set():
        if remaining() <= lead:
            log(f"[watchdog] {remaining():.0f}s left -> emitting now")
            emit("watchdog")
            sys.stdout.flush()
            sys.stderr.flush()
            os._exit(0)  # rc 0 with the JSON out, even mid-compile-RPC
        time.sleep(min(5.0, max(0.5, remaining() - lead)))


def _on_term(signum, frame):
    emit(f"signal{signum}")
    raise SystemExit(0)


def main() -> None:
    import functools

    threading.Thread(target=_watchdog, daemon=True).start()
    signal.signal(signal.SIGTERM, _on_term)

    import jax
    import jax.numpy as jnp

    from butterfly_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from butterfly_tpu.ops.butterfly import random_butterfly
    from butterfly_tpu.ops.pallas_butterfly import (
        FusedButterflyPlan,
        _apply_fused,
    )

    dev = jax.devices()[0]
    log(f"device: {dev}  budget: {BUDGET_S:.0f}s")

    def slope(rep, k1, k2, reps=3):
        """rep(K)->float runs K chained iterations in ONE dynamic-length
        jitted loop; slope of the MIN times cancels dispatch/fetch latency
        AND tunnel contention spikes (median showed 25% run-to-run drift
        in the dense-peak denominator)."""
        rep(k1), rep(k2)  # compile (one executable) + warm
        t1s, t2s = [], []
        for _ in range(reps):
            t = time.perf_counter(); rep(k1); t1s.append(time.perf_counter() - t)
            t = time.perf_counter(); rep(k2); t2s.append(time.perf_counter() - t)
        return (min(t2s) - min(t1s)) / (k2 - k1)

    def chain_timer(step, params, x):
        """step(params, x)->x' same shape; returns rep(K)."""
        @jax.jit
        def rep(params, x, K):
            y = jax.lax.fori_loop(0, K, lambda i, c: step(params, c), x)
            return jnp.sum(y.astype(jnp.float32))
        return lambda K: float(rep(params, x, jnp.int32(K)))

    def skip(name, why):
        log(f"{name}: SKIPPED ({why})")
        extra["skipped"].append(f"{name}: {why}")

    # ============ R. chip rooflines =====================================
    M = 4096
    a32 = jax.random.normal(jax.random.key(1), (M, M), dtype=jnp.float32)
    a16 = a32.astype(jnp.bfloat16)
    b16 = jax.random.normal(jax.random.key(2), (M, M), dtype=jnp.bfloat16)

    def mm_step_bf16(a, c):
        return jax.lax.dot(a, c, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

    t = slope(chain_timer(mm_step_bf16, a16, b16), 4, 28)
    peak_bf16 = 2 * M**3 / t / 1e12
    state["peak_bf16"] = peak_bf16
    extra["peak_bf16_tflops"] = round(peak_bf16, 1)
    log(f"R. dense peak bf16: {peak_bf16:.1f} TFLOP/s")

    def mm_step_f32hp(a, c):
        return jax.lax.dot(a, c, precision=jax.lax.Precision.HIGHEST)

    t = slope(chain_timer(mm_step_f32hp, a32,
                          jax.random.normal(jax.random.key(3), (M, M),
                                            dtype=jnp.float32)), 2, 12)
    peak_f32hp = 2 * M**3 / t / 1e12
    extra["peak_f32_hp_tflops"] = round(peak_f32hp, 1)
    log(f"R. dense peak f32-highest: {peak_f32hp:.1f} TFLOP/s")

    big = jax.random.normal(jax.random.key(4), (1 << 26,), dtype=jnp.float32)

    def bw_step(_, c):
        return c * 1.0000001 + 1.0

    t = slope(chain_timer(bw_step, jnp.zeros(()), big), 8, 56)
    bw = 2 * big.nbytes / t
    extra["hbm_gbps"] = round(bw / 1e9)
    log(f"R. HBM bandwidth: {bw/1e9:.0f} GB/s")

    def op_sol_frac(flops, wbytes, abytes, t, peak_tflops):
        t_sol = max((wbytes + abytes) / bw, flops / (peak_tflops * 1e12))
        return t_sol / t

    NB, block = 1024, 128

    def fused_step_maker(plan):
        # plain chaining: random_butterfly factors are scaled to unit
        # spectral norm, so no renormalization traffic is needed
        return functools.partial(_apply_fused, plan._meta)

    # ============ B. bf16 deep chain (flagship) =========================
    bf16_deep = None
    if remaining() > 90:
        r16 = 2048
        bf16_deep = random_butterfly(NB, block, dtype=jnp.bfloat16,
                                     key=jax.random.key(7))
        n = bf16_deep.shape[1]
        x16 = jax.random.normal(jax.random.key(5), (n, r16),
                                dtype=jnp.float32).astype(jnp.bfloat16)
        plan_B = FusedButterflyPlan(bf16_deep, fuse=8, r_tile=256,
                                    act_dtype=jnp.bfloat16)
        t_B = slope(chain_timer(fused_step_maker(plan_B),
                                plan_B._params, x16), 4, 24)
        flops_B = bf16_deep.flops_per_col() * r16
        tflops_B = flops_B / t_B / 1e12
        state["best_bf16"] = max(state["best_bf16"], tflops_B)
        frac_B = op_sol_frac(flops_B, bf16_deep.nbytes(), 2 * x16.nbytes,
                             t_B, peak_bf16)
        extra["bf16_deep_tflops"] = round(tflops_B, 1)
        extra["bf16_deep_sol_frac"] = round(frac_B, 3)
        log(f"B. bf16 deep chain: n={n} r={r16} {tflops_B:.1f} TFLOP/s "
            f"sol={frac_B:.2f}")
    else:
        skip("B", f"{remaining():.0f}s left")

    # ============ D. REAL streamed fac -> distilled fused apply =========
    if remaining() > 100:
        try:
            from butterfly_tpu.config import FacSpec
            from butterfly_tpu.fac.streamer import FacStreamer
            from butterfly_tpu.fac.uniformize import uniformize_fused
            from butterfly_tpu.trees import uniform_tree

            nD, mD = 4096, 1024
            xg = (np.arange(nD) + 0.5) / nD
            Phi = (np.cos(np.pi * np.outer(xg, np.arange(mD)))
                   * np.sqrt(2.0 / nD))
            spec = FacSpec(
                row_tree=uniform_tree(nD, 2, 6),
                col_tree=uniform_tree(mD, 2, 3),
                row_tree_init_depth=2, tol=1e-7,
                min_num_rows=8, min_num_cols=8,
            )
            ts = time.perf_counter()
            streamer = FacStreamer(spec)
            for leaf in spec.col_tree.nodes_at_depth(3):
                if leaf.num_points:
                    streamer.feed(Phi[:, leaf.i0:leaf.i1])
            fac = streamer.get_fac()
            fp = uniformize_fused(fac, tol=1e-7, dtype=np.float32,
                                  fuse=8, r_tile=256)
            setup_D = time.perf_counter() - ts
            rD = 256
            xD = jax.random.normal(jax.random.key(8), (mD, rD),
                                   dtype=jnp.float32)
            fnD = functools.partial(_apply_fused, fp.plan._meta)

            def step_D(params, cur):
                y = fnD(params, cur)
                return cur + 1e-30 * jnp.sum(y)  # rectangular: fold back

            t_D = slope(chain_timer(step_D, fp.plan._params, xD), 32, 224)
            flops_D = fp.flops_per_col() * rD
            tflops_D = flops_D / t_D / 1e12
            frac_D = op_sol_frac(flops_D, fp.nbytes(),
                                 xD.nbytes + nD * rD * 4, t_D, peak_f32hp)
            xs = np.random.default_rng(0).standard_normal(
                (mD, 4)).astype(np.float32)
            got = np.asarray(fp.apply(xs), dtype=np.float64)
            want = Phi @ xs.astype(np.float64)
            rel_D = float(np.linalg.norm(got - want) / np.linalg.norm(want))
            extra["real_fac_tflops"] = round(tflops_D, 1)
            extra["real_fac_sol_frac"] = round(frac_D, 3)
            extra["real_fac_rel_err"] = float(f"{rel_D:.2e}")
            extra["real_fac_setup_s"] = round(setup_D, 1)
            extra["real_fac_rank"] = fp.rank
            log(f"D. real streamed fac (distilled, r={rD}): "
                f"{tflops_D:.1f} TFLOP/s sol={frac_D:.2f} rel={rel_D:.1e}")
        except Exception as e:  # noqa: BLE001 - bench must survive anything
            skip("D", f"{type(e).__name__}: {str(e)[:100]}")
    else:
        skip("D", f"{remaining():.0f}s left")

    # ============ E. multilevel Helmholtz partition apply ===============
    if remaining() > 150:
        try:
            from butterfly_tpu.fac import helm2 as fac_helm2
            from butterfly_tpu.fac.partition import partition_apply_plan
            from butterfly_tpu.geom import Ellipse
            from butterfly_tpu.ops.helm2 import Helm2, LayerPot
            from butterfly_tpu.trees import Quadtree

            nE = 4096
            ts = time.perf_counter()
            ell = Ellipse(1.0, 0.7, (0.0, 0.0), 0.3)
            X, _, Nrm, _ = ell.sample_linspaced(nE)
            helm = Helm2(k=60.0, layer_pot=LayerPot.SINGLE)
            tree = Quadtree(X, leaf_size=32, normals=Nrm)
            A = fac_helm2.make_multilevel(helm, tree, tree)
            pp = partition_apply_plan(A, rank=None)
            setup_E = time.perf_counter() - ts
            rE = 256
            xE = jax.random.normal(jax.random.key(9), (2 * nE, rE),
                                   dtype=jnp.float32)

            def step_E(params, cur):
                y = pp.apply_with(params, cur)
                return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)

            t_E = slope(chain_timer(step_E, pp.params, xE), 16, 112)
            flops_E = pp.flops_per_col() * rE
            tflops_E = flops_E / t_E / 1e12
            frac_E = op_sol_frac(flops_E, pp.nbytes(), 2 * xE.nbytes,
                                 t_E, peak_f32hp)
            zs = (np.random.default_rng(0).standard_normal((nE, 2))
                  + 1j * np.random.default_rng(1).standard_normal((nE, 2)))
            got = np.asarray(pp.apply_complex(zs))
            want = A.matmat(zs)
            rel_E = float(np.linalg.norm(got - want) / np.linalg.norm(want))
            extra["helm2_tflops"] = round(tflops_E, 2)
            extra["helm2_sol_frac"] = round(frac_E, 3)
            extra["helm2_rel_err"] = float(f"{rel_E:.2e}")
            extra["helm2_setup_s"] = round(setup_E, 1)
            log(f"E. helm2 partition apply (r={rE}): {tflops_E:.2f} TFLOP/s "
                f"sol={frac_E:.2f} rel={rel_E:.1e}")
        except Exception as e:  # noqa: BLE001
            skip("E", f"{type(e).__name__}: {str(e)[:100]}")
    else:
        skip("E", f"{remaining():.0f}s left")

    # ============ A. f32-HIGHEST deep chain =============================
    if remaining() > 80:
        r32 = 256
        bf32 = (bf16_deep.astype(jnp.float32)
                if bf16_deep is not None
                else random_butterfly(NB, block, dtype=jnp.float32,
                                      key=jax.random.key(7)))
        x32 = jax.random.normal(jax.random.key(3), (bf32.shape[1], r32),
                                dtype=jnp.float32)
        plan_A = FusedButterflyPlan(bf32, fuse=8, r_tile=256,
                                    precision="highest")
        t_A = slope(chain_timer(fused_step_maker(plan_A),
                                plan_A._params, x32), 4, 24)
        flops_A = bf32.flops_per_col() * r32
        tflops_A = flops_A / t_A / 1e12
        frac_A = op_sol_frac(flops_A, bf32.nbytes(), 2 * x32.nbytes, t_A,
                             peak_f32hp)
        state["f32_tflops"], state["f32_sol"] = tflops_A, frac_A
        extra["f32_hp_deep_tflops"] = round(tflops_A, 1)
        extra["f32_hp_deep_sol_frac"] = round(frac_A, 3)
        rel_B = None
        if bf16_deep is not None:
            # bf16 chain accuracy vs the f32-HIGHEST kernel on the SAME
            # weights (cheaper than a dense-HLO einsum oracle)
            # quantize the probe to bf16 FIRST so both paths see identical
            # inputs and the diff isolates the kernels' compute precision
            xs16 = jnp.asarray(
                np.random.default_rng(1).standard_normal(
                    (bf32.shape[1], 8)).astype(np.float32),
                dtype=jnp.bfloat16)
            want = np.asarray(
                plan_A.apply(xs16.astype(jnp.float32)), dtype=np.float64)
            got = np.asarray(plan_B.apply(xs16)).astype(np.float64)
            rel_B = float(np.linalg.norm(got - want) / np.linalg.norm(want))
            extra["bf16_deep_rel_err"] = float(f"{rel_B:.2e}")
        log(f"A. f32-highest deep chain: r={r32} {tflops_A:.1f} TFLOP/s "
            f"sol={frac_A:.2f} bf16_rel={rel_B}")
    else:
        skip("A", f"{remaining():.0f}s left")

    # ============ C. bf16 compute-bound chain ===========================
    if remaining() > 80:
        NBc = 64
        bfc = random_butterfly(NBc, block, dtype=jnp.bfloat16,
                               key=jax.random.key(11))
        xc = jax.random.normal(jax.random.key(6), (bfc.shape[1], 2048),
                               dtype=jnp.float32).astype(jnp.bfloat16)
        plan_C = FusedButterflyPlan(bfc, fuse=8, r_tile=256,
                                    act_dtype=jnp.bfloat16)
        t_C = slope(chain_timer(fused_step_maker(plan_C),
                                plan_C._params, xc), 8, 48)
        flops_C = bfc.flops_per_col() * 2048
        tflops_C = flops_C / t_C / 1e12
        state["best_bf16"] = max(state["best_bf16"], tflops_C)
        extra["bf16_cb_tflops"] = round(tflops_C, 1)
        extra["bf16_cb_frac_peak"] = round(tflops_C / peak_bf16, 3)
        log(f"C. bf16 compute-bound: {tflops_C:.1f} TFLOP/s "
            f"({tflops_C/peak_bf16:.2f} of bf16 peak)")
    else:
        skip("C", f"{remaining():.0f}s left")

    emit("main")


if __name__ == "__main__":
    main()
