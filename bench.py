"""Flagship benchmark: butterfly-compressed operator apply on one TPU chip.

Emits JSON lines on stdout (LAST line wins):
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "extra": ...}

value        = useful TFLOP/s of the best bf16 butterfly apply (padding
               excluded).
vs_baseline  = (value / bf16 dense-matmul peak on THIS chip) / 0.70.
               >= 1.0 means the BASELINE north star as written — "compressed
               matvec at >=70% of the dense-matmul MXU roofline per chip" —
               is met outright.

BASELINE clause split: the bf16 lines are THROUGHPUT lines (rel err ~1e-3,
reported); the ACCURACY clause "rel-err <=1e-6 vs dense" is carried by the
f32 lines, which run at HIGHEST dot precision (TPU demotes default-precision
f32 matmuls to one bf16 MXU pass — a default-precision f32 number cannot
honestly claim the 1e-6 clause). `extra.clauses` states which line meets
which clause.

STALL-PROOF DESIGN (VERDICT r3 item 1 — rounds 2 and 3 recorded nothing
because the very first compile blocked past the whole driver budget):
  1. Rooflines are LOADED from the committed `BENCH_CONSTANTS.json` at
     startup, so the flagship has a denominator before anything compiles.
     Section R re-measures them when reached and refreshes the file
     (drift is then visible in git history round-over-round).
  2. The FLAGSHIP section runs FIRST; a valid headline JSON line is printed
     after EVERY section (last write wins), so a stall at any point leaves
     the best-so-far measurement on stdout.
  3. Every section body runs in a daemon thread with its own deadline
     (compile RPCs release the GIL); a section that stalls is abandoned
     (`extra.skipped` entry "<name>: stalled(Ns)") and the bench moves on —
     one wedged compile can no longer consume the whole budget.
  4. A 60s-deadline probe (tiny matmul) runs first; if even that stalls the
     bench emits a diagnostic line immediately so the artifact distinguishes
     "device/tunnel wedged" from "bench broke".
  5. The watchdog from r3 remains as the terminal backstop: it prints the
     headline ~20s before the budget expires and _exits 0 even if the main
     thread is blocked inside a compile RPC.

Sections, in execution order:
  P  probe: 256^2 matmul, 60s deadline (environment health check)
  B  bf16 deep chain (flagship throughput; reference hot path analogue:
     the product apply of src/fac.c:133-146 on a depth-10 butterfly)
  C  bf16 compute-bound chain (MXU-roofline probe, single fused pass)
  R  chip rooflines: bf16 dense peak, f32-HIGHEST dense peak, HBM BW
     (refreshes BENCH_CONSTANTS.json)
  A  f32-HIGHEST deep chain (accuracy-precision flagship)
  D  REAL streamed factorization (fac/streamer.py) distilled to FFT form
     (fac/distill.py) and applied through the fused Pallas kernel at
     r=256 — the reference's metric-critical apply, measured with its
     dense ground truth (src/fac.c:133-146; src/mat_dense_complex.c:1072)
  E  multilevel Helmholtz operator (fac/helm2.py) through the partition
     apply (near-field batched GEMM + per-class batched distilled
     butterflies), rel err vs the complex host oracle

Timing: K async dispatches of ONE cached executable chained by data
dependence, forced by a final scalar fetch; the slope
(t(K2)-t(K1))/(K2-K1) cancels the ~25 ms tunnel dispatch/fetch latency.
(See chain_timer for why fori_loop chains are banned on this box.)

Warming: `python bench.py --warm` runs all sections with a huge budget and
no deadlines, populating the persistent compile cache for later runs.
"""

import json
import os
import signal
import sys
import threading
import time

import numpy as np

T0 = time.perf_counter()
WARM = "--warm" in sys.argv
BUDGET_S = float(os.environ.get(
    "BUTTERFLY_BENCH_BUDGET_S", "3600" if WARM else "420"))
RESERVE_S = 25.0  # keep this much for the watchdog + final emit
CONSTANTS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_CONSTANTS.json")

_final = threading.Event()
_emit_lock = threading.Lock()
extra = {"skipped": []}
state = {"best_bf16": 0.0, "peak_bf16": 0.0, "peak_f32hp": 0.0,
         "hbm_gbps": 0.0, "f32_tflops": 0.0, "f32_sol": 0.0,
         "peak_source": "none"}
# raw[prefix] = (flops, wbytes, abytes, seconds, peak_key); sol fractions are
# recomputed from these at every emit so a section measured BEFORE the
# rooflines still gets its fraction once section R lands.
raw = {}
SECTION_ORDER = ["P", "B", "C", "R", "A", "D", "E"]
_done_sections = set()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def elapsed():
    return time.perf_counter() - T0


def remaining():
    return BUDGET_S - elapsed()


def load_constants():
    try:
        with open(CONSTANTS_PATH) as f:
            c = json.load(f)
        state["peak_bf16"] = float(c.get("peak_bf16_tflops", 0.0))
        state["peak_f32hp"] = float(c.get("peak_f32_hp_tflops", 0.0))
        state["hbm_gbps"] = float(c.get("hbm_gbps", 0.0))
        state["peak_source"] = "constants"
        log(f"constants: bf16 peak {state['peak_bf16']:.1f} TFLOP/s, "
            f"f32-hp peak {state['peak_f32hp']:.1f}, "
            f"HBM {state['hbm_gbps']:.0f} GB/s "
            f"(measured {c.get('measured_utc', '?')})")
    except (OSError, ValueError, KeyError):
        log("constants: BENCH_CONSTANTS.json absent/unreadable; "
            "rooflines must be measured this run")


def save_constants():
    c = {
        "peak_bf16_tflops": round(state["peak_bf16"], 1),
        "peak_f32_hp_tflops": round(state["peak_f32hp"], 1),
        "hbm_gbps": round(state["hbm_gbps"]),
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "device": extra.get("device", "unknown"),
        "note": ("chip rooflines measured by bench.py section R; committed "
                 "so later budget-constrained runs have denominators before "
                 "any compile finishes"),
    }
    tmp = CONSTANTS_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(c, f, indent=1)
    os.replace(tmp, CONSTANTS_PATH)
    log(f"constants: refreshed {CONSTANTS_PATH}")


def emit(tag, final=False):
    """Print a headline JSON line from whatever has been measured so far.

    Called after every section (progressive partial emission — last line
    wins) and by the watchdog/signal handlers as a terminal backstop."""
    if _final.is_set():
        return
    if final:
        _final.set()
    with _emit_lock:
        bw = state["hbm_gbps"] * 1e9
        for prefix, (flops, wbytes, abytes, t, peak_key) in raw.items():
            peak = state[peak_key]
            if bw > 0 and peak > 0:
                t_sol = max((wbytes + abytes) / bw, flops / (peak * 1e12))
                extra[prefix + "_sol_frac"] = round(t_sol / t, 3)
        if "bf16_cb_tflops" in extra and state["peak_bf16"] > 0:
            extra["bf16_cb_frac_peak"] = round(
                extra["bf16_cb_tflops"] / state["peak_bf16"], 3)
        if raw.get("f32_hp_deep") and state["f32_tflops"] > 0:
            state["f32_sol"] = extra.get("f32_hp_deep_sol_frac", 0.0)
        ex = dict(extra)
        ex["elapsed_s"] = round(elapsed(), 1)
        ex["budget_s"] = BUDGET_S
        ex["emitted_by"] = tag
        ex["peak_source"] = state["peak_source"]
        not_reached = [s for s in SECTION_ORDER if s not in _done_sections]
        if not_reached:
            ex["not_reached"] = not_reached
        clauses = {}
        if "bf16_deep_tflops" in ex or "bf16_cb_tflops" in ex:
            clauses["throughput_bf16"] = (
                "headline value; rel err ~1e-3 (bf16_deep_rel_err)"
            )
        if ex.get("real_fac_rel_err", 1.0) <= 1e-6:
            clauses["accuracy_f32_1e-6"] = (
                "met by the REAL streamed fac at f32-HIGHEST "
                f"(rel {ex['real_fac_rel_err']:.1e})"
            )
        if (ex.get("helm2_rel_err", 1.0) <= 1e-6
                and ex.get("helm2_sol_frac", 0.0) >= 0.5):
            clauses["helm2_accuracy_and_sol"] = (
                "the multilevel Helmholtz partition apply meets BOTH "
                f"clauses at once: rel {ex['helm2_rel_err']:.1e} <= 1e-6 "
                f"at {ex['helm2_sol_frac']:.2f} of speed of light"
            )
        ex["clauses"] = clauses
        if state["best_bf16"] > 0 and state["peak_bf16"] > 0:
            result = {
                "metric": "butterfly_apply_bf16_tflops",
                "value": round(state["best_bf16"], 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(
                    state["best_bf16"] / state["peak_bf16"] / 0.70, 3),
                "extra": ex,
            }
        elif state["f32_tflops"] > 0:
            result = {
                "metric": "butterfly_apply_f32_hp_tflops",
                "value": round(state["f32_tflops"], 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(state["f32_sol"] / 0.70, 3),
                "extra": ex,
            }
        else:
            result = {"metric": "incomplete", "value": 0.0,
                      "unit": "TFLOP/s", "vs_baseline": 0.0, "extra": ex}
        print(json.dumps(result), flush=True)


def _watchdog():
    while not _final.is_set():
        if remaining() <= RESERVE_S - 5.0:
            log(f"[watchdog] {remaining():.0f}s left -> final emit")
            emit("watchdog", final=True)
            sys.stdout.flush()
            sys.stderr.flush()
            os._exit(0)  # rc 0 with the JSON out, even mid-compile-RPC
        time.sleep(min(5.0, max(0.5, remaining() - RESERVE_S + 5.0)))


def _on_term(signum, frame):
    emit(f"signal{signum}", final=True)
    raise SystemExit(0)


def skip(name, why):
    log(f"{name}: SKIPPED ({why})")
    extra["skipped"].append(f"{name}: {why}")


def run_section(name, fn, min_budget, deadline):
    """Run `fn` in a daemon thread with a deadline. A timed-out section is
    abandoned (compile RPCs release the GIL, so the main thread moves on)
    and recorded as stalled. Returns True if the section completed."""
    if name in ("P", "B") and remaining() < min_budget:
        skip(name, f"{remaining():.0f}s left < {min_budget}s needed")
        return False
    if name not in ("P", "B") and remaining() - RESERVE_S < min_budget:
        skip(name, f"{remaining():.0f}s left < {min_budget}s needed")
        return False
    box = {}

    def wrapper():
        try:
            fn()
            box["ok"] = True
        except Exception as e:  # noqa: BLE001 - bench must survive anything
            box["err"] = f"{type(e).__name__}: {str(e)[:120]}"

    t = threading.Thread(target=wrapper, daemon=True)
    t0 = time.perf_counter()
    t.start()
    if WARM:
        t.join()
    else:
        t.join(timeout=min(deadline, max(1.0, remaining() - RESERVE_S)))
    took = time.perf_counter() - t0
    if t.is_alive():
        skip(name, f"stalled({took:.0f}s)")
        emit(f"after_{name}_stall")
        return False
    if "err" in box:
        skip(name, box["err"])
        emit(f"after_{name}_err")
        return False
    _done_sections.add(name)
    log(f"{name}: done in {took:.1f}s")
    emit(f"after_{name}")
    return True


def main() -> None:
    import functools

    threading.Thread(target=_watchdog, daemon=True).start()
    signal.signal(signal.SIGTERM, _on_term)
    load_constants()

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
    extra["device"] = str(dev)
    log(f"device: {dev}  budget: {BUDGET_S:.0f}s  warm={WARM}")

    _seed = [100]

    def randn(shape, dtype=jnp.float32):
        # ON-DEVICE generation: this box's host->device transfers crawl at
        # ~3 MB/s through the tunnel (measured r4: a 536 MB operand took
        # ~170 s), so inputs must never be shipped from the host. Each
        # shape costs one small cached PRNG executable instead.
        _seed[0] += 1
        x = jax.random.normal(jax.random.key(_seed[0]), shape,
                              dtype=jnp.float32)
        return jax.block_until_ready(x.astype(dtype))

    def slope(rep, k1, k2, reps=3):
        """rep(K)->seconds runs K chained iterations; slope of the MIN
        times cancels dispatch/fetch latency AND tunnel contention spikes.
        r4 post-mortem: with short chains (device delta ~16 ms vs ~25 ms
        tunnel RTT) a few ms of RTT asymmetry between the k1 and k2 fetches
        produced 25% denominator drift (252 vs 203 TFLOP/s for the same
        chip) — callers must size k2-k1 so the device-time delta is
        >~100 ms, and the per-pair median below rejects one-sided
        outliers."""
        rep(k1), rep(k2)  # warm (compiles happened in chain_timer)
        t1s, t2s = [], []
        for _ in range(reps):
            t1s.append(rep(k1))
            t2s.append(rep(k2))
        s_min = (min(t2s) - min(t1s)) / (k2 - k1)
        pair = sorted((t2 - t1) / (k2 - k1)
                      for t1, t2 in zip(t1s, t2s))
        s_med = pair[len(pair) // 2]
        # min-of-mins is the best estimate when contention only ADDS time;
        # the paired median guards against an unluckily-fast k2 fetch.
        return max(s_min, 0.8 * s_med) if s_med > 0 else s_min

    _summ = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))

    def chain_timer(step, params, x):
        """step(params, x)->x' same shape; returns rep(K) -> seconds.

        ASYNC-DISPATCH CHAINING, NOT fori_loop: on this box the remote
        compiler takes minutes on loop-wrapped matmul programs and NEVER
        finished a fori-wrapped Pallas call in two 17-minute attempts —
        this is what produced the empty r2/r3 bench artifacts. K plain
        dispatches of the same cached executable pipeline through the
        tunnel (measured: 50 chained fused applies complete in
        50*per-iter-device-time, not 50*25ms RPC latency), and the final
        scalar fetch forces completion (block_until_ready alone does NOT
        synchronize through this tunnel — measured 1.8 ms for 50 applies
        without the fetch)."""
        jfn = jax.jit(step)
        float(_summ(jfn(params, x)))  # compile step + sum executables

        def rep(K):
            cur = x
            t = time.perf_counter()
            for _ in range(int(K)):
                cur = jfn(params, cur)
            float(_summ(cur))
            return time.perf_counter() - t
        return rep

    def op_sol_frac(prefix, flops, wbytes, abytes, t, peak_key):
        """Record raw numbers; emit() derives the SoL fraction (and keeps
        re-deriving it as rooflines refresh)."""
        raw[prefix] = (flops, wbytes, abytes, t, peak_key)
        bw = state["hbm_gbps"] * 1e9
        peak = state[peak_key]
        if bw <= 0 or peak <= 0:
            return 0.0
        t_sol = max((wbytes + abytes) / bw, flops / (peak * 1e12))
        return t_sol / t

    # ============ P. probe ==============================================
    def sec_probe():
        a = randn((256, 256), jnp.bfloat16)
        t = time.perf_counter()
        y = jax.jit(lambda a: a @ a)(a)
        jax.block_until_ready(y)
        extra["probe_s"] = round(time.perf_counter() - t, 1)
        log(f"P. probe matmul: {extra['probe_s']}s")

    if not run_section("P", sec_probe, 5, 60):
        # even the tiny probe stalled: the device/tunnel is wedged.
        # record that fact, keep going anyway (later sections have their
        # own deadlines and the tunnel sometimes recovers).
        extra["probe_stalled"] = True

    NB, block = 1024, 128

    def fused_step_maker(plan):
        # plain chaining: random_butterfly factors are scaled to unit
        # spectral norm, so no renormalization traffic is needed
        return functools.partial(_apply_fused, plan._meta)

    # ============ B. bf16 deep chain (flagship) =========================
    holder = {}

    def sec_B():
        r16 = 2048
        bf16_deep = random_butterfly(NB, block, dtype=jnp.bfloat16,
                                     key=jax.random.key(7))
        holder["bf16_deep"] = bf16_deep
        n = bf16_deep.shape[1]
        x16 = randn((n, r16), jnp.bfloat16)
        plan_B = FusedButterflyPlan(bf16_deep, fuse=8, r_tile=256,
                                    act_dtype=jnp.bfloat16)
        holder["plan_B"] = plan_B
        t_B = slope(chain_timer(fused_step_maker(plan_B),
                                plan_B._params, x16), 4, 24)
        flops_B = bf16_deep.flops_per_col() * r16
        tflops_B = flops_B / t_B / 1e12
        state["best_bf16"] = max(state["best_bf16"], tflops_B)
        frac_B = op_sol_frac("bf16_deep", flops_B, bf16_deep.nbytes(),
                             2 * x16.nbytes, t_B, "peak_bf16")
        extra["bf16_deep_tflops"] = round(tflops_B, 1)
        log(f"B. bf16 deep chain: n={n} r={r16} {tflops_B:.1f} TFLOP/s "
            f"sol={frac_B:.2f}")

    run_section("B", sec_B, 30, 150)

    # ============ C. bf16 compute-bound chain ===========================
    def sec_C():
        NBc = 64
        bfc = random_butterfly(NBc, block, dtype=jnp.bfloat16,
                               key=jax.random.key(11))
        xc = randn((bfc.shape[1], 2048), jnp.bfloat16)
        plan_C = FusedButterflyPlan(bfc, fuse=8, r_tile=256,
                                    act_dtype=jnp.bfloat16)
        t_C = slope(chain_timer(fused_step_maker(plan_C),
                                plan_C._params, xc), 8, 48)
        flops_C = bfc.flops_per_col() * 2048
        tflops_C = flops_C / t_C / 1e12
        state["best_bf16"] = max(state["best_bf16"], tflops_C)
        extra["bf16_cb_tflops"] = round(tflops_C, 1)
        if state["peak_bf16"] > 0:
            extra["bf16_cb_frac_peak"] = round(tflops_C / state["peak_bf16"],
                                               3)
        log(f"C. bf16 compute-bound: {tflops_C:.1f} TFLOP/s "
            f"({tflops_C / max(state['peak_bf16'], 1e-9):.2f} of bf16 peak)")

    run_section("C", sec_C, 30, 120)

    # ============ R. chip rooflines =====================================
    def _adopt_peak(key, extra_key, measured, unit="TFLOP/s"):
        """VERDICT r4 item 3: PREFER the pinned denominator for SoL
        stability; adopt the fresh measurement only when it drifts >15%
        from the pin (hardware/toolchain change) or no pin exists. Both
        values always land in the artifact."""
        extra[extra_key + "_measured"] = round(measured, 1)
        pinned = state[key] if state["peak_source"] in (
            "constants", "mixed") else 0.0
        if pinned > 0 and abs(measured - pinned) / pinned <= 0.15:
            extra[extra_key] = round(pinned, 1)
            log(f"R. {extra_key}: pinned {pinned:.1f} kept "
                f"(measured {measured:.1f} {unit}, within 15%)")
            return False
        state[key] = measured
        extra[extra_key] = round(measured, 1)
        log(f"R. {extra_key}: adopted measured {measured:.1f} {unit}"
            + (f" (pin {pinned:.1f} drifted >15%)" if pinned else ""))
        return True

    def sec_R():
        # chains sized so the device-time delta is >~100 ms — short chains
        # (16 ms delta vs 25 ms tunnel RTT) caused the r4 25% denominator
        # drift (and the physically impossible 252 TFLOP/s bf16 "peak" on
        # a chip whose nominal bf16 peak is ~197)
        M = 4096
        a16 = randn((M, M), jnp.bfloat16)
        b16 = randn((M, M), jnp.bfloat16)

        def mm_step_bf16(a, c):
            return jax.lax.dot(a, c, preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)

        t = slope(chain_timer(mm_step_bf16, a16, b16), 30, 230, reps=5)
        adopted = _adopt_peak("peak_bf16", "peak_bf16_tflops",
                              2 * M**3 / t / 1e12)

        def mm_step_f32hp(a, c):
            return jax.lax.dot(a, c, precision=jax.lax.Precision.HIGHEST)

        a32 = randn((M, M), jnp.float32)
        b32 = randn((M, M), jnp.float32)
        t = slope(chain_timer(mm_step_f32hp, a32, b32), 6, 42, reps=5)
        adopted |= _adopt_peak("peak_f32hp", "peak_f32_hp_tflops",
                               2 * M**3 / t / 1e12)

        big = randn((1 << 26,), jnp.float32)

        def bw_step(_, c):
            return c * 1.0000001 + 1.0

        t = slope(chain_timer(bw_step, jnp.zeros(()), big), 30, 230, reps=5)
        adopted |= _adopt_peak("hbm_gbps", "hbm_gbps",
                               2 * big.nbytes / t / 1e9, unit="GB/s")
        extra["hbm_gbps"] = round(extra["hbm_gbps"])
        if adopted:
            state["peak_source"] = (
                "mixed" if state["peak_source"] == "constants"
                else "measured")
            save_constants()

    run_section("R", sec_R, 60, 200)

    # ============ A. f32-HIGHEST deep chain =============================
    def sec_A():
        r32 = 256
        bf16_deep = holder.get("bf16_deep")
        bf32 = (bf16_deep.astype(jnp.float32)
                if bf16_deep is not None
                else random_butterfly(NB, block, dtype=jnp.float32,
                                      key=jax.random.key(7)))
        x32 = randn((bf32.shape[1], r32), jnp.float32)
        plan_A = FusedButterflyPlan(bf32, fuse=8, r_tile=256,
                                    precision="highest")
        t_A = slope(chain_timer(fused_step_maker(plan_A),
                                plan_A._params, x32), 4, 24)
        flops_A = bf32.flops_per_col() * r32
        tflops_A = flops_A / t_A / 1e12
        frac_A = op_sol_frac("f32_hp_deep", flops_A, bf32.nbytes(),
                             2 * x32.nbytes, t_A, "peak_f32hp")
        state["f32_tflops"], state["f32_sol"] = tflops_A, frac_A
        extra["f32_hp_deep_tflops"] = round(tflops_A, 1)
        rel_B = None
        if bf16_deep is not None and "plan_B" in holder:
            # bf16 chain accuracy vs the f32-HIGHEST kernel on the SAME
            # weights; quantize the probe to bf16 FIRST so both paths see
            # identical inputs and the diff isolates compute precision
            xs16 = jnp.asarray(
                np.random.default_rng(1).standard_normal(
                    (bf32.shape[1], 8)).astype(np.float32),
                dtype=jnp.bfloat16)
            want = np.asarray(
                plan_A.apply(xs16.astype(jnp.float32)), dtype=np.float64)
            got = np.asarray(holder["plan_B"].apply(xs16)).astype(np.float64)
            rel_B = float(np.linalg.norm(got - want) / np.linalg.norm(want))
            extra["bf16_deep_rel_err"] = float(f"{rel_B:.2e}")
        log(f"A. f32-highest deep chain: r={r32} {tflops_A:.1f} TFLOP/s "
            f"sol={frac_A:.2f} bf16_rel={rel_B}")

    run_section("A", sec_A, 30, 120)

    # ============ D. REAL streamed fac -> distilled fused apply =========
    def sec_D():
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
        rD = 1024  # wide enough that per-iter device time dominates dispatch
        xD = randn((mD, rD), jnp.float32)
        fnD = functools.partial(_apply_fused, fp.plan._meta)

        def step_D(params, cur):
            y = fnD(params, cur)
            return cur + 1e-30 * jnp.sum(y)  # rectangular: fold back

        # long chains: at ~0.25 ms/iter this section showed 20% run-to-run
        # spread with 48-iter deltas; 200 iters put the device delta at
        # ~50 ms+ and in line with the other sections' <2% agreement
        t_D = slope(chain_timer(step_D, fp.plan._params, xD), 16, 216)
        flops_D = fp.flops_per_col() * rD
        tflops_D = flops_D / t_D / 1e12
        frac_D = op_sol_frac("real_fac", flops_D, fp.nbytes(),
                             xD.nbytes + nD * rD * 4, t_D, "peak_f32hp")
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

    run_section("D", sec_D, 60, 180)

    # ============ E. multilevel Helmholtz partition apply ===============
    def sec_E():
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
        rE = 1024  # wide enough that per-iter device time dominates dispatch
        xE = randn((2 * nE, rE), jnp.float32)

        def step_E(params, cur):
            y = pp.apply_with(params, cur)
            return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)

        t_E = slope(chain_timer(step_E, pp.params, xE), 4, 28)
        flops_E = pp.flops_per_col() * rE
        tflops_E = flops_E / t_E / 1e12
        frac_E = op_sol_frac("helm2", flops_E, pp.nbytes(), 2 * xE.nbytes,
                             t_E, "peak_f32hp")
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

    run_section("E", sec_E, 90, 220)

    emit("main", final=True)


if __name__ == "__main__":
    main()
