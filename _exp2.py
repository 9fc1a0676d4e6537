"""Precision experiment: einsum/pallas at default vs HIGHEST precision,
accuracy vs host f64 oracle, on the real TPU."""
import sys, time, functools
import numpy as np
import jax, jax.numpy as jnp

def log(*a):
    print(*a, file=sys.stderr, flush=True)

def slope_time(make_rep, k1, k2, reps=7):
    r1, r2 = make_rep(k1), make_rep(k2)
    for f in (r1, r2):
        f(), f()
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); r1(); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); r2(); t2s.append(time.perf_counter() - t0)
    return (np.median(t2s) - np.median(t1s)) / (k2 - k1)

from butterfly_tpu.ops.butterfly import random_butterfly

NB, blk, r = 1024, 128, 256
bf = random_butterfly(NB, blk, dtype=jnp.float32, key=jax.random.key(7))
n = bf.shape[1]
x = jax.random.normal(jax.random.key(3), (n, r), dtype=jnp.float32)
flops = bf.flops_per_col() * r

# host f64 oracle on a few columns
xs = np.asarray(x[:, :2], dtype=np.float64)
leaf = np.asarray(bf.leaf, np.float64)
cur = np.einsum('bmk,bkr->bmr', leaf, xs.reshape(NB, blk, 2), optimize=True)
for W in bf.levels:
    Wn = np.asarray(W, np.float64)
    hi, _, _, lo, m, k = Wn.shape
    cur = np.einsum('hcdlmk,hdlkr->hclmr', Wn, cur.reshape(hi, 2, lo, k, 2), optimize=True)
y_ref = cur.reshape(n, 2)
rn = np.linalg.norm(y_ref)

def apply_prec(bf, x, precision):
    cur = x.reshape(NB, blk, -1)
    cur = jnp.einsum('bmk,bkr->bmr', bf.leaf, cur, precision=precision,
                     preferred_element_type=jnp.float32)
    for W in bf.levels:
        hi, _, _, lo, m, k = W.shape
        c5 = cur.reshape(hi, 2, lo, k, -1)
        cur = jnp.einsum('hcdlmk,hdlkr->hclmr', W, c5, precision=precision,
                         preferred_element_type=jnp.float32)
    return cur.reshape(n, -1)

for prec in ("default", "highest"):
    f = jax.jit(functools.partial(apply_prec, precision=prec))
    log(f"compiling einsum {prec}..."); y = np.asarray(f(bf, x[:, :2]))
    err = np.linalg.norm(y - y_ref) / rn
    def make_rep(K, prec=prec):
        @jax.jit
        def rep(bf, x):
            def body(cur, _):
                return apply_prec(bf, cur, prec), 0.0
            out, _ = jax.lax.scan(body, x, None, length=K)
            return jnp.sum(out)
        return lambda: float(rep(bf, x))
    t = slope_time(make_rep, 3, 9, reps=5)
    log(f"einsum prec={prec}: {t*1e3:.3f} ms ({flops/t/1e12:.1f} TFLOP/s), rel err vs f64 = {err:.2e}")

# pallas with precision: patch the kernel dot precision via monkey test
import butterfly_tpu.ops.pallas_butterfly as pb

orig_dot = jnp.dot
for prec in ("default", "highest"):
    if prec == "highest":
        def hdot(a, b, **kw):
            kw.setdefault("precision", "highest")
            return orig_dot(a, b, **kw)
        pb.jnp.dot = hdot
    else:
        pb.jnp.dot = orig_dot
    try:
        plan = pb.FusedButterflyPlan(bf, fuse=8, r_tile=256, interpret=False)
        fn = functools.partial(pb._apply_fused, plan._meta)
        y = np.asarray(jax.jit(fn)(plan._params, x[:, :2]))
        err = np.linalg.norm(y - y_ref) / rn
        def make_p(K, fn=fn, plan=plan):
            @jax.jit
            def rep(params, x):
                def body(cur, _):
                    return fn(params, cur), 0.0
                out, _ = jax.lax.scan(body, x, None, length=K)
                return jnp.sum(out)
            return lambda: float(rep(plan._params, x))
        tp = slope_time(make_p, 3, 9, reps=5)
        log(f"pallas prec={prec}: {tp*1e3:.3f} ms ({flops/tp/1e12:.1f} TFLOP/s), rel err vs f64 = {err:.2e}")
    except Exception as e:
        log(f"pallas prec={prec} failed: {type(e).__name__}: {str(e)[:200]}")
pb.jnp.dot = orig_dot
