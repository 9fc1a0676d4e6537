"""Perf experiments on the real chip: bandwidth, per-level einsum cost,
radix-4 combining."""
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

dev = jax.devices()[0]
log("device:", dev)

from butterfly_tpu.ops.butterfly import random_butterfly, UniformButterfly

NB, blk, r = 1024, 128, 256
bf = random_butterfly(NB, blk, dtype=jnp.float32, key=jax.random.key(7))
n = bf.shape[1]
x = jax.random.normal(jax.random.key(3), (n, r), dtype=jnp.float32)
flops = bf.flops_per_col() * r

# ---- 1. true streaming READ bandwidth: reduce-sum the weight set ------
Ws = [jnp.asarray(W) for W in bf.levels]
wbytes = sum(W.nbytes for W in Ws) + bf.leaf.nbytes
def make_read(K):
    @jax.jit
    def rep(leaf, ws, seed):
        def body(acc, i):
            s = acc + jnp.sum(leaf[0,0,0]*0 + 1.0)
            for W in ws:
                s = s + W[i % 2, 0, 0, 0, 0, 0] + jnp.sum(W) * 1e-30
            s = s + jnp.sum(leaf) * 1e-30
            return s, 0.0
        out, _ = jax.lax.scan(body, seed, jnp.arange(K))
        return out
    return lambda: float(rep(bf.leaf, Ws, 0.0))
t_read = slope_time(make_read, 2, 10)
log(f"weight stream read: {wbytes/1e9:.2f} GB in {t_read*1e3:.3f} ms -> {wbytes/t_read/1e9:.0f} GB/s")

# ---- 2. single-level einsum cost (weights 134MB, acts 2x134MB) --------
W5 = Ws[5]
def make_lvl(K):
    @jax.jit
    def rep(W, x5):
        def body(cur, _):
            y = jnp.einsum('hcdlmk,hdlkr->hclmr', W, cur,
                           preferred_element_type=jnp.float32)
            return y.reshape(cur.shape), 0.0
        out, _ = jax.lax.scan(body, x5, None, length=K)
        return jnp.sum(out)
    hi, _, _, lo, m, k = W5.shape
    x5 = x.reshape(hi, 2, lo, k, r)
    return lambda: float(rep(W5, x5))
t_lvl = slope_time(make_lvl, 4, 24)
lvl_bytes = W5.nbytes + 2 * x.nbytes
log(f"one level einsum: {t_lvl*1e3:.3f} ms, traffic {lvl_bytes/1e9:.2f} GB -> {lvl_bytes/t_lvl/1e9:.0f} GB/s effective")

# ---- 3. full einsum chain (reference timing) ---------------------------
def make_rep(K):
    @jax.jit
    def rep(bf, x):
        def body(cur, _):
            return bf.apply(cur), 0.0
        out, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(out)
    return lambda: float(rep(bf, x))
t_e2 = slope_time(make_rep, 4, 24)
log(f"einsum chain r2: {t_e2*1e3:.3f} ms ({flops/t_e2/1e12:.1f} TFLOP/s)")

# ---- 4. radix-4 combined butterfly ------------------------------------
def combine_pairs(bf):
    R = bf.radix
    assert R == 2 and bf.num_levels % 2 == 0
    levels4 = []
    for p in range(bf.num_levels // 2):
        Wlo, Whi = bf.levels[2*p], bf.levels[2*p+1]
        hi4 = Whi.shape[0]
        lo = R ** (2*p)
        m2, m = Whi.shape[4], Whi.shape[5]
        k = Wlo.shape[5]
        Whi2 = Whi.reshape(hi4, R, R, R, lo, m2, m)   # h,i,j,p,l,a,b
        Wlo2 = Wlo.reshape(hi4, R, R, R, lo, m, k)    # h,j,p,q,l,b,k
        W4 = jnp.einsum('hijplab,hjpqlbk->hipjqlak', Whi2, Wlo2)
        levels4.append(W4.reshape(hi4, 4, 4, lo, m2, k))
    return UniformButterfly(bf.leaf, levels4, radix=4)

bf4 = combine_pairs(bf)
log(f"radix4 levels: {bf4.num_levels}, nbytes {bf4.nbytes()/1e9:.2f} vs {bf.nbytes()/1e9:.2f}")
# correctness
y2 = bf.apply(x[:, :4]); y4 = bf4.apply(x[:, :4])
err = float(jnp.linalg.norm(y4 - y2) / jnp.linalg.norm(y2))
log(f"radix4 rel err vs radix2: {err:.2e}")
def make_rep4(K):
    @jax.jit
    def rep(bf, x):
        def body(cur, _):
            return bf.apply(cur), 0.0
        out, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(out)
    return lambda: float(rep(bf4, x))
t_e4 = slope_time(make_rep4, 4, 24)
log(f"einsum chain r4: {t_e4*1e3:.3f} ms ({flops/t_e4/1e12:.1f} TFLOP/s)")

# ---- 5. pallas plans ----------------------------------------------------
from butterfly_tpu.ops.pallas_butterfly import FusedButterflyPlan, _apply_fused
for tag, b, fuse in (("r2 fuse5", bf, 8), ("r4 fuse2", bf4, 2), ("r4 fuse1", bf4, 1)):
    try:
        plan = FusedButterflyPlan(b, fuse=fuse, r_tile=256, interpret=False)
        fn = functools.partial(_apply_fused, plan._meta)
        def make_p(K, fn=fn, plan=plan):
            @jax.jit
            def rep(params, x):
                def body(cur, _):
                    return fn(params, cur), 0.0
                out, _ = jax.lax.scan(body, x, None, length=K)
                return jnp.sum(out)
            return lambda: float(rep(plan._params, x))
        tp = slope_time(make_p, 4, 24)
        ks = [pm.k for pm in plan._meta.passes]
        log(f"pallas {tag} (passes {ks}): {tp*1e3:.3f} ms ({flops/tp/1e12:.1f} TFLOP/s)")
    except Exception as e:
        log(f"pallas {tag} failed: {type(e).__name__}: {str(e)[:200]}")
