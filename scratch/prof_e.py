"""Profile bench section E: where does the partition apply spend time?

Times dense-classes-only, bf-classes-only, gather/scatter-only, and the full
tiled apply, with the bench's dispatch-chained slope method. Also reports the
class inventory and flops split.
"""
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
    log(f"fac build: {time.perf_counter()-ts:.1f}s")
    ts = time.perf_counter()
    pp = partition_apply_plan(A, rank=None)
    log(f"plan build: {time.perf_counter()-ts:.1f}s")

    # inventory
    dense_flops = 0
    for W, in_idx, out_idx in pp.params["dense"]:
        B, mt, kt = W.shape
        log(f"  dense class ({mt},{kt}) x{B}: {2*B*mt*kt*1024/1e9:.2f} GF @r1024, {W.nbytes/1e6:.0f} MB")
        dense_flops += 2 * B * mt * kt
    log(f"  dense total {dense_flops*1024/1e9:.1f} GF @r1024")
    for m in pp._bf_meta:
        log(f"  bf class {m}")
    bf_flops = pp._flops - dense_flops
    log(f"  bf total {bf_flops*1024/1e9:.1f} GF @r1024")
    log(f"  mega blocks: {len(pp._mega)}")

    r = 1024
    key = jax.random.key(0)
    x = jax.block_until_ready(
        jax.random.normal(key, (pp.n2, r), jnp.float32))
    _summ = jax.jit(lambda a: jnp.sum(a))
    hp = jax.lax.Precision.HIGHEST
    n2 = pp.n2

    def timer(step, params):
        jfn = jax.jit(step)
        t0 = time.perf_counter()
        float(_summ(jfn(params, x)))
        log(f"    (compile+1st: {time.perf_counter()-t0:.1f}s)")

        def rep(K):
            cur = x
            t = time.perf_counter()
            for _ in range(int(K)):
                cur = jfn(params, cur)
            float(_summ(cur))
            return time.perf_counter() - t
        rep(2), rep(12)
        t1 = min(rep(2) for _ in range(3))
        t2 = min(rep(12) for _ in range(3))
        return (t2 - t1) / 10

    def norm_step(y):
        return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)

    def full(params, x):
        y = jnp.zeros((n2 + 1, x.shape[1]), x.dtype)
        for W, in_idx, out_idx in params["dense"]:
            xa = jnp.take(x, in_idx.reshape(-1), axis=0).reshape(
                in_idx.shape[0], in_idx.shape[1], x.shape[1])
            ya = jnp.einsum("bmk,bkr->bmr", W, xa, precision=hp)
            y = y.at[out_idx.reshape(-1)].add(ya.reshape(-1, x.shape[1]))
        for fn, (bfp, in_idx, out_idx) in zip(pp._bf_fns, params["bf"]):
            xa = jnp.take(x, in_idx, axis=0)
            ya = fn(bfp, xa)
            y = y.at[out_idx].add(ya)
        return norm_step(y[:n2])

    def dense_only(params, x):
        y = jnp.zeros((n2 + 1, x.shape[1]), x.dtype)
        for W, in_idx, out_idx in params["dense"]:
            xa = jnp.take(x, in_idx.reshape(-1), axis=0).reshape(
                in_idx.shape[0], in_idx.shape[1], x.shape[1])
            ya = jnp.einsum("bmk,bkr->bmr", W, xa, precision=hp)
            y = y.at[out_idx.reshape(-1)].add(ya.reshape(-1, x.shape[1]))
        return norm_step(y[:n2])

    def bf_only(params, x):
        y = jnp.zeros((n2 + 1, x.shape[1]), x.dtype)
        for fn, (bfp, in_idx, out_idx) in zip(pp._bf_fns, params["bf"]):
            xa = jnp.take(x, in_idx, axis=0)
            ya = fn(bfp, xa)
            y = y.at[out_idx].add(ya)
        return norm_step(y[:n2])

    def gs_only(params, x):
        y = jnp.zeros((n2 + 1, x.shape[1]), x.dtype)
        for W, in_idx, out_idx in params["dense"]:
            xa = jnp.take(x, in_idx.reshape(-1), axis=0)
            y = y.at[out_idx.reshape(-1)].add(
                xa[:out_idx.size] if xa.shape[0] >= out_idx.size
                else jnp.pad(xa, ((0, out_idx.size - xa.shape[0]), (0, 0))))
        for fn, (bfp, in_idx, out_idx) in zip(pp._bf_fns, params["bf"]):
            xa = jnp.take(x, in_idx, axis=0)
            y = y.at[out_idx].add(
                xa[:out_idx.size] if xa.shape[0] >= out_idx.size
                else jnp.pad(xa, ((0, out_idx.size - xa.shape[0]), (0, 0))))
        return norm_step(y[:n2])

    for name, fn in [("full", full), ("dense_only", dense_only),
                     ("bf_only", bf_only), ("gather_scatter", gs_only)]:
        t = timer(fn, pp.params)
        fl = pp._flops if name == "full" else (
            dense_flops if name == "dense_only" else
            bf_flops if name == "bf_only" else 0)
        log(f"  {name}: {t*1e3:.2f} ms  ({fl*r/t/1e12:.2f} TFLOP/s)")

    # accuracy of current plan
    zs = (np.random.default_rng(0).standard_normal((nE, 2))
          + 1j * np.random.default_rng(1).standard_normal((nE, 2)))
    got = np.asarray(pp.apply_complex(zs))
    want = A.matmat(zs)
    rel = float(np.linalg.norm(got - want) / np.linalg.norm(want))
    log(f"  rel err: {rel:.2e}")


if __name__ == "__main__":
    main()
