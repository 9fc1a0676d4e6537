"""Measure the NEW partition apply (cell kernel + host f64 distill) at
bench-E sizes on the real TPU: setup time, apply time, SoL, rel err."""
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
    log(f"plan build: {time.perf_counter()-ts:.1f}s  "
        f"flops/col {pp.flops_per_col()/1e6:.1f}M  "
        f"weights {pp.nbytes()/1e6:.0f} MB")

    r = 1024
    x = jax.block_until_ready(
        jax.random.normal(jax.random.key(0), (pp.n2, r), jnp.float32))
    _summ = jax.jit(lambda a: jnp.sum(a))

    def step(params, cur):
        y = pp.apply_with(params, cur)
        return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)

    jfn = jax.jit(step)
    t0 = time.perf_counter()
    float(_summ(jfn(pp.params, x)))
    log(f"compile+1st: {time.perf_counter()-t0:.1f}s")

    def rep(K):
        cur = x
        t = time.perf_counter()
        for _ in range(int(K)):
            cur = jfn(pp.params, cur)
        float(_summ(cur))
        return time.perf_counter() - t

    rep(2), rep(12)
    t1 = min(rep(2) for _ in range(3))
    t2 = min(rep(12) for _ in range(3))
    per = (t2 - t1) / 10
    fl = pp.flops_per_col() * r
    log(f"apply: {per*1e3:.2f} ms = {fl/per/1e12:.2f} TFLOP/s "
        f"(sol vs 31.9 f32hp: {fl/per/1e12/31.9:.2f})")

    zs = (np.random.default_rng(0).standard_normal((nE, 2))
          + 1j * np.random.default_rng(1).standard_normal((nE, 2)))
    got = np.asarray(pp.apply_complex(zs))
    want = A.matmat(zs)
    rel = float(np.linalg.norm(got - want) / np.linalg.norm(want))
    log(f"rel err vs host oracle: {rel:.2e}")


if __name__ == "__main__":
    main()
