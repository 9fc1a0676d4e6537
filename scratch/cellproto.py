"""Prototype: block-sparse cell matmul with VMEM-resident output band.

y[rc*gm : rc*gm+gm] += W[t] @ x[cc*gk : cc*gk+gk]  for each cell t,
output written to HBM once per r-tile. Correctness vs einsum+scatter and
timing vs the class-einsum path at bench-E-like sizes.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from butterfly_tpu.utils.cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    gm = gk = 128
    nb = 65          # 8320 rows
    n = nb * gm
    r = 1024
    T = 3000
    r_tile = 512
    hp = jax.lax.Precision.HIGHEST

    rng = np.random.default_rng(0)
    rc = rng.integers(0, nb, T).astype(np.int32)
    cc = np.sort(rng.integers(0, nb, T)).astype(np.int32)
    W = (rng.standard_normal((T, gm, gk)) / 16).astype(np.float32)

    x = jax.block_until_ready(
        jax.random.normal(jax.random.key(0), (n, r), jnp.float32))
    Wd = jnp.asarray(W)
    rcd, ccd = jnp.asarray(rc), jnp.asarray(cc)

    def kernel(rc_ref, cc_ref, w_ref, x_ref, o_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        acc = jnp.dot(w_ref[0], x_ref[...],
                      preferred_element_type=jnp.float32, precision=hp)
        i0 = rc_ref[t] * gm
        o_ref[pl.ds(i0, gm), :] += acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r // r_tile, T),
        in_specs=[
            pl.BlockSpec((1, gm, gk), lambda j, t, rc_, cc_: (t, 0, 0)),
            pl.BlockSpec((gk, r_tile), lambda j, t, rc_, cc_: (cc_[t], j)),
        ],
        out_specs=pl.BlockSpec((n, r_tile),
                               lambda j, t, rc_, cc_: (0, j)),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, r), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    jfn = jax.jit(lambda rc_, cc_, w, x: call(rc_, cc_, w, x))
    t0 = time.perf_counter()
    y = jax.block_until_ready(jfn(rcd, ccd, Wd, x))
    log(f"compile+run: {time.perf_counter()-t0:.1f}s")

    # reference
    @jax.jit
    def ref(w, x, rc_, cc_):
        xa = jnp.take(x.reshape(nb, gk, r), cc_, axis=0)
        ya = jnp.einsum("tmk,tkr->tmr", w, xa, precision=hp)
        return jnp.zeros((nb, gm, r), jnp.float32).at[rc_].add(ya)

    yref = jax.block_until_ready(ref(Wd, x, rcd, ccd)).reshape(n, r)
    rel = float(jnp.linalg.norm(y - yref) / jnp.linalg.norm(yref))
    log(f"rel vs reference: {rel:.2e}")

    _summ = jax.jit(lambda a: jnp.sum(a))

    def timeit(name, f, *args):
        def rep(K):
            t = time.perf_counter()
            outs = [f(*args) for _ in range(int(K))]
            float(_summ(outs[-1]))
            return time.perf_counter() - t
        rep(2), rep(12)
        t1 = min(rep(2) for _ in range(3))
        t2 = min(rep(12) for _ in range(3))
        per = (t2 - t1) / 10
        fl = 2 * T * gm * gk * r
        log(f"{name}: {per*1e3:.2f} ms = {fl/per/1e12:.1f} TFLOP/s "
            f"(weights {W.nbytes/1e6:.0f} MB -> {W.nbytes/per/1e9:.0f} GB/s)")
        return per

    timeit("cell kernel", jfn, rcd, ccd, Wd, x)
    timeit("einsum+scatter", ref, Wd, x, rcd, ccd)


if __name__ == "__main__":
    main()
