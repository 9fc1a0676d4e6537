"""Fused Pallas butterfly kernel vs the einsum oracle.

Runs in Pallas interpreter mode on the CPU test backend; the same kernel
compiles via Mosaic on real TPU (exercised by bench.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from butterfly_tpu.ops.butterfly import random_butterfly
from butterfly_tpu.ops.pallas_butterfly import FusedButterflyPlan


@pytest.mark.parametrize(
    "NB,blk,fuse",
    [(8, 8, 1), (8, 8, 2),
     pytest.param(16, 8, 3, marks=pytest.mark.slow),
     pytest.param(16, 16, 4, marks=pytest.mark.slow),
     pytest.param(32, 8, 3, marks=pytest.mark.slow)])
def test_fused_matches_einsum(NB, blk, fuse):
    bf = random_butterfly(NB, blk, dtype=jnp.float32, key=jax.random.key(1))
    plan = FusedButterflyPlan(bf, fuse=fuse, r_tile=128, interpret=True)
    x = jax.random.normal(jax.random.key(2), (bf.shape[1], 16), jnp.float32)
    want = np.asarray(bf.apply(x), dtype=np.float64)
    got = np.asarray(plan.apply(x), dtype=np.float64)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-5


def test_fused_no_leaf_and_vector():
    bf = random_butterfly(16, 8, dtype=jnp.float32, key=jax.random.key(3),
                          with_leaf=False)
    plan = FusedButterflyPlan(bf, fuse=2, r_tile=128, interpret=True)
    x = jax.random.normal(jax.random.key(4), (bf.shape[1],), jnp.float32)
    want = np.asarray(bf.apply(x), dtype=np.float64)
    got = np.asarray(plan.apply(x), dtype=np.float64)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-5
    assert got.shape == want.shape


def test_fused_partial_depth():
    # fewer levels than log_R(NB), uneven pass split (5 = 3 + 2)
    bf = random_butterfly(64, 8, num_levels=5, dtype=jnp.float32,
                          key=jax.random.key(5))
    plan = FusedButterflyPlan(bf, fuse=3, r_tile=128, interpret=True)
    assert plan.num_passes == 2
    x = jax.random.normal(jax.random.key(6), (bf.shape[1], 8), jnp.float32)
    want = np.asarray(bf.apply(x), dtype=np.float64)
    got = np.asarray(plan.apply(x), dtype=np.float64)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-5


def test_fused_rejects_complex():
    bf = random_butterfly(8, 8, dtype=jnp.float32, key=jax.random.key(7))
    bfc = bf.astype(jnp.complex64)
    with pytest.raises(Exception):
        FusedButterflyPlan(bfc, interpret=True)


def test_fused_bf16_weights():
    """Mixed-precision serving mode: bf16 weights, f32 activations/accum.

    The fused plan must agree with the bf16 einsum path (same arithmetic:
    per-level bf16 inputs, f32 accumulation) and stay within bf16 distance
    of the f32 oracle.
    """
    bf32 = random_butterfly(16, 8, dtype=jnp.float32, key=jax.random.key(8))
    bf16 = bf32.astype(jnp.bfloat16)
    plan = FusedButterflyPlan(bf16, fuse=2, r_tile=128, interpret=True)
    x = jax.random.normal(jax.random.key(9), (bf32.shape[1], 4), jnp.float32)
    got = np.asarray(plan.apply(x), dtype=np.float64)
    want16 = np.asarray(bf16.apply(x), dtype=np.float64)
    want32 = np.asarray(bf32.apply(x), dtype=np.float64)
    rel_vs_einsum = np.linalg.norm(got - want16) / np.linalg.norm(want16)
    rel_vs_f32 = np.linalg.norm(got - want32) / np.linalg.norm(want32)
    assert rel_vs_einsum < 1e-3
    assert rel_vs_f32 < 5e-2
    assert got.dtype == np.float64 and plan.apply(x).dtype == jnp.float32


@pytest.mark.slow
def test_max_fuse_vmem_clamp():
    from butterfly_tpu.ops.pallas_butterfly import max_fuse

    k32 = max_fuse(2, 128, 256, has_leaf=True, wbytes=4)
    k16 = max_fuse(2, 128, 256, has_leaf=True, wbytes=2)
    assert k16 >= k32  # halving weight bytes can only deepen fusion
    # a plan requesting more than the clamp silently gets the clamp
    bf = random_butterfly(1024, 128, dtype=jnp.float32,
                          key=jax.random.key(10))
    plan = FusedButterflyPlan(bf, fuse=99, r_tile=256, interpret=True)
    # the leaf-carrying first pass respects the uniform-case clamp; every
    # pass's own VMEM estimate fits the budget
    from butterfly_tpu.ops.pallas_butterfly import (
        _VMEM_LIMIT_BYTES,
        _pass_vmem_bytes,
    )

    assert plan._meta.passes[0].k == k32
    for pm in plan._meta.passes:
        assert _pass_vmem_bytes(
            list(pm.dims), 2, 256, pm.leaf_dims, 4) <= _VMEM_LIMIT_BYTES
