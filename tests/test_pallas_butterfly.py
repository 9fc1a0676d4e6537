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


@pytest.mark.parametrize("NB,blk,fuse", [(8, 8, 1), (8, 8, 2), (16, 8, 3),
                                         (16, 16, 4), (32, 8, 3)])
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
