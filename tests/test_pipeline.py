"""Pipeline parallelism: slot-form conversion + GPipe schedule on the
8-device CPU mesh (SURVEY.md §2.10 PP design: stage = butterfly level
group, microbatched queries, ppermute rotation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from butterfly_tpu.ops.butterfly import random_butterfly
from butterfly_tpu.parallel.pipeline import (
    PipelinedButterfly,
    SlotButterfly,
    make_stage_mesh,
)


def _rel(a, b):
    return np.linalg.norm(np.asarray(a) - np.asarray(b)) / np.linalg.norm(
        np.asarray(b)
    )


@pytest.mark.parametrize(
    "NB,blk,with_leaf",
    [(16, 8, True), (16, 8, False),
     pytest.param(32, 4, True, marks=pytest.mark.slow)])
def test_slot_form_matches_butterfly(NB, blk, with_leaf):
    bf = random_butterfly(NB, blk, dtype=jnp.float32, key=jax.random.key(2),
                          with_leaf=with_leaf)
    sb = SlotButterfly.from_butterfly(bf)
    x = jax.random.normal(jax.random.key(3), (bf.shape[1], 6), jnp.float32)
    assert _rel(sb.apply(x), bf.apply(x)) < 1e-5
    v = jax.random.normal(jax.random.key(4), (bf.shape[1],), jnp.float32)
    assert _rel(sb.apply(v), bf.apply(v)) < 1e-5


@pytest.mark.parametrize(
    "stages,micro",
    [pytest.param(2, 4, marks=pytest.mark.slow), (4, 4), (4, 1), (8, 2)])
def test_pipelined_apply_matches(stages, micro):
    NB, blk = 256, 4  # 8 levels: divisible into 2/4/8 stages
    bf = random_butterfly(NB, blk, dtype=jnp.float32, key=jax.random.key(5))
    mesh = make_stage_mesh(stages)
    pipe = PipelinedButterfly(bf, mesh, num_micro=micro)
    r = micro * 3
    x = jax.random.normal(jax.random.key(6), (bf.shape[1], r), jnp.float32)
    got = pipe.apply(x)
    want = bf.apply(x)
    assert _rel(got, want) < 1e-5


def test_pipeline_weights_are_stage_sharded():
    NB, blk = 256, 4
    bf = random_butterfly(NB, blk, dtype=jnp.float32, key=jax.random.key(7))
    mesh = make_stage_mesh(4)
    pipe = PipelinedButterfly(bf, mesh, num_micro=2)
    # leading (stage) axis must be sharded: each device holds 1/4 of levels
    shard_shapes = {
        s.data.shape for s in pipe.weights.addressable_shards
    }
    assert shard_shapes == {(1,) + pipe.weights.shape[1:]}


@pytest.mark.slow
def test_pipeline_rejects_indivisible_stages():
    bf = random_butterfly(16, 4, dtype=jnp.float32, key=jax.random.key(8))
    mesh = make_stage_mesh(3)
    with pytest.raises(Exception):
        PipelinedButterfly(bf, mesh)  # 4 levels, 3 stages
