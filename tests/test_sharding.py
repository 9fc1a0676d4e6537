"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from butterfly_tpu.models.retrieval import CompressedTable, compress_table
from butterfly_tpu.ops.butterfly import random_butterfly
from butterfly_tpu.parallel import (
    data_sharding,
    make_mesh,
    shard_butterfly,
    shard_table,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["data"] * mesh.shape["model"] == 8
    assert mesh.shape["model"] >= 2
    mesh2 = make_mesh(8, data=8, model=1)
    assert dict(mesh2.shape) == {"data": 8, "model": 1}


def test_sharded_scoring_matches_single_device(rng):
    """Sharded scoring must be numerically identical to local scoring."""
    table = rng.standard_normal((1024, 32)).astype(np.float32)
    ct = compress_table(table, rank=8, block_rows=64)
    q = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    want = np.asarray(ct.score(q))

    mesh = make_mesh(8)
    with mesh:
        cts = shard_table(ct, mesh)
        qs = jax.device_put(q, data_sharding(mesh))
        got = np.asarray(jax.jit(lambda c, q: c.score(q))(cts, qs))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_butterfly_apply_matches(rng):
    bf = random_butterfly(16, 8, dtype=jnp.float32, key=jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((bf.shape[1], 4)).astype(np.float32))
    want = np.asarray(bf.apply(x))
    mesh = make_mesh(8)
    with mesh:
        bfs = shard_butterfly(bf, mesh)
        got = np.asarray(jax.jit(lambda b, x: b.apply(x))(bfs, x))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "_graft", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    vals, idx = jax.jit(fn)(*args)
    assert vals.shape == idx.shape == (16, 100)
    mod.dryrun_multichip(8)
    mod.dryrun_multichip(4)
