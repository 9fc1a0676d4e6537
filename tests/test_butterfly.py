"""UniformButterfly (FFT-form) vs its LinOp oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from butterfly_tpu.ops.butterfly import UniformButterfly, random_butterfly


def test_matches_linop_oracle(rng):
    bf = random_butterfly(8, 4, dtype=jnp.float64, key=jax.random.key(1))
    op = bf.to_linop()
    assert op.shape == bf.shape == (32, 32)
    x = rng.standard_normal((32, 3))
    got = np.asarray(bf.apply(x))
    want = op.matmat(x)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    # vector path
    np.testing.assert_allclose(
        np.asarray(bf.apply(x[:, 0])), want[:, 0], rtol=1e-12, atol=1e-12
    )


def test_partial_levels_and_no_leaf(rng):
    bf = random_butterfly(8, 4, num_levels=2, with_leaf=False,
                          dtype=jnp.float64, key=jax.random.key(2))
    assert bf.num_levels == 2 and bf.leaf is None
    x = rng.standard_normal(32)
    np.testing.assert_allclose(
        np.asarray(bf.apply(x)), bf.to_linop().matvec(x), rtol=1e-12, atol=1e-12
    )


def test_radix4(rng):
    bf = random_butterfly(16, 4, radix=4, dtype=jnp.float64, key=jax.random.key(3))
    assert bf.num_levels == 2
    x = rng.standard_normal(64)
    np.testing.assert_allclose(
        np.asarray(bf.apply(x)), bf.to_linop().matvec(x), rtol=1e-12, atol=1e-12
    )


def test_jit_and_grad(rng):
    """Factors are differentiable pytree leaves."""
    bf = random_butterfly(4, 4, dtype=jnp.float32, key=jax.random.key(4))
    x = jnp.asarray(rng.standard_normal((16, 2)).astype(np.float32))
    y_target = jnp.asarray(rng.standard_normal((16, 2)).astype(np.float32))

    @jax.jit
    def loss(bf, x, y):
        return jnp.mean((bf.apply(x) - y) ** 2)

    l0 = float(loss(bf, x, y_target))
    g = jax.grad(loss)(bf, x, y_target)
    assert isinstance(g, UniformButterfly)
    assert g.leaf.shape == bf.leaf.shape
    # one SGD step reduces the loss
    import jax.tree_util as jtu

    bf2 = jtu.tree_map(lambda p, gg: p - 0.1 * gg, bf, g)
    assert float(loss(bf2, x, y_target)) < l0


def test_flops_and_bytes():
    bf = random_butterfly(8, 4)
    # leaf: 8 blocks 4x4; levels: 3 levels x (8 out-blocks x 2 gemms) 4x4
    assert bf.flops_per_col() == 2 * 8 * 16 + 3 * 2 * 16 * 16
    assert bf.nbytes() == 4 * (8 * 16 + 3 * 16 * 16)


@pytest.mark.slow
def test_scaling_stability(rng):
    """Deep random butterfly keeps outputs O(1) (normalized init)."""
    bf = random_butterfly(64, 8, dtype=jnp.float64, key=jax.random.key(5))
    x = rng.standard_normal(64 * 8)
    y = np.asarray(bf.apply(x))
    assert 0.05 < np.std(y) < 20.0
