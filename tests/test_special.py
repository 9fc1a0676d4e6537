"""Device-path Bessel/Hankel accuracy vs scipy (the host oracle)."""

import jax
import numpy as np
import pytest
import scipy.special as ss

from butterfly_tpu.ops.special import (
    bessel_j0,
    bessel_j1,
    bessel_y0,
    bessel_y1,
    hankel1_0,
    hankel1_1,
    hankel1_0_host,
    hankel1_1_host,
)

# Envelope-relative error: |err| / sqrt(2/(pi x)) avoids blowup at zeros of
# J/Y while still demanding full absolute accuracy at the oscillation scale.
TOL = 1e-10


def _envelope(x):
    return np.sqrt(2.0 / (np.pi * np.maximum(x, 1e-10)))


@pytest.mark.parametrize(
    "mine,nu,kind",
    [
        (bessel_j0, 0, "j"),
        (bessel_j1, 1, "j"),
        (bessel_y0, 0, "y"),
        (bessel_y1, 1, "y"),
    ],
)
def test_bessel_accuracy(mine, nu, kind):
    x = np.concatenate(
        [np.linspace(1e-6, 12.0, 600), np.linspace(12.0, 300.0, 600), [12.0]]
    )
    want = ss.jv(nu, x) if kind == "j" else ss.yv(nu, x)
    got = np.asarray(jax.jit(mine)(x))
    err = np.abs(got - want) / _envelope(x)
    assert err.max() < TOL, f"max envelope-rel err {err.max():.3e}"


def test_hankel_matches_j_plus_iy():
    x = np.linspace(0.5, 60.0, 200)
    h0 = np.asarray(jax.jit(hankel1_0)(x))
    h1 = np.asarray(jax.jit(hankel1_1)(x))
    np.testing.assert_allclose(h0, ss.hankel1(0, x), atol=1e-10)
    np.testing.assert_allclose(h1, ss.hankel1(1, x), atol=1e-10)


def test_host_path_is_scipy():
    x = np.linspace(0.1, 30.0, 50)
    np.testing.assert_array_equal(hankel1_0_host(x), ss.hankel1(0, x))
    np.testing.assert_array_equal(hankel1_1_host(x), ss.hankel1(1, x))


def test_small_argument_behavior():
    """Tiny arguments: J0 -> 1, Y0 -> -inf logarithmically; no NaNs."""
    x = np.array([1e-12, 1e-8, 1e-4])
    j0 = np.asarray(jax.jit(bessel_j0)(x))
    y0 = np.asarray(jax.jit(bessel_y0)(x))
    np.testing.assert_allclose(j0, 1.0, atol=1e-8)
    assert np.all(np.isfinite(y0)) and np.all(y0 < -5)
