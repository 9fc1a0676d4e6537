"""Helmholtz kernel assembly: host vs jnp paths, re-expansion accuracy."""

import jax
import numpy as np
import pytest

from butterfly_tpu.geom import Circle, Ellipse
from butterfly_tpu.ops.helm2 import Helm2, LayerPot


@pytest.fixture
def geometry():
    e = Ellipse(1.0, 0.6, (0.0, 0.0), 0.2)
    X, T, N, W = e.sample_linspaced(64)
    return X, N


@pytest.mark.parametrize(
    "lp", [LayerPot.SINGLE, LayerPot.PV_DOUBLE, LayerPot.PV_NORMAL_DERIV_SINGLE,
           LayerPot.COMBINED_FIELD]
)
def test_kernel_matrix_host_vs_jnp(geometry, lp):
    X, N = geometry
    src, tgt = X[:30], X[34:]
    nsrc, ntgt = N[:30], N[34:]
    helm = Helm2(k=10.0, layer_pot=lp, alpha=1.0, beta=0.5j)
    K_host = helm.kernel_matrix(src, tgt, nsrc, ntgt)
    K_dev = np.asarray(
        jax.jit(lambda: helm.kernel_matrix_jnp(src, tgt, nsrc, ntgt))()
    )
    np.testing.assert_allclose(K_dev, K_host, atol=1e-9)


def test_kernel_zero_distance_is_zero(geometry):
    X, N = geometry
    helm = Helm2(k=5.0, layer_pot=LayerPot.SINGLE)
    K = helm.kernel_matrix(X, X)
    assert np.all(np.isfinite(K))
    np.testing.assert_array_equal(np.diag(K), 0.0)


def test_rank_estimate_monotone():
    helm = Helm2(k=20.0)
    c1 = Circle((0.0, 0.0), 1.0)
    near = Circle((3.0, 0.0), 1.0)
    far = Circle((10.0, 0.0), 1.0)
    r_near = helm.rank_estimate(c1, near)
    r_far = helm.rank_estimate(c1, far)
    assert r_far < r_near, "rank estimate must decrease with separation"


def test_reexpansion_accuracy():
    """Proxy re-expansion must reproduce the field of true sources at
    well-separated targets (the contract behind every butterfly factor;
    reference: bfHelm2GetReexpansionMatrix, src/helm2.c:321-365)."""
    rng = np.random.default_rng(0)
    helm = Helm2(k=15.0, layer_pot=LayerPot.SINGLE)
    src_circ = Circle((0.0, 0.0), 1.0)
    tgt_circ = Circle((6.0, 0.0), 1.0)
    # true sources inside the source circle
    src_pts = 0.7 * (rng.random((40, 2)) * 2 - 1)
    p = helm.rank_estimate(src_circ, tgt_circ, 1.0, 1e-15)
    shift = helm.reexpansion_matrix(
        src_pts, src_circ.sample_points(p), tgt_circ.sample_points(p)
    )
    assert shift.shape == (p, 40)
    # evaluate at independent targets within the target circle's box
    tgt_pts = np.asarray(tgt_circ.center) + 0.6 * (rng.random((25, 2)) * 2 - 1)
    charges = rng.standard_normal(40) + 1j * rng.standard_normal(40)
    field_true = helm.kernel_matrix(src_pts, tgt_pts) @ charges
    field_proxy = helm.kernel_matrix(src_circ.sample_points(p), tgt_pts) @ (
        shift @ charges
    )
    rel = np.linalg.norm(field_proxy - field_true) / np.linalg.norm(field_true)
    assert rel < 1e-10, f"re-expansion rel err {rel:.3e}"
