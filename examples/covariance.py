"""Gaussian-process covariance operators on a mesh: exact vs fast paths.

Parity with the reference example family (examples/covariance): apply a
spectrally-defined covariance C = Phi gamma(Lam) Phi^T two ways —

  cheb: matrix-free Chebyshev polynomial of M^{-1} L (reference: cheb_cov.c,
        chebmul examples/covariance/cheb_cov.c:30-51), no eigensolve at all;
  fast: through the butterfly-COMPRESSED eigenbasis from the streaming LBO
        pipeline (reference: lbo_cov.c + fast_cov_test.sh),

then cross-check both against each other and draw GP samples (the
reference's covariance_sphere.jl ground-truth workflow).

Usage: python examples/covariance.py [--subdiv 2] [--kappa 2.0] [--tol 1e-8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    from butterfly_tpu.geom.trimesh import Trimesh, icosphere
    from butterfly_tpu.models.covariance import (
        CompressedCovariance,
        chebyshev_covariance_apply,
        matern_density,
        squared_exponential_density,
    )
    from butterfly_tpu.models.lbo import compress_lbo_eigenfunctions

    ap = argparse.ArgumentParser()
    ap.add_argument("--obj", type=str, default=None)
    ap.add_argument("--subdiv", type=int, default=2)
    ap.add_argument("--kappa", type=float, default=0.1)
    ap.add_argument("--nu", type=float, default=None,
                    help="Matern smoothness (default: squared exponential)")
    ap.add_argument("--tol", type=float, default=1e-8)
    ap.add_argument("--cheb-order", type=int, default=96)
    args = ap.parse_args()

    mesh = Trimesh.from_obj(args.obj) if args.obj else icosphere(args.subdiv)
    n = mesh.num_verts
    print(f"mesh: {n} vertices, {mesh.num_faces} faces")

    gamma = (matern_density(args.kappa, args.nu) if args.nu
             else squared_exponential_density(args.kappa))

    # fast path: streaming-compressed eigenbasis
    t0 = time.time()
    comp = compress_lbo_eigenfunctions(mesh, tol=args.tol)
    cov = CompressedCovariance(comp)
    print(f"compressed eigenbasis: {comp.freqs.size} eigenpairs, "
          f"compression rate {comp.compression_rate:.2f} "
          f"[{time.time()-t0:.1f}s]")

    rng = np.random.default_rng(0)
    w = rng.standard_normal(n)
    L, M = mesh.lbo_fem()

    # The two paths apply the same spectral function through different
    # operators: compressed basis gives Phi g(Lam) Phi^T w; the Chebyshev
    # polynomial of S = M^{-1} L gives Phi g(Lam) Phi^T (M w) — so feed the
    # compressed path M w to compare like with like.
    t0 = time.time()
    cw_fast = cov.apply(gamma, np.asarray(M @ w))
    t_fast = time.time() - t0

    lam_max = float(comp.freqs.max() ** 2)
    t0 = time.time()
    cw_cheb = chebyshev_covariance_apply(L, M, gamma, w, lam_max,
                                         order=args.cheb_order)
    t_cheb = time.time() - t0

    rel = np.linalg.norm(cw_fast - cw_cheb) / np.linalg.norm(cw_cheb)
    print(f"C w (fast, compressed basis): {t_fast*1e3:.1f} ms")
    print(f"C w (Chebyshev, matrix-free): {t_cheb*1e3:.1f} ms")
    print(f"rel l2 difference fast vs cheb: {rel:.3e}")

    # GP sampling through the compressed basis
    z = cov.sample(gamma, rng.standard_normal(comp.freqs.size))
    print(f"GP sample: mean {z.mean():+.3e}, std {z.std():.3e}")


if __name__ == "__main__":
    main()
