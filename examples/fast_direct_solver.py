"""Hierarchical-LU fast direct solver on a BIE system.

Parity with the reference prototype
(examples/fast_direct_solver/fast_direct_solver.py): factorize a
quadtree-ordered Helmholtz system once, then amortize many solves.

Usage: python examples/fast_direct_solver.py [--n 2048] [--k 25]
"""

import argparse
import os
import sys

import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from butterfly_tpu.fac.solver import FastDirectSolver
    from butterfly_tpu.geom import Ellipse
    from butterfly_tpu.ops.helm2 import Helm2, LayerPot
    from butterfly_tpu.trees import Quadtree

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--k", type=float, default=25.0)
    ap.add_argument("--base", type=int, default=256)
    ap.add_argument("--sampled", action="store_true",
                    help="compress reflectors with randomized middle-out sampling")
    args = ap.parse_args()

    n, k = args.n, args.k
    X, T, N, w = Ellipse(1.0, 0.6, (0.0, 0.0), 0.2).sample_linspaced(n)
    helm = Helm2(k=k, layer_pot=LayerPot.PV_NORMAL_DERIV_SINGLE)
    tree = Quadtree(X, leaf_size=32, normals=N)
    P = tree.perm
    A = (helm.kernel_matrix(X, X, None, N) * w[None, :] + 0.5 * np.eye(n))
    A = A[np.ix_(P, P)]

    t0 = time.time()
    fds = FastDirectSolver(
        A, base_size=args.base, tol=1e-12,
        reflector="sampled" if args.sampled else "solve",
    )
    print(f"factorized in {time.time()-t0:.1f}s; storage "
          f"{fds.nbytes()/1e6:.1f} MB vs dense {A.nbytes/1e6:.1f} MB")

    rng = np.random.default_rng(0)
    b = rng.standard_normal(n) + 0j
    t0 = time.time()
    x = fds.solve(b)
    print(f"first solve {1e3*(time.time()-t0):.1f} ms, residual "
          f"{np.linalg.norm(A @ x - b)/np.linalg.norm(b):.2e}")
    t0 = time.time()
    for _ in range(20):
        fds.solve(b)
    print(f"amortized solve: {1e3*(time.time()-t0)/20:.1f} ms")


if __name__ == "__main__":
    main()
