"""2-D Helmholtz BIE solve with a butterfly-factorized system matrix.

Parity with the reference's flagship example (examples/simple/helm2_bie.c):
assemble the second-kind S' integral equation on an ellipse, solve densely
and with the butterfly operator via GMRES, compare fields against the exact
interior-source solution, and print the same metrics the reference prints
(MVP rel errors, timings, iteration counts, field errors).

Usage: python examples/helm2_bie.py [--n 2048] [--k 40]
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

    from butterfly_tpu.fac import helm2 as fac_helm2
    from butterfly_tpu.geom import Ellipse
    from butterfly_tpu.ops.helm2 import Helm2, LayerPot
    from butterfly_tpu.ops.linalg import solve_gmres
    from butterfly_tpu.ops.linop import Diag, Identity, Product, Scaled, Sum
    from butterfly_tpu.ops.quadrature import kr_correction
    from butterfly_tpu.trees import Quadtree

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--k", type=float, default=40.0)
    ap.add_argument("--kr-order", type=int, default=6)
    ap.add_argument("--tol", type=float, default=1e-10)
    args = ap.parse_args()

    n, k = args.n, args.k
    X, T, N, w = Ellipse(1.0, 0.6, (0.0, 0.0), 0.1).sample_linspaced(n)
    helm_sp = Helm2(k=k, layer_pot=LayerPot.PV_NORMAL_DERIV_SINGLE)
    helm_s = Helm2(k=k, layer_pot=LayerPot.SINGLE)
    x_src = np.array([[0.1, -0.05]])
    theta = np.linspace(0, 2 * np.pi, 25)[:-1]
    targets = np.stack([3 * np.cos(theta), 2.5 * np.sin(theta)], 1)
    rhs = helm_sp.kernel_matrix(x_src, X, None, N)[:, 0]

    def kernel_ij(i, j):
        return helm_sp.kernel_matrix(X[j:j+1], X[i:i+1], None, N[i:i+1])[0, 0]

    t0 = time.time()
    tree = Quadtree(X, leaf_size=32, normals=N)
    print(f"built quadtree [{time.time()-t0:.2f}s]")

    t0 = time.time()
    A_dense = helm_sp.kernel_matrix(X, X, None, N)
    A_dense += kr_correction(args.kr_order, n, kernel_ij).materialize()
    A_dense = A_dense * w[None, :] + 0.5 * np.eye(n)
    print(f"assembled dense system matrix [{time.time()-t0:.2f}s]")

    t0 = time.time()
    perm = tree.perm
    A_bf = fac_helm2.make_multilevel(helm_sp, tree, tree)
    corr = kr_correction(args.kr_order, n, kernel_ij, perm=perm)
    sys_bf = Sum([
        Product([Sum([A_bf, corr]), Diag(w[perm])]),
        Scaled(0.5, Identity(n, dtype=np.complex128)),
    ])
    print(f"assembled butterfly system [{time.time()-t0:.2f}s] "
          f"({sys_bf.nbytes()/1e6:.1f} MB vs {A_dense.nbytes/1e6:.1f} MB dense)")

    x = np.random.default_rng(0).standard_normal(n) + 0j
    mvp_rel = np.linalg.norm(sys_bf.matvec(x[perm]) - (A_dense @ x)[perm]) / \
        np.linalg.norm(A_dense @ x)
    print(f"MVP rel l2 error: {mvp_rel:.3e}")

    t0 = time.time()
    sigma_dense = np.linalg.solve(A_dense, rhs)
    print(f"dense LU solve [{time.time()-t0:.2f}s]")

    t0 = time.time()
    res = solve_gmres(sys_bf, rhs[perm], tol=args.tol, max_iter=400)
    sigma_bf = np.empty_like(res.x)
    sigma_bf[perm] = res.x
    print(f"BF GMRES solve: {res.num_iter} iterations "
          f"[{time.time()-t0:.2f}s] converged={res.converged}")

    u_exact = helm_s.kernel_matrix(x_src, targets)[:, 0]
    for name, sigma in [("dense", sigma_dense), ("butterfly", sigma_bf)]:
        u = helm_s.kernel_matrix(X, targets) @ (w * sigma)
        rel = np.linalg.norm(u - u_exact) / np.linalg.norm(u_exact)
        print(f"{name} field rel l2 error vs exact: {rel:.3e}")


if __name__ == "__main__":
    main()
