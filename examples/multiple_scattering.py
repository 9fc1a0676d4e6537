"""Multiple scattering: Helmholtz BIE on many ellipse scatterers.

Parity with the reference example (examples/multiple_scattering): scatterer
ellipses at Poisson-disk centers (multiple_scattering_context.c), combined
boundary discretization, butterfly-compressed combined-field system with
block Kapur-Rokhlin corrections (per-boundary periodic wraparound,
src/quadrature.c:82-95), GMRES solve, and the field error at exterior
targets against the exact interior-source solution. Also prints the k-sweep
grid row the reference's collector records
(collect_multiple_scattering_data.py:10-13).

Usage: python examples/multiple_scattering.py [--k 25] [--num 3]
       [--per-boundary 512] [--tol 1e-10]
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

    from butterfly_tpu.fac import helm2 as fac_helm2
    from butterfly_tpu.geom import Ellipse, sample_poisson_disk
    from butterfly_tpu.ops.helm2 import Helm2, LayerPot
    from butterfly_tpu.ops.linalg import solve_gmres
    from butterfly_tpu.ops.linop import Diag, Identity, Scaled, Sum, Product
    from butterfly_tpu.ops.quadrature import kr_block_correction
    from butterfly_tpu.trees import Quadtree

    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=float, default=25.0)
    ap.add_argument("--num", type=int, default=3, help="number of scatterers")
    ap.add_argument("--per-boundary", type=int, default=512)
    ap.add_argument("--tol", type=float, default=1e-10)
    ap.add_argument("--seed", type=int, default=5)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    centers = sample_poisson_disk((0, 0), (1, 1), 0.45, rng=rng)[: args.num]
    X, N, W, offsets = [], [], [], [0]
    for c in centers:
        a, b = 0.12, 0.08 + 0.02 * rng.random()
        e = Ellipse(a, b, tuple(c), rng.random() * np.pi)
        Xe, _, Ne, we = e.sample_linspaced(args.per_boundary)
        X.append(Xe); N.append(Ne); W.append(we)
        offsets.append(offsets[-1] + args.per_boundary)
    X, N, W = np.concatenate(X), np.concatenate(N), np.concatenate(W)
    n = len(X)
    print(f"{len(centers)} scatterers, n = {n} boundary points, "
          f"k = {args.k} [{time.time()-t0:.2f}s]")

    helm_sp = Helm2(k=args.k, layer_pot=LayerPot.PV_NORMAL_DERIV_SINGLE)
    helm_s = Helm2(k=args.k, layer_pot=LayerPot.SINGLE)

    # exact solution: interior point sources, one per scatterer
    x_src = centers
    targets = np.array([[3.0, 3.0], [-2.5, 3.2], [3.1, -2.6], [-2.8, -2.9]])
    rhs = helm_sp.kernel_matrix(x_src, X, None, N).sum(axis=1)

    t0 = time.time()
    tree = Quadtree(X, leaf_size=32, normals=N)
    perm = tree.perm
    A_bf = fac_helm2.make_multilevel(helm_sp, tree, tree)
    t_fac = time.time() - t0
    print(f"butterfly system built [{t_fac:.2f}s]")

    def kernel_ij(i, j):
        return helm_sp.kernel_matrix(X[j:j + 1], X[i:i + 1], None,
                                     N[i:i + 1])[0, 0]

    corr = kr_block_correction(6, n, offsets, kernel_ij, perm=perm)
    sys_op = Sum([
        Product([Sum([A_bf, corr]), Diag(W[perm])]),
        Scaled(0.5, Identity(n, dtype=np.complex128)),
    ])

    t0 = time.time()
    res = solve_gmres(sys_op, rhs[perm], tol=args.tol, max_iter=400)
    t_solve = time.time() - t0
    print(f"GMRES: {res.num_iter} iterations, converged={res.converged} "
          f"[{t_solve:.2f}s]")

    sigma = np.empty_like(res.x)
    sigma[perm] = res.x
    u = helm_s.kernel_matrix(X, targets) @ (W * sigma)
    u_exact = helm_s.kernel_matrix(x_src, targets).sum(axis=1)
    rel = np.linalg.norm(u - u_exact) / np.linalg.norm(u_exact)
    print(f"field rel l2 error at {len(targets)} targets: {rel:.3e}")
    ppw = 2 * np.pi / args.k / (2 * np.pi * 0.12 / args.per_boundary)
    print(f"sweep row: k={args.k:g} n={n} ppw~{ppw:.0f} "
          f"t_fac={t_fac:.2f}s t_solve={t_solve:.2f}s err={rel:.3e}")


if __name__ == "__main__":
    main()
