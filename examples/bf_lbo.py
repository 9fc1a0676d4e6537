"""Streaming butterfly compression of Laplace-Beltrami eigenfunctions.

Parity with the reference example (examples/lbo/bf_lbo.c): build the FEM
LBO on a mesh, stream eigenbands through the factorizer band by band, and
print the compression metrics the reference prints (compressed vs
uncompressed MB, compression rate, streamed rel errors).

Usage: python examples/bf_lbo.py [--subdiv 3] [--tol 1e-6] [--fiedler]
       python examples/bf_lbo.py --obj mesh.obj
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
    from butterfly_tpu.models.lbo import compress_lbo_eigenfunctions

    ap = argparse.ArgumentParser()
    ap.add_argument("--obj", type=str, default=None)
    ap.add_argument("--subdiv", type=int, default=3)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--col-depth", type=int, default=3)
    ap.add_argument("--fiedler", action="store_true",
                    help="use the spectral-bisection row tree")
    args = ap.parse_args()

    mesh = Trimesh.from_obj(args.obj) if args.obj else icosphere(args.subdiv)
    print(f"mesh: {mesh.num_verts} vertices, {mesh.num_faces} faces")

    t0 = time.time()
    comp = compress_lbo_eigenfunctions(
        mesh, tol=args.tol, col_tree_depth=args.col_depth,
        use_fiedler_tree=args.fiedler,
    )
    print(f"streamed {comp.freqs.size} eigenpairs [{time.time()-t0:.1f}s]")
    print(f"uncompressed size: {comp.dense_bytes/1e6:.2f} MB")
    print(f"compressed size:   {comp.compressed_bytes/1e6:.2f} MB")
    print(f"compression rate:  {comp.compression_rate:.2f}")

    # random-matvec accuracy check against the eigen-residual
    L, M = mesh.lbo_fem()
    rng = np.random.default_rng(0)
    c = rng.standard_normal(comp.freqs.size)
    op = comp.fac.as_linop()
    y = np.empty(mesh.num_verts)
    y[comp.row_tree.perm] = op.matvec(c)
    z = np.empty(mesh.num_verts)
    z[comp.row_tree.perm] = op.matvec(comp.freqs**2 * c)
    rel = np.linalg.norm(L @ y - M @ z) / np.linalg.norm(L @ y)
    print(f"eigen-residual of compressed apply: {rel:.3e}")


if __name__ == "__main__":
    main()
