"""Fiedler-tree (recursive spectral bisection) construction on a mesh.

Parity with the reference example (examples/fiedler_tree): build the
geometry-adapted row tree by recursive Fiedler-vector bisection of the
Laplace-Beltrami operator (reference: fiedler_tree.c / fiedler_tree_node.c,
bfTrimeshGetFiedler src/trimesh.c:1300-1367), print the per-level structure,
and compare the balance/locality of the resulting permutation against the
plain octree used by the streaming LBO pipeline.

Usage: python examples/fiedler_tree.py [--subdiv 3] [--leaf-size 64]
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
    from butterfly_tpu.trees import Octree
    from butterfly_tpu.trees.fiedler_tree import FiedlerTree

    ap = argparse.ArgumentParser()
    ap.add_argument("--obj", type=str, default=None)
    ap.add_argument("--subdiv", type=int, default=3)
    ap.add_argument("--leaf-size", type=int, default=64)
    args = ap.parse_args()

    mesh = Trimesh.from_obj(args.obj) if args.obj else icosphere(args.subdiv)
    print(f"mesh: {mesh.num_verts} vertices, {mesh.num_faces} faces")

    t0 = time.time()
    ftree = FiedlerTree(mesh, leaf_size=args.leaf_size)
    print(f"fiedler tree built [{time.time()-t0:.2f}s]")

    t0 = time.time()
    otree = Octree(mesh.verts, leaf_size=args.leaf_size)
    print(f"octree built       [{time.time()-t0:.2f}s]")

    for name, tree in (("fiedler", ftree), ("octree", otree)):
        sizes_by_depth = {}
        for level in tree.levels():
            if not level:
                continue
            d = level[0].depth
            sizes = [n.i1 - n.i0 for n in level]
            sizes_by_depth[d] = sizes
        print(f"{name}:")
        for d, sizes in sorted(sizes_by_depth.items()):
            print(f"  depth {d}: {len(sizes)} nodes, "
                  f"sizes min/median/max = {min(sizes)}/"
                  f"{int(np.median(sizes))}/{max(sizes)}")

        # locality: mean geodesic-ish (euclidean) diameter of the leaves
        leaves = [n for n in tree.post_order() if not n.children]
        diam = []
        for n in leaves:
            pts = mesh.verts[tree.perm[n.i0:n.i1]]
            diam.append(np.linalg.norm(pts.max(0) - pts.min(0)))
        print(f"  {len(leaves)} leaves, mean leaf diameter "
              f"{np.mean(diam):.3f}")


if __name__ == "__main__":
    main()
