"""Fast Hankel evaluation with the adaptive piecewise-Chebyshev EvalTree.

Parity with the reference example (examples/tree_evaluator/
test_hankel_evaluator.c and simple_evaluator.py): build EvalTrees for J0/Y0
(the real/imaginary parts of H0), compare accuracy and speed against direct
special-function evaluation over a dense argument sweep, and print the leaf
statistics the reference's plot script visualizes
(make_hankel_evaluator_plots.py).

Usage: python examples/tree_evaluator.py [--a 0.5] [--b 500] [--tol 1e-12]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np
    import scipy.special as ss

    from butterfly_tpu.ops.eval_tree import EvalTree

    ap = argparse.ArgumentParser()
    ap.add_argument("--a", type=float, default=0.5)
    ap.add_argument("--b", type=float, default=500.0)
    ap.add_argument("--tol", type=float, default=1e-12)
    ap.add_argument("--order", type=int, default=16)
    ap.add_argument("--n", type=int, default=2_000_00)
    args = ap.parse_args()

    funcs = {"J0": lambda x: ss.jv(0, x), "Y0": lambda x: ss.yv(0, x)}
    rng = np.random.default_rng(0)
    x = rng.uniform(args.a, args.b, args.n)

    for name, f in funcs.items():
        t0 = time.time()
        tree = EvalTree(f, args.a, args.b, tol=args.tol, order=args.order)
        t_build = time.time() - t0
        t0 = time.time()
        got = tree(x)
        t_tree = time.time() - t0
        t0 = time.time()
        want = f(x)
        t_direct = time.time() - t0
        err = np.abs(got - want).max()
        print(f"{name}: {tree.num_leaves} leaves (order {args.order}) "
              f"built in {t_build*1e3:.1f} ms")
        print(f"  eval {args.n} pts: tree {t_tree*1e3:.1f} ms vs direct "
              f"{t_direct*1e3:.1f} ms (x{t_direct/max(t_tree,1e-12):.1f}), "
              f"max abs err {err:.2e}")


if __name__ == "__main__":
    main()
