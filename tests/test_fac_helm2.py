"""Analytic Helmholtz butterfly vs dense ground truth.

Mirrors the reference's integration-test strategy: every factorization is
compared against the densely assembled kernel block
(reference: examples/simple/bf_one_block.c:147-280, helm2_bie.c:131-207).
"""

import numpy as np
import pytest

from butterfly_tpu.fac import helm2 as fac_helm2
from butterfly_tpu.geom import Ellipse
from butterfly_tpu.ops.helm2 import Helm2, LayerPot
from butterfly_tpu.ops.linop import Product
from butterfly_tpu.trees import Quadtree


@pytest.fixture(scope="module")
def problem():
    n = 2048
    e = Ellipse(1.0, 0.7, (0.0, 0.0), 0.3)
    X, T, N, W = e.sample_linspaced(n)
    helm = Helm2(k=50.0, layer_pot=LayerPot.SINGLE)
    tree = Quadtree(X, leaf_size=32, normals=N)
    return helm, tree, X


def _rand_complex(rng, n):
    return rng.standard_normal(n) + 1j * rng.standard_normal(n)


def test_single_block_butterfly(problem, rng):
    """One separated block pair, butterfly vs dense
    (reference parity: examples/simple/bf_one_block.c)."""
    helm, tree, X = problem
    lvl = tree.nodes_at_depth(2)
    pairs = [(s, t) for s in lvl for t in lvl if s.is_separated_from(t)]
    assert pairs, "test geometry must contain separated blocks"
    src, tgt = max(pairs, key=lambda p: p[0].num_points * p[1].num_points)
    op = fac_helm2.make_single(helm, tree, tree, src, tgt)
    assert isinstance(op, Product), "separated block must actually butterfly"
    assert len(op.factors) >= 2

    Z = helm.kernel_matrix(tree.node_points(src), tree.node_points(tgt))
    x = _rand_complex(rng, op.shape[1])
    rel = np.linalg.norm(op.matvec(x) - Z @ x) / np.linalg.norm(Z @ x)
    assert rel < 1e-10, f"single-block rel err {rel:.3e}"

    # the butterfly must actually compress the block
    assert op.nbytes() < Z.nbytes


def test_single_block_matmat_and_adjoint(problem, rng):
    helm, tree, X = problem
    lvl = tree.nodes_at_depth(2)
    pairs = [(s, t) for s in lvl for t in lvl if s.is_separated_from(t)]
    src, tgt = max(pairs, key=lambda p: p[0].num_points * p[1].num_points)
    op = fac_helm2.make_single(helm, tree, tree, src, tgt)
    Z = helm.kernel_matrix(tree.node_points(src), tree.node_points(tgt))
    Xm = _rand_complex(rng, op.shape[1] * 3).reshape(op.shape[1], 3)
    np.testing.assert_allclose(op.matmat(Xm), Z @ Xm, rtol=0, atol=1e-9)
    y = _rand_complex(rng, op.shape[0])
    np.testing.assert_allclose(op.H.matvec(y), np.conj(Z).T @ y, rtol=0, atol=1e-9)


def test_multilevel_butterfly(problem, rng):
    """Full multilevel factorization vs dense kernel matrix in tree order
    (reference parity: helm2_bie.c MVP rel l2 errors)."""
    helm, tree, X = problem
    A = fac_helm2.make_multilevel(helm, tree, tree)
    # the factorization must contain actual butterflies, not just dense blocks
    prods = []
    def _find(o):
        if isinstance(o, Product):
            prods.append(o)
        for c in o.children():
            _find(c)
    _find(A)
    assert prods, "multilevel factorization degenerated to all-dense"
    P = tree.perm
    Z = helm.kernel_matrix(X, X)[np.ix_(P, P)]
    x = _rand_complex(rng, A.shape[1])
    rel = np.linalg.norm(A.matvec(x) - Z @ x) / np.linalg.norm(Z @ x)
    assert rel < 1e-10, f"multilevel rel err {rel:.3e}"


def test_multilevel_combined_field(rng):
    """Combined-field layer potential (the BIE formulation) end to end."""
    n = 768
    e = Ellipse(1.0, 0.8, (0.0, 0.0), 0.0)
    X, T, N, W = e.sample_linspaced(n)
    helm = Helm2(k=30.0, layer_pot=LayerPot.COMBINED_FIELD, alpha=1.0, beta=-0.5j)
    tree = Quadtree(X, leaf_size=24, normals=N)
    A = fac_helm2.make_multilevel(helm, tree, tree)
    P = tree.perm
    Z = helm.kernel_matrix(X, X, N, None)[np.ix_(P, P)]
    x = _rand_complex(rng, n)
    rel = np.linalg.norm(A.matvec(x) - Z @ x) / np.linalg.norm(Z @ x)
    assert rel < 1e-10, f"combined-field rel err {rel:.3e}"


def test_not_butterfliable_falls_back_dense(problem):
    """Leaf/tiny nodes must fall back to dense blocks."""
    helm, tree, X = problem
    leaf = next(n for n in tree.root.subtree_nodes() if n.is_leaf)
    op = fac_helm2.make_single(helm, tree, tree, leaf, leaf)
    from butterfly_tpu.ops.linop import Dense

    assert isinstance(op, Dense)
