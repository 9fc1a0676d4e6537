"""Packed device runtime vs the host oracle algebra.

Every plan must reproduce its source LinOp exactly (x64 on the CPU test
backend) and within f32 budget at reduced precision.
"""

import numpy as np
import pytest

from butterfly_tpu.ops import (
    BlockCoo,
    BlockDense,
    BlockDiag,
    Dense,
    Diag,
    Diff,
    Identity,
    Perm,
    Product,
    Scaled,
    Sum,
    Zero,
)
from butterfly_tpu.ops.packed import pack


def _check_plan(op, rng, dtype=np.float64, rtol=1e-12, r=3):
    plan = pack(op, dtype=dtype, block_align=16)
    n = op.shape[1]
    X = rng.standard_normal((n, r))
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        X = X + 1j * rng.standard_normal((n, r))
    want = op.matmat(X)
    got = np.asarray(plan(X))
    np.testing.assert_allclose(got, want, rtol=rtol, atol=rtol)
    # vector path
    np.testing.assert_allclose(np.asarray(plan(X[:, 0])), want[:, 0],
                               rtol=rtol, atol=rtol)
    return plan


def test_pack_dense(rng):
    _check_plan(Dense(rng.standard_normal((13, 7))), rng)


def test_pack_identity_diag_perm(rng):
    _check_plan(Identity(9), rng)
    _check_plan(Diag(rng.standard_normal(8)), rng)
    _check_plan(Perm(rng.permutation(11)), rng)


def test_pack_block_diag(rng):
    op = BlockDiag(
        [Dense(rng.standard_normal((5, 3))), Identity(4),
         Dense(rng.standard_normal((2, 6))), Diag(rng.standard_normal(3))]
    )
    _check_plan(op, rng)


def test_pack_block_coo(rng):
    op = BlockCoo(
        np.array([0, 3, 5]),
        np.array([0, 2, 4, 7]),
        [0, 1, 0],
        [0, 1, 2],
        [Dense(rng.standard_normal((3, 2))), Dense(rng.standard_normal((2, 2))),
         Dense(rng.standard_normal((3, 3)))],
    )
    _check_plan(op, rng)


def test_pack_product_chain(rng):
    a = Dense(rng.standard_normal((6, 4)))
    b = Dense(rng.standard_normal((4, 9)))
    c = Dense(rng.standard_normal((9, 5)))
    plan = _check_plan(Product([a, b, c]), rng)
    assert plan.num_stages == 3


def test_pack_butterfly_shape(rng):
    """BlockDiag @ BlockCoo @ Perm — the canonical butterfly chain."""
    psi = BlockDiag([Dense(rng.standard_normal((4, 3))) for _ in range(4)])
    w = BlockCoo(
        np.array([0, 3, 6, 9, 12]),
        np.array([0, 4, 8, 12, 16]),
        [0, 0, 1, 1, 2, 2, 3, 3],
        [0, 2, 0, 2, 1, 3, 1, 3],
        [Dense(rng.standard_normal((3, 4))) for _ in range(8)],
    )
    p = Perm(rng.permutation(16))
    _check_plan(Product([psi, w, p]), rng)


def test_pack_block_dense_of_products(rng):
    """Heterogeneous grid: dense blocks + chains of different depths —
    the structure of a multilevel butterfly."""
    bf = Product(
        [
            BlockDiag([Dense(rng.standard_normal((3, 2))) for _ in range(2)]),
            Dense(rng.standard_normal((4, 5))),
        ]
    )
    grid = BlockDense(
        [
            [bf, Dense(rng.standard_normal((6, 4)))],
            [Dense(rng.standard_normal((3, 5))), Zero((3, 4))],
        ]
    )
    plan = _check_plan(grid, rng)
    assert plan.num_stages == 2


def test_pack_scaled_sum_diff(rng):
    a = Dense(rng.standard_normal((5, 5)))
    b = Dense(rng.standard_normal((5, 5)))
    _check_plan(Scaled(2.5, a), rng)
    _check_plan(Sum([a, b]), rng)
    _check_plan(Diff(a, b), rng)
    _check_plan(Diff(a, Scaled(0.5, Product([b, b]))), rng)


def test_pack_complex(rng):
    A = rng.standard_normal((6, 4)) + 1j * rng.standard_normal((6, 4))
    B = rng.standard_normal((4, 7)) + 1j * rng.standard_normal((4, 7))
    _check_plan(Product([Dense(A), Dense(B)]), rng, dtype=np.complex128)


def test_pack_f32_budget(rng):
    """f32 plan of a 3-level chain stays within the 1e-5 rel-err budget."""
    ops = [Dense(rng.standard_normal((32, 32)) / 6) for _ in range(3)]
    op = Product(ops)
    plan = pack(op, dtype=np.float32, block_align=16)
    x = rng.standard_normal(32)
    want = op.matvec(x)
    got = np.asarray(plan(x))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-5, f"f32 rel err {rel:.2e}"


def test_pack_multilevel_helmholtz(rng):
    """Pack the real thing: a multilevel Helmholtz butterfly, exact in c128."""
    from butterfly_tpu.fac import helm2 as fac_helm2
    from butterfly_tpu.geom import Ellipse
    from butterfly_tpu.ops.helm2 import Helm2, LayerPot
    from butterfly_tpu.trees import Quadtree

    n = 2048
    e = Ellipse(1.0, 0.7, (0.0, 0.0), 0.3)
    X, T, N, W = e.sample_linspaced(n)
    helm = Helm2(k=50.0, layer_pot=LayerPot.SINGLE)
    tree = Quadtree(X, leaf_size=32, normals=N)
    A = fac_helm2.make_multilevel(helm, tree, tree)
    plan = pack(A, dtype=np.complex128, block_align=16)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    want = A.matvec(x)
    got = np.asarray(plan(x))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-12, f"packed multilevel rel err {rel:.2e}"
    # stats sanity
    st = plan.stats
    assert st.num_stages >= 2
    assert st.useful_flops_per_col > 0
    assert 0 <= st.padding_waste < 1


def test_plan_stats_padding(rng):
    op = Dense(rng.standard_normal((100, 100)))
    plan = pack(op, dtype=np.float32, block_align=128)
    # 100 -> 128: padded flops = 2*128*128, useful = 2*100*100
    assert plan.stats.useful_flops_per_col == 2 * 100 * 100
    assert plan.stats.padded_flops_per_col == 2 * 128 * 128
