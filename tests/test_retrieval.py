"""Compressed-table retrieval: reconstruction, scoring, recall@k, training."""

import numpy as np
import pytest

from butterfly_tpu.models.retrieval import (
    CompressedTable,
    compress_table,
    exact_topk,
    recall_at_k,
    train_step,
)


def _smooth_table(n, d, rng, latent=8):
    """Embedding rows that are smooth functions of a latent coordinate —
    the structured regime where compression is meaningful (rows of kernel /
    covariance / eigenvector matrices behave like this)."""
    z = np.sort(rng.random(n))  # latent positions
    freqs = rng.standard_normal((latent, d))
    phases = rng.random((latent, 1)) * 2 * np.pi
    comps = np.stack([np.cos(2 * np.pi * (j + 1) * z + phases[j, 0]) for j in range(latent)])
    return (comps.T @ freqs) + 0.001 * rng.standard_normal((n, d))


@pytest.fixture(scope="module")
def table():
    rng = np.random.default_rng(0)
    return _smooth_table(2048, 64, rng)


def test_compression_reconstruction(table):
    ct = compress_table(table, rank=16, block_rows=128)
    rec = np.asarray(ct.materialize())
    rel = np.linalg.norm(rec - table) / np.linalg.norm(table)
    assert rel < 1e-2, f"reconstruction rel err {rel:.3e}"
    assert ct.nbytes() < table.astype(np.float32).nbytes


def test_lookup_matches_rows(table):
    ct = compress_table(table, rank=24, block_rows=128)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, table.shape[0], 50)
    rows = np.asarray(ct.lookup(ids))
    want = np.asarray(ct.materialize())[ids]
    np.testing.assert_allclose(rows, want, atol=1e-4)


def test_score_matches_dense(table):
    ct = compress_table(table, rank=24, block_rows=128)
    rng = np.random.default_rng(2)
    q = rng.standard_normal((5, table.shape[1])).astype(np.float32)
    scores = np.asarray(ct.score(q))
    want = np.asarray(ct.materialize()) @ q.T
    np.testing.assert_allclose(scores, want, atol=1e-3)


def test_recall_at_100(table):
    """BASELINE gate: recall@100 vs exact dense scoring at parity."""
    ct = compress_table(table, rank=16, block_rows=128)
    rng = np.random.default_rng(3)
    q = rng.standard_normal((8, table.shape[1])).astype(np.float32)
    _, idx = ct.topk(q, 100)
    true_idx = exact_topk(table, q, 100)
    rec = recall_at_k(np.asarray(idx), true_idx)
    assert rec > 0.97, f"recall@100 = {rec:.3f}"


@pytest.mark.slow
def test_recall_at_100_large_skewed():
    """Recall at scale on a popularity-skewed table (margin-separated top-k —
    strict recall is ill-posed when thousands of rows tie within the noise
    floor, so realistic margins are part of the benchmark definition)."""
    from butterfly_tpu.models.retrieval import recall_with_tolerance

    rng = np.random.default_rng(7)
    n, d = 16384, 64
    table = _smooth_table(n, d, rng)
    pop = (1.0 + rng.pareto(2.0, n)).clip(None, 50.0)
    table *= pop[:, None]
    ct = compress_table(table, rank=24, block_rows=128)
    q = rng.standard_normal((16, d)).astype(np.float32)
    _, idx = ct.topk(q, 100)
    true_scores = q @ table.T
    strict = recall_at_k(np.asarray(idx), exact_topk(table, q, 100))
    tolr = recall_with_tolerance(np.asarray(idx), true_scores, 100, tol=1e-3)
    assert strict > 0.95, f"strict recall@100 = {strict:.3f}"
    assert tolr > 0.99, f"tolerance recall@100 = {tolr:.3f}"


def test_train_step_reduces_loss(table):
    ct = compress_table(table, rank=8, block_rows=128)
    rng = np.random.default_rng(4)
    ids = rng.integers(0, table.shape[0], 256)
    rows = table[ids].astype(np.float32)
    import jax.numpy as jnp

    ct1, l0 = train_step(ct, jnp.asarray(rows), jnp.asarray(ids), lr=1e-2)
    for _ in range(5):
        ct1, l1 = train_step(ct1, jnp.asarray(rows), jnp.asarray(ids), lr=1e-2)
    assert float(l1) <= float(l0)


def test_bad_shapes_rejected():
    import jax.numpy as jnp

    with pytest.raises(Exception):
        CompressedTable(jnp.zeros((4, 8, 3)), jnp.zeros((4, 5, 16)))
    with pytest.raises(Exception):
        compress_table(np.zeros((100, 16)), rank=4, block_rows=32)


def _dct_table(n, m):
    x = (np.arange(n) + 0.5) / n
    k = np.arange(m)
    return np.cos(np.pi * np.outer(x, k)) * np.sqrt(2.0 / n)


def test_tree_order_improves_compression():
    """PCA tree-ordering makes shuffled clustered rows block-compressible
    (the analogue of the reference's tree perm: rows must be spatially
    ordered before row-block SVDs pay off)."""
    from butterfly_tpu.models.retrieval import tree_order_rows

    rng = np.random.default_rng(0)
    n, d, C = 8192, 64, 32
    centers = rng.standard_normal((C, d))
    table = centers[rng.integers(0, C, n)] + 0.05 * rng.standard_normal((n, d))

    def err_at_rank(t, r):
        blocks = t.reshape(n // 128, 128, d)
        U, S, Vt = np.linalg.svd(blocks, full_matrices=False)
        rec = np.einsum(
            "bsr,brd->bsd", U[:, :, :r] * S[:, None, :r], Vt[:, :r, :]
        )
        return np.linalg.norm(rec - blocks) / np.linalg.norm(blocks)

    perm = tree_order_rows(table, leaf_size=128)
    assert np.array_equal(np.sort(perm), np.arange(n))
    e_shuffled = err_at_rank(table, 8)
    e_ordered = err_at_rank(table[perm], 8)
    assert e_ordered < 0.5 * e_shuffled, (e_ordered, e_shuffled)


@pytest.mark.slow
def test_deep_table_wide_structured(rng):
    """The measured claim, side 1: on a WIDE structured table (DCT — the
    LBO-eigenvector analogue, reference: examples/lbo) the streamed deep
    butterfly beats the one-level format's storage at full recall, scored
    through the DEVICE path."""
    from butterfly_tpu.models.retrieval import compress_table_deep

    n = 2048
    table = _dct_table(n, n)
    dt = compress_table_deep(table, tol=1e-6, col_depth=4, dtype=np.float64,
                             block_align=16)
    # accuracy through the device path
    q = rng.standard_normal((6, n))
    scores = np.asarray(dt.score(q))
    want = table @ q.T
    rel = np.linalg.norm(scores - want) / np.linalg.norm(want)
    assert rel < 1e-5, f"deep device scoring rel err {rel:.2e}"
    # recall parity
    _, idx = dt.topk(q.astype(np.float32), 100)
    true_idx = exact_topk(table, q, 100)
    rec = recall_at_k(np.asarray(idx), true_idx)
    assert rec > 0.97, f"deep recall@100 {rec:.3f}"
    # one-level at the same tol needs ~full rank on a square oscillatory
    # table (every 128-row block sees every frequency): deep must win
    blocks = table.reshape(n // 128, 128, n)
    S = np.linalg.svd(blocks, compute_uv=False)
    r_needed = int((S >= 1e-6 * S[:, :1]).sum(1).max())
    one_level_bytes = (n * r_needed + (n // 128) * r_needed * n) * 8
    assert dt.nbytes_logical() < 0.5 * one_level_bytes, (
        dt.nbytes_logical(), one_level_bytes,
    )


def test_deep_table_tall_smooth_documented_loss():
    """The measured claim, side 2: on a TALL smooth table (row blocks are
    tiny arcs, so every block is already rank <~ 10) the one-level format is
    smaller at the same accuracy — the deep format's transfer matrices cost
    more than they save. This pins the docstring's honesty (DeepTable
    'HONEST SCOPE')."""
    from butterfly_tpu.models.retrieval import compress_table_deep

    n, d = 16384, 128
    table = _dct_table(n, d)

    tol = 1e-4
    dt = compress_table_deep(table, tol=tol, dtype=np.float64, block_align=16)
    rel_deep = np.linalg.norm(dt.materialize() - table) / np.linalg.norm(table)
    assert rel_deep < 1e-3

    blocks = table.reshape(n // 128, 128, d)
    U, S, Vt = np.linalg.svd(blocks, full_matrices=False)
    r = int((S >= tol * S[:, :1]).sum(1).max())
    rec = np.einsum("bsr,brd->bsd", U[:, :, :r] * S[:, None, :r], Vt[:, :r, :])
    rel_one = np.linalg.norm(rec.reshape(n, d) - table) / np.linalg.norm(table)
    one_bytes = (n * r + (n // 128) * r * d) * 8

    assert rel_one < 1e-3
    assert one_bytes < dt.nbytes_logical(), (one_bytes, dt.nbytes_logical())
