"""Streaming algebraic factorizer vs dense ground truth.

Mirrors the reference's validation: in-loop random-matvec checks and final
dense comparison (src/fac_streamer.c:286-301, examples/lbo/bf_lbo.c:343-348).
"""

import numpy as np
import pytest

from butterfly_tpu.config import FacSpec
from butterfly_tpu.fac.streamer import FacStreamer, merge_and_split
from butterfly_tpu.trees import uniform_tree


def _gaussian_kernel_matrix(n, m, rng, sigma=0.25):
    """Smooth kernel matrix — compressible by the row-tree SVD cascade."""
    x = np.sort(rng.random(n))
    y = np.sort(rng.random(m))
    return np.exp(-((x[:, None] - y[None, :]) ** 2) / sigma**2)


def _fourier_modes(n, m):
    """First m Laplacian eigenvectors on a 1-D grid — the LBO-style
    frequency-domain butterfly workload."""
    x = (np.arange(n) + 0.5) / n
    k = np.arange(m)
    return np.cos(np.pi * np.outer(x, k)) * np.sqrt(2.0 / n)


def _stream(Phi, row_depth=4, col_depth=2, tol=1e-12, init_depth=1, **kw):
    n, m = Phi.shape
    spec = FacSpec(
        row_tree=uniform_tree(n, 2, row_depth),
        col_tree=uniform_tree(m, 2, col_depth),
        row_tree_init_depth=init_depth,
        tol=tol,
        min_num_rows=4,
        min_num_cols=4,
        **kw,
    )
    streamer = FacStreamer(spec)
    leaves = [nd for nd in spec.col_tree.nodes_at_depth(col_depth) if nd.num_points]
    for leaf in leaves:
        assert streamer.current_col_node is leaf
        streamer.feed(Phi[:, leaf.i0 : leaf.i1])
    assert streamer.is_done()
    return streamer


def test_streamer_gaussian_kernel(rng):
    Phi = _gaussian_kernel_matrix(256, 64, rng)
    streamer = _stream(Phi, row_depth=4, col_depth=2, tol=1e-12)
    fac = streamer.get_fac()
    op = fac.as_linop()
    assert op.shape == Phi.shape
    rel = np.linalg.norm(op.materialize() - Phi) / np.linalg.norm(Phi)
    assert rel < 1e-9, f"streamed fac rel err {rel:.3e}"
    # merged twice: numW = col_depth + 1
    assert fac.num_w == 3
    # smooth kernel must compress
    assert fac.nbytes() < Phi.nbytes


def test_streamer_matvec_accuracy(rng):
    Phi = _gaussian_kernel_matrix(512, 128, rng)
    fac = _stream(Phi, row_depth=5, col_depth=3, tol=1e-10).get_fac()
    x = rng.standard_normal(128)
    y = fac.as_linop().matvec(x)
    rel = np.linalg.norm(y - Phi @ x) / np.linalg.norm(Phi @ x)
    assert rel < 1e-8


def test_streamer_dct_butterfly(rng):
    """Square DCT matrix — the canonical frequency-domain butterfly
    (LBO-eigenvector analogue). n=1024 sits near the n log n break-even, so
    the gate is storage <= 1.2x dense at tol 1e-8; the asymptotic win shows
    at LBO scale (tests there are in the LBO example)."""
    Phi = _fourier_modes(1024, 1024)
    fac = _stream(
        Phi, row_depth=6, col_depth=4, tol=1e-8, init_depth=2,
    ).get_fac()
    rel = np.linalg.norm(fac.as_linop().materialize() - Phi) / np.linalg.norm(Phi)
    assert rel < 1e-6
    assert fac.nbytes() < 1.2 * Phi.nbytes


def test_streamer_rel_error_logging(rng):
    """compare_relative_errors exercises the in-loop random-matvec check."""
    Phi = _gaussian_kernel_matrix(128, 32, rng)
    streamer = _stream(
        Phi, row_depth=3, col_depth=2, tol=1e-12, compare_relative_errors=True
    )
    assert streamer.is_done()


def test_fac_span_partial_stream(rng):
    """Stopping early: the span of remaining facs still reproduces the fed
    columns (reference: bfFacStreamerGetFacSpan)."""
    Phi = _gaussian_kernel_matrix(128, 64, rng)
    spec = FacSpec(
        row_tree=uniform_tree(128, 2, 3),
        col_tree=uniform_tree(64, 2, 2),
        tol=1e-12,
        min_num_rows=4,
        min_num_cols=4,
    )
    streamer = FacStreamer(spec)
    leaves = spec.col_tree.nodes_at_depth(2)
    # feed only the first two leaves (one merged pair)
    streamer.feed(Phi[:, leaves[0].i0 : leaves[0].i1])
    streamer.feed(Phi[:, leaves[1].i0 : leaves[1].i1])
    span = streamer.get_fac_span()
    want = Phi[:, leaves[0].i0 : leaves[1].i1]
    rel = np.linalg.norm(span.materialize() - want) / np.linalg.norm(want)
    assert rel < 1e-9


def test_merge_preserves_row_span(rng):
    Phi = _gaussian_kernel_matrix(128, 32, rng)
    spec = FacSpec(
        row_tree=uniform_tree(128, 2, 3),
        col_tree=uniform_tree(32, 2, 1),
        tol=1e-12,
        min_num_rows=4,
        min_num_cols=4,
    )
    streamer = FacStreamer(spec)
    for leaf in spec.col_tree.nodes_at_depth(1):
        streamer.feed(Phi[:, leaf.i0 : leaf.i1])
    fac = streamer.get_fac()
    assert fac.row_nodes[0].i0 == 0
    assert fac.row_nodes[-1].i1 == 128
    for a, b in zip(fac.row_nodes[:-1], fac.row_nodes[1:]):
        assert a.i1 == b.i0


def test_random_matrix_does_not_compress(rng):
    """Unstructured noise: the factorization stays exact but gains nothing —
    the honest behavior (identities/pass-through), not silent corruption."""
    Phi = rng.standard_normal((128, 32))
    fac = _stream(Phi, row_depth=3, col_depth=2, tol=1e-12).get_fac()
    rel = np.linalg.norm(fac.as_linop().materialize() - Phi) / np.linalg.norm(Phi)
    assert rel < 1e-10


def test_debug_invariant_mode(monkeypatch):
    """BUTTERFLY_DEBUG=1 runs per-leaf/per-merge deep invariant checks
    (the reference's BF_DEBUG analogue, src/fac_helm2.c:926-936) without
    changing the result."""
    import numpy as np

    from butterfly_tpu.config import FacSpec
    from butterfly_tpu.fac.streamer import FacStreamer
    from butterfly_tpu.trees import uniform_tree
    from butterfly_tpu.utils.debug import debug_enabled, deep_check_fac

    monkeypatch.setenv("BUTTERFLY_DEBUG", "1")
    assert debug_enabled()

    n, m = 256, 64
    xg = (np.arange(n) + 0.5) / n
    Phi = np.cos(np.pi * np.outer(xg, np.arange(m))) * np.sqrt(2.0 / n)
    spec = FacSpec(
        row_tree=uniform_tree(n, 2, 4),
        col_tree=uniform_tree(m, 2, 2),
        row_tree_init_depth=1, tol=1e-10,
        min_num_rows=4, min_num_cols=4,
    )
    st = FacStreamer(spec)
    for leaf in spec.col_tree.nodes_at_depth(2):
        if leaf.num_points:
            st.feed(Phi[:, leaf.i0:leaf.i1])
    fac = st.get_fac()
    deep_check_fac(fac, where="final")

    x = np.random.default_rng(0).standard_normal((m, 3))
    got = fac.as_linop().matmat(x)
    rel = np.linalg.norm(got - Phi @ x) / np.linalg.norm(Phi @ x)
    assert rel < 1e-8

    # a broken fac trips the checker
    fac.row_nodes = fac.row_nodes[:-1]
    import pytest

    with pytest.raises(AssertionError, match="invariant"):
        deep_check_fac(fac)
