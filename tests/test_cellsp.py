"""Block-sparse cell kernel (ops/cellsp.py) unit tests, including output
banding (VMEM-resident bands with overlap folding)."""

import numpy as np
import pytest

from butterfly_tpu.ops.cellsp import GK, GM, Cell, CellPlan, \
    cells_from_dense_block


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _dense_from_cells(cells, n_out, n_in):
    A = np.zeros((n_out, n_in))
    for c in cells:
        if c.w is None:
            A[c.dst:c.dst + GM, c.src_blk * GK:(c.src_blk + 1) * GK] += \
                np.eye(GM)
        else:
            A[c.dst:c.dst + GM, c.src_blk * GK:(c.src_blk + 1) * GK] += c.w
    return A


def test_cells_from_dense_block_roundtrip(rng):
    W = rng.standard_normal((70, 150)).astype(np.float32)
    i0, j0 = 34, 202  # arbitrary even offsets (8-shift + col split)
    cells = []
    cells_from_dense_block(W, i0, j0, cells)
    n_out, n_in = 512, 512
    A = _dense_from_cells(cells, n_out, n_in)
    want = np.zeros((n_out, n_in))
    want[i0:i0 + 70, j0:j0 + 150] = W
    assert np.allclose(A, want)


def test_cell_plan_matches_dense(rng):
    n_out, n_in = 640, 512
    cells = []
    for _ in range(6):
        i0 = int(rng.integers(0, (n_out - 200) // 2)) * 2
        j0 = int(rng.integers(0, (n_in - 200) // 2)) * 2
        W = rng.standard_normal(
            (int(rng.integers(16, 180)), int(rng.integers(16, 180)))
        ).astype(np.float32) / 8
        cells_from_dense_block(W, i0, j0, cells)
    A = _dense_from_cells(cells, n_out + GM, n_in)
    plan = CellPlan(n_out, [n_in], cells, precision="highest")
    x = rng.standard_normal((n_in, 36)).astype(np.float32)
    y = np.asarray(plan.apply([x]))
    want = (A @ x)[:n_out]
    rel = np.linalg.norm(y - want) / max(np.linalg.norm(want), 1e-30)
    assert rel < 1e-5, f"cell plan rel {rel:.2e}"


def test_cell_plan_banded_output(rng):
    """Force multiple output bands (r_tile chosen so the VMEM budget splits
    the output) and check the overlap fold reproduces the dense result."""
    n_out = 4096
    n_in = 512
    cells = []
    for _ in range(24):
        i0 = int(rng.integers(0, (n_out - 200) // 2)) * 2
        j0 = int(rng.integers(0, (n_in - 140) // 2)) * 2
        W = rng.standard_normal((130, 130)).astype(np.float32) / 8
        cells_from_dense_block(W, i0, j0, cells)
    plan = CellPlan(n_out, [n_in], cells, r_tile=512, precision="highest")
    # shrink bands artificially to exercise >3 bands + empty-band fillers
    import dataclasses

    from butterfly_tpu.ops import cellsp as m
    small = CellPlan.__new__(CellPlan)
    small.__dict__ = dict(plan.__dict__)
    assert plan._meta.n_bands >= 1
    # rebuild with a tiny budget via monkeypatched module constant
    old = m._OUT_BUDGET_BYTES
    m._OUT_BUDGET_BYTES = 1 << 20  # 1 MB -> many bands
    try:
        banded = CellPlan(n_out, [n_in], cells, r_tile=512,
                          precision="highest")
    finally:
        m._OUT_BUDGET_BYTES = old
    assert banded._meta.n_bands > 2
    A = _dense_from_cells(cells, banded._meta.n_out_pad, n_in)
    x = rng.standard_normal((n_in, 8)).astype(np.float32)
    y1 = np.asarray(plan.apply([x]))
    y2 = np.asarray(banded.apply([x]))
    want = (A @ x)[:n_out]
    for y in (y1, y2):
        rel = np.linalg.norm(y - want) / max(np.linalg.norm(want), 1e-30)
        assert rel < 1e-5, f"banded cell plan rel {rel:.2e}"


def test_cell_plan_add_cells_and_multibuf(rng):
    """kind-1 add cells assemble a second buffer's rows into the output."""
    n_out, n_in, n_t = 512, 256, 256
    cells = []
    W = rng.standard_normal((128, 128)).astype(np.float32) / 8
    cells_from_dense_block(W, 0, 0, cells)
    # add buffer-1 block 1 at dst 128, and block 0 at dst 256+8
    cells.append(Cell(dst=128, src_buf=1, src_blk=1, w=None))
    cells.append(Cell(dst=264, src_buf=1, src_blk=0, w=None))
    plan = CellPlan(n_out, [n_in, n_t], cells, precision="highest")
    x = rng.standard_normal((n_in, 12)).astype(np.float32)
    tbuf = rng.standard_normal((n_t, 12)).astype(np.float32)
    y = np.asarray(plan.apply([x, tbuf]))
    want = np.zeros((n_out, 12), np.float32)
    want[:128] = W @ x[:128]
    want[128:256] += tbuf[128:256]
    want[264:264 + 128] += tbuf[0:128]
    rel = np.linalg.norm(y - want) / np.linalg.norm(want)
    assert rel < 1e-5


def test_cell_plan_segments(rng):
    """Force tiny SMEM segments: multiple kernel calls share the weight
    stack and their band outputs concatenate + fold correctly."""
    from butterfly_tpu.ops import cellsp as m

    n_out, n_in = 2048, 512
    cells = []
    for _ in range(30):
        i0 = int(rng.integers(0, (n_out - 200) // 2)) * 2
        j0 = int(rng.integers(0, (n_in - 140) // 2)) * 2
        W = rng.standard_normal((100, 100)).astype(np.float32) / 8
        cells_from_dense_block(W, i0, j0, cells)
    ref_plan = CellPlan(n_out, [n_in], list(cells), precision="highest")
    old_b, old_c = m._OUT_BUDGET_BYTES, m._SEG_CELL_CAP
    m._OUT_BUDGET_BYTES = 1 << 20
    m._SEG_CELL_CAP = 10 * 7  # ~10 cells/segment at nb=1
    try:
        seg_plan = CellPlan(n_out, [n_in], list(cells), r_tile=512,
                            precision="highest")
    finally:
        m._OUT_BUDGET_BYTES, m._SEG_CELL_CAP = old_b, old_c
    assert seg_plan.num_segments > 1
    x = rng.standard_normal((n_in, 8)).astype(np.float32)
    y_ref = np.asarray(ref_plan.apply([x]))
    y_seg = np.asarray(seg_plan.apply([x]))
    rel = np.linalg.norm(y_seg - y_ref) / max(np.linalg.norm(y_ref), 1e-30)
    assert rel < 1e-6, f"segmented cell plan rel {rel:.2e}"
