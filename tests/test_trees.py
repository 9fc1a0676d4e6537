"""Tests for host-side trees: partition invariants, traversals, flat export."""

import numpy as np
import pytest

from butterfly_tpu.geom import Bbox, sample_poisson_disk
from butterfly_tpu.trees import (
    IntervalTree,
    Octree,
    Quadtree,
    level_is_internal,
    level_num_points,
    nearest_neighbors,
    node_span_is_contiguous,
    uniform_tree,
)


def _check_partition_invariants(tree):
    """Every internal node's children partition its index range, in order,
    and every point lies inside its node's bbox."""
    for node in tree.root.subtree_nodes():
        if node.is_leaf:
            continue
        assert node.children[0].i0 == node.i0
        assert node.children[-1].i1 == node.i1
        assert node_span_is_contiguous(node.children)
        for child in node.children:
            assert child.num_points > 0
            pts = tree.node_points(child)
            assert np.all(child.bbox.contains(pts)), "child points escape bbox"


def test_quadtree_build(rng):
    pts = rng.standard_normal((300, 2))
    tree = Quadtree(pts, leaf_size=4)
    assert tree.num_points == 300
    assert sorted(tree.perm.tolist()) == list(range(300))
    _check_partition_invariants(tree)
    # level structure
    levels = tree.levels()
    assert levels[0] == [tree.root]
    for depth, nodes in enumerate(levels):
        assert all(n.depth == depth for n in nodes)
    assert level_num_points(levels[1]) == 300


def test_quadtree_leaf_sizes(rng):
    pts = rng.standard_normal((200, 2))
    tree = Quadtree(pts, leaf_size=8)
    for node in tree.root.subtree_nodes():
        if node.is_leaf:
            assert node.num_points <= 8


def test_quadtree_separation(rng):
    pts = rng.random((256, 2))
    tree = Quadtree(pts, leaf_size=16)
    lvl = tree.levels()[2]
    if len(lvl) >= 2:
        # a node is never separated from itself
        assert not lvl[0].is_separated_from(lvl[0])
    # two unit boxes far apart are separated
    a = Quadtree(rng.random((16, 2)), leaf_size=4).root
    b = Quadtree(rng.random((16, 2)) + 100.0, leaf_size=4).root
    assert a.is_separated_from(b)


def test_bounding_circle_contains_points(rng):
    pts = rng.standard_normal((128, 2))
    tree = Quadtree(pts, leaf_size=8)
    for node in tree.root.subtree_nodes():
        circ = node.bounding_circle()
        d = np.linalg.norm(tree.node_points(node) - np.asarray(circ.center), axis=1)
        assert np.all(d <= circ.r + 1e-12)


def test_octree_build(rng):
    pts = rng.standard_normal((500, 3))
    tree = Octree(pts, leaf_size=16)
    assert tree.num_points == 500
    _check_partition_invariants(tree)


def test_octree_knn(rng):
    pts = rng.standard_normal((400, 3))
    tree = Octree(pts, leaf_size=16)
    q = rng.standard_normal((5, 3))
    got = nearest_neighbors(tree, q, k=3)
    # brute force check
    for i in range(5):
        d = np.linalg.norm(pts - q[i], axis=1)
        want = np.argsort(d)[:3]
        assert set(got[i]) == set(want)


def test_post_order(rng):
    pts = rng.standard_normal((64, 2))
    tree = Quadtree(pts, leaf_size=8)
    seen = set()
    for node in tree.post_order():
        for child in node.children:
            assert id(child) in seen, "child must precede parent in post-order"
        seen.add(id(node))
    assert len(seen) == sum(len(l) for l in tree.levels())


def test_level_table(rng):
    pts = rng.standard_normal((128, 2))
    tree = Quadtree(pts, leaf_size=8)
    tab = tree.level_table(1)
    nodes = tree.nodes_at_depth(1)
    np.testing.assert_array_equal(tab["i0"], [n.i0 for n in nodes])
    np.testing.assert_array_equal(tab["i1"], [n.i1 for n in nodes])
    assert np.all(tab["parent"] == 0)


def test_interval_tree():
    tree = IntervalTree(0.0, 16.0, arity=2, depth=3)
    assert len(tree.levels()) == 4
    assert len(tree.nodes_at_depth(3)) == 8
    # attach points without rebuilding
    pts = np.array([0.5, 3.3, 3.9, 7.2, 8.0, 15.0, 16.0])
    tree.set_points(pts)
    assert tree.root.num_points == 7
    for node in tree.root.subtree_nodes():
        sel = tree.points[node.i0 : node.i1]
        lo_ok = np.all(sel >= node.a)
        hi_ok = np.all(sel <= node.b) if node.is_rightmost else np.all(sel < node.b)
        assert lo_ok and hi_ok
    # leaves partition the index range
    leaves = tree.nodes_at_depth(3)
    assert node_span_is_contiguous(leaves)
    assert leaves[0].i0 == 0 and leaves[-1].i1 == 7
    # rightmost leaf owns the closed endpoint 16.0
    assert leaves[-1].i1 - leaves[-1].i0 >= 1


def test_interval_tree_leftmost_rightmost():
    tree = IntervalTree(0.0, 8.0, arity=2, depth=2)
    lvl = tree.nodes_at_depth(2)
    assert lvl[0].is_leftmost and not lvl[0].is_rightmost
    assert lvl[-1].is_rightmost and not lvl[-1].is_leftmost
    assert not lvl[1].is_leftmost and not lvl[1].is_rightmost


def test_uniform_tree():
    tree = uniform_tree(100, arity=2, depth=3)
    leaves = tree.nodes_at_depth(3)
    assert len(leaves) == 8
    assert node_span_is_contiguous(leaves)
    assert leaves[0].i0 == 0 and leaves[-1].i1 == 100
    assert level_is_internal(tree.nodes_at_depth(2))


def test_poisson_disk():
    pts = sample_poisson_disk((0, 0), (1, 1), 0.1, rng=np.random.default_rng(3))
    assert len(pts) > 20
    from butterfly_tpu.geom import pairwise_dists

    D = pairwise_dists(pts, pts)
    np.fill_diagonal(D, np.inf)
    assert D.min() >= 0.1 - 1e-12


def test_level_set_submesh_exact_boundary():
    """Exact level-set split of a sphere by phi = z (reference:
    bfTrimeshGetLevelSetSubmesh, src/trimesh.get_level_set_submesh.c)."""
    from butterfly_tpu.geom.trimesh import icosphere

    mesh = icosphere(3)
    phi = mesh.verts[:, 2].copy()
    sub, ids = mesh.level_set_submesh(phi)
    # kept original verts are exactly the phi <= tol ones referenced by faces
    kept = ids[ids >= 0]
    assert np.all(phi[kept] <= 1e-12)
    # cut verts (ids == -1) sit exactly on the level set
    cuts = ids < 0
    assert cuts.any()
    assert np.abs(sub.verts[cuts, 2]).max() < 1e-12
    # all original inside verts that belong to some inside face are kept
    # and area approximates the hemisphere
    a_sub = sub.face_areas().sum()
    a_hemi = mesh.face_areas().sum() / 2
    assert abs(a_sub - a_hemi) / a_hemi < 2e-2
    # mesh is well-formed: all faces reference valid verts, no isolated verts
    assert sub.faces.max() < sub.num_verts
    used = np.zeros(sub.num_verts, dtype=bool)
    used[sub.faces.ravel()] = True
    assert used.all()


def test_level_set_submesh_on_vertex_crossings():
    """Vertices exactly on the level set (case111 analogue) don't create
    degenerate faces."""
    from butterfly_tpu.geom.trimesh import Trimesh

    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0], [-1, 0.5, 0]],
                 dtype=np.float64)
    f = np.array([[0, 1, 2], [1, 3, 2], [0, 2, 4]])
    phi = np.array([0.0, 1.0, 0.0, 2.0, -1.0])  # edge (0,2) on the set
    sub, ids = Trimesh(v, f).level_set_submesh(phi)
    areas = sub.face_areas()
    assert np.all(areas > 1e-14)
    # only the fully-inside triangle (0,2,4) survives
    assert sub.num_faces == 1 and set(ids) == {0, 2, 4}


def test_nodal_domain_repair_reconnects_split():
    from butterfly_tpu.geom.trimesh import icosphere
    from butterfly_tpu.trees.fiedler_tree import _repair_nodal_domains

    mesh = icosphere(2)
    z = mesh.verts[:, 2]
    neg = z < 0
    # poison: flip an isolated island at the north pole into the neg class
    island = int(np.argmax(z))
    neg[island] = True
    fixed = _repair_nodal_domains(mesh, neg)
    assert not fixed[island]
    # both sides connected now
    import scipy.sparse.csgraph as csgraph

    A = mesh.vertex_adjacency()
    for side in (True, False):
        idx = np.flatnonzero(fixed == side)
        ncomp, _ = csgraph.connected_components(A[np.ix_(idx, idx)],
                                                directed=False)
        assert ncomp == 1
