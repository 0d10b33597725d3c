"""Graph core: loading the reference binary format, transforms, goldens.

Golden values come from the reference fixtures (inputs/*/graph.meta.txt)
and src/triangle/README.md.
"""

import numpy as np
import pytest

from graphaibench_tpu.graph import transforms as T
from graphaibench_tpu.graph.csr import CSRGraph, from_edges
from graphaibench_tpu.graph.io import load_gnn_dataset, load_graph, read_meta, save_graph

from conftest import fixture_path


def test_load_tester(tester):
    # inputs/tester: 8 vertices, 24 edges (graph.meta.txt)
    assert tester.nv == 8
    assert tester.ne == 24
    assert tester.max_degree() == 4
    np.testing.assert_array_equal(tester.neighbors(0), [1, 2])
    np.testing.assert_array_equal(tester.neighbors(2), [0, 1, 3, 6])


def test_load_citeseer(citeseer):
    assert citeseer.nv == 3312
    assert citeseer.ne == 9072
    assert citeseer.max_degree() == 99
    assert citeseer.vlabels is not None
    assert citeseer.vlabels.max() <= 5  # 6 classes


def test_load_cora_meta():
    m = read_meta(fixture_path("cora"))
    assert (m.nv, m.ne, m.feat_len, m.num_vertex_classes) == (2708, 10556, 1433, 7)
    assert m.train == (0, 140, 140)
    assert m.val == (140, 640, 500)
    assert m.test == (1708, 2708, 1000)


def test_bipartite_meta():
    g = load_graph(fixture_path("test_cf"))
    assert g.is_bipartite()
    assert g.n_left == 6 and g.n_right == 4
    assert g.nv == 10 and g.ne == 24


def test_roundtrip(tmp_path, citeseer):
    save_graph(citeseer, str(tmp_path / "cs"))
    g2 = load_graph(str(tmp_path / "cs"), with_vlabels=True)
    np.testing.assert_array_equal(g2.row_ptr, citeseer.row_ptr)
    np.testing.assert_array_equal(g2.col_idx, citeseer.col_idx)
    np.testing.assert_array_equal(g2.vlabels, citeseer.vlabels)


def test_add_selfloop(tester):
    g = T.add_selfloop(tester)
    assert g.ne == tester.ne + tester.nv
    for v in range(g.nv):
        nbrs = g.neighbors(v)
        assert v in nbrs
        assert np.all(np.diff(nbrs) > 0)  # sorted, selfloop in place
    # vertex 0 had [1,2] -> [0,1,2]
    np.testing.assert_array_equal(g.neighbors(0), [0, 1, 2])


def test_selfloop_isolated_vertex():
    g = from_edges([0], [1], 3)
    g2 = T.add_selfloop(g)
    np.testing.assert_array_equal(g2.neighbors(2), [2])
    np.testing.assert_array_equal(g2.neighbors(0), [0, 1])


def test_orientation_halves_edges(citeseer):
    dag = T.orientation(citeseer)
    assert dag.ne == citeseer.ne // 2
    # DAG property under the degree-then-id total order (graph.cc:628-631)
    deg = citeseer.degrees()
    src, dst = dag.coo()
    key_src = deg[src].astype(np.int64) * citeseer.nv + src
    key_dst = deg[dst].astype(np.int64) * citeseer.nv + dst
    assert np.all(key_dst > key_src)


def test_reverse_roundtrip(tester):
    rg = T.reverse(T.reverse(tester))
    np.testing.assert_array_equal(rg.row_ptr, tester.row_ptr)
    np.testing.assert_array_equal(rg.col_idx, tester.col_idx)


def test_transpose_edge_permutation(citeseer):
    perm = T.transpose_edge_permutation(citeseer)
    src, dst = citeseer.coo()
    rg = T.reverse(citeseer)
    rsrc, rdst = rg.coo()
    np.testing.assert_array_equal(src[perm], rdst)
    np.testing.assert_array_equal(dst[perm], rsrc)


def test_masked_subgraph(tester):
    mask = np.zeros(8, dtype=np.uint8)
    mask[[0, 1, 2]] = 1
    sub = T.masked_subgraph(tester, mask)
    assert sub.nv == tester.nv  # vertex ids unchanged
    np.testing.assert_array_equal(sub.neighbors(0), [1, 2])
    np.testing.assert_array_equal(sub.neighbors(2), [0, 1])
    assert len(sub.neighbors(3)) == 0


def test_induced_subgraph(tester):
    sub, vs = T.induced_subgraph(tester, np.array([0, 2, 3]))
    assert sub.nv == 3
    np.testing.assert_array_equal(vs, [0, 2, 3])
    # edges among {0,2,3}: 0-2, 2-3 (both directions)
    np.testing.assert_array_equal(sub.neighbors(0), [1])       # 0->2
    np.testing.assert_array_equal(sub.neighbors(1), [0, 2])    # 2->0, 2->3
    np.testing.assert_array_equal(sub.neighbors(2), [1])       # 3->2


def test_gcn_norms(tester):
    g = T.add_selfloop(tester)
    vn = T.gcn_vertex_norms(g)
    deg = g.degrees()
    np.testing.assert_allclose(vn, 1.0 / np.sqrt(deg), rtol=1e-6)
    en = T.gcn_edge_norms(g)
    src, dst = g.coo()
    np.testing.assert_allclose(en, 1.0 / np.sqrt(deg[src] * deg[dst]), rtol=1e-6)


def test_sage_norms(tester):
    w = T.sage_edge_norms(tester)
    src, _ = tester.coo()
    np.testing.assert_allclose(w, 1.0 / tester.degrees()[src], rtol=1e-6)


def test_symmetrize_and_clean():
    g = from_edges([0, 0, 1, 2, 2], [1, 1, 0, 2, 0], 3)  # dup edge, selfloop
    s = T.symmetrize(g)
    np.testing.assert_array_equal(s.neighbors(0), [1, 2])
    np.testing.assert_array_equal(s.neighbors(1), [0])
    np.testing.assert_array_equal(s.neighbors(2), [0])


def test_kcore_oracle():
    # triangle 0-1-2 plus pendant 3: core numbers 2,2,2,1
    g = T.symmetrize(from_edges([0, 1, 2, 2], [1, 2, 0, 3], 4))
    core = T.k_core_decomposition(g)
    np.testing.assert_array_equal(core, [2, 2, 2, 1])


def test_gnn_dataset_citeseer():
    ds = load_gnn_dataset(fixture_path("citeseer"), synth_feat_len=64)
    assert ds.graph.nv == 3312
    assert ds.num_classes == 6
    assert ds.feats.shape == (3312, 64)
    assert ds.labels.shape == (3312,)


def test_generators():
    from graphaibench_tpu.graph.generators import grid2d, rmat, uniform_random
    g = grid2d(4)
    assert g.nv == 16
    assert g.ne == 2 * (2 * 4 * 3)  # 24 undirected edges both directions
    r = rmat(8, 4, seed=1)
    assert r.nv == 256
    assert r.ne > 0
    u = uniform_random(100, 300, seed=2)
    src, dst = u.coo()
    assert np.all(src != dst)


def test_mmap_load(citeseer):
    """Out-of-core loading (reference OutOfCoreGraph, graph.h:253): memmap
    views must equal the eager load and feed transforms unchanged."""
    from graphaibench_tpu.graph import transforms as T
    from graphaibench_tpu.graph.io import load_graph

    g = load_graph("/root/reference/inputs/citeseer", with_vlabels=True,
                   mmap=True)
    assert isinstance(g.row_ptr, np.memmap) or g.row_ptr.base is not None
    assert np.array_equal(g.row_ptr, citeseer.row_ptr)
    assert np.array_equal(g.col_idx, citeseer.col_idx)
    assert np.array_equal(g.vlabels, citeseer.vlabels)
    dag = T.orientation(g)
    assert dag.ne == citeseer.ne // 2
