"""MST, HAC, Louvain, link prediction, Hungarian, distributed TC."""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from graphaibench_tpu.analytics.assignment import assignment_oracle, hungarian
from graphaibench_tpu.analytics.community import louvain, modularity
from graphaibench_tpu.analytics.hac import cut_clusters, hac_from_embeddings
from graphaibench_tpu.analytics.linkpred import jaccard, predict_links
from graphaibench_tpu.analytics.mst import boruvka_mst, kruskal_oracle
from graphaibench_tpu.graph.csr import from_edges
from graphaibench_tpu.graph.generators import grid2d, rmat, uniform_random
from graphaibench_tpu.graph import transforms as T
from graphaibench_tpu.parallel.dist_analytics import distributed_triangle_count
from graphaibench_tpu.parallel.halo import AXIS


def sym_weights(g, seed=0):
    src, dst = g.coo()
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    pairs, inv = np.unique(np.stack([lo, hi], 1), axis=0, return_inverse=True)
    pw = np.random.default_rng(seed).uniform(0.1, 10, len(pairs))
    return pw[inv].astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_boruvka_matches_kruskal(seed):
    g = uniform_random(120, 400, seed=seed)
    w = sym_weights(g, seed)
    _ids, total = boruvka_mst(g, w)
    assert abs(total - kruskal_oracle(g, w)) < 1e-3


def test_boruvka_equal_weights():
    g = grid2d(8)
    w = np.ones(g.ne, dtype=np.float32)
    ids, total = boruvka_mst(g, w)
    assert total == 63.0  # spanning tree of 64-vertex connected graph
    assert len(ids) == 63


def test_hac_two_blobs():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.1, (10, 2))
    b = rng.normal(5, 0.1, (10, 2))
    x = np.vstack([a, b])
    link = hac_from_embeddings(x, "average")
    labels = cut_clusters(link, 20, 2)
    assert len(np.unique(labels)) == 2
    assert len(np.unique(labels[:10])) == 1
    assert len(np.unique(labels[10:])) == 1


def test_louvain_two_cliques():
    # two 6-cliques joined by one edge
    edges = []
    for base in (0, 6):
        for i in range(6):
            for j in range(i + 1, 6):
                edges.append((base + i, base + j))
    edges.append((0, 6))
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    g = T.symmetrize(from_edges(src, dst, 12))
    labels, q = louvain(g)
    assert len(np.unique(labels)) == 2
    assert len(np.unique(labels[:6])) == 1
    assert len(np.unique(labels[6:])) == 1
    assert q > 0.3


def test_jaccard_path():
    # path 0-1-2: jaccard(0,2) = |{1}| / |{1} u {1}| = 1
    g = T.symmetrize(from_edges([0, 1], [1, 2], 3))
    s = jaccard(g, np.array([[0, 2]]))
    np.testing.assert_allclose(s, [1.0])
    top = predict_links(g, k=1)
    assert top[0][0] == 0 and top[0][1] == 2


def test_hungarian():
    rng = np.random.default_rng(3)
    for n in (3, 5, 6):
        c = rng.uniform(0, 10, (n, n))
        col, total = hungarian(c)
        assert sorted(col.tolist()) == list(range(n))
        assert abs(total - assignment_oracle(c)) < 1e-9


def test_distributed_tc_matches_single(citeseer):
    mesh = Mesh(np.array(jax.devices()[:8]), (AXIS,))
    assert distributed_triangle_count(mesh, citeseer) == 1166


def test_distributed_tc_rmat():
    from graphaibench_tpu.analytics import triangle_count
    g = rmat(8, 8, seed=2)
    mesh = Mesh(np.array(jax.devices()[:8]), (AXIS,))
    assert distributed_triangle_count(mesh, g) == triangle_count(g)


def test_distributed_tc_2d_blocks(citeseer):
    """partition_2d consumer (graph_partition.cc:276-360 semantics): the
    2-D edge-block TC — device (i, j) holds only block (i, j)'s edges
    plus two O(nv/s)-row neighbor-table slices — must match the golden
    and the 1-D solver exactly."""
    from graphaibench_tpu.graph import transforms as T
    from graphaibench_tpu.analytics import triangle_count
    from graphaibench_tpu.parallel.dist_analytics import (
        distributed_triangle_count_2d,
    )

    mesh = Mesh(np.array(jax.devices()[:8]), (AXIS,))  # -> 2x2 grid
    assert distributed_triangle_count_2d(mesh, citeseer) == 1166
    g = T.symmetrize(rmat(9, 7, seed=5))
    assert distributed_triangle_count_2d(mesh, g) == triangle_count(g)
