"""DeepWalk / node2vec (reference src/embedding/README.md:50-54 lists
them as TODO — here they are real)."""

import numpy as np

from graphaibench_tpu.analytics.embedding import (deepwalk, node2vec,
                                                  node2vec_walks,
                                                  _skipgram_pairs)
from graphaibench_tpu.graph.csr import from_edges


def _two_cliques(k=12, bridges=1, seed=0):
    """Two k-cliques joined by `bridges` edges: the canonical community
    fixture."""
    edges = []
    for c in range(2):
        base = c * k
        for i in range(k):
            for j in range(i + 1, k):
                edges.append((base + i, base + j))
    for b in range(bridges):
        edges.append((b, k + b))
    src = np.array([e[0] for e in edges] + [e[1] for e in edges])
    dst = np.array([e[1] for e in edges] + [e[0] for e in edges])
    return from_edges(src, dst, 2 * k), k


def _community_separation(emb, k):
    """Mean intra-community cosine sim minus inter-community."""
    e = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
    s = e @ e.T
    n = len(emb)
    intra = (s[:k, :k].sum() - k + s[k:, k:].sum() - k) / (2 * k * (k - 1))
    inter = s[:k, k:].mean()
    return intra - inter


def test_deepwalk_separates_communities():
    g, k = _two_cliques()
    emb = deepwalk(g, dim=16, walks_per_vertex=8, walk_length=10,
                   window=3, epochs=2, seed=0)
    assert emb.shape == (g.nv, 16)
    assert np.isfinite(emb).all()
    assert _community_separation(emb, k) > 0.2


def test_node2vec_separates_communities():
    g, k = _two_cliques()
    emb = node2vec(g, dim=16, walks_per_vertex=8, walk_length=10,
                   window=3, p=1.0, q=2.0, epochs=2, seed=0)
    assert emb.shape == (g.nv, 16)
    assert _community_separation(emb, k) > 0.2


def test_node2vec_bias_distribution():
    """On a path-with-fork graph, q >> 1 must keep the walk local
    (prefer returning/triangle moves), q << 1 must push it outward."""
    # star of triangles: t=0 -- v=1; 1 -- {0, 2, 3}; 2 -- {0} (triangle
    # with 0,1), 3 -- only 1 (outward)
    src = np.array([0, 1, 0, 2, 1, 2, 1, 3])
    dst = np.array([1, 0, 2, 0, 2, 1, 3, 1])
    g = from_edges(src, dst, 4)
    n = 4000
    for q, expect_outward_more in ((0.25, True), (4.0, False)):
        walks = node2vec_walks(g, np.zeros(n, np.int32), 2, p=1.0, q=q,
                               seed=1)
        # step 1: 0 -> 1 or 0 -> 2; condition on 0 -> 1, look at step 2
        sel = walks[:, 1] == 1
        nxt = walks[sel, 2]
        frac_outward = (nxt == 3).mean()   # 3 is the 1/q "outward" move
        frac_triangle = (nxt == 2).mean()  # 2 is the weight-1 move
        if expect_outward_more:
            assert frac_outward > 0.25, (q, frac_outward)
        else:
            assert frac_outward < frac_triangle, (q, frac_outward,
                                                  frac_triangle)


def test_skipgram_pairs_window():
    walks = np.array([[0, 1, 2, 3]])
    c, o = _skipgram_pairs(walks, 2)
    pairs = set(zip(c.tolist(), o.tolist()))
    assert (0, 1) in pairs and (1, 0) in pairs
    assert (0, 2) in pairs and (2, 0) in pairs
    assert (0, 3) not in pairs  # beyond window
