"""Labeled-graph support (reference FSM structures, graph.cc:1025-1120)
vs brute-force oracles."""

import itertools

import numpy as np

from graphaibench_tpu.graph import labels as LB
from graphaibench_tpu.graph.csr import from_edges


def _random_labeled(n, p, L, seed):
    rng = np.random.default_rng(seed)
    a = np.triu(rng.random((n, n)) < p, 1)
    src, dst = np.nonzero(a | a.T)
    g = from_edges(src, dst, n)
    lab = rng.integers(0, L, n).astype(np.int32)
    return g, lab, a | a.T


def test_nlf_and_index():
    g, lab, adj = _random_labeled(40, 0.2, 5, 0)
    nlf = LB.neighborhood_label_frequency(g, lab)
    nlf_host = LB.neighborhood_label_frequency(g, lab, device=False)
    assert np.array_equal(nlf, nlf_host)
    for v in range(g.nv):
        nbrs = g.neighbors(v)
        exp = np.bincount(lab[nbrs], minlength=5)
        assert np.array_equal(nlf[v], exp), v
    idx = LB.label_index(g, lab)
    for l, vs in idx.items():
        assert (lab[vs] == l).all()
    assert sum(len(v) for v in idx.values()) == g.nv
    assert LB.label_frequency(g, lab).sum() == g.nv


def test_nlf_match_filter():
    g, lab, _ = _random_labeled(30, 0.3, 3, 1)
    nlf = LB.neighborhood_label_frequency(g, lab)
    # a pattern vertex requiring one neighbor of each label
    pat = np.ones((1, 3), np.int32)
    cand = LB.nlf_match(nlf, pat)
    exp = (nlf >= 1).all(1)
    assert np.array_equal(cand[:, 0], exp)


def test_labeled_triangles_vs_bruteforce():
    g, lab, adj = _random_labeled(30, 0.35, 3, 2)
    got = LB.labeled_triangle_counts(g, lab)
    exp = {}
    for u, v, w in itertools.combinations(range(g.nv), 3):
        if adj[u, v] and adj[v, w] and adj[u, w]:
            key = tuple(sorted((int(lab[u]), int(lab[v]), int(lab[w]))))
            exp[key] = exp.get(key, 0) + 1
    assert got == exp
    # total across triples == unlabeled triangle count
    from graphaibench_tpu.analytics.motif import motif_counts
    assert sum(got.values()) == motif_counts(g, 3)["triangle"]


def test_citeseer_nlf(citeseer):
    nlf = LB.neighborhood_label_frequency(citeseer)
    assert nlf.shape[0] == citeseer.nv
    assert nlf.sum() == citeseer.ne
