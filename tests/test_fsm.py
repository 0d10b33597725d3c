"""FSM miner (analytics/fsm.py) vs a brute-force MNI-support oracle."""

import itertools

import numpy as np

from graphaibench_tpu.analytics.fsm import (fsm, mine_edges, mine_triangles,
                                            mine_wedges)
from graphaibench_tpu.graph.csr import from_edges


def _random_labeled(n, p, L, seed):
    rng = np.random.default_rng(seed)
    a = np.triu(rng.random((n, n)) < p, 1)
    adj = a | a.T
    src, dst = np.nonzero(adj)
    return from_edges(src, dst, n), rng.integers(0, L, n).astype(np.int32), adj


def _oracle(adj, lab):
    """Enumerate every embedding; MNI support = min role-image size."""
    n = len(lab)
    edges = {}
    wedges = {}
    tris = {}
    for u, v in itertools.permutations(range(n), 2):
        if adj[u, v]:
            key = tuple(sorted((lab[u], lab[v])))
            # role order matches miner: (la, lb) sorted; collect images
            la, lb = key
            d = edges.setdefault(key, (set(), set()))
            if lab[u] == la:
                d[0].add(u)
            if lab[v] == lb:
                d[1].add(v)
            if lab[v] == la:
                d[0].add(v)
            if lab[u] == lb:
                d[1].add(u)
    for u, w, x in itertools.permutations(range(n), 3):
        if adj[u, w] and adj[w, x] and not False:
            la, lc = sorted((lab[u], lab[x]))
            key = (la, lab[w], lc)
            d = wedges.setdefault(key, (set(), set(), set()))
            d[1].add(w)
            for end in (u, x):
                if lab[end] == la:
                    d[0].add(end)
                if lab[end] == lc:
                    d[2].add(end)
        if adj[u, w] and adj[w, x] and adj[u, x]:
            key = tuple(sorted((lab[u], lab[w], lab[x])))
            d = tris.setdefault(key, (set(), set(), set()))
            for vtx in (u, w, x):
                for i, l in enumerate(key):
                    if lab[vtx] == l:
                        d[i].add(vtx)
    sup = lambda d: min(len(s) for s in d)
    return ({k: sup(d) for k, d in edges.items()},
            {k: sup(d) for k, d in wedges.items()},
            {k: sup(d) for k, d in tris.items()})


def test_fsm_vs_oracle():
    for seed, p in ((0, 0.15), (1, 0.3)):
        g, lab, adj = _random_labeled(18, p, 3, seed)
        oe, ow, ot = _oracle(adj, lab)
        got_e = {f.labels: f.support for f in mine_edges(g, lab)}
        got_w = {f.labels: f.support for f in mine_wedges(g, lab)}
        got_t = {f.labels: f.support for f in mine_triangles(g, lab)}
        assert got_e == {k: v for k, v in oe.items() if v >= 1}, seed
        assert got_w == {k: v for k, v in ow.items() if v >= 1}, seed
        assert got_t == {k: v for k, v in ot.items() if v >= 1}, seed


def test_fsm_min_support_filters():
    g, lab, adj = _random_labeled(20, 0.3, 2, 3)
    all_p = fsm(g, lab, min_support=1)
    some_p = fsm(g, lab, min_support=4)
    assert len(some_p) <= len(all_p)
    assert all(f.support >= 4 for f in some_p)
    kinds = {f.kind for f in all_p}
    assert kinds == {"edge", "wedge", "triangle"}
