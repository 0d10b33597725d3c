"""Motif counting / Pattern descriptors (reference M8, src/common/pattern.cc)
vs a brute-force enumeration oracle."""

import numpy as np
import pytest

from graphaibench_tpu.analytics.motif import (Pattern, brute_force_motif_counts,
                                              count_pattern,
                                              induced_motif_counts,
                                              motif_counts)
from graphaibench_tpu.graph.csr import from_edges


def _random_graph(n, p, seed):
    rng = np.random.default_rng(seed)
    a = np.triu(rng.random((n, n)) < p, 1)
    src, dst = np.nonzero(a | a.T)
    return from_edges(src, dst, n)


def test_pattern_naming_matches_reference_taxonomy():
    # pattern.cc:4-27 classifies by (n, m, max_degree)
    assert Pattern.from_name("wedge").name == "wedge"
    assert Pattern.from_edges([(0, 1), (0, 2), (1, 2)]).name == "triangle"
    assert Pattern.from_edges([(0, 1), (0, 2), (0, 3)]).name == "3-star"
    assert Pattern.from_edges([(0, 1), (1, 2), (2, 3)]).name == "4-path"
    assert Pattern.from_edges([(0, 1), (1, 2), (2, 3), (0, 3)]).name == "square"
    assert Pattern.from_edges(
        [(0, 1), (0, 2), (1, 2), (2, 3)]).name == "tailed_triangle"
    assert Pattern.from_name("diamond").m == 5
    k4 = Pattern.from_name("4-clique")
    assert k4.is_clique() and k4.max_degree == 3
    assert Pattern(edges=k4.edges, num_vertex_classes=3).name == \
        "3labeled-4-clique"
    with pytest.raises(ValueError):
        Pattern.from_name("5-house")


@pytest.mark.parametrize("p,seed", [(0.12, 0), (0.3, 1), (0.5, 2)])
def test_motif_counts_vs_bruteforce(p, seed):
    g = _random_graph(22, p, seed)
    for k in (3, 4):
        got = motif_counts(g, k)
        exp = brute_force_motif_counts(g, k)
        for name in got:
            assert got[name] == exp[name], (k, name)


def test_induced_counts_vs_bruteforce():
    g = _random_graph(20, 0.4, 7)
    got = induced_motif_counts(g)
    exp = brute_force_motif_counts(g, 4)["_induced"]
    for name in exp:
        assert got[name] == exp[name], name


def test_count_pattern_dispatch():
    g = _random_graph(20, 0.4, 3)
    exp = brute_force_motif_counts(g, 4)
    assert count_pattern(g, "diamond") == exp["diamond"]
    assert count_pattern(g, Pattern.from_name("square")) == exp["square"]
    assert count_pattern(g, "square", induced=True) == \
        exp["_induced"]["square"]


def test_citeseer_triangles_via_motifs(citeseer):
    # golden: src/triangle/README.md:50-63 (citeseer = 1166)
    assert motif_counts(citeseer, 3)["triangle"] == 1166
