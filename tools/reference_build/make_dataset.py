"""Deterministic synthetic-cora dataset used for reference-binary parity
(same recipe as tests/test_reference_parity.py)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from graphaibench_tpu.graph.io import Meta, load_graph, save_graph  # noqa: E402


def build(out: str, src="/root/reference/inputs/cora"):
    g = load_graph(src, with_vlabels=True)
    feat_len = 64
    rng = np.random.default_rng(7)
    feats = (rng.random((g.nv, feat_len)) < 0.1).astype(np.float32)
    centers = rng.standard_normal((7, feat_len)).astype(np.float32) * 0.5
    feats += centers[np.asarray(g.vlabels, dtype=np.int64)]
    meta = Meta(nv=g.nv, ne=g.ne, max_degree=g.max_degree(), feat_len=feat_len,
                num_vertex_classes=7, num_edge_classes=0,
                train=(0, 140, 140), val=(140, 640, 500),
                test=(1708, 2708, 1000))
    save_graph(g, out, meta=meta)
    feats.tofile(os.path.join(out, "graph.feats.bin"))
    return out


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/cora_synth")
