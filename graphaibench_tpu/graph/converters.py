"""Graph format converters — parity with src/converters (B13):
MatrixMarket (.mtx) and Galois binary (.gr) readers, plus the converter
pipeline operations (symmetrize, clean = sort+dedup+deselfloop, DAG
orient) writing the binary CSR dataset layout."""

from __future__ import annotations

import numpy as np

from graphaibench_tpu.graph.csr import CSRGraph, from_edges
from graphaibench_tpu.graph.io import save_graph
from graphaibench_tpu.graph import transforms as T


def read_mtx(path: str, *, symmetrize: bool = False) -> CSRGraph:
    """MatrixMarket coordinate format; 1-based indices. The
    %%MatrixMarket header's 'symmetric' qualifier triggers mirroring."""
    sym = symmetrize
    src, dst, vals = [], [], []
    dims = None
    with open(path) as f:
        header = f.readline()
        if header.startswith("%%MatrixMarket") and "symmetric" in header:
            sym = True
        for line in f:
            if line.startswith("%") or not line.strip():
                continue
            parts = line.split()
            if dims is None:
                dims = (int(parts[0]), int(parts[1]))
                continue
            u, v = int(parts[0]) - 1, int(parts[1]) - 1
            src.append(u)
            dst.append(v)
            if len(parts) > 2:
                vals.append(float(parts[2]))
    nv = max(dims[0], dims[1])
    s = np.asarray(src, dtype=np.int64)
    d = np.asarray(dst, dtype=np.int64)
    if sym:
        s, d = np.concatenate([s, d]), np.concatenate([d, s])
    g = from_edges(s, d, nv)
    return T.sort_and_clean(g)


def read_gr(path: str) -> CSRGraph:
    """Galois binary .gr (version 1): uint64 header {version,
    edge_data_size, num_nodes, num_edges}, uint64 out-index per node,
    uint32 dst per edge (padded to 8B), optional edge data — the layout
    the reference's csgr reader mmaps (reader.cpp:170-246)."""
    with open(path, "rb") as f:
        hdr = np.fromfile(f, dtype=np.uint64, count=4)
        version, edata_size, nv, ne = (int(x) for x in hdr)
        assert version in (1, 2), f"unsupported .gr version {version}"
        row_ptr = np.zeros(nv + 1, dtype=np.int64)
        row_ptr[1:] = np.fromfile(f, dtype=np.uint64, count=nv).astype(np.int64)
        col_idx = np.fromfile(f, dtype=np.uint32, count=ne)
        elabels = None
        if edata_size:
            if ne % 2:  # 4-byte padding to 8-byte boundary
                f.read(4)
            dt = {4: np.uint32, 8: np.uint64}[edata_size]
            elabels = np.fromfile(f, dtype=dt, count=ne)
    return CSRGraph(row_ptr=row_ptr, col_idx=col_idx.astype(np.int32),
                    elabels=elabels)


def convert(
    in_path: str,
    out_dir: str,
    *,
    symmetrize: bool = False,
    clean: bool = False,
    orient: bool = False,
) -> CSRGraph:
    """The converter pipeline (src/converters/main.cc:5-34)."""
    if in_path.endswith(".mtx"):
        g = read_mtx(in_path, symmetrize=symmetrize)
    elif in_path.endswith(".gr"):
        g = read_gr(in_path)
        if symmetrize:
            g = T.symmetrize(g)
    else:
        from graphaibench_tpu.graph.io import load_graph
        g = load_graph(in_path)
        if symmetrize:
            g = T.symmetrize(g)
    if clean:
        g = T.sort_and_clean(g)
    if orient:
        g = T.orientation(g)
    save_graph(g, out_dir)
    return g
