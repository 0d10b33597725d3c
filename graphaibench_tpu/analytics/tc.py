"""Triangle counting: DAG orientation + per-edge sorted intersection.

The reference counts sum over DAG edges (u, v) of |N(u) ∩ N(v)| with
AVX/warp merge or galloping intersections (src/triangle/omp_base.cc:5-26,
intersect.cc, bs_warp_edge.cuh). The TPU formulation packs the oriented
adjacency into a padded (nv, W) matrix and answers each edge's
intersection with a batched binary search (searchsorted) — |N(u)|·log W
comparisons per edge on the VPU, no data-dependent control flow. Edges
are processed in fixed-size chunks to bound memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graphaibench_tpu.graph import transforms as T
from graphaibench_tpu.graph.csr import CSRGraph


def _pack_padded(g: CSRGraph, sentinel: int):
    """(nv, W) neighbor matrix padded with ``sentinel`` (> any id)."""
    W = max(g.max_degree(), 1)
    deg = g.degrees()
    starts = g.row_ptr[:, None]
    offs = np.arange(W, dtype=np.int64)[None, :]
    in_row = offs < deg[:, None]
    pos = np.where(in_row, starts[: g.nv] + offs, 0)
    nbr = np.where(in_row, g.col_idx[pos], sentinel)
    return nbr.astype(np.int32), deg


def triangle_count(g: CSRGraph, *, chunk: int = 1 << 18) -> int:
    """Exact triangle count of an undirected graph (golden values in
    src/triangle/README.md:50-63, e.g. citeseer = 1166)."""
    dag = T.orientation(g)
    sentinel = dag.nv + 1
    nbr_np, deg = _pack_padded(dag, sentinel)
    src_np, dst_np = dag.coo()
    ne = dag.ne
    if ne == 0:
        return 0

    nbr = jnp.asarray(nbr_np)

    @jax.jit
    def count_chunk(src_c, dst_c, valid_c):
        a = nbr[src_c]            # (C, W) sorted with sentinel padding
        b = nbr[dst_c]            # (C, W)
        # membership of each a-element in b via batched binary search
        idx = jax.vmap(jnp.searchsorted)(b, a)
        idx = jnp.minimum(idx, b.shape[1] - 1)
        found = jnp.take_along_axis(b, idx, axis=1) == a
        found &= (a < sentinel) & valid_c[:, None]
        # per-edge counts stay < 2^31; the grand total is summed on host
        # in Python ints to avoid int32 overflow on billion-triangle graphs
        return jnp.sum(found, axis=1, dtype=jnp.int32)

    csize = min(chunk, ne)
    total = 0
    for s in range(0, ne, csize):
        e = min(s + csize, ne)
        pad = csize - (e - s)
        src_c = np.pad(src_np[s:e], (0, pad))
        dst_c = np.pad(dst_np[s:e], (0, pad))
        valid = np.pad(np.ones(e - s, dtype=bool), (0, pad))
        total += int(np.asarray(count_chunk(jnp.asarray(src_c),
                                            jnp.asarray(dst_c),
                                            jnp.asarray(valid)),
                                dtype=np.int64).sum())
    return int(total)
