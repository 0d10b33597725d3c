"""Device-resident graph representation for TPU sparse ops.

Replaces the reference's GPU graph mirrors (``LearningGraph`` device
pointers, lgraph.cu:56-118, and ``GraphGPU``, include/graph_gpu.h) with a
JAX pytree holding several *layouts* of the same adjacency, each tuned to
a different execution strategy:

  * COO (edge_src / col_idx, CSR-ordered) — for XLA gather + segment_sum
    and for per-edge ops (SDDMM, segment softmax).
  * Degree-bucketed ELL — rows grouped by pow2 degree up to width 64,
    heavier rows split into 64-wide virtual-row chunks (scatter-add
    accumulated), neighbor ids padded to the bucket width. The SpMM over
    a bucket is a dense gather + weighted reduction XLA fuses into a
    streaming kernel; this replaces the reference's warp/CTA
    load-balancing tricks (include/gnn/graph_operations.h:85-178) which
    have no TPU analog.
  * Optional dense adjacency — for small graphs the N x N normalized
    adjacency lives in HBM and aggregation is a single MXU matmul.

The transpose permutation (built once on host) replaces the reference's
per-step cuSPARSE csr2csc in the GAT adjoint (gat_aggregator.cu:88-92).

All index arrays are int32: graphs are sharded so per-shard edge counts
fit in 32 bits (XLA int64 is slow on TPU).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from graphaibench_tpu.graph.csr import CSRGraph
from graphaibench_tpu.graph import transforms as T


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class EllBucket:
    """Rows of (padded) degree exactly ``width``; padding slots carry
    edge_id == ne (one past the end) so runtime per-edge values gather a
    zero from a sentinel slot."""

    row_ids: jnp.ndarray   # (R,) int32
    nbr: jnp.ndarray       # (R, W) int32, padded with 0
    edge_id: jnp.ndarray   # (R, W) int32, padded with ne (sentinel)
    width: int             # static

    def tree_flatten(self):
        return (self.row_ids, self.nbr, self.edge_id), (self.width,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, width=aux[0])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DeviceGraph:
    """Static-topology device graph. Edge weights are supplied separately
    at call sites so one topology serves GCN norms, SAGE means, and GAT
    attention scores alike."""

    row_ptr: jnp.ndarray           # (N+1,) int32
    col_idx: jnp.ndarray           # (E,) int32  — CSR destination ids
    edge_src: jnp.ndarray          # (E,) int32  — CSR-ordered source ids
    deg: jnp.ndarray               # (N,) int32
    # host-precomputed transpose: edge k of G^T corresponds to edge
    # trans_perm[k] of G (see transforms.transpose_edge_permutation)
    trans_perm: Optional[jnp.ndarray]  # (E,) int32 or None
    ell: tuple                     # tuple[EllBucket, ...] (possibly empty)
    nv: int                        # static
    ne: int                        # static

    def tree_flatten(self):
        children = (self.row_ptr, self.col_idx, self.edge_src, self.deg,
                    self.trans_perm, self.ell)
        return children, (self.nv, self.ne)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, nv=aux[0], ne=aux[1])

    @property
    def has_transpose(self) -> bool:
        return self.trans_perm is not None


# Width grid + heavy-row splitting, tuned on real TPU hardware with a
# CHAINED benchmark (spmm output feeds the next iteration's input, like
# real GNN layers — independent-iteration loops overlap across steps and
# overstate throughput). Measured on rmat17/F=128 (old pow2-to-maxdeg,
# no splitting: 236 M edges/s, 1.36x padding, 14 buckets):
#     widths {1..512}x1.5-grid, split 512: 224 (18 buckets)
#     widths {4..512} pow2,     split 512: 263 (8)
#     widths {4..128} pow2,     split 128: 284 (6)
#     widths {4..64}  pow2,     split  64: 298 (5)   <- this
#     widths {4..32}  pow2,     split  32: 278 (4, scatter-add grows)
#     widths {8,32,128,512},    split 512:  85 (padding 1.8 kills it)
# Under serial dependencies the per-bucket fixed cost (gather+einsum+
# scatter sequence) dominates, so FEWER buckets win as long as padding
# stays ~<1.25x; splitting every row wider than 64 into 64-wide virtual
# rows bounds padding without adding buckets.
_WIDTH_GRID = (4, 8, 16, 32, 64)
ELL_SPLIT = 64


def build_ell_buckets(g: CSRGraph, split: Optional[int] = None) -> list[EllBucket]:
    """Host-side degree-bucketed ELL packing with heavy-row splitting.

    Rows of degree 0 are skipped (their aggregation output is zero).
    Rows wider than ``split`` are broken into several virtual rows that
    target the same output row — consumers MUST accumulate with
    scatter-add, not set (spmm.py does)."""
    deg = g.degrees().astype(np.int64)
    ne = g.ne
    buckets: list[EllBucket] = []
    if g.nv == 0 or ne == 0:
        return buckets
    split = split or ELL_SPLIT
    widths = [w for w in _WIDTH_GRID if w < split] + [split] \
        if split >= _WIDTH_GRID[0] else [split]
    row_ptr = g.row_ptr
    # virtual rows: (target_row, start_edge, length), heavy rows split
    nchunks = np.maximum((deg + split - 1) // split, 1)
    vr_t = np.repeat(np.arange(g.nv, dtype=np.int32), nchunks)
    first = np.repeat(np.cumsum(nchunks) - nchunks, nchunks)
    k = np.arange(len(vr_t), dtype=np.int64) - first
    vr_s = row_ptr[vr_t] + k * split
    vr_l = np.minimum(deg[vr_t] - k * split, split)
    keep = vr_l > 0
    vr_t, vr_s, vr_l = vr_t[keep], vr_s[keep], vr_l[keep]
    for wi, w in enumerate(widths):
        lo = widths[wi - 1] if wi > 0 else 0
        sel = (vr_l > lo) & (vr_l <= w)
        if not sel.any():
            continue
        rows, starts, lens = vr_t[sel], vr_s[sel], vr_l[sel]
        # vectorized packing: slot (i, j) is edge starts[i] + j when
        # j < lens[i], else padding
        offs = np.arange(w, dtype=np.int64)[None, :]         # (1, w)
        in_row = offs < lens[:, None]
        pos_c = np.where(in_row, starts[:, None] + offs, 0)
        nbr = np.where(in_row, g.col_idx[pos_c], 0).astype(np.int32)
        eid = np.where(in_row, pos_c, ne).astype(np.int32)
        buckets.append(
            EllBucket(
                row_ids=jnp.asarray(rows),
                nbr=jnp.asarray(nbr),
                edge_id=jnp.asarray(eid),
                width=w,
            )
        )
    return buckets


def to_device_graph(
    g: CSRGraph,
    *,
    with_transpose: bool = True,
    with_ell: bool = True,
    ell_split: Optional[int] = None,
) -> DeviceGraph:
    """One-time host -> device transfer (the analog of the reference's
    single copy_to_gpu crossing, net.cpp:186-187)."""
    assert g.ne < 2**31, "per-shard edge count must fit int32; partition first"
    src, dst = g.coo()
    trans = (
        jnp.asarray(T.transpose_edge_permutation(g)) if with_transpose else None
    )
    ell = tuple(build_ell_buckets(g, ell_split)) if with_ell else ()
    return DeviceGraph(
        row_ptr=jnp.asarray(g.row_ptr.astype(np.int32)),
        col_idx=jnp.asarray(dst),
        edge_src=jnp.asarray(src),
        deg=jnp.asarray(g.degrees()),
        trans_perm=trans,
        ell=ell,
        nv=g.nv,
        ne=g.ne,
    )
