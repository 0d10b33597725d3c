"""Device-resident graph representation for TPU sparse ops.

Replaces the reference's GPU graph mirrors (``LearningGraph`` device
pointers, lgraph.cu:56-118, and ``GraphGPU``, include/graph_gpu.h) with a
JAX pytree holding several *layouts* of the same adjacency, each tuned to
a different execution strategy:

  * COO (edge_src / col_idx, CSR-ordered) — for XLA gather + segment_sum
    and for per-edge ops (SDDMM, segment softmax).
  * Degree-bucketed ELL — rows grouped by ceil-pow2 degree, neighbor ids
    padded to the bucket width. The SpMM over a bucket is a dense gather
    + weighted reduction XLA fuses into a streaming kernel; this replaces
    the reference's warp/CTA load-balancing tricks
    (include/gnn/graph_operations.h:85-178) which have no TPU analog.
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


def _ceil_pow2(x: int) -> int:
    return 1 if x <= 1 else 1 << (int(x) - 1).bit_length()


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


def build_ell_buckets(g: CSRGraph, max_width: Optional[int] = None) -> list[EllBucket]:
    """Host-side degree-bucketed ELL packing. Rows with degree in
    (w/2, w] for each pow-2 width w share a bucket. Rows of degree 0 are
    skipped (their aggregation output is zero)."""
    deg = g.degrees()
    ne = g.ne
    buckets: list[EllBucket] = []
    if g.nv == 0:
        return buckets
    # ceil-pow2 width buckets: <2x padding worst case, ~1.3x typical.
    # (Exact-width buckets were measured SLOWER on TPU despite zero
    # padding — per-bucket fixed launch/fusion overhead dominates, so
    # fewer, larger buckets win.)
    widths = sorted({_ceil_pow2(int(d)) for d in np.unique(deg) if d > 0})
    row_ptr = g.row_ptr
    for w in widths:
        lo = w // 2 if w > 1 else 0
        rows = np.nonzero((deg > lo) & (deg <= w))[0].astype(np.int32)
        r = len(rows)
        # vectorized packing: slot (i, j) is edge row_ptr[rows[i]] + j when
        # j < deg[rows[i]], else padding
        starts = row_ptr[rows][:, None]                      # (r, 1)
        offs = np.arange(w, dtype=np.int64)[None, :]         # (1, w)
        pos = starts + offs
        in_row = offs < deg[rows][:, None]
        pos_c = np.where(in_row, pos, 0)
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
    ell_max_width: Optional[int] = None,
) -> DeviceGraph:
    """One-time host -> device transfer (the analog of the reference's
    single copy_to_gpu crossing, net.cpp:186-187)."""
    assert g.ne < 2**31, "per-shard edge count must fit int32; partition first"
    src, dst = g.coo()
    trans = (
        jnp.asarray(T.transpose_edge_permutation(g)) if with_transpose else None
    )
    ell = tuple(build_ell_buckets(g, ell_max_width)) if with_ell else ()
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
