"""Sharding metadata for multi-chip/multi-host full-batch GNN training.

TPU-native replacement for the reference's distribution machinery
(NVSHMEM symmetric-heap remote fetches, multigpu_nvshmem.cu:13-160, and
MPI rank-strided ownership, dist_cpu.cpp:6-75): the graph is
1-D vertex-partitioned into uniform contiguous blocks (the
edgecut_induced_partition1D structure, graph_partition.cc:128-182), each
shard's rows are stored as a locally-reindexed padded CSR, and instead
of pulling remote adjacency mid-kernel, boundary vertex FEATURES are
exchanged between layers with one all_to_all over ICI — indices
precomputed here on host once.

Everything is padded to identical static shapes and stacked with a
leading [P] axis so the whole structure shards cleanly along a mesh
axis under shard_map.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from graphaibench_tpu.graph.csr import CSRGraph


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _ceil_div(x, m) * m


@dataclasses.dataclass
class ShardedGraph:
    """Host-side stacked shard arrays. Leading axis = shard id."""

    num_shards: int
    nv: int           # global vertex count (unpadded)
    nv_pad: int       # owned vertex slots per shard
    e_max: int        # padded per-shard edge count
    h_max: int        # padded per-shard halo size
    s_max: int        # padded per-peer send count

    # local topology: col ids are "extended local": [0, nv_pad) owned,
    # [nv_pad, nv_pad + h_max) halo
    edge_src: np.ndarray   # (P, e_max) int32 local row of each edge
    col_idx: np.ndarray    # (P, e_max) int32 extended-local dst
    edge_w: np.ndarray     # (P, e_max) f32, 0 on padding
    edge_valid: np.ndarray  # (P, e_max) bool
    edge_gid: np.ndarray   # (P, e_max) int32 original global edge id (pad: ne)

    # halo exchange plan
    send_idx: np.ndarray   # (P, P, s_max) int32 owned-local ids to send to q
    halo_map: np.ndarray   # (P, h_max) int32 into flattened recv (P*s_max)
    # real (unpadded) per-shard halo sizes — h_max is padded to >=8;
    # bandwidth/efficiency models must use these, not P*h_max
    halo_counts: np.ndarray = None  # (P,) int64
    # contiguous block starts (P,) and the global-id -> padded-slot map
    # (nv,): identity-block layout under balance="vertex" (slot == id);
    # under balance="edge" the blocks have unequal vertex counts (equal
    # EDGES instead — rmat hubs concentrate in low ids and uniform
    # blocks measured 3.6x max/mean edge imbalance at P=16,
    # weak_scaling_project.json), so vertex-row arrays must scatter
    # through ``perm``
    block_lo: np.ndarray = None     # (P,) int64
    perm: np.ndarray = None         # (nv,) int64 global id -> padded slot

    @property
    def padded_nv(self) -> int:
        return self.num_shards * self.nv_pad


def build_sharded_graph(
    g: CSRGraph,
    edge_w: np.ndarray,
    num_shards: int,
    *,
    row_align: int = 8,
    balance: str = "vertex",
) -> ShardedGraph:
    """Partition into ``num_shards`` contiguous vertex blocks with 1-hop
    halo plans. ``edge_w`` are global per-edge weights in CSR order.

    ``balance``: "vertex" (uniform blocks — slot == global id) or
    "edge" (equal-EDGE cuts: block vertex counts vary, rows pad per
    shard to the largest block; fixes the measured 3.6x max/mean edge
    imbalance of uniform blocks on rmat at P=16 at the price of extra
    feature-row padding)."""
    P = num_shards
    src_all, dst_all = g.coo()
    eid_all = np.arange(g.ne, dtype=np.int64)

    if balance == "edge" and g.ne:
        cum = np.concatenate([[0], np.cumsum(g.degrees(),
                                             dtype=np.int64)])
        target = g.ne / P
        block_lo = [0]
        for p in range(1, P):
            hi = int(np.searchsorted(cum, p * target, side="left"))
            block_lo.append(min(max(hi, block_lo[-1] + 1), g.nv))
        block_lo = np.asarray(block_lo, np.int64)
        block_hi = np.concatenate([block_lo[1:], [g.nv]])
        nv_pad = _round_up(max(int((block_hi - block_lo).max()), 1),
                           row_align)
    else:
        nv_pad = _round_up(_ceil_div(g.nv, P), row_align)
        block_lo = np.arange(P, dtype=np.int64) * nv_pad
        block_hi = np.minimum(block_lo + nv_pad, g.nv)

    def owner_of(ids):
        return (np.searchsorted(block_lo, ids, side="right") - 1).clip(
            0, P - 1)

    per = []
    for p in range(P):
        lo, hi = int(block_lo[p]), int(block_hi[p])
        if lo >= g.nv or hi <= lo:
            src = dst = eid = np.empty(0, dtype=np.int64)
        else:
            em = (src_all >= lo) & (src_all < hi)
            src, dst, eid = src_all[em], dst_all[em], eid_all[em]
        owned = (dst >= lo) & (dst < hi)
        halo_ids = np.unique(dst[~owned])          # global ids, sorted
        per.append(dict(lo=lo, hi=hi, src=src, dst=dst, eid=eid,
                        owned=owned, halo=halo_ids))

    e_max = max((len(p["src"]) for p in per), default=0)
    e_max = max(_round_up(max(e_max, 1), 8), 8)
    h_max = max((len(p["halo"]) for p in per), default=0)
    h_max = max(_round_up(max(h_max, 1), 8), 8)

    # send lists: what p must ship to q = q's halo ids owned by p
    send_lists = [[None] * P for _ in range(P)]
    s_max = 1
    for q in range(P):
        halo = per[q]["halo"]
        owner = owner_of(halo)
        for p in range(P):
            ids = halo[owner == p]
            send_lists[p][q] = ids
            s_max = max(s_max, len(ids))
    s_max = _round_up(s_max, 8)

    edge_src = np.zeros((P, e_max), dtype=np.int32)
    col_idx = np.zeros((P, e_max), dtype=np.int32)
    w_arr = np.zeros((P, e_max), dtype=np.float32)
    valid = np.zeros((P, e_max), dtype=bool)
    egid = np.full((P, e_max), g.ne, dtype=np.int32)
    send_idx = np.zeros((P, P, s_max), dtype=np.int32)
    halo_map = np.zeros((P, h_max), dtype=np.int32)

    for p in range(P):
        d = per[p]
        n_e = len(d["src"])
        edge_src[p, :n_e] = d["src"] - d["lo"]
        # extended-local dst
        loc = np.where(
            d["owned"],
            d["dst"] - d["lo"],
            nv_pad + np.searchsorted(d["halo"], d["dst"]),
        )
        col_idx[p, :n_e] = loc
        w_arr[p, :n_e] = edge_w[d["eid"]]
        valid[p, :n_e] = True
        egid[p, :n_e] = d["eid"]
        # park padded edges on the last row with weight 0
        if n_e < e_max:
            edge_src[p, n_e:] = nv_pad - 1

        # halo_map: for each halo vertex, its slot in the flattened recv
        # buffer (peer_owner * s_max + position in that peer's send list)
        for q in range(P):
            ids = send_lists[q][p]       # q sends these to p
            if len(ids):
                pos_in_halo = np.searchsorted(d["halo"], ids)
                halo_map[p, pos_in_halo] = q * s_max + np.arange(len(ids))
        for q in range(P):
            ids = send_lists[p][q]       # p sends these to q
            send_idx[p, q, : len(ids)] = ids - per[p]["lo"]

    ids = np.arange(g.nv, dtype=np.int64)
    own = owner_of(ids)
    perm = own * nv_pad + (ids - block_lo[own])
    return ShardedGraph(
        num_shards=P, nv=g.nv, nv_pad=nv_pad, e_max=e_max, h_max=h_max,
        s_max=s_max, edge_src=edge_src, col_idx=col_idx, edge_w=w_arr,
        edge_valid=valid, edge_gid=egid, send_idx=send_idx, halo_map=halo_map,
        halo_counts=np.array([len(p_["halo"]) for p_ in per], dtype=np.int64),
        block_lo=block_lo, perm=perm,
    )


def pad_rows(x: np.ndarray, padded_nv: int, perm: np.ndarray = None
             ) -> np.ndarray:
    """Lay a (nv, ...) vertex array out in the sharded row space:
    zero-pad to ``padded_nv`` rows, scattering row i to ``perm[i]``
    (identity under balance="vertex", where it reduces to a tail pad)."""
    if perm is not None:
        out = np.zeros((padded_nv,) + x.shape[1:], dtype=x.dtype)
        out[perm] = x
        return out
    pad = padded_nv - x.shape[0]
    if pad <= 0:
        return x
    return np.concatenate([x, np.zeros((pad,) + x.shape[1:], dtype=x.dtype)])
