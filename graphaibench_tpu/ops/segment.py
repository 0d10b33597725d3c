"""Segment ops over CSR rows: softmax over each vertex's edge list.

The GAT attention normalization (gat_aggregator.cpp:78-80 softmax over a
vertex's outgoing edges) and its exact derivative (d_softmax,
gat_aggregator.cpp:132-153) expressed as edge-parallel segment ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphaibench_tpu.ops.device_graph import DeviceGraph, all_buckets


def _row_reduce_ell(g: DeviceGraph, vals: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Per-source-row reduction of per-edge values via the ELL buckets:
    dense (R, W) reductions + one small scatter per bucket. On TPU this
    replaces jax.ops.segment_max/_sum, whose big scatters cost ~125 ms
    on a 4M-edge graph vs ~5 ms for the streaming ELL passes."""
    if kind == "max":
        pad_val, init = -jnp.inf, jnp.full((g.nv,), -jnp.inf, vals.dtype)
    else:
        pad_val, init = 0.0, jnp.zeros((g.nv,), vals.dtype)
    v_pad = jnp.concatenate([vals, jnp.full((1,), pad_val, vals.dtype)])
    out = init
    for b in all_buckets(g):
        vb = v_pad[b.edge_id]                   # (R, W)
        if kind == "max":
            out = out.at[b.row_ids].max(vb.max(axis=1))
        else:
            out = out.at[b.row_ids].add(vb.sum(axis=1))
    return out


def segment_softmax(g: DeviceGraph, scores: jnp.ndarray) -> jnp.ndarray:
    """Row-wise (per-source-vertex) softmax of per-edge scores.

    Matches the reference's per-row ``softmax(deg, scores, norm_scores)``:
    max-subtracted exp, normalized within the row. The max shift is
    gradient-stopped (softmax is shift-invariant, and autodiff through a
    scatter-max transpose is pure waste)."""
    seg = g.edge_src
    use_ell = g.has_ell_layout
    if use_ell:
        row_max = _row_reduce_ell(g, scores, "max")
    else:
        row_max = jax.ops.segment_max(scores, seg, num_segments=g.nv,
                                      indices_are_sorted=True)
    # rows with no edges produce -inf max; they have no edges to index
    shifted = scores - jax.lax.stop_gradient(row_max)[seg]
    e = jnp.exp(shifted)
    if use_ell:
        denom = _row_reduce_ell(g, e, "sum")
    else:
        denom = jax.ops.segment_sum(e, seg, num_segments=g.nv,
                                    indices_are_sorted=True)
    return e / denom[seg]


def segment_softmax_vjp(
    g: DeviceGraph, y: jnp.ndarray, dy: jnp.ndarray
) -> jnp.ndarray:
    """Adjoint of segment_softmax given outputs y and cotangent dy:
    dx_e = y_e * (dy_e - sum_row(y*dy))  — the d_softmax of
    math_functions.cpp applied per row."""
    seg = g.edge_src
    inner = jax.ops.segment_sum(y * dy, seg, num_segments=g.nv,
                                indices_are_sorted=True)
    return y * (dy - inner[seg])


def segment_sum_edges(g: DeviceGraph, vals: jnp.ndarray) -> jnp.ndarray:
    return jax.ops.segment_sum(vals, g.edge_src, num_segments=g.nv,
                               indices_are_sorted=True)


# identity elements per reduction kind, chosen per dtype at trace time
def _ident(kind: str, dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return {"max": -jnp.inf, "min": jnp.inf, "sum": 0.0}[kind]
    info = jnp.iinfo(dtype)
    return {"max": info.min, "min": info.max, "sum": 0}[kind]


def _pad_edge_vals(edge_vals: jnp.ndarray) -> jnp.ndarray:
    """Append the pad-slot sentinel value. Pad slots are overwritten
    with the combine identity AFTER the edge-value combine
    (``neighbor_reduce``'s edge_id==ne mask), so any finite sentinel
    works; 0 keeps the combine arithmetic NaN-free for +/*."""
    return jnp.concatenate([edge_vals, jnp.zeros((1,), edge_vals.dtype)])


def pack_neighbor_edge_vals(g: DeviceGraph, edge_vals: jnp.ndarray,
                            kind: str = "min") -> tuple:
    """Pre-gather per-edge values into the ELL slot layout, one (R, W)
    array per bucket. Passing the result as ``neighbor_reduce``'s
    ``edge_vals`` skips the per-slot edge-id scalar gather on EVERY
    call — for fixpoint solvers (SSSP) that gather is loop-invariant
    and this hoists it explicitly instead of trusting XLA's while-loop
    LICM with a multi-MB gather. ``kind`` is accepted for call-site
    symmetry with ``neighbor_reduce`` but does not affect the packing
    (pad slots are masked to the combine identity after the combine)."""
    from graphaibench_tpu.ops.device_graph import iter_buckets_sliced

    ev_pad = _pad_edge_vals(edge_vals)
    return tuple(ev_pad[b.edge_id] for b, _ in iter_buckets_sliced(g))


def neighbor_reduce(g: DeviceGraph, vals: jnp.ndarray, kind: str,
                    edge_vals=None) -> jnp.ndarray:
    """out[i] = reduce_{j in N(i)} vals[j]  (optionally combined with the
    per-edge value: vals[j] + edge_vals[e] for min/max, vals[j] *
    edge_vals[e] for sum). ``edge_vals`` is a (ne,) array or a
    pre-packed per-bucket tuple from ``pack_neighbor_edge_vals``.

    The PULL-mode relaxation primitive for frontier analytics
    (BFS/CC/PR/BC/SSSP): one dense (R, W) gather + reduction per degree
    bucket replaces the (ne,)-sized scatter-min/max of the push
    formulation (the reference's direction-optimizing pull pass,
    src/traversal/omp_direction.cc:31, mapped to the TPU gather engine).
    The vertex table is packed to 2 columns because a pure scalar gather
    runs at HALF the row rate (115 vs 232 M rows/s, measured round 2).

    Requires ELL buckets (plain or column-segmented); N(i) here are the
    row-i neighbors in the bucket layout, i.e. out-neighbors — pass the
    reverse graph for in-neighbor pulls on directed graphs."""
    ident = _ident(kind, vals.dtype)
    v2 = jnp.stack([vals, vals], axis=1)               # 2-col packed
    out = jnp.full((g.nv,), ident, vals.dtype)
    packed = isinstance(edge_vals, tuple)
    if edge_vals is not None and not packed:
        ev_pad = _pad_edge_vals(edge_vals)
    from graphaibench_tpu.ops.device_graph import iter_buckets_sliced

    for i, (b, (lo, hi)) in enumerate(iter_buckets_sliced(g)):
        vb = v2[lo:hi][b.nbr][..., 0]                  # (R, W)
        if edge_vals is not None:
            eb = edge_vals[i] if packed else ev_pad[b.edge_id]
            vb = vb * eb if kind == "sum" else vb + eb
        vb = jnp.where(b.edge_id == g.ne, ident, vb)
        if kind == "max":
            out = out.at[b.row_ids].max(vb.max(axis=1))
        elif kind == "min":
            out = out.at[b.row_ids].min(vb.min(axis=1))
        else:
            out = out.at[b.row_ids].add(vb.sum(axis=1))
    return out
