"""Segment ops over CSR rows: softmax over each vertex's edge list.

The GAT attention normalization (gat_aggregator.cpp:78-80 softmax over a
vertex's outgoing edges) and its exact derivative (d_softmax,
gat_aggregator.cpp:132-153) expressed as edge-parallel segment ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphaibench_tpu.ops.device_graph import DeviceGraph


def segment_softmax(g: DeviceGraph, scores: jnp.ndarray) -> jnp.ndarray:
    """Row-wise (per-source-vertex) softmax of per-edge scores.

    Matches the reference's per-row ``softmax(deg, scores, norm_scores)``:
    max-subtracted exp, normalized within the row."""
    seg = g.edge_src
    row_max = jax.ops.segment_max(scores, seg, num_segments=g.nv,
                                  indices_are_sorted=True)
    # rows with no edges produce -inf max; they have no edges to index
    shifted = scores - row_max[seg]
    e = jnp.exp(shifted)
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
