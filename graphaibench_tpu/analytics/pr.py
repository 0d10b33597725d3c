"""PageRank: pull iteration with the reference's exact constants
(EPSILON 1e-4, kDamp 0.85, MAX_ITER 100 — common.h:73-76) and update
rule (omp_base.cc:5-46), expressed as one SpMM per iteration."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphaibench_tpu.ops.device_graph import DeviceGraph
from graphaibench_tpu.ops.segment import neighbor_reduce

EPSILON = 1e-4
K_DAMP = 0.85
MAX_ITER = 100


import functools


@functools.partial(jax.jit, static_argnames=("damp", "epsilon", "max_iter"))
def pagerank(
    g: DeviceGraph,
    rg: DeviceGraph | None = None,
    *,
    damp: float = K_DAMP,
    epsilon: float = EPSILON,
    max_iter: int = MAX_ITER,
):
    """Returns (scores, iterations). ``rg`` is the reverse (incoming)
    graph; for symmetric graphs pass None to reuse ``g``. The per-edge
    gather new[dst] += scores[src]/deg[src] is a scatter-add over the
    reverse edge list — one fused segment-sum per iteration."""
    if rg is None:
        rg = g
    nv = g.nv
    base = (1.0 - damp) / nv
    out_deg = jnp.maximum(g.deg, 1).astype(jnp.float32)
    # reverse-graph edge (v -> u) means original (u -> v): v accumulates
    rsrc, rdst = rg.edge_src, rg.col_idx

    def cond(state):
        _s, err, it = state
        return (err >= epsilon) & (it < max_iter)

    pull = rg.has_ell_layout

    def body(state):
        scores, _, it = state
        contrib = scores / out_deg
        if pull:
            incoming = neighbor_reduce(rg, contrib, "sum")
        else:
            incoming = jax.ops.segment_sum(contrib[rdst], rsrc,
                                           num_segments=nv)
        new = base + damp * incoming
        err = jnp.sum(jnp.abs(new - scores))
        return new, err, it + 1

    s0 = jnp.full(nv, 1.0 / nv, dtype=jnp.float32)
    scores, _, iters = jax.lax.while_loop(
        cond, body, (s0, jnp.float32(jnp.inf), jnp.int32(0))
    )
    return scores, iters
