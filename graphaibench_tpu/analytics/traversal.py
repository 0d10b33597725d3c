"""BFS and SSSP as dense edge-parallel fixpoint iterations.

TPU-native replacement for the reference's worklist solvers
(src/traversal: SlidingQueue + CAS push BFS omp_base.cc:8-57,
direction-optimizing omp_direction.cc, Bellman-Ford/delta-stepping
SSSP): on TPU a sparse frontier buys nothing — every step is a full
edge-parallel scatter — so the worklist machinery collapses into dense
frontier vectors updated with scatter-min/max inside lax.while_loop.
The direction-optimizing push/pull switch is likewise moot (push and
pull are the same dense pass), which *is* the TPU-idiomatic answer to
that optimization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graphaibench_tpu.ops.device_graph import DeviceGraph


def bfs(g: DeviceGraph, source: int) -> jnp.ndarray:
    """Level-synchronous BFS. Returns int32 depths, -1 if unreachable."""
    nv = g.nv
    src, dst = g.edge_src, g.col_idx

    def cond(state):
        _dist, frontier, _level = state
        return jnp.any(frontier)

    def body(state):
        dist, frontier, level = state
        # push step: any edge from a frontier vertex reaches dst
        reached = (
            jnp.zeros(nv, dtype=jnp.int32)
            .at[dst]
            .max(frontier[src].astype(jnp.int32))
        )
        new = (reached > 0) & (dist < 0)
        dist = jnp.where(new, level + 1, dist)
        return dist, new, level + 1

    dist0 = jnp.full(nv, -1, dtype=jnp.int32).at[source].set(0)
    frontier0 = jnp.zeros(nv, dtype=bool).at[source].set(True)
    dist, _, _ = jax.lax.while_loop(cond, body, (dist0, frontier0, jnp.int32(0)))
    return dist


def sssp_bellman_ford(
    g: DeviceGraph, weights: jnp.ndarray, source: int, *, max_iter: int | None = None
) -> jnp.ndarray:
    """Bellman-Ford to fixpoint (the reference's gpu_bellmanford shape;
    delta-stepping's bucketing is a work-efficiency device with no dense
    TPU analog). Returns float32 distances, inf unreachable."""
    nv = g.nv
    src, dst = g.edge_src, g.col_idx
    inf = jnp.float32(jnp.inf)
    max_iter = nv if max_iter is None else max_iter

    def cond(state):
        _dist, changed, it = state
        return changed & (it < max_iter)

    def body(state):
        dist, _, it = state
        cand = jnp.full(nv, inf).at[dst].min(dist[src] + weights)
        new = jnp.minimum(dist, cand)
        return new, jnp.any(new < dist), it + 1

    dist0 = jnp.full(nv, inf).at[source].set(0.0)
    dist, _, _ = jax.lax.while_loop(cond, body, (dist0, jnp.bool_(True), jnp.int32(0)))
    return dist


def bfs_host(g_host, source: int) -> np.ndarray:
    """Convenience: device BFS from a host CSRGraph."""
    from graphaibench_tpu.ops.device_graph import to_device_graph

    dg = to_device_graph(g_host, with_transpose=False, with_ell=False)
    return np.asarray(bfs(dg, source))
