"""k-hop neighbor sampling and random walks.

Parity with src/sampling/omp_base.cc:6-45 (hops=3, fanouts {15,10,10})
plus the node2vec/DeepWalk-style uniform random walk the reference only
stubs (src/embedding/README.md:50-54). Sampling uses padded neighbor
matrices + vectorized jax.random choices — static shapes, no worklists."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graphaibench_tpu.graph.csr import CSRGraph

DEFAULT_FANOUTS = (15, 10, 10)


def _padded_nbrs(g: CSRGraph):
    W = max(g.max_degree(), 1)
    deg = g.degrees()
    starts = g.row_ptr[:, None]
    offs = np.arange(W, dtype=np.int64)[None, :]
    in_row = offs < deg[:, None]
    pos = np.where(in_row, starts[: g.nv] + offs, 0)
    nbr = np.where(in_row, g.col_idx[pos], 0).astype(np.int32)
    return jnp.asarray(nbr), jnp.asarray(deg.astype(np.int32))


def khop_sample(
    g: CSRGraph,
    seeds: np.ndarray,
    fanouts=DEFAULT_FANOUTS,
    *,
    seed: int = 0,
):
    """Returns a list of (src, dst) int32 edge arrays, one per hop.
    Vertices with degree 0 emit self-edges (filtered by the caller if
    undesired)."""
    nbr, deg = _padded_nbrs(g)
    key = jax.random.PRNGKey(seed)
    frontier = jnp.asarray(np.asarray(seeds, dtype=np.int32))
    out = []
    for hop, fanout in enumerate(fanouts):
        key, sub = jax.random.split(key)
        n = frontier.shape[0]
        r = jax.random.randint(sub, (n, fanout), 0, jnp.maximum(deg[frontier], 1)[:, None])
        dsts = nbr[frontier[:, None], r]           # (n, fanout)
        has_nbr = (deg[frontier] > 0)[:, None]
        dsts = jnp.where(has_nbr, dsts, frontier[:, None])
        srcs = jnp.broadcast_to(frontier[:, None], dsts.shape)
        out.append((np.asarray(srcs).ravel(), np.asarray(dsts).ravel()))
        frontier = dsts.ravel()
    return out


def random_walk(
    g: CSRGraph,
    starts: np.ndarray,
    walk_length: int,
    *,
    seed: int = 0,
) -> np.ndarray:
    """(num_walks, walk_length+1) uniform random walks; walks stall at
    degree-0 vertices."""
    nbr, deg = _padded_nbrs(g)
    key = jax.random.PRNGKey(seed)
    cur = jnp.asarray(np.asarray(starts, dtype=np.int32))

    def step(cur, key):
        r = jax.random.randint(key, cur.shape, 0, jnp.maximum(deg[cur], 1))
        nxt = nbr[cur, r]
        return jnp.where(deg[cur] > 0, nxt, cur)

    walks = [cur]
    for _ in range(walk_length):
        key, sub = jax.random.split(key)
        cur = step(cur, sub)
        walks.append(cur)
    return np.asarray(jnp.stack(walks, axis=1))
