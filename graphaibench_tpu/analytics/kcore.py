"""k-core decomposition: bulk peeling.

The reference peels one degree level at a time with a worklist
(src/coreness/omp_base.cc:11-60). The dense TPU version peels ALL
vertices with degree <= k in one pass per sweep, recomputing live
degrees with a bucketed neighbor reduction — O(E) per sweep.

The OUTER level loop runs on HOST (one jitted fixpoint per level, a
scalar fetch between levels): a fully-jitted nested while_loop packs
hundreds of O(E) sweeps into ONE device call, which crashed the TPU
worker process at rmat19/20 through the tunnel (runtime watchdog;
tools/results/kcore19_{plain,unroll}.json — both layouts, so not a
layout fault). Host syncs cost ~10 ms/level through the tunnel; the
level counter also JUMPS to the minimum live degree, skipping empty
levels entirely (power-law graphs have sparse degree levels near the
top)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from graphaibench_tpu.ops.device_graph import DeviceGraph
from graphaibench_tpu.ops.segment import neighbor_reduce


def _live_degrees(g: DeviceGraph, alive):
    if g.has_ell_layout:
        # deg[i] = alive[i] * sum_{j in N(i)} alive[j] as a dense
        # bucket reduce instead of the (ne,)-scatter-add
        nbr_alive = neighbor_reduce(g, alive.astype(jnp.int32), "sum")
        return jnp.where(alive, nbr_alive, 0)
    contrib = (alive[g.edge_src] & alive[g.col_idx]).astype(jnp.int32)
    return jax.ops.segment_sum(contrib, g.edge_src, num_segments=g.nv)


@functools.partial(jax.jit, static_argnums=())
def _peel_level(g: DeviceGraph, core, alive, deg, k):
    """Fixpoint at level k: repeatedly peel deg<=k vertices until no
    change. Returns (core, alive, deg, min-live-degree-or-intmax)."""

    def cond(s):
        return s[3]

    def body(s):
        core, alive, deg, _ = s
        peel = alive & (deg <= k)
        core = jnp.where(peel, k, core)
        alive2 = alive & ~peel
        deg2 = _live_degrees(g, alive2)
        return core, alive2, deg2, jnp.any(peel)

    core, alive, deg, _ = jax.lax.while_loop(
        cond, body, (core, alive, deg, jnp.bool_(True)))
    imax = jnp.iinfo(jnp.int32).max
    min_live = jnp.min(jnp.where(alive, deg, imax))
    return core, alive, deg, min_live


def k_core(g: DeviceGraph) -> jnp.ndarray:
    """Coreness of every vertex (matches transforms.k_core_decomposition)."""
    imax = jnp.iinfo(jnp.int32).max
    core = jnp.zeros(g.nv, jnp.int32)
    alive = jnp.ones(g.nv, bool)
    deg = _live_degrees(g, alive)
    k = 0
    while True:
        core, alive, deg, min_live = _peel_level(
            g, core, alive, deg, jnp.int32(k))
        nxt = int(min_live)          # host sync: ends the device call
        if nxt == imax:              # nothing alive
            return core
        k = max(k + 1, nxt)
