"""k-core decomposition: bulk peeling.

The reference peels one degree level at a time with a worklist
(src/coreness/omp_base.cc:11-60). The dense TPU version peels ALL
vertices with degree <= k in one scatter pass per sweep, recomputing
live degrees with a segment-sum — O(E) per sweep, converging in
(max coreness) * (few) sweeps."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphaibench_tpu.ops.device_graph import DeviceGraph
from graphaibench_tpu.ops.segment import neighbor_reduce


@jax.jit
def k_core(g: DeviceGraph) -> jnp.ndarray:
    """Coreness of every vertex (matches transforms.k_core_decomposition)."""
    nv = g.nv
    src, dst = g.edge_src, g.col_idx
    pull = g.has_ell_layout

    def live_degrees(alive):
        if pull:
            # deg[i] = alive[i] * sum_{j in N(i)} alive[j] as a dense
            # bucket reduce instead of the (ne,)-scatter-add
            nbr_alive = neighbor_reduce(g, alive.astype(jnp.int32), "sum")
            return jnp.where(alive, nbr_alive, 0)
        contrib = (alive[src] & alive[dst]).astype(jnp.int32)
        return jax.ops.segment_sum(contrib, src, num_segments=nv)

    def outer_cond(state):
        _core, alive, _k = state
        return jnp.any(alive)

    def outer_body(state):
        core, alive, k = state

        def inner_cond(s):
            _core, alive, deg, changed = s
            return changed

        def inner_body(s):
            core, alive, deg, _ = s
            peel = alive & (deg <= k)
            core = jnp.where(peel, k, core)
            alive2 = alive & ~peel
            deg2 = live_degrees(alive2)
            return core, alive2, deg2, jnp.any(peel)

        deg = live_degrees(alive)
        core, alive, _deg, _ = jax.lax.while_loop(
            inner_cond, inner_body, (core, alive, deg, jnp.bool_(True))
        )
        return core, alive, k + 1

    core0 = jnp.zeros(nv, jnp.int32)
    alive0 = jnp.ones(nv, bool)
    core, _, _ = jax.lax.while_loop(
        outer_cond, outer_body, (core0, alive0, jnp.int32(0))
    )
    return core
