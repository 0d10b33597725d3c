"""Greedy vertex coloring: parallel first-fit + conflict resolution.

Matches the reference scheme (src/coloring/omp_base.cc:6-41): assign
every (conflicted) vertex the smallest color absent from its
neighborhood, detect edges whose endpoints collide, re-run on the
lower-id endpoint until no conflicts. Forbidden sets are dense (nv,
max_colors) one-hot scatters instead of per-thread bitsets."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphaibench_tpu.ops.device_graph import DeviceGraph


def color(g: DeviceGraph, *, max_colors: int | None = None) -> jnp.ndarray:
    nv = g.nv
    src, dst = g.edge_src, g.col_idx
    if max_colors is None:
        max_colors = int(g.deg.max()) + 2 if nv else 1

    def first_fit(colors, active):
        # forbidden[v, c] = some neighbor of v has color c
        forb = (
            jnp.zeros((nv, max_colors), bool)
            .at[src, colors[dst]]
            .max(src != dst)
        )
        avail = ~forb
        smallest = jnp.argmax(avail, axis=1)  # first True
        return jnp.where(active, smallest, colors)

    def cond(state):
        _colors, active, it = state
        return jnp.any(active) & (it < max_colors + 2)

    def body(state):
        colors, active, it = state
        colors = first_fit(colors, active)
        conflict_e = (colors[src] == colors[dst]) & (src != dst)
        # recolor the smaller endpoint (matching the reference's
        # deterministic tie-break)
        loser = jnp.where(src < dst, src, dst)
        active = (
            jnp.zeros(nv, bool).at[loser].max(conflict_e)
        )
        return colors, active, it + 1

    colors0 = jnp.zeros(nv, jnp.int32)
    active0 = jnp.ones(nv, bool)
    colors, _, _ = jax.lax.while_loop(cond, body, (colors0, active0, jnp.int32(0)))
    return colors
