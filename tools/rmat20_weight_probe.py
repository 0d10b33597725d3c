"""Isolate the rmat20 seg-ELL SpMM bottleneck: the per-edge WEIGHT gather.

tools/segell_probe.py showed the x[nbr] gathers run at full rate (~260 M
rows/s) even as 64 MB views of a 512 MB buffer. The remaining per-slot
gather is w_pad[eid]: in the column-segmented layout the edge ids of a
segment are scattered over the whole (ne+1,) weight array (a vertex's
edges are dst-sorted, so each segment picks an interleaved subset), i.e.
a SCALAR gather (half row rate, measured) over a 128 MB window (slow
regime) — plausibly the entire 446 ms.

Cases on rmat20 (selfloop, GCN norms), chained protocol:
  a. full spmm_ell (seg-ELL auto)          — the round-1 446 ms number
  b. x-gather only (weights == 1)          — no eid gather
  c. weight-gather only (sum w_pad[eid])   — no x gather
If b ~= 150 ms and c ~= 300+ ms, pre-packing weights per bucket at build
time (static for GCN/SAGE) deletes c from every training step.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_chained(fn, x0, iters=5):
    import jax

    run = jax.jit(lambda c: jax.lax.fori_loop(
        0, iters, lambda i, v: fn(v), c))
    _ = np.asarray(run(x0))[..., :1]
    times = []
    for k in range(3):
        xk = x0 + np.float32(1e-6) * (k + 1)
        _ = np.asarray(xk[0])
        t0 = time.perf_counter()
        out = run(xk)
        _ = np.asarray(out)[..., :1]
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[1]


def main():
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        # the axon plugin ignores the env var; pin explicitly (CLAUDE.md)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax
    import jax.numpy as jnp

    from graphaibench_tpu.graph import transforms as T
    from graphaibench_tpu.graph.generators import rmat
    from graphaibench_tpu.ops.device_graph import DeviceGraph, build_seg_ell
    from graphaibench_tpu.ops.spmm import spmm_ell

    scale, ef, feat = 20, 32, 128
    print("building graph...", file=sys.stderr, flush=True)
    g = T.add_selfloop(rmat(scale, ef, seed=0))
    # ONLY the seg-ELL layout is built/uploaded (~300 MB); x and w are
    # synthesized on device — uploading x (512 MB) + plain ELL + COO
    # made the full to_device_graph probe blow the time budget.
    seg = build_seg_ell(g)
    z1 = jnp.zeros((1,), jnp.int32)
    dg = DeviceGraph(row_ptr=z1, col_idx=z1, edge_src=z1, deg=z1,
                     trans_perm=None, ell=(), nv=g.nv, ne=g.ne, seg_ell=seg)

    @jax.jit
    def make_xw():
        r = jax.lax.broadcasted_iota(jnp.float32, (g.nv, feat), 0)
        c = jax.lax.broadcasted_iota(jnp.float32, (g.nv, feat), 1)
        x = jnp.sin(r * 1e-3 + c)
        w = jnp.cos(jnp.arange(g.ne, dtype=jnp.float32) * 1e-4)
        return x, w

    print("uploading + synthesizing...", file=sys.stderr, flush=True)
    x, w_d = make_xw()
    x.block_until_ready()

    def report(tag, dt):
        print(json.dumps(dict(tag=tag, ms=dt * 1e3,
                              edges_per_s=g.ne / dt)), flush=True)

    # a: full spmm
    report("a_full_spmm", bench_chained(lambda v: spmm_ell(dg, w_d, v), x))

    # b: x gather + reduce only, no weight gather (timing only — padded
    # slots contribute garbage, irrelevant to the rate)
    def x_only(v):
        out = jnp.zeros((dg.nv, feat), v.dtype)
        for (lo, hi), buckets in zip(dg.seg_ell.bounds, dg.seg_ell.segs):
            xs = v[lo:hi]
            for b in buckets:
                out = out.at[b.row_ids].add(xs[b.nbr].sum(axis=1))
        return out
    report("b_x_gather_only", bench_chained(x_only, x))

    # c: weight gather only
    w_pad = jnp.concatenate([w_d, jnp.zeros((1,), w_d.dtype)])

    def w_only(v):
        out = jnp.zeros((dg.nv,), w_pad.dtype)
        wp = w_pad + v[0, 0] * 1e-9
        for (lo, hi), buckets in zip(dg.seg_ell.bounds, dg.seg_ell.segs):
            for b in buckets:
                out = out.at[b.row_ids].add(wp[b.edge_id].sum(axis=1))
        return out
    report("c_weight_gather_only", bench_chained(w_only, x))

    # d: packed static weights (the production GCN/SAGE path)
    from graphaibench_tpu.ops.device_graph import pack_edge_values

    wp = pack_edge_values(dg, w_d, with_transpose=False)
    report("d_spmm_packed_w",
           bench_chained(lambda v: spmm_ell(dg, wp, v), x))
    return 0


if __name__ == "__main__":
    sys.exit(main())
