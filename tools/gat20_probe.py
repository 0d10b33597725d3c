"""Where does the rmat20 GAT epoch (6.8 s, target <=4 s) go?

Components timed on the real chip (chained protocol, device-resident):
  rowmax   — _sr_rowmax (2-col packed scalar sweep)
  fwd      — full v2 forward (rowmax + packed aggregation pass)
  fwdbwd   — forward + the two backward passes via jax.grad
  roofline — pure packed gather of the same slot volume

Usage: python tools/gat20_probe.py [--scale 20] [--feat 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_chained(fn, x0, iters=4, *args):
    """Chained-dependency timing loop. Every big array/pytree operand
    must ride in ``*args`` — closed-over device arrays serialize into
    the remote compile request and the rmat20 seg-ELL alone blows the
    tunnel's limit (HTTP 413; CLAUDE.md rule)."""
    import jax

    run = jax.jit(lambda c, *a: jax.lax.fori_loop(
        0, iters, lambda i, v: fn(v, *a), c))
    _ = np.asarray(run(x0, *args))[..., :1]
    times = []
    for k in range(3):
        xk = x0 + np.float32(1e-6) * (k + 1)
        _ = np.asarray(xk)[..., :1]
        t0 = time.perf_counter()
        out = run(xk, *args)
        _ = np.asarray(out)[..., :1]
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[1]


def main():
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        # the axon plugin ignores the env var; pin explicitly (CLAUDE.md)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=20)
    ap.add_argument("--ef", type=int, default=32)
    ap.add_argument("--feat", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from graphaibench_tpu.graph import transforms as T
    from graphaibench_tpu.graph.generators import rmat
    from graphaibench_tpu.ops.device_graph import DeviceGraph, build_seg_ell
    from graphaibench_tpu.ops import fused_gat as FG

    print("building...", file=sys.stderr, flush=True)
    g = T.add_selfloop(rmat(args.scale, args.ef, seed=0))
    seg = build_seg_ell(g)
    z1 = jnp.zeros((1,), jnp.int32)
    dg = DeviceGraph(row_ptr=z1, col_idx=z1, edge_src=z1, deg=z1,
                     trans_perm=None, ell=(), nv=g.nv, ne=g.ne, seg_ell=seg)
    slots = sum(b.nbr.size for sg_ in seg.segs for b in sg_)
    f = args.feat

    @jax.jit
    def mk():
        r = jax.lax.broadcasted_iota(jnp.float32, (g.nv, f), 0)
        c = jax.lax.broadcasted_iota(jnp.float32, (g.nv, f), 1)
        h = jnp.sin(r * 1e-3 + c) * 0.1
        sl = jnp.sin(jnp.arange(g.nv, dtype=jnp.float32) * 1e-5)
        sr = jnp.cos(jnp.arange(g.nv, dtype=jnp.float32) * 1e-5)
        return h, sl, sr

    h, sl, sr = mk()
    h.block_until_ready()
    print(f"graph nv={g.nv} ne={g.ne} slots={slots} "
          f"pad={slots / g.ne:.2f}", file=sys.stderr, flush=True)

    def report(tag, dt):
        print(json.dumps(dict(tag=tag, ms=dt * 1e3,
                              slot_mrows_per_s=slots / dt / 1e6)), flush=True)

    # rowmax sweep alone
    report("rowmax", bench_chained(
        lambda v, g_, s_: FG._sr_rowmax(g_, s_ + v[0] * 1e-9), sl, 4,
        dg, sr))

    # full v2 forward
    report("fwd", bench_chained(
        lambda v, g_, s1, s2, hh: FG.gat_attention_spmm_v2(
            g_, s1, s2, hh + v[..., None] * 1e-12)[:, 0], sl, 4,
        dg, sl, sr, h))

    # forward + backward
    def fb(v, g_, s1_, s2_, h_):
        def loss(hh, s1, s2):
            return FG.gat_attention_spmm_v2(g_, s1, s2, hh).sum()
        dh, ds1, ds2 = jax.grad(loss, argnums=(0, 1, 2))(
            h_ * (1 + v[0] * 1e-12), s1_, s2_)
        return ds1
    report("fwdbwd", bench_chained(fb, sl, 4, dg, sl, sr, h))
    return 0


if __name__ == "__main__":
    sys.exit(main())
