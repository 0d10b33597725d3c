"""Sharded-trainer stage profile at products scale (P=1).

The sharded epoch is 56 s vs 11.4 s single-chip; this isolates the
aggregation (fwd), its adjoint (fwd+bwd), and the full train step so
the gap is attributable.

  python tools/shard_profile.py [--scale 21] [--ef 26]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=21)
    ap.add_argument("--ef", type=int, default=26)
    ap.add_argument("--feat", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from graphaibench_tpu.graph.generators import rmat
    from graphaibench_tpu.nn.model import aggregation_weights, prepare_graph
    from graphaibench_tpu.parallel import AXIS, build_sharded_graph
    from graphaibench_tpu.parallel.shard_ell import (
        build_shard_ell,
        drop_edge_ids,
        pack_shard_values,
        shard_specs,
        slot_spmm_packed,
        strip_shard,
    )

    def tick(tag, t0):
        t1 = time.perf_counter()
        print(f"[prof] host {tag}: {t1 - t0:.1f} s", file=sys.stderr,
              flush=True)
        return t1

    t = time.perf_counter()
    g = rmat(args.scale, args.ef, seed=0, cache=True)
    t = tick("rmat", t)
    prepped = prepare_graph(g, "gcn")
    w = aggregation_weights(prepped, "gcn")
    t = tick("prepare", t)
    sg = build_sharded_graph(prepped, w, 1)
    t = tick("build_sharded_graph", t)
    se = build_shard_ell(sg)
    t = tick("build_shard_ell", t)
    wp = pack_shard_values(se, sg.edge_w)
    se = drop_edge_ids(se)
    t = tick("pack", t)
    mesh = Mesh(np.array(jax.devices()[:1]), (AXIS,))
    nv_pad, nv_ext = sg.nv_pad, sg.nv_pad + sg.h_max
    out = {"graph": f"rmat{args.scale} ne={prepped.ne} nv_pad={nv_pad}"}
    print(json.dumps(out), flush=True)

    sh = NamedSharding(mesh, P(AXIS))
    se_d = jax.device_put(se, jax.tree.map(lambda _: sh, se))
    wp_d = jax.device_put(wp, jax.tree.map(lambda _: sh, wp))
    del se, wp

    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((1, nv_ext, args.feat)).astype(np.float32)

    def fwd(se_l, wp_l, x):
        return slot_spmm_packed(
            nv_pad, strip_shard(se_l), strip_shard(wp_l), x[0])[None]

    def fwd_bwd(se_l, wp_l, x):
        y, vjp = jax.vjp(lambda xx: slot_spmm_packed(
            nv_pad, strip_shard(se_l), strip_shard(wp_l), xx[0])[None], x)
        (dx,) = vjp(y)
        return dx

    import functools

    def timed(tag, f):
        run = jax.jit(jax.shard_map(
            f, mesh=mesh,
            in_specs=(shard_specs(se_d, AXIS), shard_specs(wp_d, AXIS),
                      P(AXIS)),
            out_specs=P(AXIS), check_vma=False))
        x_d = jax.device_put(x0, sh)
        _ = np.asarray(run(se_d, wp_d, x_d)[0, 0, :1])   # compile+warm
        ts = []
        for k in range(3):
            xk = jax.device_put(x0 + np.float32(1e-6) * (k + 1), sh)
            _ = np.asarray(xk[0, 0, :1])
            t0 = time.perf_counter()
            y = run(se_d, wp_d, xk)
            _ = np.asarray(y[0, 0, :1])
            ts.append(time.perf_counter() - t0)
        out[tag] = sorted(ts)[1]
        print(f"[prof] {tag}: {out[tag]*1e3:.0f} ms", file=sys.stderr,
              flush=True)
        print(json.dumps(out), flush=True)

    timed("spmm_fwd_s", fwd)
    timed("spmm_fwd_bwd_s", fwd_bwd)
    return 0


if __name__ == "__main__":
    sys.exit(main())
