"""Gather-rate microbench at LARGE table sizes: does bf16 help?

Round-2 established the fast window (8..512 B rows @ ~230-256 M rows/s)
on a small (512 KB) table. At rmat20-sized tables (512 MB) the measured
rate collapses to ~85-102 M rows/s. Open question for the GAT-at-scale
target: is the large-table regime ROW-rate-bound (bf16 buys nothing per
row but lets 2x more columns ride one gather, halving the pass count) or
BYTE-bound (bf16 also doubles row rate)? Either way bf16 halves HBM
traffic; this bench tells us the multiplier.

Chained protocol (output perturbs next indices) per CLAUDE.md.

  python tools/gather_dtype_bench.py [--rows 20] [--gathers 22]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_gather(table, idx, iters=8):
    # table/idx are jit ARGUMENTS — closed-over arrays are serialized
    # into every remote compile (HTTP 413 at >100 MB; CLAUDE.md).
    import jax
    import jax.numpy as jnp

    nv = table.shape[0]

    def step(i, carry, table, idx):
        acc, shift = carry
        rows = (idx + shift) % nv
        gat = table[rows]                       # (n, C) gather
        acc = acc + gat.astype(jnp.float32).sum(axis=0)
        # derive the next shift from the data: serial dependency
        shift = (shift + 1 + (acc[0] > 1e30).astype(jnp.int32)) % nv
        return acc, shift

    run = jax.jit(lambda c, t, ix: jax.lax.fori_loop(
        0, iters, lambda i, v: step(i, v, t, ix), c))
    c0 = (jnp.zeros((table.shape[1],), jnp.float32), jnp.int32(0))
    _ = np.asarray(run(c0, table, idx)[0])
    times = []
    for k in range(3):
        ck = (jnp.full((table.shape[1],), np.float32(k) * 1e-6), jnp.int32(k))
        t0 = time.perf_counter()
        out = run(ck, table, idx)
        _ = np.asarray(out[0])
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[1]


def main():
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        # the axon plugin ignores the env var; pin explicitly (CLAUDE.md)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20, help="log2 table rows")
    ap.add_argument("--gathers", type=int, default=22,
                    help="log2 gathered rows per pass")
    ap.add_argument("--quick", action="store_true",
                    help="only f32 cols=128 (table-size sweeps)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    nv, n = 1 << args.rows, 1 << args.gathers
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, nv, n).astype(np.int32))

    # build tables ON DEVICE: uploading a 512 MB table through the
    # tunnel costs ~100 s; an iota-derived table costs nothing and the
    # gather engine doesn't care about values.
    from functools import partial

    @partial(jax.jit, static_argnums=(0, 1))
    def make_table(cols, dt):
        r = jax.lax.broadcasted_iota(jnp.float32, (nv, cols), 0)
        c = jax.lax.broadcasted_iota(jnp.float32, (nv, cols), 1)
        return jnp.sin(r * 1e-3 + c).astype(dt)

    configs = ((("float32", (128,)),) if args.quick else
               (("float32", (64, 128)), ("bfloat16", (128, 256))))
    for dtype, cols_list in configs:
        for cols in cols_list:
            tab = make_table(cols, dtype)
            tab.block_until_ready()
            dt = bench_gather(tab, idx)
            rate = n / dt
            row_b = cols * (2 if dtype == "bfloat16" else 4)
            print(json.dumps(dict(
                dtype=dtype, cols=cols, row_bytes=row_b,
                table_mb=nv * row_b / 2**20,
                mrows_per_s=rate / 1e6,
                gb_per_s=rate * row_b / 2**30)), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
