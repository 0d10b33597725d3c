"""Probe WHY seg-ELL doesn't reach the fast-gather window at rmat20.

Measured facts feeding this probe (tools/gather_dtype_bench.py):
  64 MB f32 table -> 292 M rows/s; 128 MB -> 86 M rows/s (3.4x cliff).
Yet the seg-ELL SpMM at rmat20 (512 MB x table, 64 MB slices) runs at
~85 M slots/s — the SLOW rate. Hypothesis: XLA fuses ``x[lo:hi][idx]``
into one gather over the full 512 MB buffer, and the cliff is a property
of the gather OPERAND BUFFER (page spread / prefetch window), not of the
index value range. If so, the fix is to materialize each slice (an
optimization_barrier'd copy: 8 x 64 MB = ~few ms at HBM rate) before
gathering from it.

Cases (all chained protocol, arrays as jit args):
  a. standalone 64 MB table                      (control, expect ~290 M/s)
  b. x[lo:hi][idx] fused view of a 512 MB x      (expect slow if hypothesis)
  c. barrier(x[lo:hi])[idx] forced slice copy    (expect ~290 M/s minus copy)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def bench(run, args, n, iters):
    _ = np.asarray(run(*args)[0])
    times = []
    for k in range(3):
        a0 = args[0] + np.float32(k) * 1e-6
        t0 = time.perf_counter()
        out = run(a0, *args[1:])
        _ = np.asarray(out[0])
        times.append((time.perf_counter() - t0) / iters)
    dt = sorted(times)[1]
    return n / dt / 1e6


def main():
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        # the axon plugin ignores the env var; pin explicitly (CLAUDE.md)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax
    import jax.numpy as jnp

    cols = 128
    nv_small, nv_big = 1 << 17, 1 << 20     # 64 MB and 512 MB
    n = 1 << 22
    iters = 8
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, nv_small, n).astype(np.int32))

    def make(nv):
        @jax.jit
        def mk():
            r = jax.lax.broadcasted_iota(jnp.float32, (nv, cols), 0)
            c = jax.lax.broadcasted_iota(jnp.float32, (nv, cols), 1)
            return jnp.sin(r * 1e-3 + c)
        t = mk()
        t.block_until_ready()
        return t

    def chain(gather_fn):
        def step(i, carry, tab, ix):
            acc, shift = carry
            rows = (ix + shift) % nv_small
            acc = acc + gather_fn(tab, rows).sum(axis=0)
            shift = (shift + 1 + (acc[0] > 1e30).astype(jnp.int32)) % nv_small
            return acc, shift
        return jax.jit(lambda acc0, t, ix: jax.lax.fori_loop(
            0, iters, lambda i, v: step(i, v, t, ix), (acc0, jnp.int32(0))))

    c0 = jnp.zeros((cols,), jnp.float32)

    # a: standalone 64 MB table
    small = make(nv_small)
    r_a = bench(chain(lambda t, rows: t[rows]), (c0, small, idx), n, iters)
    print(json.dumps(dict(case="a_standalone_64mb", mrows_per_s=r_a)),
          flush=True)
    del small

    big = make(nv_big)
    lo = nv_small  # second slice: not at offset 0, like a real segment

    # b: fused view gather
    r_b = bench(chain(lambda t, rows: t[lo:lo + nv_small][rows]),
                (c0, big, idx), n, iters)
    print(json.dumps(dict(case="b_fused_view_of_512mb", mrows_per_s=r_b)),
          flush=True)

    # c: forced slice materialization
    def gat_c(t, rows):
        sl = jax.lax.optimization_barrier(
            jax.lax.dynamic_slice_in_dim(t, lo, nv_small, 0))
        return sl[rows]
    r_c = bench(chain(gat_c), (c0, big, idx), n, iters)
    print(json.dumps(dict(case="c_barrier_slice_of_512mb", mrows_per_s=r_c)),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
