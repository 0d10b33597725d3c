"""Iteration-count probe for the h-index k-core fixpoint (numpy).

core_0 = deg; core_{t+1}[v] = min(core_t[v], H(core_t[N(v)])) converges
to the coreness (Lu et al. 2016 "H-index of a network node"). The
number of iterations bounds the device sweeps of a TPU implementation
(each sweep = one O(E) gather), vs the bulk-peel's ~sum-of-cascade-
depths sweeps (measured ~1300 at rmat19 -> 133.5 s).

  python tools/kcore_hindex_probe.py --scales 17 19
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def hindex_iterations(g, max_iter=100000):
    """Run the fixpoint; return (core, iterations)."""
    row_ptr = g.row_ptr.astype(np.int64)
    col = g.col_idx.astype(np.int64)
    deg = np.diff(row_ptr).astype(np.int64)
    nv, ne = g.nv, g.ne
    rows = np.repeat(np.arange(nv, dtype=np.int64), deg)
    core = deg.copy()
    it = 0
    while it < max_iter:
        it += 1
        vals = core[col]
        # descending sort within each row: lexsort by (row, -val)
        order = np.lexsort((-vals, rows))
        sv = vals[order]
        pos = np.arange(ne, dtype=np.int64) - np.repeat(row_ptr[:-1], deg)
        # h = number of positions i (0-based) with sorted_val[i] >= i+1
        ind = (sv >= pos + 1).astype(np.int64)
        h = np.bincount(rows, weights=ind, minlength=nv).astype(np.int64)
        new = np.minimum(core, h)
        changed = int((new != core).sum())
        core = new
        if changed == 0:
            break
    return core, it


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=int, nargs="+", default=[17])
    ap.add_argument("--ef", type=int, default=16)
    args = ap.parse_args()

    from graphaibench_tpu.graph.generators import rmat
    from graphaibench_tpu.graph.transforms import k_core_decomposition

    out = {}
    for s in args.scales:
        g = rmat(s, args.ef, seed=0, cache=True)
        t0 = time.perf_counter()
        core, iters = hindex_iterations(g)
        dt = time.perf_counter() - t0
        rec = {"nv": g.nv, "ne": g.ne, "iterations": iters,
               "max_core": int(core.max()), "host_s": round(dt, 1)}
        if g.nv <= (1 << 18):  # oracle check on the smaller scales
            rec["exact"] = bool(
                np.array_equal(core, k_core_decomposition(g)))
        out[f"rmat{s}"] = rec
        print(json.dumps({f"rmat{s}": rec}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
