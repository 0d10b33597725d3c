"""Headline benchmark: SpMM edges/s/chip (the BASELINE.json north-star
kernel metric) on a power-law RMAT graph, plus full GCN epoch time.

Prints ONE JSON line:
  {"metric": "spmm_edges_per_s", "value": ..., "unit": "edges/s",
   "vs_baseline": <fraction of the measured HBM speed-of-light>}

"vs_baseline" is the ratio against the memory-bandwidth roofline of the
chip it runs on, measured in-process with a large device copy: one SpMM
must move >= (E * F * 4) gather-read bytes + (N * F * 4) write bytes, so
sol_edges/s = BW / (4F * (1 + N/E)). The reference publishes no absolute
GNN numbers (src/gnn/README.md "TBD"), so roofline fraction is the
honest comparable.
"""

from __future__ import annotations

import json
import time

import numpy as np


def measure_copy_bandwidth(nbytes: int = 1 << 28) -> float:
    """Effective HBM read+write bandwidth via on-device copy (bytes/s)."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros(nbytes // 4, dtype=jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    f(x).block_until_ready()
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        x = f(x)
    x.block_until_ready()
    dt = time.perf_counter() - t0
    return 2.0 * nbytes * iters / dt  # read + write


def main():
    import jax
    import jax.numpy as jnp

    from graphaibench_tpu.graph.generators import rmat
    from graphaibench_tpu.nn.layers import ModelConfig, init_params
    from graphaibench_tpu.nn.model import Model, GraphBundle
    from graphaibench_tpu.graph.io import GnnDataset
    from graphaibench_tpu.ops.spmm import spmm_coo, spmm_ell

    scale, ef, feat = 17, 16, 128
    g = rmat(scale, ef, seed=0)
    gb = GraphBundle.build(g, "gcn")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((gb.host.nv, feat)).astype(np.float32))

    results = {}
    for name, fn in (("coo", spmm_coo), ("ell", spmm_ell)):
        jf = jax.jit(lambda xx, fn=fn: fn(gb.device, gb.edge_w, xx))
        jf(x).block_until_ready()
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jf(x)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        results[name] = gb.host.ne * iters / dt

    best_name = max(results, key=results.get)
    edges_per_s = results[best_name]

    bw = measure_copy_bandwidth()
    sol = bw / (4.0 * feat * (1.0 + gb.host.nv / gb.host.ne))

    # GCN epoch time on the same graph
    labels = rng.integers(0, 16, g.nv).astype(np.int32)
    mask = np.ones(g.nv, dtype=np.uint8)
    tr = (0, g.nv, g.nv)
    ds = GnnDataset(graph=g, feats=np.asarray(x), labels=labels,
                    train_mask=mask, val_mask=mask, test_mask=mask,
                    num_classes=16, train_range=tr, val_range=tr, test_range=tr)
    cfg = ModelConfig(arch="gcn", num_layers=2, dim_init=feat, dim_hid=128,
                      num_cls=16, lr=0.01)
    model = Model(cfg, ds)
    model.train_epoch()  # compile
    t0 = time.perf_counter()
    epochs = 5
    for _ in range(epochs):
        model.train_epoch()
    epoch_s = (time.perf_counter() - t0) / epochs

    print(json.dumps({
        "metric": "spmm_edges_per_s",
        "value": float(edges_per_s),
        "unit": "edges/s",
        "vs_baseline": float(edges_per_s / sol),
        "extra": {
            "impl": best_name,
            "all_impls_edges_per_s": {k: float(v) for k, v in results.items()},
            "graph": f"rmat{scale} nv={gb.host.nv} ne={gb.host.ne} feat={feat}",
            "hbm_bw_GBps": bw / 1e9,
            "sol_edges_per_s": float(sol),
            "gcn_epoch_s": epoch_s,
            "gcn_epoch_edges_per_s": float(gb.host.ne * 2 * 3 / epoch_s),
        },
    }))


if __name__ == "__main__":
    main()
