"""Headline benchmark: SpMM edges/s/chip (the BASELINE.json north-star
kernel metric) on a power-law RMAT graph, plus full GCN epoch time.

Prints ONE JSON line:
  {"metric": "spmm_edges_per_s", "value": ..., "unit": "edges/s",
   "vs_baseline": <fraction of the measured pure-gather roofline>}

Methodology: every timing runs K iterations INSIDE one jit via
lax.fori_loop — dispatch through the device tunnel costs ~10ms, so
per-call host timing measures latency, not throughput. The roofline is
the chip's measured random row-gather rate on the same row size (the
TPU gather unit is row-rate-bound for rows <= 512 B); an SpMM cannot
beat the gather that feeds it, so vs_baseline = spmm_rate / gather_bound
is the honest speed-of-light fraction. The reference publishes no
absolute GNN numbers (src/gnn/README.md "TBD")."""

from __future__ import annotations

import json
import time

import numpy as np


def _bench_looped(f, init, iters):
    """Median-of-3 timed runs, each on a FRESH input with the result
    value fetched: through the tunnelled TPU, identical repeat
    executions can be served from a cache and block_until_ready can
    return early (see CLAUDE.md), so neither repeats nor bare blocking
    are trustworthy."""
    import jax

    run = jax.jit(lambda c: jax.lax.fori_loop(0, iters, lambda i, v: f(i, v), c))
    _ = np.asarray(run(init)[0])  # compile + force (tiny slice fetch)
    times = []
    for k in range(3):
        init_k = init + np.float32(1e-6) * (k + 1)
        _ = np.asarray(init_k[0])           # materialize input first
        t0 = time.perf_counter()
        out = run(init_k)
        _ = np.asarray(out[0])              # force execution; fetch one row
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[1]


def main():
    import jax
    import jax.numpy as jnp

    from graphaibench_tpu.graph.generators import rmat
    from graphaibench_tpu.graph.io import GnnDataset
    from graphaibench_tpu.nn.layers import ModelConfig
    from graphaibench_tpu.nn.model import GraphBundle, Model
    from graphaibench_tpu.ops.spmm import spmm_ell

    scale, ef, feat = 17, 16, 128
    g = rmat(scale, ef, seed=0)
    gb = GraphBundle.build(g, "gcn")
    nv, ne = gb.host.nv, gb.host.ne
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((nv, feat)).astype(np.float32))

    # SpMM throughput (best strategy for this size: ELL; packed static
    # weights = the production training path, see GraphBundle.edge_w_agg)
    dt = _bench_looped(lambda i, v: spmm_ell(gb.device, gb.edge_w_agg, v), x, 20)
    edges_per_s = ne / dt
    slots = sum(b.nbr.size for b in gb.device.ell)

    # roofline: pure weighted row-gather of the same number of padded rows
    # (iteration-dependent indices defeat constant-folding rewrites)
    idx = jnp.asarray(rng.integers(0, nv, slots).astype(np.int32))
    wg = jnp.asarray(rng.standard_normal(slots).astype(np.float32))

    def gather_only(i, acc):
        shifted = (idx + i) % nv
        return acc + (x[shifted] * wg[:, None]).sum(0)

    dt_g = _bench_looped(gather_only, jnp.zeros(feat), 10)
    gather_rows_per_s = slots / dt_g
    sol_edges_per_s = gather_rows_per_s * ne / slots

    # full GCN epoch (fw+bw+adam) on the same graph
    labels = rng.integers(0, 16, nv).astype(np.int32)
    mask = np.ones(nv, dtype=np.uint8)
    tr = (0, nv, nv)
    ds = GnnDataset(graph=g, feats=np.asarray(x), labels=labels,
                    train_mask=mask, val_mask=mask, test_mask=mask,
                    num_classes=16, train_range=tr, val_range=tr, test_range=tr)
    cfg = ModelConfig(arch="gcn", num_layers=2, dim_init=feat, dim_hid=128,
                      num_cls=16, lr=0.01)
    model = Model(cfg, ds)
    epochs = 10
    model.train_epochs(epochs)  # compile
    t0 = time.perf_counter()
    model.train_epochs(epochs)
    epoch_s = (time.perf_counter() - t0) / epochs

    # GAT epoch on the same graph (v2 slot-space fused attention)
    cfg_gat = ModelConfig(arch="gat", num_layers=2, dim_init=feat,
                          dim_hid=128, num_cls=16, lr=0.01)
    model_gat = Model(cfg_gat, ds)
    model_gat.train_epochs(epochs)  # compile
    t0 = time.perf_counter()
    model_gat.train_epochs(epochs)
    gat_epoch_s = (time.perf_counter() - t0) / epochs

    # --- scale regime: rmat20 (1M v / 32M e), where the gather-locality
    # cliff lives (CLAUDE.md scale findings). SpMM + GCN epoch + GAT
    # epoch so at-scale regressions show up in BENCH_r*.json each round.
    del model, model_gat, ds
    import gc

    gc.collect()
    g20 = rmat(20, 32, seed=0)
    gb20 = GraphBundle.build(g20, "gcn")
    x20 = jnp.asarray(rng.standard_normal((g20.nv, feat)).astype(np.float32))
    dt20 = _bench_looped(
        lambda i, v: spmm_ell(gb20.device, gb20.edge_w_agg, v), x20, 5)
    labels20 = rng.integers(0, 16, g20.nv).astype(np.int32)
    mask20 = np.ones(g20.nv, dtype=np.uint8)
    tr20 = (0, g20.nv, g20.nv)
    ds20 = GnnDataset(graph=g20, feats=np.asarray(x20), labels=labels20,
                      train_mask=mask20, val_mask=mask20, test_mask=mask20,
                      num_classes=16, train_range=tr20, val_range=tr20,
                      test_range=tr20)
    del gb20, x20
    gc.collect()
    scale_epochs = 3
    m20 = Model(ModelConfig(arch="gcn", num_layers=2, dim_init=feat,
                            dim_hid=128, num_cls=16, lr=0.01), ds20)
    m20.train_epochs(scale_epochs)
    t0 = time.perf_counter()
    m20.train_epochs(scale_epochs)
    gcn20_epoch_s = (time.perf_counter() - t0) / scale_epochs
    del m20
    gc.collect()
    m20g = Model(ModelConfig(arch="gat", num_layers=2, dim_init=feat,
                             dim_hid=128, num_cls=16, lr=0.01), ds20)
    m20g.train_epochs(scale_epochs)
    t0 = time.perf_counter()
    m20g.train_epochs(scale_epochs)
    gat20_epoch_s = (time.perf_counter() - t0) / scale_epochs
    del m20g
    gc.collect()

    print(json.dumps({
        "metric": "spmm_edges_per_s",
        "value": float(edges_per_s),
        "unit": "edges/s",
        "vs_baseline": float(edges_per_s / sol_edges_per_s),
        "extra": {
            "graph": f"rmat{scale} nv={nv} ne={ne} feat={feat}",
            "spmm_ms": dt * 1e3,
            "ell_padding_overhead": slots / ne,
            "gather_rows_per_s": float(gather_rows_per_s),
            "sol_edges_per_s": float(sol_edges_per_s),
            "gcn_epoch_s": epoch_s,
            "gat_epoch_s": gat_epoch_s,
            "rmat20_spmm_ms": dt20 * 1e3,
            "rmat20_spmm_edges_per_s": g20.ne / dt20,
            "rmat20_gcn_epoch_s": gcn20_epoch_s,
            "rmat20_gat_epoch_s": gat20_epoch_s,
        },
    }))


if __name__ == "__main__":
    main()
