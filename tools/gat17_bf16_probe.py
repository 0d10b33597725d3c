"""GAT rmat17 epoch: v2 gather-dtype threshold ablation (VERDICT r3
item 6 — GAT is 6.6x GCN at rmat17; target <= 170 ms/epoch).

At rmat17 (nv = 2^17, below the default bf16 threshold) the f32 packed
(1+F)/(4+F) tables need TWO <=512 B gather chunks per slot where bf16
needs one; GAB_V2_BF16_MIN_NV=131072 halves the v2 gather count.

  python tools/gat17_bf16_probe.py
"""

from __future__ import annotations

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

    from graphaibench_tpu.graph.generators import rmat
    from graphaibench_tpu.graph.io import GnnDataset
    from graphaibench_tpu.nn.layers import ModelConfig
    from graphaibench_tpu.nn.model import Model

    rng = np.random.default_rng(0)
    g = rmat(17, 16, seed=0, cache=True)
    feats = rng.standard_normal((g.nv, 128)).astype(np.float32)
    labels = rng.integers(0, 16, g.nv).astype(np.int32)
    mask = np.ones(g.nv, dtype=np.uint8)
    tr = (0, g.nv, g.nv)
    ds = GnnDataset(graph=g, feats=feats, labels=labels, train_mask=mask,
                    val_mask=mask, test_mask=mask, num_classes=16,
                    train_range=tr, val_range=tr, test_range=tr)
    out = {"graph": f"rmat17 nv={g.nv} ne={g.ne}"}

    def timed(tag):
        cfg = ModelConfig(arch="gat", num_layers=2, dim_init=128,
                          dim_hid=128, num_cls=16, lr=0.01)
        m = Model(cfg, ds)
        m.train_epochs(10)           # compile + warm
        t0 = time.perf_counter()
        m.train_epochs(10)
        dt = (time.perf_counter() - t0) / 10
        out[tag] = dt
        print(f"[gat17] {tag}: {dt*1e3:.1f} ms/epoch",
              file=sys.stderr, flush=True)
        print(json.dumps(out), flush=True)

    timed("f32_epoch_s")
    os.environ["GAB_V2_BF16_MIN_NV"] = "131072"
    try:
        timed("bf16_epoch_s")
    finally:
        del os.environ["GAB_V2_BF16_MIN_NV"]
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
