"""rmat20 full-batch epoch times with a layout fallback.

The tunnel's compile helper has a program-size ceiling: the segmented
ELL layout unrolls segments x buckets, and the rmat20 (ef=32) fwd+bwd
epoch program deterministically fails remote compilation with HTTP 500
(both round-3 sessions), while the plain-ELL program (8x fewer gather
stages) compiles. This probe tries seg first and falls back to plain,
labelling which layout each number belongs to — the honest record of
what the chip can run today.

  python tools/rmat20_epoch_probe.py [--scale 20] [--ef 32]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=20)
    ap.add_argument("--ef", type=int, default=32)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--archs", nargs="+", default=["gcn", "gat"])
    ap.add_argument("--layouts", default="seg_ell,plain_ell",
                    help="comma list; pass plain_ell alone when the seg "
                         "compile failure is already on record (bench.json)")
    args = ap.parse_args()

    from graphaibench_tpu.graph.generators import rmat
    from graphaibench_tpu.graph.io import GnnDataset
    from graphaibench_tpu.nn.layers import ModelConfig
    from graphaibench_tpu.nn.model import Model

    rng = np.random.default_rng(0)
    g = rmat(args.scale, args.ef, seed=0)
    feats = rng.standard_normal((g.nv, args.feat)).astype(np.float32)
    labels = rng.integers(0, 16, g.nv).astype(np.int32)
    mask = np.ones(g.nv, dtype=np.uint8)
    tr = (0, g.nv, g.nv)
    ds = GnnDataset(graph=g, feats=feats, labels=labels, train_mask=mask,
                    val_mask=mask, test_mask=mask, num_classes=16,
                    train_range=tr, val_range=tr, test_range=tr)
    print(f"graph nv={g.nv} ne={g.ne}", file=sys.stderr, flush=True)

    def timed_epochs(model, epochs):
        model.train_epochs(epochs)  # compile
        t0 = time.perf_counter()
        model.train_epochs(epochs)
        return (time.perf_counter() - t0) / epochs

    out = {"graph": f"rmat{args.scale} ef={args.ef} feat={args.feat}"}
    for arch in args.archs:
        cfg = ModelConfig(arch=arch, num_layers=2, dim_init=args.feat,
                          dim_hid=128, num_cls=16, lr=0.01)
        wanted = args.layouts.split(",")
        for layout, env in (("seg_ell", "1"), ("plain_ell", "0")):
            if layout not in wanted:
                continue
            gc.collect()
            if env:
                os.environ["GAB_SEG_ELL"] = env
            try:
                dt = timed_epochs(Model(cfg, ds), args.epochs)
                out[f"{arch}_epoch_s"] = dt
                out[f"{arch}_layout"] = layout
                print(f"[probe] {arch} {layout}: {dt:.3f} s/epoch",
                      file=sys.stderr, flush=True)
                break
            except Exception as e:  # noqa: BLE001 - try the smaller program
                out[f"{arch}_{layout}_error"] = f"{type(e).__name__}: {e}"[:200]
                print(f"[probe] {arch} {layout} failed: "
                      f"{type(e).__name__}", file=sys.stderr, flush=True)
            finally:
                os.environ.pop("GAB_SEG_ELL", None)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
