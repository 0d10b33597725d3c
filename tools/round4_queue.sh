#!/bin/bash
# Round-4 serial chip queue (one real chip; runs one tool at a time).
# Each tool is budget-guarded/incremental; artifacts land in tools/results.
cd "$(dirname "$0")/.." || exit 1
R=tools/results

echo "[queue] plain epochs" >&2
GAB_SEG_ELL=0 timeout 2400 python tools/rmat20_epoch_probe.py \
  --archs gcn gat --layouts plain_ell \
  > $R/rmat20_plain_r4b.json 2> $R/rmat20_plain_r4b.err

echo "[queue] products bench" >&2
timeout 3600 python tools/products_bench.py \
  > $R/products_bench.json 2> $R/products_bench.err

echo "[queue] sharded p1 rmat20" >&2
timeout 3000 python tools/sharded_p1_bench.py --scale 20 --ef 32 --epochs 3 \
  > $R/sharded_p1_20.json 2> $R/sharded_p1_20.err

echo "[queue] frontier rmat20" >&2
FRONTIER_BUDGET_S=1200 timeout 1800 python tools/frontier_bench.py \
  --scale 20 --ef 32 > $R/frontier_20.json 2> $R/frontier_20.err

echo "[queue] frontier rmat19" >&2
FRONTIER_BUDGET_S=1200 timeout 1800 python tools/frontier_bench.py \
  --scale 19 --ef 30 > $R/frontier_bench.json 2> $R/frontier_bench.err

echo "[queue] decode bench (incl. device-resident)" >&2
timeout 2400 python tools/decode_bench.py \
  > $R/decode_bench.json 2> $R/decode_bench.err

echo "[queue] done" >&2
