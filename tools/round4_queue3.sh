#!/bin/bash
cd "$(dirname "$0")/.." || exit 1
R=tools/results

echo "[queue3] kcore rmat19 host-driven retry" >&2
FRONTIER_BUDGET_S=900 timeout 1200 python tools/frontier_bench.py \
  --scale 19 --ef 30 --which kcore,bc \
  > $R/kcore19_hostloop.json 2> $R/kcore19_hostloop.err

echo "[queue3] products sharded retry (trimmed + balanced)" >&2
PRODUCTS_EPOCHS=2 timeout 3600 python tools/products_bench.py \
  > $R/products_bench3.json 2> $R/products_bench3.err

echo "[queue3] products single GCN, stage cap 30" >&2
GAB_STAGE_ELEMS_LOG2=30 PRODUCTS_EPOCHS=2 PRODUCTS_SHARDED=0 timeout 2400 \
  python tools/products_bench.py \
  > $R/products_cap30.json 2> $R/products_cap30.err

echo "[queue3] bench.py full (driver dress rehearsal)" >&2
GAB_BENCH_BUDGET_S=2400 timeout 3000 python bench.py \
  > $R/bench_r4.json 2> $R/bench_r4.err

echo "[queue3] done" >&2
