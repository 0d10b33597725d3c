#!/bin/bash
# Round-4 follow-up chip queue (after round4_queue.sh).
cd "$(dirname "$0")/.." || exit 1
R=tools/results

echo "[queue2] kcore layout probe rmat19" >&2
# the seg-scan-inside-while kcore crashed the TPU worker at rmat19/20;
# isolate: unrolled seg vs plain
GAB_SEG_SCAN=0 FRONTIER_BUDGET_S=600 timeout 900 python tools/frontier_bench.py \
  --scale 19 --ef 30 --which kcore \
  > $R/kcore19_unroll.json 2> $R/kcore19_unroll.err
GAB_SEG_ELL=0 FRONTIER_BUDGET_S=600 timeout 900 python tools/frontier_bench.py \
  --scale 19 --ef 30 --which kcore,bc \
  > $R/kcore19_plain.json 2> $R/kcore19_plain.err

echo "[queue2] GAT rmat17 bf16-threshold ablation" >&2
timeout 1800 python tools/gat17_bf16_probe.py \
  > $R/gat17_bf16.json 2> $R/gat17_bf16.err

echo "[queue2] GCN rmat20 stage-cap ablation" >&2
GAB_STAGE_ELEMS_LOG2=30 timeout 1800 python tools/rmat20_epoch_probe.py \
  --archs gcn --layouts seg_ell \
  > $R/rmat20_gcn_cap30.json 2> $R/rmat20_gcn_cap30.err

echo "[queue2] sharded GAT rmat20 (chunking fix)" >&2
timeout 2400 python tools/sharded_p1_bench.py --scale 20 --ef 32 --epochs 3 \
  --arch gat > $R/sharded_p1_20_gat.json 2> $R/sharded_p1_20_gat.err

echo "[queue2] products sharded P=1 (balanced shard bounds)" >&2
PRODUCTS_EPOCHS=2 timeout 3600 python tools/products_bench.py \
  > $R/products_bench2.json 2> $R/products_bench2.err

echo "[queue2] done" >&2
