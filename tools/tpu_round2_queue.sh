#!/bin/bash
# TPU measurement queue (rounds 2+3) — run when the tunnel is up.
# Captures every pending real-chip measurement in priority order,
# saving JSON outputs under tools/results/ which are COMMITTED per
# round (VERDICT r2: measured claims must be reproducible from
# committed artifacts), then summarized into BASELINE.md.
#
#   bash tools/tpu_round2_queue.sh [outdir]
#
# Priority rationale (VERDICT r1): 1. headline bench (driver metric,
# incl. the unmeasured bf16 GAT-at-scale commit a973f54), 2. rmat20 GAT
# probe (target <=4 s), 3. rmat20 SpMM sweep (target <=300 ms),
# 4. frontier pull-kernel timings (target <=0.3 s at rmat19),
# 5. sharded P=1 ratio incl. the overlap split, 6. GraphSAINT sampled
# epoch (target <=0.3 s).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-tools/results}
mkdir -p "$OUT"
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout "${RUN_TIMEOUT:-1500}" "$@" >"$OUT/$name.json" 2>"$OUT/$name.err"
  echo "    exit=$? ($(date +%H:%M:%S))"
  tail -c 600 "$OUT/$name.json"
  echo
}
run bench           python bench.py
run gat20_probe     python tools/gat20_probe.py
run rmat20_sweep    python tools/rmat20_sweep.py
run frontier_bench  python tools/frontier_bench.py
run sharded_p1_17   python tools/sharded_p1_bench.py --scale 17
run sharded_p1_20   python tools/sharded_p1_bench.py --scale 20 --ef 32 --epochs 3
run saint_bench     python tools/saint_bench.py
run decode_bench    python tools/decode_bench.py
RUN_TIMEOUT=3000 run products_bench  python tools/products_bench.py
echo "queue done $(date)"
