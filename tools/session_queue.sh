#!/bin/bash
# Continuation-session measurement chain: waits for the running bench.py
# (pid $1) to finish, then works through the round-3 queue in VERDICT
# priority order. Each item has its own timeout so one hang cannot eat
# the session. Results land in tools/results/*.json (committed per round).
set -u
cd "$(dirname "$0")/.."
OUT=tools/results
mkdir -p "$OUT"
export GAB_COMPILE_CACHE=${GAB_COMPILE_CACHE:-$PWD/.jax_cache}
export JAX_COMPILATION_CACHE_DIR=$GAB_COMPILE_CACHE
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

BENCH_PID=${1:-}
if [ -n "$BENCH_PID" ]; then
  echo "waiting for bench pid $BENCH_PID ($(date +%H:%M:%S))"
  while kill -0 "$BENCH_PID" 2>/dev/null; do sleep 15; done
  echo "bench done ($(date +%H:%M:%S))"
fi

run() {
  to=$1; name=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout "$to" "$@" >"$OUT/$name.json" 2>"$OUT/$name.err"
  echo "    exit=$? ($(date +%H:%M:%S))"
  tail -c 400 "$OUT/$name.json"; echo
}

run 1800 rmat20_epochs    python tools/rmat20_epoch_probe.py --layouts plain_ell
run 1500 gat20_probe     python tools/gat20_probe.py
run  900 sharded_p1_17   python tools/sharded_p1_bench.py --scale 17
run 1200 frontier_bench  python tools/frontier_bench.py
run  900 decode_bench    python tools/decode_bench.py
run 1200 rmat20_sweep    python tools/rmat20_sweep.py
run 1200 frontier_20     python tools/frontier_bench.py --scale 20 --ef 32
run 1200 sharded_p1_20   python tools/sharded_p1_bench.py --scale 20 --ef 32 --epochs 3
run  900 saint_bench     python tools/saint_bench.py
run 3000 products_bench  python tools/products_bench.py
echo "session queue done $(date)"
