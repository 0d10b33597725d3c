#!/bin/bash
# Round-3 follow-up measurements (run after tpu_round2_queue.sh):
#   - frontier solvers at rmat20 (VERDICT r2-3/r2-9: the CC afforest-vs-
#     label-prop speedup and the BFS/SSSP/PR/kcore/BC table at SCALE 20,
#     not just 19)
#   - triangle counting warm timing at rmat20 (round-1 number refresh)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-tools/results}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=${JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS:-1}
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout "${RUN_TIMEOUT:-2400}" "$@" >"$OUT/$name.json" 2>"$OUT/$name.err"
  echo "    exit=$? ($(date +%H:%M:%S))"
  tail -c 600 "$OUT/$name.json"
  echo
}
run frontier_20 python tools/frontier_bench.py --scale 20 --ef 32
echo "extras done $(date)"
