#!/bin/bash
# Round-3 measurement queue, part 2 — everything after bench.py.
# (bench.py runs separately first; this script assumes .rmat_cache is
# warm and the closure-free harnesses: arrays ride as jit ARGUMENTS,
# never captures — the rmat20 seg-ELL closure hit the tunnel's HTTP 413
# compile-request limit.)
#
#   bash tools/round3_queue.sh [outdir]
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
run gat20_probe     python tools/gat20_probe.py
run rmat20_sweep    python tools/rmat20_sweep.py
run frontier_bench  python tools/frontier_bench.py
run frontier_20     python tools/frontier_bench.py --scale 20 --ef 32
run sharded_p1_17   python tools/sharded_p1_bench.py --scale 17
run sharded_p1_20   python tools/sharded_p1_bench.py --scale 20 --ef 32 --epochs 3
run saint_bench     python tools/saint_bench.py
run decode_bench    python tools/decode_bench.py
RUN_TIMEOUT=3000 run products_bench  python tools/products_bench.py
echo "queue part 2 done $(date)"
