#!/bin/bash
# Watch for the TPU tunnel to come back, then run the measurement queue.
# Probes every 3 min with a 90 s timeout: a live tunnel answers a tiny
# matmul in seconds; a dead one hangs in backend init (see CLAUDE.md).
#   bash tools/tunnel_watch.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-tools/results}
while true; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
d = jax.devices()
assert d[0].platform != 'cpu', d
x = jnp.ones((8, 8))
print('probe ok:', d[0].platform, float((x @ x).sum()))
" >/tmp/tunnel_probe.out 2>&1; then
    tail -2 /tmp/tunnel_probe.out
    echo "TUNNEL UP $(date) — starting queue"
    break
  fi
  echo "tunnel down $(date)"
  sleep 180
done
bash tools/tpu_round2_queue.sh "$OUT"
