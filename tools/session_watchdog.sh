#!/bin/bash
# Probe the tunnelled TPU every ~3 min; when a trivial compile succeeds,
# run the remaining round-5 measurement chain once and exit.
# (Explicit serial chain — NOTE: never guard queue stages with
# `pgrep -f <tool names>`: the waiter shells' own -c strings match the
# pattern and every queue deadlocks against the others, which is
# exactly what happened to the round-5 queues 8-10.)
cd /root/repo
for i in $(seq 1 40); do
  if timeout 240 python - <<'EOF' 2>/dev/null
import jax
jax.config.update('jax_platforms', 'axon')
import jax.numpy as jnp, numpy as np
y = jax.jit(lambda a: a @ a)(jnp.asarray(np.ones((128, 128), np.float32)))
assert float(y[0, 0]) == 128.0
EOF
  then
    echo "tunnel back at attempt $i" >> tools/results/watchdog.log
    python tools/products_convergence.py --epochs 12 --val-every 4 \
      > tools/results/products_convergence.json 2> tools/results/products_convergence.err
    python tools/frontier_bench.py --scale 19 --which kcore \
      > tools/results/kcore19_hindex_bs.json 2> tools/results/kcore19_hindex_bs.err
    GAB_SEG_ELL=1 PRODUCTS_REMAT=1 PRODUCTS_ARCHS=gat PRODUCTS_SHARDED=0 \
      PRODUCTS_EPOCHS=2 python tools/products_bench.py \
      > tools/results/products_gat_seg2.json 2> tools/results/products_gat_seg2.err
    GAB_SEG_ELL=1 PRODUCTS_ARCHS=ggnn PRODUCTS_SHARDED=0 PRODUCTS_EPOCHS=2 \
      python tools/products_bench.py \
      > tools/results/products_ggnn_seg2.json 2> tools/results/products_ggnn_seg2.err
    exit 0
  fi
  echo "probe $i failed $(date -u +%H:%M:%S)" >> tools/results/watchdog.log
  sleep 120
done
