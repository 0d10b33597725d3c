#!/usr/bin/env bash
# Build the reference cpu_train_gcn from the read-only tree at
# /root/reference for golden-output generation. Nothing from the
# reference is copied into this repo — sources are patched in a scratch
# dir (the snapshot ships a debug exit(0) in net.cpp:154 and hardcodes
# ENABLE_GPU in global.h:61); the cblas/boost shims in ./shim are our
# own minimal implementations.
set -euo pipefail
R=${REFERENCE:-/root/reference}
B=${BUILD_DIR:-/tmp/refbuild}
HERE=$(cd "$(dirname "$0")" && pwd)

mkdir -p "$B/src"
cp -r "$HERE/shim" "$B/" 2>/dev/null || true

# patched copies
cp "$R/src/gnn/net.cpp" "$B/src/net_patched.cpp"
python3 - "$B/src/net_patched.cpp" <<'EOF'
import sys
p = sys.argv[1]
s = open(p).read()
block = """  for(size_t i = 0; i < 10; i++){
    printf("labels[%d] = %i\\n", i, labels[i]);
  }

  exit(0);
"""
s = s.replace(block, "")
s = s.replace("template class Model<GAT_layer>;", "")
s = s.replace("template class Model<GGNN_layer>;", "")
s = s.replace("template class Model<SAGE_layer>;", "")
open(p, "w").write(s)
EOF
cp "$R/src/utilities/random.cpp" "$B/src/random_patched.cpp"
sed -i '1i #include <unistd.h>' "$B/src/random_patched.cpp"
rm -rf "$B/inc_gnn"
cp -r "$R/include/gnn" "$B/inc_gnn"
sed -i 's/^#define ENABLE_GPU/\/\/&/; s/^#define USE_GGNN/\/\/&/' "$B/inc_gnn/global.h"

g++ -O2 -std=c++17 -fopenmp -DUSE_GCN \
  -I "$B/inc_gnn" -I "$B/shim" -I "$R/include" -I "$R/include/utils" -I "$R/include/layers" \
  "$B/src/net_patched.cpp" "$R/src/gnn/train.cpp" "$R/src/gnn/reader.cpp" \
  "$R/src/gnn/lgraph.cpp" "$R/src/gnn/sampler.cpp" "$R/src/gnn/graph_conv_layer.cpp" \
  "$R/src/gnn/loss_layer.cpp" "$R/src/gnn/gconv/gcn_layer.cpp" \
  "$R/src/gnn/gconv/gcn_aggregator.cpp" "$R/src/layers/l2norm_layer.cpp" \
  "$R/src/layers/dense_layer.cpp" "$R/src/layers/softmax_loss_layer.cpp" \
  "$R/src/layers/sigmoid_loss_layer.cpp" "$R/src/utilities/math_functions.cpp" \
  "$R/src/utilities/optimizer.cpp" "$B/src/random_patched.cpp" \
  -o "$B/cpu_train_gcn"
echo "built $B/cpu_train_gcn"
echo "usage: mkdir -p $B/data && python3 $HERE/make_dataset.py $B/data/cora &&"
echo "       DATASET_PATH=$B/data/ $B/cpu_train_gcn cora 10 4 softmax 16"
