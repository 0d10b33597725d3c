#!/usr/bin/env bash
# Build the reference `compressor` CLI (src/structure/compressor.cc)
# from the read-only tree for compression-format golden generation.
# Unlike cpu_train_gcn (build.sh) no patching is needed — the encoder
# side compiles cleanly without CUDA/SIMDCAI.
#
# Golden provenance (tests/goldens/ref_cgr_citeseer.json):
#   ./compressor -s cgr -g    <inputs>/citeseer/graph out/cs_ref
#   ./compressor -s cgr -g -i <inputs>/citeseer/graph out/cs_ref_itv
# then sha256 of the produced .edge.bin / .vertex.bin.
set -euo pipefail
R=${REFERENCE:-/root/reference}
B=${BUILD_DIR:-/tmp/refcomp}

mkdir -p "$B"
g++ -O2 -std=c++17 -fopenmp -I "$R/include" -I "$R/include/utils" \
  "$R/src/structure/compressor.cc" "$R/src/structure/cgr_encoder.cc" \
  "$R/src/structure/unary_encoder.cc" "$R/src/structure/vbyte_encoder.cc" \
  "$R/src/common/graph.cc" "$R/src/common/VertexSet.cc" \
  -o "$B/compressor"
echo "built $B/compressor"
echo "usage: $B/compressor -s cgr -g [-i] $R/inputs/citeseer/graph <out-prefix>"
