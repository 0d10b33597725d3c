#!/usr/bin/env bash
# Smoke-run every CLI surface on the bundled fixtures — the analog of the
# reference's bin/run-test.sh (one command per binary). Runs on whatever
# device JAX picks; set JAX_PLATFORMS=cpu for a quick host run.
set -e
cd "$(dirname "$0")/.."
PY="python -m graphaibench_tpu.cli"
TMP=$(mktemp -d)

echo "== info =="
$PY info cora
echo "== training =="
$PY train gcn  citeseer 3 1 softmax 16
$PY train sage cora 3 1 softmax 16 0 0 0.01 2
$PY train gat  cora 3 1 softmax 16
$PY train ggnn cora 3 1 softmax 16 0 0 0.01 1
$PY train gcn  cora 3 1 sigmoid 16
$PY train gcn  cora 3 1 softmax 16 0 0 0.02 2 300 50 1     # GraphSAINT
$PY train gcn  /root/reference/inputs/gnn-tester 3 1 softmax 8  # csgr
echo "== analytics =="
$PY analytics tc     citeseer
$PY analytics bfs    citeseer 0
$PY analytics sssp   citeseer 0
$PY analytics pr     citeseer
$PY analytics cc     citeseer
$PY analytics bc     citeseer 0
$PY analytics kcore  citeseer
$PY analytics color  citeseer
$PY analytics cf     test_cf
$PY analytics sample citeseer
$PY analytics motif  citeseer 4
$PY analytics fsm    citeseer 300
$PY analytics embed  citeseer deepwalk 16
echo "== compression =="
$PY compress compress /root/reference/inputs/citeseer $TMP/cs_cgr -s cgr -z 2
$PY compress verify   /root/reference/inputs/citeseer $TMP/cs_cgr
$PY compress compress /root/reference/inputs/citeseer $TMP/cs_svb -s streamvbyte
$PY compress decompress $TMP/cs_svb $TMP/cs_plain
$PY analytics tc $TMP/cs_svb          # analytics on a compressed prefix
$PY info $TMP/cs_svb
echo "== driver hooks =="
python __graft_entry__.py
rm -rf "$TMP"
echo "ALL SMOKE TESTS PASSED"
