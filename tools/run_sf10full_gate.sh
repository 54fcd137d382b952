#!/bin/bash
# sf10full relational/graph correctness gate, per-query process-isolated
# (same discipline as run_sf10_gate.sh, different query family).
# Usage: tools/run_sf10full_gate.sh [sfDir=target/sf10full] [outDir=target/verify_sf10full] [jsonDir=target/sf10full_gate]
set -u
SF=${1:-target/sf10full}
OUT=${2:-target/verify_sf10full}
JD=${3:-target/sf10full_gate}
mkdir -p "$JD"

MED="rollup_reconcile scd2_customer_history scd2_customer_history_batch \
setsim_snm_pairs sparse_cosine_pairs"
GRAPH="pagerank_trade_graph hits_trade_graph communities_trade_graph \
bfs_depth_trade_graph trustrank_trade_graph"

for q in $MED; do
  CHECK_ORACLE_ONLY=$q CHECK_ORACLE_MEM=${CHECK_ORACLE_MEM:-48GB} \
  CHECK_ORACLE_TIMEOUT=${CHECK_ORACLE_TIMEOUT:-3600} \
    python3 tools/check_oracle.py "$SF" "$OUT" "$JD/$q.json"
done
for q in $GRAPH; do
  CHECK_ORACLE_ONLY=$q CHECK_ORACLE_MEM=${CHECK_ORACLE_MEM:-48GB} \
  CHECK_ORACLE_TIMEOUT=${CHECK_ORACLE_TIMEOUT:-7200} \
    python3 tools/check_oracle.py "$SF" "$OUT" "$JD/$q.json"
done
