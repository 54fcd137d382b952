#!/bin/bash
# sf100full (1000 key-offset copies of sf0.1: 600M lineitem / 150M
# orders / 15M customers — the THIRD full-table decade) correctness
# gate, per-query process-isolated like run_sf10full_gate.sh.
#
# Usage: tools/run_sf100full_gate.sh [sfDir=target/sf100full] [outDir=target/verify_sf100full] [jsonDir=target/sf100full_gate]
#
# Envelope rationale: the medium relational twins (rollup, scd2 batch,
# blocked pair families) are single-pass SQL over 600M rows — heavy
# but within a 64 GB process-isolated DuckDB. The ITERATIVE families
# (scd2 incremental fold, the five graph fixed-points) unroll 20-24
# rounds over a ~0.5B-edge CTE chain; each round re-materializes an
# edge-grain state, so the twin's working set is rounds x edges — a
# single-node memory bound, not an engine defect. They get the longest
# timeouts and whatever fails is documented as an oracle-envelope
# exception (the Spark side is green and hash-certified one decade
# down at sf10full).
set -u
SF=${1:-target/sf100full}
OUT=${2:-target/verify_sf100full}
JD=${3:-target/sf100full_gate}
mkdir -p "$JD"

MED="rollup_reconcile scd2_customer_history_batch setsim_snm_pairs \
sparse_cosine_pairs"
ITER="scd2_customer_history pagerank_trade_graph hits_trade_graph \
communities_trade_graph bfs_depth_trade_graph trustrank_trade_graph"

for q in $MED; do
  CHECK_ORACLE_ONLY=$q CHECK_ORACLE_MEM=${CHECK_ORACLE_MEM:-64GB} \
  CHECK_ORACLE_TIMEOUT=${CHECK_ORACLE_TIMEOUT:-7200} \
    python3 tools/check_oracle.py "$SF" "$OUT" "$JD/$q.json"
done
for q in $ITER; do
  CHECK_ORACLE_ONLY=$q CHECK_ORACLE_MEM=${CHECK_ORACLE_MEM:-64GB} \
  CHECK_ORACLE_TIMEOUT=${CHECK_ORACLE_TIMEOUT:-10800} \
    python3 tools/check_oracle.py "$SF" "$OUT" "$JD/$q.json"
done
