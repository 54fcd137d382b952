#!/bin/bash
# sf10 document-family correctness gate, per-query process-isolated.
#
# Usage: tools/run_sf10_gate.sh [sfDir=target/sf10] [outDir=target/verify_sf10] [jsonDir=target/sf10_gate]
#
# Assumes graft.Verify has already dumped the engine results + oracle
# SQL to $outDir. Each oracle twin runs in its OWN python process
# (CHECK_ORACLE_ONLY) so a heavy twin's DuckDB buffer state / OOM can
# never poison later queries; the closure family is certified by the
# union-find second oracle (tools/check_unionfind.py) instead of the
# round-unrolled SQL chains that exceed single-node DuckDB at 100-copy
# scale. Per-query JSONs land in $jsonDir for tools/merge_correctness.py.
set -u
SF=${1:-target/sf10}
OUT=${2:-target/verify_sf10}
JD=${3:-target/sf10_gate}
mkdir -p "$JD"

# direct SQL twins, light first then heavy; every one isolated
LIGHT="text_stats lm_quality_score ngram_repetition dedup_exact_stats \
image_header_stats substring_dup_stats winnow_dup_pairs near_dedup_survivors \
knn_cosine_brute knn_cosine_ivf knn_cosine_pq knn_cosine_pq_refined \
bpe_doc_tokens"
HEAVY="minhash_dup_pairs simhash_near_pairs containment_pairs \
substring_dup_spans bpe_merges bpe_merges_batched"

for q in $LIGHT; do
  CHECK_ORACLE_ONLY=$q CHECK_ORACLE_MEM=${CHECK_ORACLE_MEM:-48GB} \
  CHECK_ORACLE_TIMEOUT=${CHECK_ORACLE_TIMEOUT:-1800} \
    python3 tools/check_oracle.py "$SF" "$OUT" "$JD/$q.json"
done
for q in $HEAVY; do
  CHECK_ORACLE_ONLY=$q CHECK_ORACLE_MEM=${CHECK_ORACLE_MEM:-48GB} \
  CHECK_ORACLE_TIMEOUT=${CHECK_ORACLE_TIMEOUT:-5400} \
    python3 tools/check_oracle.py "$SF" "$OUT" "$JD/$q.json"
done

# closures: union-find second oracle over the certified edge sets
python3 tools/check_unionfind.py "$SF" "$OUT" "$JD/unionfind.json"
