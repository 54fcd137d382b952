#!/bin/bash
# sf100 document-family correctness gate — THIRD decade up (5M docs /
# 2M embeddings, 1000 key-offset copies of sf0.1), per-query
# process-isolated like run_sf10_gate.sh.
#
# Usage: tools/run_sf100_gate.sh [sfDir=target/sf100] [outDir=target/verify_sf100] [jsonDir=target/sf100_gate]
#
# Assumes graft.Verify has already dumped engine results + oracle SQL to
# $outDir. Subset rationale (the 1000-copy multiplicity regime):
#  - map-grain text analysis, exact fingerprint dedup, substring stats
#    (linear by construction), BPE, and the ANN index family keep their
#    semantics and are certified against DuckDB directly;
#  - winnow_dup_pairs/_clusters are certified in their CAP regime: at
#    1000 copies every shared fingerprint exceeds maxDocsPerFp=100, so
#    the contract output is EMPTY on both engines — the gate proves the
#    skew cap fires, not that pairs enumerate;
#  - the minhash pair/closure family (minhash_dup_pairs,
#    near_dedup_survivors*, near_dup_clusters*, semantic/simhash/
#    containment pairs) is EXCLUDED: its pair OUTPUT is Θ(copies²) ≈
#    2.5e9 rows at 1000 copies — an output-size bound, not an engine
#    bound (certified at sf10's 100-copy regime instead).
set -u
SF=${1:-target/sf100}
OUT=${2:-target/verify_sf100}
JD=${3:-target/sf100_gate}
mkdir -p "$JD"

LIGHT="text_stats lm_quality_score ngram_repetition dedup_exact_stats \
image_header_stats substring_dup_stats winnow_dup_pairs winnow_dup_clusters \
knn_cosine_brute knn_cosine_ivf knn_cosine_pq knn_cosine_pq_refined"
HEAVY="bpe_doc_tokens bpe_merges bpe_merges_batched bpe_merges_local"

for q in $LIGHT; do
  CHECK_ORACLE_ONLY=$q CHECK_ORACLE_MEM=${CHECK_ORACLE_MEM:-48GB} \
  CHECK_ORACLE_TIMEOUT=${CHECK_ORACLE_TIMEOUT:-3600} \
    python3 tools/check_oracle.py "$SF" "$OUT" "$JD/$q.json"
done
for q in $HEAVY; do
  CHECK_ORACLE_ONLY=$q CHECK_ORACLE_MEM=${CHECK_ORACLE_MEM:-48GB} \
  CHECK_ORACLE_TIMEOUT=${CHECK_ORACLE_TIMEOUT:-7200} \
    python3 tools/check_oracle.py "$SF" "$OUT" "$JD/$q.json"
done
