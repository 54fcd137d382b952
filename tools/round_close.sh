#!/bin/bash
# Round-close checklist (round-10 verdict #8: BENCH.json / LEAKCHECK.json /
# CORRECTNESS_r*.json recurrently sat uncommitted at round end).
#
# Usage: tools/round_close.sh <roundN> [sfDir=/root/testdata/sf0.01]
#
# 1. regenerates the plan-audit artifact PLANS_r<N>.md (the
#    PlanShapeSpec round-close invariant requires the NEWEST audit to
#    match the query surface exactly);
# 2. stages every round artifact that exists — bench JSONs, correctness
#    JSONs, leakcheck, plans — so the close commit carries them;
# 3. fails loudly if the worktree still has unstaged tracked changes
#    afterward (the drift the verdict flagged twice).
#
# Driver-written artifacts that land AFTER the session's last commit
# (the judge's own BENCH_r<N>/CORRECTNESS_r<N> reruns) are out of this
# script's reach by construction; everything the session itself
# produced must be clean here.
set -eu
N=${1:?round number, e.g. 11}
SF=${2:-/root/testdata/sf0.01}

sbt -batch "runMain graft.Explain $SF PLANS_r$N.md"

git add -A "PLANS_r$N.md" 2>/dev/null || true
for f in BENCH.json BENCH_r*.json BENCH_STREAMING.json BENCH_BPE*.json \
         BENCH_SF*.json CORRECTNESS_r*.json CORRECTNESS_SF*.json \
         LEAKCHECK.json COPYCHECK.json; do
  [ -e "$f" ] && git add "$f"
done

if ! git diff --quiet; then
  echo "ROUND CLOSE: unstaged tracked changes remain:" >&2
  git diff --stat >&2
  exit 1
fi

# Standing rule (round-11 verdict #8): every query on the contract
# surface ships with an sf1 ladder rung in the same round it lands.
# Warn on any SparkEntry.queries name absent from CORRECTNESS_SF1.json.
python3 - <<'PYEOF' || true
import json, re, glob
sf1 = set(json.load(open("CORRECTNESS_SF1.json"))) - {"__meta__"}
# the query surface, from the newest verify dump's oracle_sql.json
dumps = sorted(glob.glob("target/verify*/oracle_sql.json") +
               glob.glob("/tmp/verify*/oracle_sql.json"),
               key=lambda p: __import__("os").path.getmtime(p))
if not dumps:
    print("LADDER CHECK: no verify dump found to read the query surface from")
else:
    surface = set(json.load(open(dumps[-1])))
    missing = sorted(surface - sf1)
    if missing:
        print("LADDER CHECK WARNING: queries with no sf1 rung in "
              "CORRECTNESS_SF1.json:", ", ".join(missing))
    else:
        print("LADDER CHECK: every oracle-backed query has an sf1 rung")
PYEOF
echo "round-close artifacts staged; commit to finish."
