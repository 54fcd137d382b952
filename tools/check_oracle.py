#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `graft.Verify` has dumped query results + oracle_sql.json:
for each query, executes the oracle SQL in DuckDB over the same parquet
tables, sorts columns by name, sorts rows, and compares values exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [jsonOut]

With jsonOut, also writes a CORRECTNESS-style JSON artifact:
{query: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
         err, oracle_sec}}.

Environment knobs for scale-ladder runs (sf1+), where a handful of
deliberately-brute oracle twins are infeasible by design:
- CHECK_ORACLE_SKIP: comma-separated query names to record as
  "skipped" (e.g. an O(n^2) all-pairs equality proof certified at
  smaller scale factors) without running them;
- CHECK_ORACLE_TIMEOUT: per-oracle wall budget in seconds; a DuckDB
  query past it is interrupted and recorded as timed out;
- CHECK_ORACLE_ONLY: comma-separated query names — run ONLY these.
  The scale gates run each heavy twin in its OWN process with this
  (a heavy list-CTE query's DuckDB buffer state poisons later queries
  on a shared connection).
"""
import json
import os
import sys
import glob
import threading
import time

import duckdb
import pandas as pd


def load_spark_result(con, path):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        return None
    return con.execute(
        "SELECT * FROM read_parquet([" +
        ",".join(f"'{f}'" for f in files) + "])").df()


def normalize(df):
    df = df[sorted(df.columns)]
    # stringify for robust exact compare across decimal/int backends
    out = df.copy()
    for c in out.columns:
        out[c] = out[c].map(lambda v: "NULL" if v is None or (
            isinstance(v, float) and pd.isna(v)) else str(v))
    out = out.sort_values(by=list(out.columns), kind="mergesort")
    out = out.reset_index(drop=True)
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # in-memory connections have out-of-core spilling DISABLED unless a
    # temp_directory is set; scale-ladder twins (sf1/sf10 closures over
    # tens of millions of edges) legitimately exceed RAM and must spill,
    # not die -- an sf10 run OOM'd here and took the whole gate down
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    # CHECK_ORACLE_MEM caps DuckDB's reservation below the default 80%
    # of RAM: an allocation failure at the default leaves the PROCESS so
    # starved that pthread_create fails and the whole gate dies mid-run
    # (observed at sf10 on a list-typed twin) -- a lower cap turns that
    # into a clean per-query error instead
    mem = os.environ.get("CHECK_ORACLE_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    # result order is irrelevant (normalize() sorts rows before compare)
    # and insertion-order preservation forces DuckDB to buffer entire
    # intermediate pipelines in memory — the difference between a heavy
    # scale-ladder twin spilling and dying
    con.execute("SET preserve_insertion_order=false")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    skip = set(filter(None,
        os.environ.get("CHECK_ORACLE_SKIP", "").split(",")))
    only = set(filter(None,
        os.environ.get("CHECK_ORACLE_ONLY", "").split(",")))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    budget = float(os.environ.get("CHECK_ORACLE_TIMEOUT", "0")) or None
    report = {}
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None, "oracle_sec": None}
        report[name] = rec
        if name in skip:
            rec["err"] = ("skipped: oracle marked infeasible at this "
                          "scale (see CHECK_ORACLE_SKIP)")
            print(f"SKIP {name}")
            n_skip += 1
            continue
        t0 = time.time()
        timer = None
        # done-flag guard: if the timer fires between execute() returning
        # and cancel(), an unguarded interrupt() would cancel the NEXT
        # oracle (spurious failure near the budget boundary). The lock
        # makes the flag-check-then-interrupt atomic against the
        # finally-block update — without it the timer can still sneak an
        # interrupt() onto an idle connection in the window between
        # execute() returning and done[0]=True
        done = [False]
        done_lock = threading.Lock()

        def _interrupt():
            with done_lock:
                if not done[0]:
                    con.interrupt()

        if budget:
            timer = threading.Timer(budget, _interrupt)
            try:
                timer.start()
            except RuntimeError:
                # after a DuckDB OOM the process can be too starved to
                # spawn a thread -- run the query un-budgeted rather
                # than killing the whole gate (the OS OOM killer is the
                # backstop); the prior query's failure is already
                # recorded
                timer = None
        try:
            expect = con.execute(sql).df()
        except Exception as e:
            took = time.time() - t0
            if budget and took >= budget:
                rec["err"] = (f"oracle timed out after {int(took)}s "
                              f"(budget {int(budget)}s)")
            else:
                rec["err"] = f"oracle SQL error: {e}"
            print(f"FAIL {name}: {rec['err']}")
            n_fail += 1
            continue
        finally:
            with done_lock:
                done[0] = True
            if timer:
                timer.cancel()
        rec["oracle_sec"] = round(time.time() - t0, 3)
        rec["oracle_rows"] = len(expect)
        got = load_spark_result(con, f"{out_dir}/{name}")
        if got is None:
            rec["err"] = "no spark result written"
            print(f"FAIL {name}: no spark result written")
            n_fail += 1
            continue
        rec["spark_rows"] = len(got)
        if sorted(got.columns) != sorted(expect.columns):
            rec["err"] = (f"columns differ spark={sorted(got.columns)} "
                          f"oracle={sorted(expect.columns)}")
            print(f"FAIL {name}: {rec['err']}")
            n_fail += 1
            continue
        rec["schema_match"] = True
        g, e = normalize(got), normalize(expect)
        rec["rows_match"] = len(g) == len(e)
        if len(g) != len(e):
            rec["err"] = f"row count spark={len(g)} oracle={len(e)}"
            print(f"FAIL {name}: {rec['err']}")
            n_fail += 1
            continue
        if g.equals(e):
            rec["hash_match"] = True
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            neq = (g != e).any(axis=1)
            idx = list(g.index[neq])[:5]
            rec["err"] = f"{int(neq.sum())}/{len(g)} rows differ"
            print(f"FAIL {name}: {rec['err']}; first diffs:")
            for i in idx:
                for c in g.columns:
                    if g.at[i, c] != e.at[i, c]:
                        print(f"  row {i} col {c}: "
                              f"spark={g.at[i, c]!r} oracle={e.at[i, c]!r}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail"
          + (f" / {n_skip} skip" if n_skip else "") + " ==")
    if json_out:
        json.dump(report, open(json_out, "w"), indent=1)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
