#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `graft.Verify` has dumped query results + oracle_sql.json:
for each query, executes the oracle SQL in DuckDB over the same parquet
tables, sorts columns by name, sorts rows, and compares values exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob

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
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expect = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        got = load_spark_result(con, f"{out_dir}/{name}")
        if got is None:
            print(f"FAIL {name}: no spark result written")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(expect.columns):
            print(f"FAIL {name}: columns differ spark={sorted(got.columns)} "
                  f"oracle={sorted(expect.columns)}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(expect)
        if len(g) != len(e):
            print(f"FAIL {name}: row count spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        if g.equals(e):
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            neq = (g != e).any(axis=1)
            idx = list(g.index[neq])[:5]
            print(f"FAIL {name}: {int(neq.sum())}/{len(g)} rows differ; "
                  f"first diffs:")
            for i in idx:
                for c in g.columns:
                    if g.at[i, c] != e.at[i, c]:
                        print(f"  row {i} col {c}: "
                              f"spark={g.at[i, c]!r} oracle={e.at[i, c]!r}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
