#!/usr/bin/env python3
"""Union-find second oracle for the transitive-closure queries.

The closure twins (bounded-round min-label SQL chains) are the one
oracle family whose cost explodes at the 100-copy scale fixtures: each
round re-joins the full edge set, and 24 materialized rounds over a
~25M-edge candidate graph exceed a single-node DuckDB long before the
Spark side breaks a sweat. This tool certifies the SAME contract a
different way — the way round 9's winnow audit convicted a wrong twin:

 1. read the engine's own CANDIDATE-PAIR output (the edge set) — a
    flat pair list that IS independently oracle-certified (hash-exact
    or aggregate-grain) at the same scale;
 2. compute connected components with a driver-side union-find (path
    compression + union by root-min) — exact, and entirely independent
    of the Spark closure algorithm (alternating large-star/small-star)
    it certifies;
 3. compare labels / survivor aggregates bit-for-bit.

Covers:
 - winnow_dup_clusters        vs edges from winnow_dup_pairs
 - near_dup_clusters_logstar  vs edges from minhash_dup_pairs
                                 (est_jaccard >= 0.5)
 - near_dedup_survivors_exact vs survivors implied by those labels
                                 over the documents table

Usage: check_unionfind.py <sfDir> <verifyOutDir> [jsonOut]

jsonOut records CORRECTNESS-style entries with mode="union-find".
"""
import glob
import json
import sys
import time

import duckdb


def read_pairs(con, path, cols, where=""):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        return None
    lst = ",".join(f"'{f}'" for f in files)
    q = f"SELECT {cols} FROM read_parquet([{lst}]) {where}"
    return con.execute(q).fetchnumpy()


class UnionFind:
    """Array-backed union-find; components labeled by their MIN member
    (the same label contract as graft.ops.ConnectedComponents)."""

    def __init__(self):
        self.parent = {}

    def find(self, x):
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != x:
            p[x], x = root, p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # root-min union keeps the min id reachable as the root
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra


def components(ids_a, ids_b):
    uf = UnionFind()
    for a, b in zip(ids_a.tolist(), ids_b.tolist()):
        uf.union(a, b)
    # min-label per component: root-min union makes find() the min id
    return {x: uf.find(x) for x in uf.parent} | {
        x: x for x in set(ids_a.tolist()) | set(ids_b.tolist())
        if uf.find(x) == x}


def check_labels(con, out_dir, cluster_query, expect_labels, rec):
    got = read_pairs(con, f"{out_dir}/{cluster_query}",
                     "doc_id, cluster_id")
    if got is None:
        rec["err"] = "no spark result written"
        return
    rec["spark_rows"] = len(got["doc_id"])
    rec["oracle_rows"] = len(expect_labels)
    rec["schema_match"] = True
    rec["rows_match"] = len(got["doc_id"]) == len(expect_labels)
    if not rec["rows_match"]:
        rec["err"] = (f"row count spark={len(got['doc_id'])} "
                      f"union-find={len(expect_labels)}")
        return
    bad = 0
    for d, c in zip(got["doc_id"].tolist(), got["cluster_id"].tolist()):
        if expect_labels.get(d) != c:
            bad += 1
    if bad:
        rec["err"] = f"{bad}/{len(expect_labels)} labels differ"
    else:
        rec["hash_match"] = True


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    report = {}

    def rec(name):
        r = {"rows_match": False, "schema_match": False,
             "hash_match": False, "spark_rows": None, "oracle_rows": None,
             "err": None, "oracle_sec": None, "mode": "union-find"}
        report[name] = r
        return r

    # --- winnow closure: edges from the certified winnow pair list ----
    t0 = time.time()
    r = rec("winnow_dup_clusters")
    e = read_pairs(con, f"{out_dir}/winnow_dup_pairs", "id_a, id_b")
    if e is None:
        r["err"] = "no winnow_dup_pairs edge set written"
    else:
        labels = components(e["id_a"], e["id_b"])
        check_labels(con, out_dir, "winnow_dup_clusters", labels, r)
    r["oracle_sec"] = round(time.time() - t0, 3)
    print(("PASS" if r["hash_match"] else "FAIL"), "winnow_dup_clusters",
          r["err"] or f"({r['spark_rows']} labels)")

    # --- minhash closure + exact survivors ----------------------------
    t0 = time.time()
    r = rec("near_dup_clusters_logstar")
    e = read_pairs(con, f"{out_dir}/minhash_dup_pairs", "id_a, id_b",
                   "WHERE est_jaccard >= 0.5")
    labels = None
    if e is None:
        r["err"] = "no minhash_dup_pairs edge set written"
    else:
        labels = components(e["id_a"], e["id_b"])
        check_labels(con, out_dir, "near_dup_clusters_logstar", labels, r)
    r["oracle_sec"] = round(time.time() - t0, 3)
    print(("PASS" if r["hash_match"] else "FAIL"), "near_dup_clusters_logstar",
          r["err"] or f"({r['spark_rows']} labels)")

    t0 = time.time()
    r = rec("near_dedup_survivors_exact")
    if labels is None:
        r["err"] = "no edge set (see near_dup_clusters_logstar)"
    else:
        losers = {d for d, c in labels.items() if c != d}
        tot = con.execute(
            f"SELECT CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) "
            f"FROM '{sf_dir}/documents.parquet'").fetchone()
        lose_n = len(losers)
        lose_sum = sum(losers)
        expect = (tot[0] - lose_n, tot[1] - lose_sum)
        got = read_pairs(con, f"{out_dir}/near_dedup_survivors_exact",
                         "n_docs, id_sum")
        if got is None:
            r["err"] = "no spark result written"
        else:
            r["spark_rows"] = len(got["n_docs"])
            r["oracle_rows"] = 1
            r["schema_match"] = True
            r["rows_match"] = r["spark_rows"] == 1
            g = (int(got["n_docs"][0]), int(got["id_sum"][0]))
            if g == expect:
                r["hash_match"] = True
            else:
                r["err"] = f"spark={g} union-find={expect}"
    r["oracle_sec"] = round(time.time() - t0, 3)
    print(("PASS" if r["hash_match"] else "FAIL"),
          "near_dedup_survivors_exact", r["err"] or "(1 row)")

    if json_out:
        json.dump(report, open(json_out, "w"), indent=1)
    sys.exit(0 if all(v["hash_match"] for v in report.values()) else 1)


if __name__ == "__main__":
    main()
