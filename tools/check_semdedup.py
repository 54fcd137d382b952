#!/usr/bin/env python3
"""Second oracle for semantic_dedup_stats at scales where the SQL twin
cannot exist.

Above 10k vectors per k-means cluster, Dedup.embeddingNearDups'
hot-bucket sub-salting engages and the pair set depends on
pmod(xxhash64(vec_id), nsub) — DuckDB has no xxhash64, so the
recursive-closure SQL twin is only valid at scales where the cap stays
disengaged (sf0.01/sf1, where it IS hash-certified). This tool
replicates the ENGINE's exact semantics end to end, independently:

 - centroid literals parsed from the dumped twin SQL (the same trained
   values the engine memoized — Float.toString shortest-repr strings,
   recovered exactly via float32 parse);
 - cosine with Spark's exact arithmetic: float elements widened to
   double, dot/nx/ny accumulated LEFT-TO-RIGHT over dimensions (the
   dim-loop below preserves that order for every pair at once),
   denom = sqrt(nx)*sqrt(ny), one division;
 - assignment by greatest (similarity, -index) — ties to lowest index;
 - Spark's XXH64.hashLong(vec_id, seed=42) sub-salting, vectorized in
   uint64 numpy;
 - round(cos, 6) as Spark's Round: HALF_UP over BigDecimal.valueOf =
   the SHORTEST decimal repr of the double (fast floor path, exact
   Decimal(repr) audit for values within 1e-6 of a .5 boundary);
 - union-find min-label components over the ≥ threshold pairs, exact
   survivor aggregate (count, id_sum) compared to the engine output.

Usage: check_semdedup.py <sfDir> <verifyOutDir> [jsonOut] [threshold=0.3] [cap=10000]
"""
import glob
import json
import math
import re
import sys
import time
from decimal import Decimal, ROUND_HALF_UP

import duckdb
import numpy as np

P1 = np.uint64(0x9E3779B185EBCA87)
P2 = np.uint64(0xC2B2AE3D27D4EB4F)
P3 = np.uint64(0x165667B19E3779F9)
P4 = np.uint64(0x85EBCA77C2B2AE63)
P5 = np.uint64(0x27D4EB2F165667C5)


def rotl(x, r):
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def xxh64_long(vals, seed=42):
    """Spark XXH64.hashLong over an int64 array, as signed int64."""
    with np.errstate(over="ignore"):
        inp = vals.astype(np.uint64)
        h = np.uint64(seed) + P5 + np.uint64(8)
        h = h ^ (rotl(inp * P2, 31) * P1)
        h = rotl(h, 27) * P1 + P4
        h ^= h >> np.uint64(33)
        h *= P2
        h ^= h >> np.uint64(29)
        h *= P3
        h ^= h >> np.uint64(32)
    return h.astype(np.int64)


def parse_centroids(sql):
    rows = re.findall(r"\((\d+), list_value\((.*?)\)\)", sql, re.S)
    cents = []
    for ci, body in sorted(((int(c), b) for c, b in rows)):
        vals = re.findall(r"'([^']+)'::FLOAT", body)
        cents.append(np.array([np.float32(v) for v in vals],
                              dtype=np.float32))
    return cents


def seq_cosine_vs_centroid(emb64, cent32):
    """cosine(vec, centroid) with Spark's left-to-right accumulation."""
    n = emb64.shape[0]
    dot = np.zeros(n)
    nx = np.zeros(n)
    ny = 0.0
    for k in range(emb64.shape[1]):
        xk = emb64[:, k]
        yk = float(cent32[k])
        dot += xk * yk
        nx += xk * xk
        ny += yk * yk
    denom = np.sqrt(nx) * math.sqrt(ny)
    out = np.where(denom > 0, dot / np.where(denom > 0, denom, 1.0), 0.0)
    return out


def round6_half_up(v):
    """Spark Round(col, 6) on double: HALF_UP over the double's SHORTEST
    decimal repr (BigDecimal.valueOf). Fast floor path + Decimal audit
    for boundary-adjacent values."""
    scaled = v * 1e6
    fast = np.floor(scaled + 0.5) / 1e6
    frac = scaled - np.floor(scaled)
    audit = np.abs(frac - 0.5) < 1e-6
    if audit.any():
        idx = np.nonzero(audit)[0]
        q = Decimal("0.000001")
        for i in idx:
            fast[i] = float(Decimal(repr(float(v[i])))
                            .quantize(q, rounding=ROUND_HALF_UP))
    return fast


class UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        p, r = self.p, x
        while p.get(r, r) != r:
            r = p[r]
        while p.get(x, x) != x:
            p[x], x = r, p[x]
        return r

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if rb < ra:
            ra, rb = rb, ra
        self.p[rb] = ra


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    threshold = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    cap = int(sys.argv[5]) if len(sys.argv) > 5 else 10000
    t0 = time.time()
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": 1, "err": None,
           "oracle_sec": None, "mode": "python-second-oracle"}

    cents = parse_centroids(
        json.load(open(f"{out_dir}/oracle_sql.json"))["semantic_dedup_stats"])
    assert cents, "no centroid literals found in the dumped twin SQL"

    con = duckdb.connect()
    tab = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        f"ORDER BY vec_id").fetchnumpy()
    ids = tab["vec_id"].astype(np.int64)
    emb32 = np.stack([np.asarray(e, dtype=np.float32)
                      for e in tab["embedding"]])
    emb64 = emb32.astype(np.float64)
    n, dims = emb64.shape
    print(f"{n} vectors x {dims} dims, {len(cents)} centroids")

    # assignment: greatest (similarity, -index) == first argmax
    scores = np.stack([seq_cosine_vs_centroid(emb64, c) for c in cents],
                      axis=1)
    assign = np.argmax(scores, axis=1)  # first max -> lowest index on ties

    # per-vector norms with the same left-to-right accumulation
    nx = np.zeros(n)
    for k in range(dims):
        nx += emb64[:, k] * emb64[:, k]
    snx = np.sqrt(nx)

    uf = UF()
    n_edges = 0
    for ci in range(len(cents)):
        members = np.nonzero(assign == ci)[0]
        m = len(members)
        if m < 2:
            continue
        nsub = max(1, math.ceil(m / cap))
        sub = np.mod(xxh64_long(ids[members]), nsub)  # pmod: np.mod >= 0
        for s in range(nsub):
            g = members[sub == s]
            mg = len(g)
            if mg < 2:
                continue
            G = emb64[g]
            D = np.zeros((mg, mg))
            for k in range(dims):
                col = G[:, k]
                D += col[:, None] * col[None, :]
            denom = snx[g][:, None] * snx[g][None, :]
            cos = np.where(denom > 0, D / np.where(denom > 0, denom, 1.0),
                           0.0)
            iu, ju = np.triu_indices(mg, k=1)
            r6 = round6_half_up(cos[iu, ju])
            hit = r6 >= threshold
            ia = ids[g[iu[hit]]]
            ib = ids[g[ju[hit]]]
            n_edges += len(ia)
            for a, b in zip(ia.tolist(), ib.tolist()):
                uf.union(a, b)
    losers = {x for x in uf.p if uf.find(x) != x}
    exp_n = int(n - len(losers))
    exp_sum = int(ids.sum() - sum(losers))
    print(f"{n_edges} edges, {len(losers)} losers -> "
          f"expect n_docs={exp_n} id_sum={exp_sum}")

    files = sorted(glob.glob(f"{out_dir}/semantic_dedup_stats/*.parquet"))
    got = con.execute(
        "SELECT n_docs, id_sum FROM read_parquet([" +
        ",".join(f"'{f}'" for f in files) + "])").fetchone()
    rec["spark_rows"] = 1
    rec["schema_match"] = True
    rec["rows_match"] = True
    if (int(got[0]), int(got[1])) == (exp_n, exp_sum):
        rec["hash_match"] = True
        print(f"PASS semantic_dedup_stats (n_docs={exp_n})")
    else:
        rec["err"] = (f"spark=(n_docs={got[0]}, id_sum={got[1]}) "
                      f"oracle=(n_docs={exp_n}, id_sum={exp_sum})")
        print(f"FAIL semantic_dedup_stats: {rec['err']}")
    rec["oracle_sec"] = round(time.time() - t0, 3)
    if json_out:
        json.dump({"semantic_dedup_stats": rec}, open(json_out, "w"),
                  indent=1)
    sys.exit(0 if rec["hash_match"] else 1)


if __name__ == "__main__":
    main()
