#!/usr/bin/env python3
"""Merge per-query gate JSONs (tools/run_sf10_gate.sh output dir) into
one CORRECTNESS-style artifact, with an optional __meta__ note.

Usage: merge_correctness.py <jsonDir> <outFile> [metaNote]
"""
import glob
import json
import sys


def main():
    json_dir, out = sys.argv[1], sys.argv[2]
    note = sys.argv[3] if len(sys.argv) > 3 else None
    merged = {}
    for f in sorted(glob.glob(f"{json_dir}/*.json")):
        for k, v in json.load(open(f)).items():
            # a later (re-run) file wins only if it passed or the
            # existing entry didn't
            if k not in merged or v.get("hash_match") or \
                    not merged[k].get("hash_match"):
                merged[k] = v
    merged.pop("__meta__", None)
    n_pass = sum(1 for v in merged.values() if v.get("hash_match"))
    n_queries = len(merged)
    if note:
        merged["__meta__"] = {"summary": note,
                              "n_pass": n_pass, "n_queries": n_queries}
    json.dump(merged, open(out, "w"), indent=1, sort_keys=True)
    print(f"{n_pass}/{n_queries} pass -> {out}")


if __name__ == "__main__":
    main()
