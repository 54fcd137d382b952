#!/usr/bin/env python3
"""Extract per-query formatted plans from a PLANS_*.md dump into
plans/<round>/<query>_<suffix>.txt files (round-12 deliverable helper).

Usage: extract_plans.py PLANS_r12.md plans/r12 after q1,q2,...
"""
import re
import sys
import pathlib

def main():
    src, outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3], \
        set(sys.argv[4].split(","))
    text = pathlib.Path(src).read_text()
    # sections: "## <name>\n\n```\n<plan>\n```" — the closing fence is
    # anchored to a LINE (r12 ADVICE: a non-greedy dotall match truncated
    # a plan at the first ``` inside plan text and silently depended on
    # the exact blank-line layout)
    found = set()
    for m in re.finditer(r"^## (\S+)\s*\n+```\n(.*?)^```\s*$", text,
                         re.M | re.S):
        name, plan = m.group(1), m.group(2)
        if name in names:
            out = pathlib.Path(outdir) / f"{name}_{suffix}.txt"
            out.write_text(plan)
            found.add(name)
            print(f"wrote {out}")
    missing = names - found
    if missing:
        print(f"MISSING: {sorted(missing)}", file=sys.stderr)
        sys.exit(1)

if __name__ == "__main__":
    main()
