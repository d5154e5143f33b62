#!/usr/bin/env python3
"""Merge graft Bench subset outputs into one artifact (the sf10 protocol
runs one family subset per Bench invocation so samples stay same-session
and box-idle; the published BENCH_sfN.json is their union). Later files
win per query; total and subset list recomputed. Refuses to merge files
from different sf dirs.

Usage: merge_bench.py out.json part1.json part2.json ...
"""
import sys, json

out_path = sys.argv[1]
queries = {}
subset = []
sf = None
for p in sys.argv[2:]:
    d = json.load(open(p))
    if sf is None:
        sf = d["sf"]
    elif d["sf"] != sf:
        sys.exit(f"sf mismatch: {d['sf']} vs {sf}")
    queries.update(d["queries"])
    for tok in d.get("subset", []):
        if tok not in subset:
            subset.append(tok)
result = {
    "metric": "total",
    "value": round(sum(v for v in queries.values() if v >= 0), 4),
    "unit": "sec",
    "queries": dict(sorted(queries.items())),
    "sf": sf,
}
if subset:
    result["subset"] = subset
json.dump(result, open(out_path, "w"))
open(out_path, "a").write("\n")
print(f"{out_path}: {len(queries)} queries, total {result['value']}s, subset {subset}")
