#!/usr/bin/env python3
"""Render the BASELINE.md scale-curve table: graft vs DuckDB per query at a
given scale factor, plus the sf0.1->sf1 growth ratio for each engine (the
scale-curve evidence: a floor-dominated query grows ~1x in graft while DuckDB
grows ~10x; a data-dominated query grows ~10x in both and the ratio converges
or flips).

Usage: scale_table.py BENCH_sf1.json baseline_sf1.json BENCH_r{N}.json baseline_sf01_total_json
"""
import json
import sys

g1 = json.load(open(sys.argv[1]))["queries"]          # graft sf1
d1 = json.load(open(sys.argv[2]))["queries"]          # duckdb sf1
def queries_of(path):
    d = json.load(open(path))
    if "queries" in d:
        return d["queries"]
    if "parsed" in d and isinstance(d["parsed"], dict):  # driver BENCH_r{N} wrapper
        return d["parsed"].get("queries", d["parsed"])
    return {}

g01 = queries_of(sys.argv[3]) if len(sys.argv) > 3 else {}  # graft sf0.1
d01 = queries_of(sys.argv[4]) if len(sys.argv) > 4 else {}  # duckdb sf0.1

common = sorted(set(g1) & set(d1))
heavy = [k for k in common if k.startswith(("q_text", "q_dedup", "q_pipeline", "q_line"))]

def row(k):
    ratio = g1[k] / d1[k]
    gg = f"{g1[k]/g01[k]:.1f}x" if k in g01 and g01[k] > 0 else "-"
    dg = f"{d1[k]/d01[k]:.1f}x" if k in d01 and d01[k] > 0 else "-"
    return f"| {k} | {g1[k]:.2f} | {d1[k]:.3f} | {ratio:.1f}x | {gg} | {dg} |"

print("| query | graft s | duckdb s | ratio | graft growth | duckdb growth |")
print("|---|---|---|---|---|---|")
for k in heavy:
    print(row(k))
gt = sum(g1[k] for k in heavy); dt = sum(d1[k] for k in heavy)
print(f"| **heavy total ({len(heavy)})** | **{gt:.1f}** | **{dt:.1f}** | **{gt/dt:.2f}x** | | |")
at = sum(g1[k] for k in common); bt = sum(d1[k] for k in common)
print(f"| all {len(common)} common | {at:.1f} | {bt:.1f} | {at/bt:.2f}x | | |")
