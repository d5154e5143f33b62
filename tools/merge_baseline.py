#!/usr/bin/env python3
"""Merge partial baseline_capped.py outputs (a crash-split run) into one
artifact: later files win per query; totals/timeouts/errors recomputed.

Usage: merge_baseline.py out.json part1.json part2.json ...
A part may also be a stderr log of "  name: value" lines (the crash case
where the JSON line never printed); non-numeric values are recorded as
errors.
"""
import sys, json, re

out_path = sys.argv[1]
queries, timeouts, errors = {}, {}, {}
meta = {}
for p in sys.argv[2:]:
    text = open(p).read()
    try:
        d = json.loads(text)
        queries.update(d.get("queries", {}))
        timeouts.update(d.get("timeouts", {}))
        errors.update(d.get("errors", {}))
        meta = {k: d[k] for k in ("engine", "threads", "sf_dir", "cap_sec") if k in d}
    except json.JSONDecodeError:
        for m in re.finditer(r"^  (\S+): (.+)$", text, re.M):
            name, val = m.group(1), m.group(2)
            try:
                queries[name] = float(val)
            except ValueError:
                errors[name] = val[:200]
result = dict(meta)
result.update({"total": round(sum(queries.values()), 4),
               "queries": dict(sorted(queries.items())),
               "timeouts": timeouts, "errors": errors,
               "merged_from": sys.argv[2:]})
json.dump(result, open(out_path, "w"), indent=1)
print(f"merged {len(queries)} queries, {len(timeouts)} timeouts, {len(errors)} errors -> {out_path}")
