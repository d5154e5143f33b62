#!/usr/bin/env python3
"""Noisy-box bench protocol, mechanized (r21 VERDICT item 3).

This box's bench numbers swing +-50% per query under outside-host contention
(r21: untouched rows drifted ~30% between rounds purely from load). The r21
mitigation — watch the load average, run the full surface twice, take the
per-query min, keep both raws — lived in prose; this runner IS that protocol,
so round-over-round artifacts are self-normalizing.

It does NOT touch graft.Bench (the driver contract: one JSON line, env-driven
SF dir / core count, interleaved median-of-3 samples). It invokes `sbt
"runMain graft.Bench"` N times (default 2), each a fresh cold JVM exactly
like the driver's run, records the 1-minute load average before each run,
and emits ONE JSON object whose top-level shape mirrors Bench's own line —
{"metric","value","unit","queries","sf"} — so anything that parses a Bench
artifact parses this one:

  - queries[name] = min over runs (per-query min discards per-run contention;
    a query absent from some run — e.g. it failed there — takes the min of
    the runs that have it, and a -1.0 failure marker never masks a real
    timing from another run);
  - value         = sum of those mins (same definition as Bench's total);
  - runs[]        = every raw run verbatim: its loadavg triple at launch,
    wall time, and its full parsed Bench line, so a judge can re-derive any
    other statistic.

Usage: bench_protocol.py OUT.json [n_runs]
Env passthrough: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_ONLY
work exactly as for graft.Bench.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(idx, n_runs):
    load = os.getloadavg()
    out = os.path.join(tempfile.gettempdir(), f"bench_protocol_run{idx}.json")
    if os.path.exists(out):
        os.remove(out)
    env = dict(os.environ, SPARK_GRAFT_BENCH_OUT=out)
    t0 = time.time()
    proc = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    wall = time.time() - t0
    tail = proc.stdout.decode("utf-8", "replace")[-2000:]
    if proc.returncode != 0 or not os.path.exists(out):
        sys.stderr.write(f"[bench_protocol] run {idx}/{n_runs} FAILED "
                         f"(rc={proc.returncode}); sbt tail:\n{tail}\n")
        return {"loadavg": list(load), "wall_sec": round(wall, 1),
                "rc": proc.returncode, "bench": None}
    with open(out) as f:
        bench = json.load(f)
    sys.stderr.write(f"[bench_protocol] run {idx}/{n_runs}: load1={load[0]:.2f} "
                     f"total={bench.get('value')} wall={wall:.0f}s\n")
    return {"loadavg": list(load), "wall_sec": round(wall, 1),
            "rc": proc.returncode, "bench": bench}


def main():
    if len(sys.argv) < 2:
        sys.exit("usage: bench_protocol.py OUT.json [n_runs]")
    out_path = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    runs = [run_once(i + 1, n_runs) for i in range(n_runs)]
    ok = [r["bench"] for r in runs if r["bench"] is not None]
    if not ok:
        sys.exit("[bench_protocol] every run failed — no artifact written")
    names = sorted({q for b in ok for q in b["queries"]})
    mins = {}
    for q in names:
        # -1.0 marks a failed query inside a run; it must not win the min
        vals = [b["queries"][q] for b in ok if b["queries"].get(q, -1.0) >= 0]
        mins[q] = min(vals) if vals else -1.0
    total = sum(v for v in mins.values() if v >= 0)
    artifact = {
        "metric": "total",
        "value": round(total, 4),
        "unit": "sec",
        "queries": mins,
        "sf": ok[0].get("sf"),
        "protocol": {"aggregation": "min", "n_runs": n_runs,
                     "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32")},
        "runs": runs,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    sys.stderr.write(f"[bench_protocol] wrote {out_path}: total(min-of-{len(ok)})="
                     f"{artifact['value']}\n")


if __name__ == "__main__":
    main()
