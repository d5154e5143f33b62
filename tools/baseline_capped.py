#!/usr/bin/env python3
"""DuckDB baseline with a per-query wall-clock cap — the sf10 scale step.

Same measurement protocol as baseline.py (warm cache, median of 3) with one
addition: each sample is guarded by a timer that calls `con.interrupt()` at
`cap` seconds. An oracle twin that is merely slow at sf1 can be quadratic by
construction (q_dedup_semantic's all-pairs SEMANTIC spec is ~4×10^12 pair
cosines at sf10) — the cap records it as {"timeout": cap} instead of hanging
the run, and the growth table reports the censoring honestly.

Usage: baseline_capped.py SF_DIR ORACLE_JSON [cap_sec] [prefix1,prefix2,...]
"""
import sys, json, time, statistics, threading
import duckdb

sf_dir = sys.argv[1]
oracle_path = sys.argv[2]
cap = float(sys.argv[3]) if len(sys.argv) > 3 else 180.0
prefixes = tuple(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

con = duckdb.connect()
con.execute("SET threads TO 32")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(oracle_path))
names = sorted(n for n in oracle if prefixes is None or n.startswith(prefixes))

for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
    con.execute(f"SELECT count(*) FROM {t}").fetchall()

out, timeouts = {}, {}
for name in names:
    sql = oracle[name]
    times = []
    for _ in range(3):
        timer = threading.Timer(cap, con.interrupt)
        timer.start()
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            times.append(time.time() - t0)
        except duckdb.InterruptException:
            timeouts[name] = cap
            break
        finally:
            timer.cancel()
    if times and name not in timeouts:
        out[name] = round(statistics.median(times), 4)
    print(f"  {name}: {out.get(name, 'TIMEOUT')}", file=sys.stderr)

print(json.dumps({"engine": "duckdb-1.0.0", "threads": 32, "sf_dir": sf_dir,
                  "cap_sec": cap,
                  "total": round(sum(out.values()), 4),
                  "queries": out, "timeouts": timeouts}, indent=1))
