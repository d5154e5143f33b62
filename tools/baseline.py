#!/usr/bin/env python3
"""Measure DuckDB 1.0.0 single-node timings for every oracle query at a given
scale factor — the BASELINE.md numbers. Warm cache, median of 3 runs."""
import sys, json, time, statistics
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify/oracle_sql.json"

con = duckdb.connect()
con.execute("SET threads TO 32")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(oracle_path))
# warmup
for t in ["lineitem","orders","events","documents","embeddings"]:
    con.execute(f"SELECT count(*) FROM {t}").fetchall()

out = {}
for name in sorted(oracle):
    sql = oracle[name]
    times = []
    for _ in range(3):
        t0 = time.time()
        con.execute(sql).fetchall()
        times.append(time.time() - t0)
    out[name] = round(statistics.median(times), 4)

print(json.dumps({"engine": "duckdb-1.0.0", "threads": 32, "sf_dir": sf_dir,
                  "total": round(sum(out.values()), 4), "queries": out}, indent=1))
