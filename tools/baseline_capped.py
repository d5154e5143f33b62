#!/usr/bin/env python3
"""DuckDB baseline with per-query isolation — the sf10 scale step.

Same measurement protocol as baseline.py (warm cache, median of 3) with two
additions learned at sf10:

- a per-sample wall-clock cap via `con.interrupt()` (an oracle twin that is
  merely slow at sf1 can be quadratic by construction — q_dedup_semantic's
  all-pairs SEMANTIC spec is ~4x10^10 pair cosines at sf10);
- each query runs in its OWN subprocess. q_line_filter's twin
  (string_agg ORDER BY over 13.5M exploded lines) allocates outside
  DuckDB's buffer-manager accounting, blows past `SET memory_limit`, and
  kills the whole process with a raw "bad allocation" — which in a shared
  process also poisoned every later query (even `threading.Timer.start()`
  failed). A child process dying costs exactly one query, recorded as an
  error. Cache warmth survives process boundaries (it is the OS page
  cache), so the warm-protocol comparison is unchanged.

Usage: baseline_capped.py SF_DIR ORACLE_JSON [cap_sec] [prefix1,prefix2,...]
Child mode (internal): baseline_capped.py --one SF_DIR ORACLE_JSON NAME CAP
"""
import sys, json, time, statistics, subprocess

def run_one(sf_dir, oracle_path, name, cap):
    import threading
    import duckdb
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    # below the OS ceiling so an accounted blow-up fails inside DuckDB
    con.execute("SET memory_limit='90GB'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sql = json.load(open(oracle_path))[name]
    times = []
    for _ in range(3):
        timer = threading.Timer(cap, con.interrupt)
        timer.start()
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            times.append(time.time() - t0)
        except duckdb.InterruptException:
            print(json.dumps({"timeout": cap}))
            return
        finally:
            timer.cancel()
    print(json.dumps({"sec": round(statistics.median(times), 4)}))

if sys.argv[1] == "--one":
    run_one(sys.argv[2], sys.argv[3], sys.argv[4], float(sys.argv[5]))
    sys.exit(0)

sf_dir = sys.argv[1]
oracle_path = sys.argv[2]
cap = float(sys.argv[3]) if len(sys.argv) > 3 else 180.0
prefixes = tuple(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

oracle = json.load(open(oracle_path))
names = sorted(n for n in oracle if prefixes is None or n.startswith(prefixes))

# one warm pass (page cache persists across the per-query children)
run_warm = subprocess.run(
    [sys.executable, "-c",
     f"import duckdb; con=duckdb.connect(); con.execute('SET threads TO 32');\n"
     f"[con.execute(f\"SELECT count(*) FROM '{sf_dir}/{{t}}.parquet'\").fetchall()\n"
     f" for t in ['lineitem','orders','events','documents','embeddings']]"],
    capture_output=True, text=True)
if run_warm.returncode != 0:
    print(run_warm.stderr, file=sys.stderr)

out, timeouts, errors = {}, {}, {}
for name in names:
    # 3 samples * cap + startup slack as the hard wall for a wedged child
    try:
        r = subprocess.run(
            [sys.executable, sys.argv[0], "--one", sf_dir, oracle_path, name, str(cap)],
            capture_output=True, text=True, timeout=3 * cap + 120)
        if r.returncode == 0 and r.stdout.strip():
            d = json.loads(r.stdout.strip().splitlines()[-1])
            if "sec" in d:
                out[name] = d["sec"]
            else:
                timeouts[name] = d["timeout"]
        else:
            tail = (r.stderr.strip().splitlines() or ["no output"])[-1]
            errors[name] = f"rc={r.returncode}: {tail}"[:200]
    except subprocess.TimeoutExpired:
        errors[name] = f"child wall-clock timeout at {3 * cap + 120}s"
    print(f"  {name}: {out.get(name, timeouts.get(name, errors.get(name, '?')))}",
          file=sys.stderr)

print(json.dumps({"engine": "duckdb-1.0.0", "threads": 32, "sf_dir": sf_dir,
                  "cap_sec": cap,
                  "total": round(sum(out.values()), 4),
                  "queries": out, "timeouts": timeouts, "errors": errors}, indent=1))
