#!/usr/bin/env python3
"""Deterministic scale-up of the driver's sf0.1 testdata (default 10x -> "sf1").

The driver generates /root/testdata/sf{0.001,0.01,0.1} and stops there; the
scale-curve evidence (BASELINE.md) needs one decade more. This tool derives a
larger set FROM sf0.1 so distributions stay comparable:

 - TPC-H-ish tables (customer/supplier/part/orders/lineitem/events): replicated
   `factor` times with key shifts that preserve FK integrity; name columns that
   embed the key are regenerated so uniqueness properties survive (cursor
   pagination pages on c_name). nation/region are dimensions - copied as-is.
 - SKEW PLANT: in copies 1..factor-1, orders rows with o_orderkey % 4 == 0
   point at hot customer 7 - a genuine heavy-hitter ((factor-1)/factor * 25%
   = 22.5% of all orders at factor 10) so salted-vs-plain shuffle joins can
   be MEASURED, not argued. Copy 0 is left untouched. Oracles recompute on
   the same files, so every query stays green.
 - documents: generated fresh (same ~31-word vocabulary, same length range,
   same lang/source mix as sf0.1, seeded) at rows_sf01 * factor. Replicating
   texts verbatim would make 90% of the corpus exact dups and turn every dedup
   benchmark degenerate; fresh word-soup keeps dup rates realistic (~0.2%
   planted full-text dups, like the driver's).
 - embeddings: generated fresh at rows_sf01 * factor - 10 label centroids +
   gaussian noise (the sf0.1 shape), float32[64].

Deterministic: fixed seeds, no wall-clock input. Output dir must not exist.
Usage: gen_sf.py [out_dir] [factor]   (defaults: /root/repo/testdata/sf1, 10)
"""
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/sf1"
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10

# sf0.1 key strides (max key + 1), verified against the parquet files below
N_CUST, N_SUPP, N_PART, N_ORD, N_EVT = 15000, 1000, 20000, 150000, 100000
HOT_CUSTKEY = 7

assert not os.path.exists(OUT), f"{OUT} already exists - refusing to overwrite"
os.makedirs(OUT)

con = duckdb.connect()
con.execute("SET threads TO 32")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'")

# strides must match reality or FK integrity silently breaks
for table, key, stride in [("customer", "c_custkey", N_CUST),
                           ("supplier", "s_suppkey", N_SUPP),
                           ("part", "p_partkey", N_PART),
                           ("orders", "o_orderkey", N_ORD),
                           ("events", "event_id", N_EVT),
                           ("events", "user_id", 1500)]:
    mx = con.execute(f"SELECT max({key}) FROM {table}").fetchone()[0]
    assert mx == stride - 1, f"{table}.{key} max {mx} != stride-1 {stride - 1}"

def write(sql: str, name: str) -> None:
    con.execute(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

write("SELECT * FROM region", "region")
write("SELECT * FROM nation", "nation")

write(f"""
  SELECT c_custkey + i * {N_CUST} AS c_custkey,
         'Customer#' || lpad(CAST(c_custkey + i * {N_CUST} AS VARCHAR), 9, '0') AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM customer, range({FACTOR}) t(i)""", "customer")

write(f"""
  SELECT s_suppkey + i * {N_SUPP} AS s_suppkey,
         'Supplier#' || lpad(CAST(s_suppkey + i * {N_SUPP} AS VARCHAR), 9, '0') AS s_name,
         s_nationkey, s_acctbal
  FROM supplier, range({FACTOR}) t(i)""", "supplier")

# p_name is adjective+noun (repeats already exist at sf0.1) - no key inside
write(f"""
  SELECT p_partkey + i * {N_PART} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM part, range({FACTOR}) t(i)""", "part")

# the skew plant: replica copies redirect every 4th order to one hot customer
write(f"""
  SELECT o_orderkey + i * {N_ORD} AS o_orderkey,
         CASE WHEN i > 0 AND o_orderkey % 4 = 0 THEN {HOT_CUSTKEY}
              ELSE o_custkey + i * {N_CUST} END AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders, range({FACTOR}) t(i)""", "orders")

write(f"""
  SELECT l_orderkey + i * {N_ORD} AS l_orderkey,
         l_partkey + i * {N_PART} AS l_partkey,
         l_suppkey + i * {N_SUPP} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM lineitem, range({FACTOR}) t(i)""", "lineitem")

# same one-month event-time window at factor x density (keeps window plans
# comparable); user population scales with the copies. Written via pyarrow
# with a timestamp[ns] cast: the driver's events are parquet TIMESTAMP(NANOS)
# and Tables.load reads them through the nanosAsLong shim, which FAILS on a
# plain-micros column — and DuckDB 1.0's parquet writer only emits micros.
evt = con.execute(f"""
  SELECT event_id + i * {N_EVT} AS event_id, ts,
         user_id + i * 1500 AS user_id, event_type, value, props
  FROM events, range({FACTOR}) t(i)""").arrow()
evt = evt.set_column(evt.schema.get_field_index("ts"),
                     pa.field("ts", pa.timestamp("ns")),
                     evt.column("ts").cast(pa.timestamp("ns")))
# small row groups everywhere pyarrow writes: a single-row-group file is
# UNSPLITTABLE for Spark (byte-range splits land on row-group boundaries),
# which serializes every scan of that table onto one core
pq.write_table(evt, f"{OUT}/events.parquet", row_group_size=65536)
print(f"events: {evt.num_rows} rows")

# ---- documents: fresh word-soup, driver-compatible statistics ----------------
rng = np.random.default_rng(42)
vocab = [r[0] for r in con.execute(
    "SELECT DISTINCT unnest(regexp_split_to_array(text, ' ')) AS w "
    "FROM documents ORDER BY w").fetchall()]
langs, lang_p = ["en", "de", "es", "fr", "zh"], [0.41, 0.14, 0.15, 0.15, 0.15]
n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0] * FACTOR

tokens_per_doc = rng.integers(8, 111, size=n_docs)
texts = [" ".join(rng.choice(vocab, size=k)) for k in tokens_per_doc]
# ~0.2% planted exact dups of an earlier doc (the driver plants ~0.16%)
for j in rng.choice(np.arange(1, n_docs), size=n_docs // 500, replace=False):
    texts[j] = texts[rng.integers(0, j)]
doc_lang = rng.choice(langs, size=n_docs, p=lang_p)
doc_src = np.char.add("src", rng.integers(0, 20, size=n_docs).astype(str))
pq.write_table(pa.table({
    "doc_id": pa.array(np.arange(n_docs), pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(doc_lang, pa.string()),
    "source": pa.array(doc_src, pa.string()),
    "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
}), f"{OUT}/documents.parquet", row_group_size=4096)
print(f"documents: {n_docs} rows")

# ---- embeddings: 10 label clusters + noise, float32[64] ----------------------
n_vec = con.execute("SELECT count(*) FROM embeddings").fetchone()[0] * FACTOR
dim, n_labels = 64, 10
centers = rng.standard_normal((n_labels, dim))
labels = rng.integers(0, n_labels, size=n_vec)
vecs = (centers[labels] + 0.3 * rng.standard_normal((n_vec, dim))).astype(np.float32)
pq.write_table(pa.table({
    "vec_id": pa.array(np.arange(n_vec), pa.int64()),
    "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    "label": pa.array(labels.astype(np.int32), pa.int32()),
}), f"{OUT}/embeddings.parquet", row_group_size=2048)
print(f"embeddings: {n_vec} rows")
print(f"done -> {OUT}")
