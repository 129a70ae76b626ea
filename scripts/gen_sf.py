#!/usr/bin/env python3
"""Synthetic scale-up generator for the isolated scale smoke (driver-side
tooling, like check.py — NOT part of the Spark library).

Replicates every sf0.1 table N times (default 10 -> "sf1") with
FK-CONSISTENT key offsets, so every join/query shape survives:

- region/nation: fixed dimensions, copied once (keys referenced by
  customer/supplier stay dense).
- customer/supplier/part/orders/lineitem: replica i offsets each key
  domain by i * (its sf0.1 max), preserving orderkey->custkey,
  lineitem->(orderkey, partkey, suppkey) references within the replica.
- events: event_id/user_id offset per replica; ts preserved (the time
  axis does not grow with corpus size — more users, same window).
- documents: doc_id offset; replica i > 0 appends a per-replica suffix
  token so replicas are NEAR- not exact-duplicates (a deliberately
  duplication-heavy corpus: every doc is a 10-member near-dup group,
  harder-than-linear candidate structure for the dedup families).
- embeddings: vec_id offset; replica vectors keep identical values, so
  every vector sits in a 10-member exact-dup group (the IVF/LSH cell
  structure gets maximally dense cells — the adversarial case for
  candidate-set linearity).

Usage: python3 scripts/gen_sf.py [OUT_DIR] [SRC_DIR] [REPLICAS]
Defaults: /tmp/sf1 /root/testdata/sf0.1 10
"""
import sys

import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

con = duckdb.connect()
con.execute(f"CREATE TABLE reps AS SELECT unnest(range({N})) AS i")


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def write(t, sql):
    con.execute(f"COPY ({sql}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")


import os

os.makedirs(OUT, exist_ok=True)

# key domain strides: max(key)+1 so replica i's key 0 never collides with
# replica i-1's max key (the sf0.1 domains are 0-based dense)
mx = {}
for t, k in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
             ("part", "p_partkey"), ("orders", "o_orderkey"),
             ("events", "event_id"), ("documents", "doc_id"),
             ("embeddings", "vec_id")]:
    mx[t] = con.execute(f"SELECT max({k}) FROM {src(t)}").fetchone()[0] + 1
umax = con.execute(f"SELECT max(user_id) FROM {src('events')}").fetchone()[0] + 1

write("region", f"SELECT * FROM {src('region')}")
write("nation", f"SELECT * FROM {src('nation')}")
write("customer", f"""
  SELECT c_custkey + i * {mx['customer']} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM {src('customer')} CROSS JOIN reps""")
write("supplier", f"""
  SELECT s_suppkey + i * {mx['supplier']} AS s_suppkey, s_name, s_nationkey,
         s_acctbal
  FROM {src('supplier')} CROSS JOIN reps""")
write("part", f"""
  SELECT p_partkey + i * {mx['part']} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM {src('part')} CROSS JOIN reps""")
write("orders", f"""
  SELECT o_orderkey + i * {mx['orders']} AS o_orderkey,
         o_custkey + i * {mx['customer']} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')} CROSS JOIN reps""")
write("lineitem", f"""
  SELECT l_orderkey + i * {mx['orders']} AS l_orderkey,
         l_partkey + i * {mx['part']} AS l_partkey,
         l_suppkey + i * {mx['supplier']} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')} CROSS JOIN reps""")
write("events", f"""
  SELECT event_id + i * {mx['events']} AS event_id, ts,
         user_id + i * {umax} AS user_id, event_type, value, props
  FROM {src('events')} CROSS JOIN reps""")
write("documents", f"""
  SELECT doc_id + i * {mx['documents']} AS doc_id,
         CASE WHEN i = 0 THEN text ELSE text || ' rep' || i END AS text,
         lang, source, n_chars + CASE WHEN i = 0 THEN 0 ELSE 4 + len(CAST(i AS VARCHAR)) END AS n_chars
  FROM {src('documents')} CROSS JOIN reps""")
write("embeddings", f"""
  SELECT vec_id + i * {mx['embeddings']} AS vec_id, embedding, label
  FROM {src('embeddings')} CROSS JOIN reps""")
print("done ->", OUT)
