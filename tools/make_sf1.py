#!/usr/bin/env python3
"""Generate a 10x scale-up of /root/testdata/sf0.1 for local scale
validation (VERDICT r4 item 1: prove the suite one decade up).

FK-consistent key-offset replication: every fact/dim key is offset by
k * (max_key + 1) per copy k, so each copy is an internally-consistent
star; nation/region stay fixed (TPC-H keeps dims constant across SF).
Timestamps are left unchanged — scaling densifies the same time span,
which is exactly how event-rate growth looks in production.

Usage: make_sf1.py [K] [SRC] [DST] [tables]
  (defaults: 10 sf0.1 /tmp/sf1.0 all; tables = comma list to generate a
   subset, e.g. "region,nation,events,documents,embeddings" for the sf10
   spot-checks that never touch the TPC-H facts)
"""
import sys

import duckdb

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
DST = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1.0"
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

con = duckdb.connect()
con.execute(f"PRAGMA threads={int(__import__('os').environ.get('MAKE_SF_THREADS', '8'))}")
# K=1000 x lineitem (600M rows) OOM-kills the box without a cap:
# preserve_insertion_order=true makes COPY buffer the whole result, and
# DuckDB's default memory_limit (80% RAM) collides with any live Spark
# JVM. Row order of the generated parquet is irrelevant (both engines
# read the same files), so no_order + a hard cap + disk spill is safe.
_env = __import__('os').environ
if _env.get("MAKE_SF_MEM"):
    con.execute(f"SET memory_limit='{_env['MAKE_SF_MEM']}'")
if _env.get("MAKE_SF_TMP"):
    __import__('os').makedirs(_env["MAKE_SF_TMP"], exist_ok=True)
    con.execute(f"SET temp_directory='{_env['MAKE_SF_TMP']}'")
if _env.get("MAKE_SF_NO_ORDER"):
    con.execute("SET preserve_insertion_order=false")
con.execute(f"CREATE TABLE ks AS SELECT unnest(range({K})) AS k")


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def off(t, c):
    return con.execute(
        f"SELECT max({c}) + 1 FROM {src(t)}").fetchone()[0]


E = off("events", "event_id")
U = off("events", "user_id")
D = off("documents", "doc_id")
V = off("embeddings", "vec_id")
C = off("customer", "c_custkey")
O = off("orders", "o_orderkey")
P = off("part", "p_partkey")
S = off("supplier", "s_suppkey")

jobs = {
    "region": "SELECT * FROM {t}",
    "nation": "SELECT * FROM {t}",
    "events": f"""SELECT event_id + k * {E} AS event_id, ts,
                    user_id + k * {U} AS user_id, event_type, value, props
                  FROM {{t}} CROSS JOIN ks""",
    "documents": f"""SELECT doc_id + k * {D} AS doc_id, text, lang, source,
                       n_chars
                     FROM {{t}} CROSS JOIN ks""",
    "embeddings": f"""SELECT vec_id + k * {V} AS vec_id, embedding, label
                      FROM {{t}} CROSS JOIN ks""",
    "customer": f"""SELECT c_custkey + k * {C} AS c_custkey, c_name,
                      c_nationkey, c_acctbal, c_mktsegment
                    FROM {{t}} CROSS JOIN ks""",
    "supplier": f"""SELECT s_suppkey + k * {S} AS s_suppkey, s_name,
                      s_nationkey, s_acctbal
                    FROM {{t}} CROSS JOIN ks""",
    "part": f"""SELECT p_partkey + k * {P} AS p_partkey, p_name, p_brand,
                  p_type, p_size, p_retailprice
                FROM {{t}} CROSS JOIN ks""",
    "orders": f"""SELECT o_orderkey + k * {O} AS o_orderkey,
                    o_custkey + k * {C} AS o_custkey, o_orderstatus,
                    o_totalprice, o_orderdate, o_orderpriority
                  FROM {{t}} CROSS JOIN ks""",
    "lineitem": f"""SELECT l_orderkey + k * {O} AS l_orderkey,
                      l_partkey + k * {P} AS l_partkey,
                      l_suppkey + k * {S} AS l_suppkey, l_linenumber,
                      l_quantity, l_extendedprice, l_discount, l_tax,
                      l_returnflag, l_linestatus, l_shipdate
                    FROM {{t}} CROSS JOIN ks""",
}

import os

os.makedirs(DST, exist_ok=True)
for t, q in jobs.items():
    if ONLY is not None and t not in ONLY:
        continue
    sql = q.format(t=src(t))
    con.execute(
        f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
    ).fetchone()[0]
    print(f"{t}: {n} rows")
print("done ->", DST)
