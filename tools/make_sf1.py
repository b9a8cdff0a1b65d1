#!/usr/bin/env python3
"""Derive a 10x-scale benchmark dataset (sf~1) from /root/testdata/sf0.1.

Driver-side tooling (like check.py): the official testdata is read-only
and ships no sf1, so scaling-exponent measurements replicate sf0.1 ten
times with shifted keys. Foreign keys stay consistent (lineitem ->
orders -> customer, lineitem -> part/supplier); region/nation remain
dimension-sized; document text gets a per-copy suffix token so exact-
and near-dup structure is preserved without an artificial 10-way
exact-duplicate explosion; event timestamps are untouched so window/
sessionize workloads see 10x density, not a longer horizon.

Usage: python3 tools/make_sf1.py [outDir]   (default /root/repo/target/sf1)
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"
COPIES = 10

con = duckdb.connect()
con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS i")


def src(t):
    return f"parquet_scan('{SRC}/{t}.parquet')"


def key_bounds():
    row = con.execute(f"""
        SELECT (SELECT max(o_orderkey) + 1 FROM {src('orders')}),
               (SELECT max(c_custkey) + 1 FROM {src('customer')}),
               (SELECT max(p_partkey) + 1 FROM {src('part')}),
               (SELECT max(s_suppkey) + 1 FROM {src('supplier')}),
               (SELECT max(user_id) + 1 FROM {src('events')}),
               (SELECT max(event_id) + 1 FROM {src('events')}),
               (SELECT max(doc_id) + 1 FROM {src('documents')}),
               (SELECT max(vec_id) + 1 FROM {src('embeddings')})
    """).fetchone()
    return dict(zip(["KO", "KC", "KP", "KS", "KU", "KE", "KD", "KV"], row))


K = key_bounds()

TABLES = {
    # dimension tables stay dimension-sized
    "region": f"SELECT * FROM {src('region')}",
    "nation": f"SELECT * FROM {src('nation')}",
    "customer": f"""
        SELECT c_custkey + i * {K['KC']} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {src('customer')}, copies""",
    "supplier": f"""
        SELECT s_suppkey + i * {K['KS']} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM {src('supplier')}, copies""",
    "part": f"""
        SELECT p_partkey + i * {K['KP']} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM {src('part')}, copies""",
    "orders": f"""
        SELECT o_orderkey + i * {K['KO']} AS o_orderkey,
               o_custkey + i * {K['KC']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, copies""",
    "lineitem": f"""
        SELECT l_orderkey + i * {K['KO']} AS l_orderkey,
               l_partkey + i * {K['KP']} AS l_partkey,
               l_suppkey + i * {K['KS']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}, copies""",
    # ts as int64 nanos — the driver's events layout (Tables.load reads
    # the raw int64 and truncates to micros)
    "events": f"""
        SELECT event_id + i * {K['KE']} AS event_id,
               epoch_ns(ts) AS ts,
               user_id + i * {K['KU']} AS user_id,
               event_type, value, props
        FROM {src('events')}, copies""",
    "documents": f"""
        SELECT doc_id + i * {K['KD']} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE text || ' c' || i END AS text,
               lang, source, n_chars
        FROM {src('documents')}, copies""",
    "embeddings": f"""
        SELECT vec_id + i * {K['KV']} AS vec_id, embedding, label
        FROM {src('embeddings')}, copies""",
}

import os

# r15 (VERDICT r14 #4): pin the write order — without an ORDER BY,
# DuckDB's parallel COPY emits rows in a nondeterministic order, so the
# parquet row layout (and therefore partition-local token/gram
# distributions seen by the text-pipeline benches) varied per
# regeneration, moving sf1 anchors ±20-30% with identical content and
# plans. The sort key is the primary key, so regenerated decade anchors
# now compare like-for-like; the order-independent corpus fingerprint
# is unchanged by construction.
SORT = {
    "region": "r_regionkey", "nation": "n_nationkey",
    "customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
    "orders": "o_orderkey", "lineitem": "l_orderkey, l_linenumber, l_partkey",
    "events": "event_id", "documents": "doc_id", "embeddings": "vec_id",
}

# --no-sort reproduces the pre-r15 nondeterministic layout, for A/B
# measurement of layout sensitivity only (SCALE.md adjudication)
NO_SORT = "--no-sort" in sys.argv

os.makedirs(OUT, exist_ok=True)
for name, q in TABLES.items():
    out = f"{OUT}/{name}.parquet"
    sel = q if NO_SORT else f"SELECT * FROM ({q}) ORDER BY {SORT[name]}"
    con.execute(f"COPY ({sel}) TO '{out}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM parquet_scan('{out}')").fetchone()[0]
    print(f"{name}: {n} rows -> {out}")
