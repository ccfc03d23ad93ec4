#!/usr/bin/env python
"""Synthesize sf1 (10x sf0.1) for scale validation — NOT driver testdata.

The driver provides sf0.001/0.01/0.1 (TESTDATA.md, read-only); the
100 TB claims in SCALE.md rest on plan-shape tests at those SFs, so this
builds a 10x dataset to empirically check per-query scaling factors
(VERDICT r5 item 1).  Scaling semantics mirror how the driver's data
scales between its own SFs (verified: events sf0.01 and sf0.1 cover the
SAME 30-day window at different density):

- events: 10 copies in the same time window, event_id/user_id offset per
  copy (density scales, window fixed — spine-window queries see 10x
  rows/minute).
- lineitem/orders/customer/supplier/part: 10 shard-consistent copies
  (every key offset by copy*stride, FKs shifted together) — TPC-H-style
  density scaling, date ranges fixed.  region/nation stay fixed dims.
- documents: 10 shards with DISJOINT token vocabularies (copy i suffixes
  every token with ~i) — dedup totals scale linearly instead of every
  doc gaining 9 verbatim clones (which would quadratically inflate pair
  outputs and measure the data, not the engine). n_chars recomputed.
- embeddings: corpus rows copied with vec_id offset and the vector
  ROTATED by copy index (norm/distribution preserved, cross-copy cosine
  decorrelated — same reasoning); the single query row (vec_id=0) stays
  unique.

Output parquet is written by DuckDB with default row groups, so sf1
scans split across tasks (the production shape) unlike the single-row-
group driver files.
"""

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scale_data", "sf1"
)
COPIES = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW copies AS SELECT unnest(generate_series(0, {COPIES - 1})) AS c")


def write(name: str, sql: str) -> None:
    out = os.path.join(DST, f"{name}.parquet")
    con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, COMPRESSION ZSTD)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"{name}: {n} rows")


def src(name: str) -> str:
    return f"read_parquet('{SRC}/{name}.parquet')"


# fixed dims
for t in ("region", "nation"):
    write(t, f"SELECT * FROM {src(t)}")

# key strides (max key + 1 per table so shards never collide)
CK, SK, PK, OK_, EK, UK, DK, VK = [
    con.execute(q).fetchone()[0] + 1
    for q in (
        f"SELECT max(c_custkey) FROM {src('customer')}",
        f"SELECT max(s_suppkey) FROM {src('supplier')}",
        f"SELECT max(p_partkey) FROM {src('part')}",
        f"SELECT max(o_orderkey) FROM {src('orders')}",
        f"SELECT max(event_id) FROM {src('events')}",
        f"SELECT max(user_id) FROM {src('events')}",
        f"SELECT max(doc_id) FROM {src('documents')}",
        f"SELECT max(vec_id) FROM {src('embeddings')}",
    )
]

write("customer", f"SELECT c_custkey + c*{CK} AS c_custkey, COLUMNS(* EXCLUDE c_custkey) FROM {src('customer')}, copies")
write("supplier", f"SELECT s_suppkey + c*{SK} AS s_suppkey, COLUMNS(* EXCLUDE s_suppkey) FROM {src('supplier')}, copies")
write("part", f"SELECT p_partkey + c*{PK} AS p_partkey, COLUMNS(* EXCLUDE p_partkey) FROM {src('part')}, copies")
write(
    "orders",
    f"SELECT o_orderkey + c*{OK_} AS o_orderkey, o_custkey + c*{CK} AS o_custkey, "
    f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM {src('orders')}, copies",
)
write(
    "lineitem",
    f"SELECT l_orderkey + c*{OK_} AS l_orderkey, l_partkey + c*{PK} AS l_partkey, "
    f"l_suppkey + c*{SK} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
    f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}, copies",
)
write(
    "events",
    f"SELECT event_id + c*{EK} AS event_id, ts, user_id + c*{UK} AS user_id, "
    f"event_type, value, props FROM {src('events')}, copies",
)
write(
    "documents",
    f"""
    SELECT doc_id + c*{DK} AS doc_id,
           CASE WHEN c = 0 THEN text
                ELSE array_to_string(list_transform(string_split(text, ' '),
                                                    t -> t || '~' || c), ' ')
           END AS text,
           lang, source,
           CASE WHEN c = 0 THEN n_chars
                ELSE len(array_to_string(list_transform(string_split(text, ' '),
                                                        t -> t || '~' || c), ' '))
           END AS n_chars
    FROM {src('documents')}, copies
    """,
)
write(
    "embeddings",
    f"""
    SELECT vec_id + c*{VK} AS vec_id,
           CASE WHEN c = 0 THEN embedding
                ELSE embedding[c+1:] || embedding[1:c]
           END AS embedding,
           label
    FROM {src('embeddings')}, copies
    WHERE NOT (c > 0 AND vec_id = 0)  -- exactly one query row corpus-wide
    """,
)
print("done ->", DST)
