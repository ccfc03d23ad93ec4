"""Loader canary: Spark must see the exact same timestamps DuckDB sees.

Round 3 regressed 26/50 driver queries because a Spark version bump changed
how the events.ts parquet TIMESTAMP(NANOS) column surfaced through a forced
LongType schema, and nothing in the suite pinned the loader's absolute
values.  This test is that pin: min/max/count of every table's key columns
must equal DuckDB's on the real driver testdata, so any future reader-
behavior drift fails loudly here instead of silently corrupting 30 queries.
"""

from __future__ import annotations

import duckdb
import pytest

from crypto_datalake_spark.io import load_table


def _duck(sf_dir: str, sql: str):
    return duckdb.sql(sql.format(d=sf_dir)).fetchone()


def test_events_ts_matches_duckdb(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    got = ev.selectExpr("min(ts)", "max(ts)", "count(*)").first()
    want = _duck(sf_dir, "select min(ts), max(ts), count(*) from '{d}/events.parquet'")
    assert tuple(got) == want


def test_events_ts_spans_days_not_minutes(spark, sf_dir):
    # The round-3 failure fingerprint: all timestamps collapsed into ~43
    # minutes of 1970.  Assert the loaded span covers multiple real days.
    row = load_table(spark, sf_dir, "events").selectExpr(
        "year(min(ts)) y", "datediff(max(ts), min(ts)) span_days"
    ).first()
    assert row["y"] >= 2020
    assert row["span_days"] >= 7


@pytest.mark.parametrize(
    "table,col",
    [("orders", "o_orderdate"), ("lineitem", "l_shipdate"), ("documents", "doc_id")],
)
def test_key_columns_match_duckdb(spark, sf_dir, table, col):
    got = load_table(spark, sf_dir, table).selectExpr(
        f"min({col})", f"max({col})", "count(*)"
    ).first()
    want = _duck(
        sf_dir, f"select min({col}), max({col}), count(*) from '{{d}}/{table}.parquet'"
    )
    assert tuple(got) == want
