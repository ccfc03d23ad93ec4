"""The correctness gate, locally: every catalog query vs its DuckDB oracle.

This mirrors the driver's CORRECTNESS check (row count + column names +
order-insensitive values). We additionally require 100% bit-exact cells —
stricter than necessary, but it is the regime our determinism discipline
targets, and bit-exactness here means the driver's hash compare passes
regardless of how it quantises.
"""

from __future__ import annotations

import pytest

from crypto_datalake_spark.queries import REGISTRY
from tests.oracle import compare, duckdb_conn, exact_fraction


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY.keys()))
def test_query_matches_oracle(name, spark, sf_dir, con):
    q = REGISTRY[name]
    if q.sql is None:
        df = q.fn(spark, sf_dir)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    df = q.fn(spark, sf_dir)
    ok, msg = compare(df, con, q.sql)
    assert ok, f"{name}: {msg}"
    exact, total = exact_fraction(df, con, q.sql)
    assert exact == total, f"{name}: only {exact}/{total} cells bit-exact"
