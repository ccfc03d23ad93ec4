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
    # Run the Spark side FIRST: surrogate oracles read a persisted fitted
    # artifact (trained centroids/codebooks/coefficients) that the query's
    # own run builds on first use.
    df = q.fn(spark, sf_dir)
    sql = q.resolved_sql(sf_dir)
    if sql is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    ok, msg = compare(df, con, sql)
    assert ok, f"{name}: {msg}"
    exact, total = exact_fraction(df, con, sql)
    assert exact == total, f"{name}: only {exact}/{total} cells bit-exact"
