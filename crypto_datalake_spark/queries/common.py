"""Shared helpers/constants for the query catalog.

The generic testdata (TESTDATA.md) stands in for the reference's domain
tables per FIXTURES.md §5: ``events`` plays the raw trade/event streams,
``lineitem``/``orders`` play the bar tables, timestamps span Jan 2024
(events) / 1995-2001 (TPC-H-ish tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_datalake_spark.io import load_table
from crypto_datalake_spark.ops.time import bucket_floor

# Dense-spine windows used by spine/as-of/ffill queries.  Events exist from
# 2024-01-01 at every SF (larger SFs extend further), so a fixed first-week
# window is valid at every scale factor.
SPINE_START = "2024-01-01 00:00:00"
SPINE_END = "2024-01-08 00:00:00"  # exclusive
SPINE_END_INCLUSIVE = "2024-01-07 23:59:00"  # DuckDB generate_series is inclusive

# DuckDB fragment for the same spine (column name slot_ts)
SQL_SPINE = (
    "SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00', "
    f"TIMESTAMP '{SPINE_END_INCLUSIVE}', INTERVAL 1 MINUTE)) AS slot_ts"
)


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with a minute-floored NTZ bucket column."""
    return load_table(spark, sf_dir, "events").withColumn(
        "minute_ts", bucket_floor("ts", 1)
    )


# Tables whose queries are dominated by per-row expression work
# (shingling, minhash banks, gram hashing, 384-dim vector math) rather
# than scan/shuffle volume — worth spreading an under-parallel scan for.
_PER_ROW_HEAVY = {"documents", "embeddings"}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = load_table(spark, sf_dir, name)
    return spread(df) if name in _PER_ROW_HEAVY else df


def spread(df: DataFrame) -> DataFrame:
    """Spread an under-parallel scan across the executor cores before
    per-row-HEAVY compute (shingling, minhash banks, gram hashing,
    vector math).

    The test tables are single-row-group parquet files, so Spark's file
    splitting hands the whole scan to ONE task and everything up to the
    first exchange runs single-threaded — measured 1.5-4x on the
    shingle+minhash bank at sf0.1.  The condition makes it scale-safe:
    a production table is thousands of row groups, the scan already has
    >= defaultParallelism splits, and this is the identity — it never
    inserts a full-data shuffle at 100 TB.  Only for batch frames whose
    downstream cost is dominated by per-row expression work; a plain
    filter/agg never needs it (the shuffle would cost more than it
    saves)."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
