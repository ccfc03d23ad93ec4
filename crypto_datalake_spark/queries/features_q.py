"""Tabular feature engineering over events: exact quantile binning and
leave-one-out target encoding.

The featurization tier a training-data pipeline applies to structured
columns (the text tier has tokenizers/quality; this is its numeric
sibling).  Both operators are exact and deterministic so they carry
full static DuckDB oracles:

- ``feature_quantile_bins`` — per-event_type quartile edges by the
  nearest-rank convention (the engine's a8/W7 percentile — NOT
  Spark's interpolating ``percentile``), then each row binned 0-3 by a
  broadcast join against the handful-of-rows edge table.  At 100 TB:
  one window sort-shuffle per group to rank (the exact path; swap in
  ``percentile_approx`` when edges may be approximate), then the
  binning itself is a broadcast map pass.

- ``feature_target_encode`` — per-category mean of the target with the
  category's own row EXCLUDED (leave-one-out: te = (Σ − x)/(n − 1)),
  the standard leakage guard for categorical encodings.  One
  aggregation to category sums (decimal — exact, order-independent),
  one broadcast join back, row-local arithmetic; NULL for singleton
  categories and NULL targets (their exclusion would divide by zero /
  poison the sum).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_datalake_spark.io import load_table
from crypto_datalake_spark.ops.agg import DEC, dec
from crypto_datalake_spark.queries.registry import register

_QS = (0.25, 0.5, 0.75)


@register(
    "feature_quantile_bins",
    sql="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events WHERE value IS NOT NULL
    ),
    edges AS (
      SELECT event_type,
             max(CASE WHEN rk = CAST(ceil(CAST(0.25 AS DOUBLE) * n) AS BIGINT)
                      THEN value END) AS q1,
             max(CASE WHEN rk = CAST(ceil(CAST(0.5 AS DOUBLE) * n) AS BIGINT)
                      THEN value END) AS q2,
             max(CASE WHEN rk = CAST(ceil(CAST(0.75 AS DOUBLE) * n) AS BIGINT)
                      THEN value END) AS q3
      FROM ranked GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           CAST(CASE WHEN e.value IS NULL THEN NULL
                     WHEN e.value <= x.q1 THEN 0
                     WHEN e.value <= x.q2 THEN 1
                     WHEN e.value <= x.q3 THEN 2
                     ELSE 3 END AS BIGINT) AS bin
    FROM events e JOIN edges x USING (event_type)
    """,
    doc="Exact quantile binning (feature discretization): per-event_type "
    "quartile edges by the nearest-rank convention (value at rank "
    "ceil(p·n) — the engine's a8/W7 percentile), each row assigned bin "
    "0-3 by closed-upper-edge comparison against the broadcast "
    "groups×3 edge table; NULL values keep NULL bins. The exact path "
    "costs one per-group rank window; percentile_approx is the "
    "documented approximate swap when edges may drift. Full static "
    "DuckDB oracle.",
)
def feature_quantile_bins(spark, sf_dir):
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    # ONE per-group rank window (the oracle's `ranked` CTE shape), then
    # all three edges as conditional aggregates of a single groupBy —
    # not one sort-shuffle per quartile.
    nn = e.where(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(F.col("value").asc())
    wn = Window.partitionBy("event_type")
    ranked = nn.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("__rk"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    edges = ranked.groupBy("event_type").agg(
        *[
            F.max(
                F.when(
                    F.col("__rk") == F.ceil(F.lit(p) * F.col("__n")),
                    F.col("value"),
                )
            ).alias(f"q{i}")
            for i, p in enumerate(_QS, start=1)
        ]
    )
    b = (
        F.when(F.col("value").isNull(), F.lit(None))
        .when(F.col("value") <= F.col("q1"), 0)
        .when(F.col("value") <= F.col("q2"), 1)
        .when(F.col("value") <= F.col("q3"), 2)
        .otherwise(3)
    )
    return e.join(F.broadcast(edges), "event_type").select(
        "event_id", "event_type", "value", b.cast("long").alias("bin")
    )


@register(
    "feature_target_encode",
    sql="""
    WITH s AS (
      SELECT event_type,
             sum(CAST(value AS DECIMAL(28,6))) AS vsum,
             CAST(count(value) AS BIGINT) AS nn
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           CASE WHEN e.value IS NOT NULL AND s.nn > 1
                THEN (CAST(s.vsum AS DOUBLE) - e.value)
                     / CAST(s.nn - 1 AS DOUBLE)
           END AS te
    FROM events e JOIN s USING (event_type)
    """,
    doc="Leave-one-out target encoding: each row's category mean of the "
    "target EXCLUDING the row itself — te = (Σ − x)/(n − 1) — the "
    "standard leakage guard for categorical features. Category sums "
    "are exact decimals (order-independent, oracle-hash-stable); the "
    "subtraction and division are then plain IEEE doubles. One "
    "category aggregate broadcast back, row-local arithmetic; NULL for "
    "NULL targets and singleton categories. Full static DuckDB oracle.",
)
def feature_target_encode(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    s = e.groupBy("event_type").agg(
        F.sum(dec("value", DEC)).alias("vsum"),
        F.count("value").alias("nn"),
    )
    te = F.when(
        F.col("value").isNotNull() & (F.col("nn") > 1),
        (F.col("vsum").cast("double") - F.col("value"))
        / (F.col("nn") - 1).cast("double"),
    )
    return e.join(F.broadcast(s), "event_type").select(
        "event_id", "event_type", "value", te.alias("te")
    )
