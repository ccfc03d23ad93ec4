"""Ordered window functions — SURVEY.md §2.5 (W1-W6) + derived fields §2.10.

Cumulative/windowed sums go through DECIMAL so the result is independent of
the engine's accumulation scheme (DuckDB uses segment trees, Spark running
accumulation — plain double sums differ in final bits).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crypto_datalake_spark.ops.agg import last_nonnull
from crypto_datalake_spark.ops.fill import ffill
from crypto_datalake_spark.ops.time import bucket_floor, minute_spine
from crypto_datalake_spark.queries.common import SQL_SPINE, SPINE_END, SPINE_START, events
from crypto_datalake_spark.queries.registry import register

def _by_user():
    # built lazily: Window objects need an active session
    return Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())


@register(
    "w1_log_return",
    sql="""
    WITH w AS (
      SELECT event_id, user_id, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    )
    SELECT event_id, user_id,
           CASE WHEN value > 0 AND prev > 0
                THEN round(ln(value) - ln(prev), 7) END AS log_return
    FROM w
    """,
    doc="W1: partitioned lag-diff log return over explicit event order; "
    "NULL unless both prices are positive (log returns are undefined "
    "otherwise, and ANSI mode makes the unguarded form a runtime error "
    "on zero values) (ref: transforms/minute_builder.py:236-241).",
)
def w1_log_return(spark, sf_dir):
    ev = events(spark, sf_dir)
    prev = F.lag("value", 1).over(_by_user())
    return ev.select(
        "event_id",
        "user_id",
        F.when(
            (F.col("value") > 0) & (prev > 0),
            F.round(F.log(F.col("value")) - F.log(prev), 7),
        ).alias("log_return"),
    )


@register(
    "w2_realized_vol",
    sql="""
    WITH w AS (
      SELECT user_id, ts, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    lr AS (
      SELECT user_id, ts,
             CASE WHEN value > 0 AND prev > 0 THEN ln(value / prev) END AS r
      FROM w
    )
    SELECT user_id,
           TIMESTAMP '1970-01-01 00:00:00'
             + to_seconds(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)) AS hour_ts,
           round(sqrt(sum(r * r)), 6) AS realized_vol,
           CAST(count(r) AS BIGINT) AS n_returns
    FROM lr
    GROUP BY 1, 2
    """,
    doc="W2: close-to-close realized volatility — lag within partition, "
    "then sqrt(Σ log-return²) per hour bucket; first row contributes NULL "
    "(ref: aggregator/aggregation_rules.py:142, 162-167, 222, 254). "
    "Rounded(6) on both sides: log/sqrt are correctly-rounded to ~1 ulp "
    "but not bit-identical across libm implementations.",
)
def w2_realized_vol(spark, sf_dir):
    ev = events(spark, sf_dir)
    prev = F.lag("value", 1).over(_by_user())
    lr = ev.select(
        "user_id",
        "ts",
        F.when(
            (F.col("value") > 0) & (prev > 0), F.log(F.col("value") / prev)
        ).alias("r"),
    )
    return (
        lr.withColumn("hour_ts", bucket_floor("ts", 60))
        .groupBy("user_id", "hour_ts")
        .agg(
            F.round(F.sqrt(F.sum(F.col("r") * F.col("r"))), 6).alias("realized_vol"),
            F.count("r").alias("n_returns"),
        )
    )


@register(
    "w3_lag_delta",
    sql="""
    WITH w AS (
      SELECT event_id, user_id, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    )
    SELECT event_id, user_id,
           value - prev AS delta_value,
           CASE WHEN value > 0 AND prev > 0
                THEN round(abs(ln(value / prev)), 7) END AS abs_log_move
    FROM w
    """,
    doc="W3: bar-over-bar deltas, NULL on the first row; the log-move "
    "column additionally requires positive prices (undefined otherwise) "
    "(ref: live_data_api_service/service.py:1188-1257 delta_* block).",
)
def w3_lag_delta(spark, sf_dir):
    ev = events(spark, sf_dir)
    prev = F.lag("value", 1).over(_by_user())
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - prev).alias("delta_value"),
        F.when(
            (F.col("value") > 0) & (prev > 0),
            F.round(F.abs(F.log(F.col("value") / prev)), 7),
        ).alias("abs_log_move"),
    )


@register(
    "w4_cumsum",
    sql="""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(28,6)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_value
    FROM events
    """,
    doc="W4: cumulative sum (the CVD pattern) over explicit order "
    "(ref: live_data_api_service/aggregation.py:222-227). Decimal "
    "accumulation → identical under any accumulation scheme.",
)
def w4_cumsum(spark, sf_dir):
    ev = events(spark, sf_dir)
    w = _by_user().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double").alias("cum_value"),
    )


@register(
    "w5_ffill_limited",
    sql=f"""
    WITH spine AS ({SQL_SPINE}),
    sparse AS (
      SELECT date_trunc('minute', ts) AS minute_ts, arg_max(value, event_id) AS v
      FROM events WHERE event_type = 'signup'
        AND ts >= TIMESTAMP '{SPINE_START}' AND ts < TIMESTAMP '{SPINE_END}'
      GROUP BY 1
    )
    SELECT s.slot_ts,
           last_value(sp.v IGNORE NULLS) OVER (
             ORDER BY s.slot_ts ROWS BETWEEN 60 PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM spine s LEFT JOIN sparse sp ON sp.minute_ts = s.slot_ts
    """,
    doc="W5: LIMITED forward-fill (60 rows) on a dense minute spine — "
    "last-non-null over a row-bounded frame; row-bounded == time-bounded "
    "only because the spine is dense, same contract as the reference "
    "(ref: transforms/minute_builder.py:624-642, ffill limit 60).",
)
def w5_ffill_limited(spark, sf_dir):
    spine = minute_spine(spark, SPINE_START, SPINE_END, 1)
    sparse = (
        events(spark, sf_dir)
        .where(
            (F.col("event_type") == "signup")
            & (F.col("ts") >= F.lit(SPINE_START).cast("timestamp_ntz"))
            & (F.col("ts") < F.lit(SPINE_END).cast("timestamp_ntz"))
        )
        .groupBy("minute_ts")
        .agg(last_nonnull("value", "event_id").alias("v"))
    )
    joined = spine.join(sparse, spine.slot_ts == sparse.minute_ts, "left").select(
        "slot_ts", "v"
    )
    return ffill(joined, ["v"], order_by=["slot_ts"], limit=60).withColumnRenamed(
        "v", "filled_value"
    )


@register(
    "w6_topk_recent",
    sql="""
    SELECT event_id, user_id, ts, value
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 100
    """,
    doc="W6: tail/top-k by time with deterministic tie-break "
    "(ref: live_data_api_service/aggregation.py:170-171 tail(limit)). "
    "orderBy+limit compiles to TakeOrderedAndProject — per-partition top-k "
    "then driver merge, no full sort at scale.",
)
def w6_topk_recent(spark, sf_dir):
    ev = events(spark, sf_dir)
    return ev.orderBy(F.col("ts").desc(), F.col("event_id").desc()).limit(100).select(
        "event_id", "user_id", "ts", "value"
    )
