"""Indicator + serving-layer queries — SURVEY.md §2.9 (U1/U2), §2.10
derived fields, §2.6 O2, §2.2 P8.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crypto_datalake_spark.functions.ema import ema_by_group
from crypto_datalake_spark.functions.pivots import traditional_pivots
from crypto_datalake_spark.ops.agg import dsum, last_nonnull, ratio_of_sums
from crypto_datalake_spark.ops.time import bucket_floor, minute_spine
from crypto_datalake_spark.queries.common import SPINE_END, SPINE_START, events
from crypto_datalake_spark.queries.registry import register

_SQL_HOUR_SPINE = (
    "SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00', "
    "TIMESTAMP '2024-01-07 23:00:00', INTERVAL 1 HOUR)) AS hour_ts"
)


@register(
    "o2_union_relaxed",
    sql="""
    SELECT event_id, user_id, value, NULL::TIMESTAMP AS minute_ts, 'era1' AS era
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, user_id, value, date_trunc('minute', ts) AS minute_ts, 'era2' AS era
    FROM events WHERE event_type = 'click'
    """,
    doc="O2: vertical concat with relaxed schema — columns missing on one "
    "side become NULL (ref: pl.concat(how='vertical_relaxed'), "
    "writer/atomic.py:67; utils.py:64-66). unionByName(allowMissingColumns).",
)
def o2_union_relaxed(spark, sf_dir):
    ev = events(spark, sf_dir)
    a = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value", F.lit("era1").alias("era")
    )
    b = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "value", "minute_ts", F.lit("era2").alias("era")
    )
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "p8_partition_audit",
    sql=f"""
    WITH spine AS ({_SQL_HOUR_SPINE}),
    stats AS (
      SELECT date_trunc('hour', ts) AS hour_ts,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT date_trunc('minute', ts)) AS BIGINT) AS observed_minutes,
             CAST(count(*) - count(DISTINCT (user_id, date_trunc('minute', ts))) AS BIGINT) AS dup_key_rows,
             CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT) AS null_values
      FROM events
      WHERE ts >= TIMESTAMP '{SPINE_START}' AND ts < TIMESTAMP '{SPINE_END}'
      GROUP BY 1
    )
    SELECT s.hour_ts,
           CAST(coalesce(t.n_rows, 0) AS BIGINT) AS n_rows,
           CAST(coalesce(t.observed_minutes, 0) AS BIGINT) AS observed_minutes,
           CAST(coalesce(t.dup_key_rows, 0) AS BIGINT) AS dup_key_rows,
           CAST(coalesce(t.null_values, 0) AS BIGINT) AS null_values,
           CASE WHEN t.n_rows IS NULL THEN 'missing'
                WHEN t.observed_minutes < 60 THEN 'gap'
                ELSE 'complete' END AS status
    FROM spine s LEFT JOIN stats t ON t.hour_ts = s.hour_ts
    """,
    doc="P8: partition audit — per hour partition: row count, dense-minute "
    "coverage vs the expected spine, duplicate-key rows, hard-required "
    "nulls, status classification "
    "(ref: validation/partition_audit.py:18-95; dq.py:22-63).",
)
def p8_partition_audit(spark, sf_dir):
    hours = minute_spine(spark, SPINE_START, SPINE_END, 60).withColumnRenamed(
        "slot_ts", "hour_ts"
    )
    ev = events(spark, sf_dir).where(
        (F.col("ts") >= F.lit(SPINE_START).cast("timestamp_ntz"))
        & (F.col("ts") < F.lit(SPINE_END).cast("timestamp_ntz"))
    )
    stats = ev.groupBy(bucket_floor("ts", 60).alias("hour_ts")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("minute_ts").alias("observed_minutes"),
        # struct-wrapped: bare countDistinct(a, b) SKIPS rows where any
        # argument is NULL, inflating dup_key_rows by every NULL-user row;
        # the struct is never null, so (NULL, minute) counts as its own
        # distinct key — matching DuckDB's count(DISTINCT (a, b))
        (
            F.count(F.lit(1))
            - F.countDistinct(F.struct("user_id", "minute_ts"))
        ).alias("dup_key_rows"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("null_values"),
    )
    j = hours.join(stats, "hour_ts", "left")
    return j.select(
        "hour_ts",
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        F.coalesce("observed_minutes", F.lit(0)).alias("observed_minutes"),
        F.coalesce("dup_key_rows", F.lit(0)).alias("dup_key_rows"),
        F.coalesce("null_values", F.lit(0)).alias("null_values"),
        F.when(F.col("n_rows").isNull(), "missing")
        .when(F.col("observed_minutes") < 60, "gap")
        .otherwise("complete")
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# U1: EMA — grouped pandas UDF; oracle = recursive CTE replaying the exact
# IEEE op sequence (see functions/ema.py float discipline).
_EMA_LEN = 5
_SQL_ALPHA = "(CAST(2 AS DOUBLE) / CAST(6 AS DOUBLE))"


@register(
    "u1_ema",
    sql=f"""
    WITH RECURSIVE hourly AS (
      SELECT user_id,
             TIMESTAMP '1970-01-01 00:00:00'
               + to_seconds(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)) AS hour_ts,
             arg_max(value, event_id) AS close
      FROM events
      GROUP BY 1, 2
    ),
    base AS (
      SELECT user_id, hour_ts, close,
             row_number() OVER (PARTITION BY user_id ORDER BY hour_ts) AS rn
      FROM hourly
    ),
    rec AS (
      SELECT user_id, rn, hour_ts, close, close AS s, CAST(NULL AS DOUBLE) AS ema
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.user_id, b.rn, b.hour_ts, b.close,
             CASE WHEN b.rn <= {_EMA_LEN} THEN r.s + b.close ELSE r.s END AS s,
             CASE WHEN b.rn < {_EMA_LEN} THEN CAST(NULL AS DOUBLE)
                  WHEN b.rn = {_EMA_LEN} THEN (r.s + b.close) / CAST({_EMA_LEN} AS DOUBLE)
                  ELSE {_SQL_ALPHA} * b.close + (CAST(1 AS DOUBLE) - {_SQL_ALPHA}) * r.ema
             END AS ema
      FROM rec r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1
    )
    SELECT user_id, hour_ts, close, ema FROM rec
    """,
    doc="U1: TradingView EMA (SMA seed at index len−1, then "
    "α·x + (1−α)·prev, α=2/(len+1); NULL before seed) per user over hourly "
    "closes — hash-repartition by user, JVM-side sort, one Arrow-batched "
    "mapInPandas fold per task; thousands of parallel small groups at "
    "scale (ref: live_indicators/ema.py:6-24). Oracle: recursive CTE "
    "replaying the identical IEEE op sequence.",
)
def u1_ema(spark, sf_dir):
    ev = events(spark, sf_dir)
    hourly = ev.groupBy(
        "user_id", bucket_floor("ts", 60).alias("hour_ts")
    ).agg(last_nonnull("value", "event_id").alias("close"))
    return ema_by_group(
        hourly, "close", "hour_ts", ["user_id"], _EMA_LEN, out_col="ema"
    )


@register(
    "u2_traditional_pivots",
    sql="""
    WITH bars AS (
      SELECT TIMESTAMP '1970-01-01 00:00:00'
               + to_seconds(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT)) AS bucket_start,
             max(value) AS high, min(value) AS low, arg_max(value, event_id) AS close
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT bucket_start,
             lag(high) OVER (ORDER BY bucket_start) AS ph,
             lag(low) OVER (ORDER BY bucket_start) AS pl,
             lag(close) OVER (ORDER BY bucket_start) AS pc
      FROM bars
    )
    SELECT bucket_start,
           (ph + pl + pc) / CAST(3 AS DOUBLE) AS pivot,
           CAST(2 AS DOUBLE) * ((ph + pl + pc) / CAST(3 AS DOUBLE)) - pl AS r1,
           CAST(2 AS DOUBLE) * ((ph + pl + pc) / CAST(3 AS DOUBLE)) - ph AS s1,
           ((ph + pl + pc) / CAST(3 AS DOUBLE)) + (ph - pl) AS r2,
           ((ph + pl + pc) / CAST(3 AS DOUBLE)) - (ph - pl) AS s2
    FROM lagged
    """,
    doc="U2: traditional pivot levels (P/R1/S1/R2/S2) from the previous "
    "period's bar — pure column arithmetic over a lag, no UDF "
    "(ref: live_indicators/pivots.py:4-12).",
)
def u2_traditional_pivots(spark, sf_dir):
    ev = events(spark, sf_dir)
    bars = ev.groupBy(bucket_floor("ts", 15).alias("bucket_start")).agg(
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        last_nonnull("value", "event_id").alias("close"),
    )
    return traditional_pivots(bars, order_col="bucket_start")


@register(
    "d1_derived_fields",
    sql="""
    WITH b AS (
      SELECT user_id,
             TIMESTAMP '1970-01-01 00:00:00'
               + to_seconds(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT)) AS bucket_start,
             CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS vol,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(28,6))
                           ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) AS buy_vol
      FROM events GROUP BY 1, 2
    ),
    d AS (
      SELECT user_id, bucket_start, vol, buy_vol,
             vol - buy_vol AS sell_vol,
             buy_vol - (vol - buy_vol) AS net_vol,
             CASE WHEN vol <> 0 THEN buy_vol / vol END AS buy_ratio
      FROM b
    )
    SELECT user_id, bucket_start, vol, buy_vol, sell_vol, net_vol, buy_ratio,
           CAST(sum(CAST(net_vol AS DECIMAL(28,6)))
                  OVER (PARTITION BY user_id ORDER BY bucket_start
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cvd,
           vol - lag(vol) OVER (PARTITION BY user_id ORDER BY bucket_start) AS delta_vol
    FROM d
    """,
    doc="§2.10 derived-field block: recompute-after-agg ratios "
    "(taker_buy_ratio shape), net flow, CVD cumulative sum, bar-over-bar "
    "deltas — all computed AFTER window aggregation, not aggregated from "
    "per-row ratios (ref: live_data_api_service/service.py:1188-1257; "
    "aggregation.py:115-227; README.md:47).",
)
def d1_derived_fields(spark, sf_dir):
    ev = events(spark, sf_dir)
    zero = F.lit(0).cast("decimal(28,6)")
    b = ev.groupBy("user_id", bucket_floor("ts", 15).alias("bucket_start")).agg(
        dsum("value").alias("vol"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value").cast("decimal(28,6)"))
            .otherwise(zero)
        ).cast("double").alias("buy_vol"),
    )
    d = b.select(
        "user_id",
        "bucket_start",
        "vol",
        "buy_vol",
        (F.col("vol") - F.col("buy_vol")).alias("sell_vol"),
        (F.col("buy_vol") - (F.col("vol") - F.col("buy_vol"))).alias("net_vol"),
        F.when(F.col("vol") != 0, F.col("buy_vol") / F.col("vol")).alias("buy_ratio"),
    )
    w = Window.partitionBy("user_id").orderBy("bucket_start")
    return d.select(
        "*",
        F.sum(F.col("net_vol").cast("decimal(28,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("cvd"),
        (F.col("vol") - F.lag("vol", 1).over(w)).alias("delta_vol"),
    )
