"""Bucketed aggregations — SURVEY.md §2.4 (A1-A11) and §2.10 derived fields.

Determinism: every float sum goes through DECIMAL (exact, order-free); all
divisions are double/double on exact operands; first/last-non-null are
arg-min/max over the explicit event order (see ops.agg docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_datalake_spark.ops.agg import (
    dsum,
    dsum_prod,
    first_nonnull,
    last_nonnull,
    nearest_rank_percentile,
    ratio_of_sums,
    wavg,
    wavg_with_mean_fallback,
)
from crypto_datalake_spark.ops.time import bucket_floor
from crypto_datalake_spark.queries.common import events, t
from crypto_datalake_spark.queries.registry import register


@register(
    "a1_minute_trade_rollup",
    sql="""
    SELECT date_trunc('minute', ts) AS minute_ts,
      CAST(count(*) AS BIGINT) AS n_events,
      CASE WHEN sum(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(18,6))) <> 0
           THEN CAST(CAST(sum(CAST(value AS DECIMAL(18,6))
                         * CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
                / CAST(sum(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(18,6))) AS DOUBLE)
      END AS vwap_value,
      CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(28,6)) ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) AS purchase_vol,
      CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(28,6)) ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) AS click_vol,
      CAST(count(*) FILTER (WHERE value >= 150.0) AS BIGINT) AS whale_n,
      max(value) AS max_value
    FROM events
    GROUP BY 1
    """,
    doc="A1: raw-events → minute rollup with VWAP (Σpq/Σq, zero-guarded), "
    "conditional buy/sell sums and whale counts; JSON field extraction for "
    "the qty (ref: transforms/minute_builder.py:195-259; JSON: "
    "websocket.py:1064-1088). Single hash-agg, map-side partials.",
)
def a1_minute_trade_rollup(spark, sf_dir):
    from crypto_datalake_spark.queries.common import spread

    # the per-row JSON parse is this query's dominant map-side cost —
    # spread an under-parallel single-row-group scan before it
    # (identity at scale; the a8/spread doctrine)
    ev = spread(events(spark, sf_dir)).withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    zero = F.lit(0).cast("decimal(28,6)")
    return ev.groupBy("minute_ts").agg(
        F.count(F.lit(1)).alias("n_events"),
        wavg("value", "k").alias("vwap_value"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value").cast("decimal(28,6)")).otherwise(zero)
        ).cast("double").alias("purchase_vol"),
        F.sum(
            F.when(F.col("event_type") == "click", F.col("value").cast("decimal(28,6)")).otherwise(zero)
        ).cast("double").alias("click_vol"),
        F.count(F.when(F.col("value") >= 150.0, 1)).alias("whale_n"),
        F.max("value").alias("max_value"),
    )


@register(
    "a2_mean_last_rollup",
    sql="""
    SELECT date_trunc('minute', ts) AS minute_ts,
      CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / CAST(count(value) AS DOUBLE) AS mean_value,
      arg_max(value, event_id) AS last_value
    FROM events
    GROUP BY 1
    """,
    doc="A2: per-minute mean + LAST-by-event-order value (the book-ticker "
    "micro_price_close pattern, ref: transforms/minute_builder.py:261-296). "
    "Positional last() replaced by max_by over the event order column.",
)
def a2_mean_last_rollup(spark, sf_dir):
    ev = events(spark, sf_dir)
    return ev.groupBy("minute_ts").agg(
        (dsum("value") / F.count("value").cast("double")).alias("mean_value"),
        last_nonnull("value", "event_id").alias("last_value"),
    )


_SQL_MINUTE_BARS = """
  SELECT date_trunc('minute', ts) AS minute_ts,
         arg_min(value, event_id) AS open,
         max(value) AS high,
         min(value) AS low,
         arg_max(value, event_id) AS close,
         CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS volume,
         CAST(count(*) AS BIGINT) AS n_events,
         bool_or(event_type = 'error') AS has_error,
         arg_min(CASE WHEN event_type = 'purchase' THEN value END,
                 CASE WHEN event_type = 'purchase' THEN event_id END) AS first_purchase,
         arg_max(CASE WHEN event_type = 'purchase' THEN value END,
                 CASE WHEN event_type = 'purchase' THEN event_id END) AS last_purchase
  FROM events
  GROUP BY 1
"""


def minute_bars(spark, sf_dir):
    """Per-minute OHLC 'bars' from raw events — the §3.2 minute-builder
    shape re-targeted at the generic events table."""
    ev = events(spark, sf_dir)
    return ev.groupBy("minute_ts").agg(
        first_nonnull("value", "event_id").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        last_nonnull("value", "event_id").alias("close"),
        dsum("value").alias("volume"),
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.col("event_type") == "error").alias("has_error"),
        first_nonnull(
            F.when(F.col("event_type") == "purchase", F.col("value")), "event_id"
        ).alias("first_purchase"),
        last_nonnull(
            F.when(F.col("event_type") == "purchase", F.col("value")), "event_id"
        ).alias("last_purchase"),
    )


@register(
    "a4_htf_bucket_agg",
    sql=f"""
    WITH mb AS ({_SQL_MINUTE_BARS})
    SELECT
      TIMESTAMP '1970-01-01 00:00:00'
        + to_seconds(CAST(floor(epoch(minute_ts) / 900) * 900 AS BIGINT)) AS bucket_start,
      arg_min(open, minute_ts) AS open,
      max(high) AS high,
      min(low) AS low,
      arg_max(close, minute_ts) AS close,
      CAST(sum(CAST(volume AS DECIMAL(28,6))) AS DOUBLE) AS volume,
      CAST(sum(n_events) AS BIGINT) AS n_events,
      bool_or(has_error) AS has_error,
      arg_min(first_purchase, CASE WHEN first_purchase IS NOT NULL THEN minute_ts END) AS first_purchase,
      arg_max(last_purchase, CASE WHEN last_purchase IS NOT NULL THEN minute_ts END) AS last_purchase,
      CAST(count(*) AS BIGINT) AS observed_minutes,
      CAST(15 AS BIGINT) AS expected_minutes,
      CAST(15 - count(*) AS BIGINT) AS missing_minutes,
      (count(*) = 15) AS bucket_complete
    FROM mb
    GROUP BY 1
    """,
    doc="A4+A10: the HTF bucket aggregation — first/last-by-time open/close, "
    "min/max, sums, bool-OR flags, first/last-NON-NULL snapshot columns, "
    "and bucket-completeness accounting (observed vs expected minutes) "
    "(ref: aggregator/aggregation_rules.py:129-272; bucketing.py:61-68). "
    "Two-level agg: minute bars then 15-min buckets; both map-side partial.",
)
def a4_htf_bucket_agg(spark, sf_dir):
    mb = minute_bars(spark, sf_dir)
    b = mb.withColumn("bucket_start", bucket_floor("minute_ts", 15))
    return b.groupBy("bucket_start").agg(
        first_nonnull("open", "minute_ts").alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        last_nonnull("close", "minute_ts").alias("close"),
        dsum("volume").alias("volume"),
        F.sum("n_events").alias("n_events"),
        F.max("has_error").alias("has_error"),
        first_nonnull("first_purchase", "minute_ts").alias("first_purchase"),
        last_nonnull("last_purchase", "minute_ts").alias("last_purchase"),
        F.count(F.lit(1)).alias("observed_minutes"),
        F.lit(15).cast("long").alias("expected_minutes"),
        (F.lit(15) - F.count(F.lit(1))).cast("long").alias("missing_minutes"),
        (F.count(F.lit(1)) == 15).alias("bucket_complete"),
    )


@register(
    "a5_weighted_avg",
    sql="""
    SELECT event_type,
      CASE WHEN sum(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(18,6))) <> 0
           THEN CAST(CAST(sum(CAST(value AS DECIMAL(18,6))
                         * CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
                / CAST(sum(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(18,6))) AS DOUBLE)
      END AS wavg_value,
      CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1
    """,
    doc="A5: notional-weighted average, NULL when the weight sum is zero "
    "(ref: aggregator/aggregation_rules.py:138-160, liq_avg_fill_price).",
)
def a5_weighted_avg(spark, sf_dir):
    from crypto_datalake_spark.queries.common import spread

    ev = spread(events(spark, sf_dir)).withColumn(  # JSON-parse heavy
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    return ev.groupBy("event_type").agg(
        wavg("value", "k").alias("wavg_value"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "a6_weighted_avg_fallback",
    sql="""
    WITH e AS (
      SELECT event_type, value,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             CASE WHEN event_type = 'error' THEN 0
                  ELSE CAST(json_extract_string(props, '$.k') AS BIGINT) END AS w
      FROM events
    )
    SELECT event_type,
      CASE WHEN sum(CAST(k AS DECIMAL(18,6))) <> 0
           THEN CAST(CAST(sum(CAST(value AS DECIMAL(18,6))
                         * CAST(k AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
                / CAST(sum(CAST(k AS DECIMAL(18,6))) AS DOUBLE)
      END AS wavg_value,
      CASE WHEN sum(CAST(CASE WHEN value IS NOT NULL THEN w END AS DECIMAL(18,6))) <> 0
           THEN CAST(CAST(sum(CAST(value AS DECIMAL(18,6))
                         * CAST(CASE WHEN value IS NOT NULL THEN w END AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
                / CAST(sum(CAST(CASE WHEN value IS NOT NULL THEN w END AS DECIMAL(18,6))) AS DOUBLE)
           ELSE CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / CAST(count(value) AS DOUBLE)
      END AS wavg_or_mean
    FROM e
    GROUP BY 1
    """,
    doc="A5+A6 weighted-average family from ONE scan: ``wavg_value`` is the "
    "pure notional-weighted average (A5 — NULL when the weight sum is "
    "zero; ref aggregator/aggregation_rules.py:138-160 "
    "liq_avg_fill_price), ``wavg_or_mean`` adds the simple-mean fallback "
    "with weights nulled pairwise where the value is null (A6 — ref "
    "aggregation_rules.py:143-160, 205-216 depth-quality columns). Both "
    "are partial-aggregable decimal sums, so fusing them costs one extra "
    "accumulator, not a second shuffle; the standalone a5_weighted_avg "
    "entry remains registered.",
)
def a6_weighted_avg_fallback(spark, sf_dir):
    from crypto_datalake_spark.queries.common import spread

    ev = spread(events(spark, sf_dir)).select(  # JSON-parse heavy x2
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.when(F.col("event_type") == "error", F.lit(0))
        .otherwise(F.get_json_object("props", "$.k").cast("long"))
        .alias("w"),
    )
    return ev.groupBy("event_type").agg(
        wavg("value", "k").alias("wavg_value"),
        wavg_with_mean_fallback("value", "w").alias("wavg_or_mean"),
    )


@register(
    "a7_ratio_of_sums",
    sql="""
    SELECT l_returnflag, l_linestatus,
      CASE WHEN sum(CAST(l_quantity AS DECIMAL(28,6))) <> 0
           THEN CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                / CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
      END AS avg_unit_price,
      CASE WHEN sum(CAST(l_extendedprice AS DECIMAL(28,6))) <> 0
           THEN CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
                / CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
      END AS effective_discount
    FROM lineitem
    GROUP BY 1, 2
    """,
    doc="A7: ratio-of-sums recomputation — Σnum/Σden per group, NOT "
    "avg-of-ratios (ref: aggregation_rules.py:234-245 vwap/avg_trade_size/"
    "taker_buy_ratio; README.md:283-285).",
)
def a7_ratio_of_sums(spark, sf_dir):
    from crypto_datalake_spark.queries.common import spread

    # decimal multiply-accumulate is per-row-HEAVY (BigDecimal, no
    # codegen primitive path) — spread an under-parallel single-row-group
    # scan so the map-side partial agg uses every core (identity at
    # production split counts; see common.spread)
    li = spread(t(spark, sf_dir, "lineitem"))
    eff = F.sum(
        F.col("l_extendedprice").cast("decimal(18,6)")
        * F.col("l_discount").cast("decimal(18,6)")
    )
    ep = F.sum(F.col("l_extendedprice").cast("decimal(28,6)"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        ratio_of_sums("l_extendedprice", "l_quantity").alias("avg_unit_price"),
        F.when(
            ep != 0, eff.cast("decimal(38,6)").cast("double") / ep.cast("double")
        ).alias("effective_discount"),
    )


@register(
    "a8_p95_nearest_rank",
    sql="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type, value AS p95_value
    FROM ranked
    WHERE rk = CAST(ceil(CAST(0.95 AS DOUBLE) * n) AS BIGINT)
    """,
    doc="W7/A8: exact nearest-rank p95 (value at rank ceil(0.95·n)) — the "
    "reference's latency percentile (ref: websocket.py:100-105; "
    "live_data_api_service/aggregation.py:58-59). percentile_approx is the "
    "scale path; this exact ranking is the oracle-parity path.",
)
def a8_p95_nearest_rank(spark, sf_dir):
    ev = events(spark, sf_dir)
    return nearest_rank_percentile(ev, "value", 0.95, by=["event_type"], out_col="p95_value")


@register(
    "a9_ohlc_complete_only",
    sql=f"""
    WITH mb AS ({_SQL_MINUTE_BARS})
    SELECT * FROM (
      SELECT
        TIMESTAMP '1970-01-01 00:00:00'
          + to_seconds(CAST(floor(epoch(minute_ts) / 180) * 180 AS BIGINT)) AS bucket_start,
        arg_min(open, minute_ts) AS open,
        max(high) AS high,
        min(low) AS low,
        arg_max(close, minute_ts) AS close,
        CAST(count(*) AS BIGINT) AS observed_minutes
      FROM mb
      GROUP BY 1
    ) WHERE observed_minutes = 3
    """,
    doc="A9+P5: OHLC-only indicator-bar aggregation with the complete-"
    "window-only filter — bars missing any constituent minute are dropped, "
    "not emitted partially (ref: live_indicators/aggregation.py:22-75; "
    "completeness predicate live_data_api_service/aggregation.py:114). "
    "The HAVING-style filter runs post-agg on the reduced side.",
)
def a9_ohlc_complete_only(spark, sf_dir):
    mb = minute_bars(spark, sf_dir)
    b = mb.withColumn("bucket_start", bucket_floor("minute_ts", 3))
    return (
        b.groupBy("bucket_start")
        .agg(
            first_nonnull("open", "minute_ts").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            last_nonnull("close", "minute_ts").alias("close"),
            F.count(F.lit(1)).alias("observed_minutes"),
        )
        .where(F.col("observed_minutes") == 3)
    )


@register(
    "a11_populated_count",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN value IS NOT NULL AND props IS NOT NULL
                          AND user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_populated,
           CAST(sum(CASE WHEN json_extract_string(props, '$.k') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_k
    FROM events
    GROUP BY 1
    """,
    doc="A11: existence/populated-count scans — all-columns-populated count "
    "(all_horizontal(is_not_null).sum()) and per-field null counts "
    "(ref: live_data_api_service/service.py:2283-2290; validation/dq.py:42-51).",
)
def a11_populated_count(spark, sf_dir):
    from crypto_datalake_spark.queries.common import spread

    ev = spread(events(spark, sf_dir))  # JSON-parse heavy
    populated = (
        F.col("value").isNotNull()
        & F.col("props").isNotNull()
        & F.col("user_id").isNotNull()
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(populated.cast("long")).alias("n_populated"),
        F.sum(F.get_json_object("props", "$.k").isNull().cast("long")).alias(
            "n_missing_k"
        ),
    )


@register(
    "u6_calendar_buckets",
    sql="""
    SELECT month_start, week_start,
           CAST(datediff('minute', month_start,
                month_start + INTERVAL 1 MONTH) AS BIGINT)
             AS month_expected_minutes,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start
      FROM orders
    )
    GROUP BY 1, 2
    """,
    doc="U6/A10: calendar bucket floors — month and Monday-aligned week — "
    "with calendar-aware expected-minute accounting (add_months, NOT a "
    "fixed constant; ref: aggregator/bucketing.py:61-114, weekly/monthly "
    "boundary tests tests/test_aggregator.py:328). Month lengths and leap "
    "years come out of the interval arithmetic on both engines.",
)
def u6_calendar_buckets(spark, sf_dir):
    from crypto_datalake_spark.ops.time import bucket_end, calendar_floor

    o = t(spark, sf_dir, "orders")
    month = calendar_floor("o_orderdate", "month")
    week = calendar_floor("o_orderdate", "week")
    out = o.groupBy(
        month.alias("month_start"), week.alias("week_start")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    exp = F.timestamp_diff(
        "MINUTE", F.col("month_start"), bucket_end(F.col("month_start"), "1M")
    ).cast("long")
    return out.select(
        "month_start",
        "week_start",
        exp.alias("month_expected_minutes"),
        "n_orders",
    )


@register(
    "a10_bucket_completeness",
    sql="""
    SELECT date_trunc('hour', ts) AS hour_ts,
           CAST(count(DISTINCT date_trunc('minute', ts)) AS BIGINT) AS observed_minutes,
           CAST(60 AS BIGINT) AS expected_minutes,
           CAST(60 - count(DISTINCT date_trunc('minute', ts)) AS BIGINT) AS missing_minutes,
           (count(DISTINCT date_trunc('minute', ts)) = 60) AS bucket_complete
    FROM events
    GROUP BY 1
    """,
    doc="A10: bucket-completeness accounting — observed vs expected minutes "
    "per hour bucket (ref: aggregator/bucketing.py:61-68; validator.py:22-37).",
)
def a10_bucket_completeness(spark, sf_dir):
    ev = events(spark, sf_dir).withColumn("hour_ts", bucket_floor("ts", 60))
    obs = F.countDistinct("minute_ts")
    return ev.groupBy("hour_ts").agg(
        obs.alias("observed_minutes"),
        F.lit(60).cast("long").alias("expected_minutes"),
        (F.lit(60) - obs).cast("long").alias("missing_minutes"),
        (obs == 60).alias("bucket_complete"),
    )


@register(
    "a13_distinct_agg",
    sql="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1
    """,
    doc="Distinct aggregation: exact multi-column count-distinct per group "
    "(SURVEY.md §2.4 flags distinct-agg as an engine-parity extension the "
    "reference never needed). Spark plans this as expand + two-phase agg; "
    "at 100 TB swap exact for approx_count_distinct(col, 0.01) — HLL "
    "sketches merge map-side and cut the expand shuffle entirely.",
)
def a13_distinct_agg(spark, sf_dir):
    ev = events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.date_trunc("day", "ts")).alias("n_days"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "sketch_profile",
    sql=None,
    doc="Sketch-based corpus profiling — the 100 TB form of a13's exact "
    "distincts: per event_type, HLL (Apache DataSketches, lgK=12) user "
    "cardinality and approx percentiles of value, plus exact counts. "
    "Sketches are MERGEABLE partial aggregates: per-partition sketches "
    "combine map-side, shuffle bytes are the sketch size (~4 KB), not "
    "the key space — and daily sketch columns stored in a lake table "
    "roll up to any coarser grain later via hll_union_agg without "
    "rescanning the data (tests/test_scale_ops.py pins "
    "estimate(union(daily)) == estimate(global)). No SQL oracle: "
    "DuckDB's approx algorithms differ by construction (rows-only "
    "driver check); the pytest bounds the HLL estimate against the "
    "exact distinct count instead.",
)
def sketch_profile(spark, sf_dir):
    ev = events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias(
                "approx_users"
            ),
            F.percentile_approx(
                "value", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10_000)
            ).alias("value_p50_p95"),
        )
        .select(
            "event_type",
            "n_events",
            "approx_users",
            F.col("value_p50_p95").getItem(0).alias("p50_value"),
            F.col("value_p50_p95").getItem(1).alias("p95_value"),
        )
    )
