"""HTF aggregator: registry-driven bucket aggregation + incremental upsert.

Reference (/root/reference/src/aggregator/): the rule table
(aggregation_rules.py:16-89) maps each canonical column to an aggregation
kind; buckets carry completeness accounting (bucketing.py:61-68); the
service materializes incrementally with a repair lookback that re-aggregates
recent buckets idempotently (incremental.py:43-104); missing buckets are
detected by anti-joining complete source buckets against the existing index
(validator.py:17-52).

Spark realization: ONE groupBy per timeframe with the full agg list —
Tungsten does partial aggregation map-side; the realized-vol term needs a
lag window before the groupBy (close-to-close within bucket). Writes go
through sinks.upsert_partitioned (dynamic partition overwrite == the
reference's per-partition atomic rewrite).

Scale: aggregation shuffles once on (symbol, bucket_start); 12 timeframes
can share the scan via a single cached minute frame. The repair window
bounds recomputation to recent buckets only — partition pruning keeps a
100 TB lake's repair cost proportional to the lookback, not the history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crypto_datalake_spark.ops.agg import (
    dsum,
    first_nonnull,
    last_nonnull,
    ratio_of_sums,
    wavg_with_mean_fallback,
)
from crypto_datalake_spark.ops.time import expected_minutes, timeframe_floor
from crypto_datalake_spark.schema import MINUTE_COLUMNS, AggRule
from crypto_datalake_spark.sinks import upsert_partitioned


def _agg_exprs(tf: str) -> list[Column]:
    """The A4 rule set from the schema registry (aggregation_rules.py:129-272)."""
    out: list[Column] = []
    for c in MINUTE_COLUMNS:
        if c.agg is None or c.name in ("timestamp", "symbol"):
            continue
        name, rule = c.name, c.agg
        if rule is AggRule.FIRST_BY_TIME:
            e = F.min_by(name, "timestamp")
        elif rule is AggRule.LAST_BY_TIME:
            e = F.max_by(name, "timestamp")
        elif rule is AggRule.MAX:
            e = F.max(name)
        elif rule is AggRule.MIN:
            e = F.min(name)
        elif rule is AggRule.SUM:
            # preserves NULL-when-no-data: sum of all-NULL is NULL, matching
            # the 0-vs-NULL discipline (LIVE_ONLY sums stay NULL for
            # uncovered buckets; covered-but-quiet minutes carry literal 0s)
            e = dsum(name) if c.dtype.simpleString() == "double" else F.sum(name)
        elif rule is AggRule.BOOL_OR:
            e = F.max(name)
        elif rule is AggRule.FIRST_NONNULL:
            e = first_nonnull(name, "timestamp")
        elif rule is AggRule.LAST_NONNULL:
            e = last_nonnull(name, "timestamp")
        elif rule is AggRule.WEIGHTED_AVG:
            e = wavg_with_mean_fallback(name, c.agg_weight)
        elif rule is AggRule.RATIO_OF_SUMS:
            e = ratio_of_sums(c.agg_num, c.agg_den)
        elif rule is AggRule.REALIZED_VOL:
            # Σ log(close/prev_close)² within bucket, sqrt'd — the lag column
            # __log_ret is prepared before the groupBy (W2)
            e = F.sqrt(F.sum(F.pow(F.col("__log_ret"), 2)))
        else:  # COUNT_OBSERVED handled with the metadata block
            continue
        out.append(e.alias(name))
    return out


def aggregate_minutes(minute_df: DataFrame, timeframe: str) -> DataFrame:
    """Minute frame → HTF bars for one timeframe, with completeness
    accounting. Pure; callers filter complete-only per policy."""
    b = minute_df.withColumn("bucket_start", timeframe_floor("timestamp", timeframe))
    w = Window.partitionBy("symbol", "bucket_start").orderBy("timestamp")
    prev_close = F.lag("close", 1).over(w)
    # positive-price guard (same as w1/w2): log returns are undefined
    # otherwise, and under ANSI mode the unguarded close/prev raises
    # DIVIDE_BY_ZERO on a zero close (halted market, bad tick) — one bar
    # would crash the whole incremental tick
    b = b.withColumn(
        "__log_ret",
        F.when(
            (F.col("close") > 0) & (prev_close > 0),
            F.log(F.col("close") / prev_close),
        ),
    )
    obs = F.count(F.lit(1))
    agg = b.groupBy("symbol", "bucket_start").agg(
        *_agg_exprs(timeframe),
        obs.alias("observed_minutes"),
    )
    exp = expected_minutes(F.col("bucket_start"), timeframe)
    return (
        agg.withColumn("timeframe", F.lit(timeframe))
        .withColumn("expected_minutes", exp)
        .withColumn("missing_minutes", exp - F.col("observed_minutes"))
        .withColumn("bucket_complete", F.col("observed_minutes") == exp)
    )


def detect_missing_buckets(
    minute_df: DataFrame, existing_index: DataFrame | None, timeframe: str
) -> DataFrame:
    """Complete source buckets ANTI existing-complete index
    (ref: aggregator/validator.py:17-52). ``existing_index`` needs columns
    (symbol, bucket_start, bucket_complete); None = empty lake."""
    src = (
        minute_df.select(
            "symbol", timeframe_floor("timestamp", timeframe).alias("bucket_start")
        )
        .groupBy("symbol", "bucket_start")
        .agg(F.count(F.lit(1)).alias("observed_minutes"))
        .where(
            F.col("observed_minutes")
            == expected_minutes(F.col("bucket_start"), timeframe)
        )
        .select("symbol", "bucket_start")
    )
    if existing_index is None:
        return src
    done = existing_index.where(F.col("bucket_complete")).select(
        "symbol", "bucket_start"
    )
    return src.join(done, ["symbol", "bucket_start"], "left_anti")


def incremental_update(
    spark: SparkSession,
    minute_df: DataFrame,
    lake_path: str,
    timeframe: str,
    repair_lookback_minutes: int = 120,
    now_ts: str | None = None,
    atomic: bool = False,
    stats_cols: Sequence[str] = (),
) -> None:
    """Incremental materialization with late-data repair: re-aggregate every
    bucket overlapping [max(ts) − lookback, ∞) and upsert idempotently
    (ref: aggregator/incremental.py:43-104 — recomputing recent buckets IS
    the late-repair mechanism; the write is keep-last so reruns are no-ops).

    ``atomic=True``: commit the repair through the generation manifest —
    a tick that dies mid-write can never leave some repaired days visible
    and others stale (read the lake back with ``txn.read_table``).
    """
    if stats_cols and not atomic:
        raise ValueError(
            "stats_cols requires atomic=True — only manifest commits can "
            "record data-skipping stats"
        )
    horizon = (
        F.lit(now_ts).cast("timestamp_ntz")
        if now_ts
        else minute_df.agg(F.max("timestamp")).head()[0]
    )
    cutoff_expr = F.timestamp_add(
        "MINUTE", F.lit(-repair_lookback_minutes), F.lit(horizon)
    )
    cutoff_bucket = timeframe_floor(cutoff_expr, timeframe)
    recent = minute_df.where(
        timeframe_floor("timestamp", timeframe) >= cutoff_bucket
    )
    bars = aggregate_minutes(recent, timeframe).where(F.col("bucket_complete"))
    bars = (
        bars.withColumn("year", F.year("bucket_start"))
        .withColumn("month", F.month("bucket_start"))
        .withColumn("day", F.dayofmonth("bucket_start"))
    )
    kw = dict(
        keys=["timeframe", "symbol", "bucket_start"],
        order_cols=["observed_minutes"],
        partition_cols=["timeframe", "symbol", "year", "month", "day"],
    )
    if atomic:
        from crypto_datalake_spark.txn import atomic_upsert_partitioned

        # stats_cols: manifest data-skipping stats per commit (atomic only)
        atomic_upsert_partitioned(
            spark, bars, lake_path, stats_cols=stats_cols, **kw
        )
    else:
        upsert_partitioned(spark, bars, lake_path, **kw)
