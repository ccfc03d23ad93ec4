"""Streaming per-minute live-feature aggregation (ST1/ST2/ST6/ST7/ST11).

Reference: the in-memory ``_MinuteAccumulator``
(/root/reference/src/binance_minute_lake/sources/websocket.py:1273-1304,
1488-1653) folds WS events into per-minute feature rows keyed by
``floor_to_minute_ms(event_time)`` (:33-34 — exchange event time, not
arrival). Late/duplicate handling is batch repair with a 3-minute safety
lag (orchestrator.py:105).

Spark realization: ONE event-time windowed aggregation —
``withWatermark("event_time", "3 minutes")`` plays the safety lag;
liquidation folds (ST7: SELL→long-liq, BUY→short-liq, qty-weighted fill
price, unfilled ratio) and latency decomposition (ST6: engine = arrival −
event, network = arrival − transact) are conditional-sum/max expressions
inside the agg — all JVM-side, partial-aggregated map-side before the
shuffle on (symbol, window).

p95 note: the streaming path uses ``percentile_approx`` (mergeable sketch,
required for partial aggregation); the batch repair path recomputes exact
nearest-rank p95 (ops.agg.nearest_rank_percentile) — same split as the
reference, which tracks stream-side approximations and repairs from the
event store (websocket.py:901-1127).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# expected bronze event columns (a superset union of the 4 WS streams;
# NULLs where a stream doesn't carry the field — same shape as the raw
# event tables, websocket.py:431-562)
EVENT_COLUMNS = (
    "symbol",        # string
    "stream",        # string: depth|liq|trade|mark
    "event_time",    # timestamp (exchange event time)
    "transact_time", # timestamp
    "arrival_time",  # timestamp (local receipt)
    "side",          # string: BUY|SELL (liq/trade)
    "price",         # double
    "qty",           # double (liq: DISPLAY qty — executed if > 0 else original)
    "orig_qty",      # double (liq: original order qty)
    "exec_qty",      # double (liq: RAW executed qty clamped to [0, orig];
                     # null when the payload lacks z/l/q — the unfilled
                     # ratio needs the raw value, which the display qty's
                     # orig-fallback destroys for fully-unfilled orders)
)


def minute_feature_stream(events: DataFrame, watermark: str = "3 minutes") -> DataFrame:
    """Bronze WS events → per-(symbol, minute) live features.

    Works identically on a streaming or batch ``events`` frame (the batch
    path is the repair job, ST11)."""
    # Watermarks require instant-typed TIMESTAMP; lake timestamps are NTZ.
    # The session tz is pinned UTC (session.get_spark), so the round-trip
    # NTZ → TIMESTAMP → NTZ is value-identical.
    events = events.withColumn("event_time", F.col("event_time").cast("timestamp"))
    if events.isStreaming:
        events = events.withWatermark("event_time", watermark)

    is_liq = F.col("stream") == "liq"
    is_sell = F.col("side") == "SELL"
    notional = F.col("price") * F.col("qty")
    engine_ms = F.timestamp_diff("MILLISECOND", F.col("event_time"), F.col("arrival_time"))
    network_ms = F.timestamp_diff(
        "MILLISECOND", F.col("transact_time"), F.col("arrival_time")
    )

    agg = events.groupBy(
        F.col("symbol"), F.window("event_time", "1 minute").alias("w")
    ).agg(
        # ST2 accumulator core: max observed times, counts
        F.max("event_time").cast("timestamp_ntz").alias("max_event_time"),
        F.max("arrival_time").alias("max_arrival_time"),
        F.count(F.lit(1)).alias("n_events"),
        # ST7 liquidation fold: SELL → long liq, BUY → short liq
        F.sum(F.when(is_liq & is_sell, notional)).alias("liq_long_notional"),
        F.count(F.when(is_liq & is_sell, 1)).alias("liq_long_count"),
        F.sum(F.when(is_liq & ~is_sell, notional)).alias("liq_short_notional"),
        F.count(F.when(is_liq & ~is_sell, 1)).alias("liq_short_count"),
        # qty-weighted fill price, NULL when no liq qty (A5 discipline)
        (
            F.sum(F.when(is_liq, F.col("price") * F.col("qty")))
            / F.sum(F.when(is_liq, F.col("qty")))
        ).alias("liq_avg_fill_price"),
        # unfilled ratio Σ(orig−exec)/Σorig over the RAW executed qty —
        # the display qty falls back to orig for fully-unfilled orders,
        # which would count them as fully FILLED. NULL (unsupported)
        # when any liq row in the minute lacks orig/exec, mirroring the
        # reference's unfilled_supported latch (websocket.py:1073-1099).
        F.when(
            F.min(
                F.when(
                    is_liq,
                    F.col("orig_qty").isNotNull()
                    & (F.col("orig_qty") > 0)
                    & F.col("exec_qty").isNotNull(),
                )
            ),
            F.sum(F.when(is_liq, F.col("orig_qty") - F.col("exec_qty")))
            / F.sum(F.when(is_liq, F.col("orig_qty"))),
        ).alias("liq_unfilled_ratio"),
        # ST6 latency decomposition (approx p95 — mergeable)
        F.percentile_approx(engine_ms, 0.95).alias("engine_latency_p95_ms"),
        F.percentile_approx(network_ms, 0.95).alias("network_latency_p95_ms"),
        (F.max(engine_ms) > 500).alias("latency_bad"),
        # coverage flags (bool_or)
        F.max(is_liq).alias("has_liq"),
        F.max(F.col("stream") == "depth").alias("has_depth"),
    )
    return agg.select(
        "symbol",
        F.col("w.start").cast("timestamp_ntz").alias("minute_ts"),
        *[c for c in agg.columns if c not in ("symbol", "w")],
    )
