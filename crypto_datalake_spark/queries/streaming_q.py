"""Streaming operators surfaced as driver queries (SURVEY.md §2.8).

st2 runs a REAL Structured Streaming query (file source → availableNow →
memory sink) and returns the sink table — the streaming result is
oracle-checked against batch SQL, proving stream/batch semantic parity
(the Dataflow-model promise). st3 replays the order-book fold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_datalake_spark.io import _EVENTS_PHYSICAL, _NS_TO_NTZ
from crypto_datalake_spark.queries.common import t
from crypto_datalake_spark.queries.registry import register


@register(
    "st2_streaming_minute_agg",
    sql="""
    SELECT date_trunc('minute', ts) AS minute_ts,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
           max(ts) AS max_ts
    FROM events
    GROUP BY 1
    """,
    doc="ST1/ST2: event-time minute bucketing + per-minute accumulators as "
    "a REAL Structured Streaming query — file source, availableNow "
    "trigger, complete-mode memory sink (ref: websocket.py:1273-1304 "
    "accumulators; §2.8). The oracle compares the STREAMING result to "
    "batch SQL: stream/batch parity is the assertion. Incremental "
    "per-micro-batch partial aggregation = the production shape "
    "(streaming.minute_features adds the 3-minute watermark / liq folds).",
)
def st2_streaming_minute_agg(spark, sf_dir):
    name = "st2_minute_agg_sink"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    # file streaming sources take a directory; glob-filter to the one table
    stream = (
        spark.readStream.schema(_EVENTS_PHYSICAL)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
        .withColumn("ts", F.expr(_NS_TO_NTZ))
    )
    agg = (
        stream.withColumn(
            "minute_ts",
            F.timestamp_add(
                "MINUTE",
                (F.timestamp_diff("SECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), F.col("ts")) / 60).cast("long"),
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            ),
        )
        .groupBy("minute_ts")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
            F.max("ts").alias("max_ts"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


@register(
    "st3_orderbook_replay",
    sql=None,  # stateful sequential fold — not SQL-expressible (driver records rows-only)
    doc="ST3-ST5: order-book state machine replay — snapshot sync, "
    "sequence-continuity delta application, impact walk, health metrics "
    "(streaming.orderbook; ref websocket.py:234-413). Depth events are "
    "synthesized deterministically from the events table (first event per "
    "key = snapshot, then continuous deltas); the same fold runs under "
    "applyInPandasWithState in streaming mode.",
)
def st3_orderbook_replay(spark, sf_dir):
    from pyspark.sql import Window

    from crypto_datalake_spark.streaming.orderbook import book_state_stream

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    rn = F.row_number().over(w)
    price = 100.0 + F.pmod(F.col("value"), F.lit(10.0))
    depth = (
        ev.withColumn("rn", rn)
        .select(
            F.col("event_type").alias("symbol"),
            F.col("ts").alias("event_time"),
            F.when(F.col("rn") == 1, "snapshot").otherwise("delta").alias("kind"),
            F.col("rn").alias("first_update_id"),
            F.col("rn").alias("final_update_id"),
            F.when(F.col("rn") > 1, F.col("rn") - 1).alias("prev_final_update_id"),
            F.format_string('[[%.6f, %.6f]]', price - 1.0, F.abs("value")).alias("bids"),
            F.format_string('[[%.6f, %.6f]]', price + 1.0, F.abs("value")).alias("asks"),
        )
    )
    return book_state_stream(depth)
