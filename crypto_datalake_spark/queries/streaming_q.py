"""Streaming operators surfaced as driver queries (SURVEY.md §2.8).

st2 runs a REAL Structured Streaming query (file source → availableNow →
memory sink) and returns the sink table — the streaming result is
oracle-checked against batch SQL, proving stream/batch semantic parity
(the Dataflow-model promise). st3 replays the order-book fold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_datalake_spark.io import _EVENTS_PHYSICAL, _LONG_TO_NTZ
from crypto_datalake_spark.queries.common import t
from crypto_datalake_spark.queries.registry import register


def _await_or_die(q, timeout_sec: int = 300) -> None:
    """awaitTermination(timeout) returns False on timeout WITHOUT raising;
    reading the memory sink after that would silently compare partial
    results. Fail loudly instead (and stop the straggler query)."""
    if not q.awaitTermination(timeout_sec):
        # stop() may itself throw (e.g. the query died with an error
        # between awaitTermination returning False and this call) —
        # never let that mask the TimeoutError and its 'partial sink'
        # diagnostic (ADVICE r12), but CHAIN it so the query's actual
        # death cause stays visible under the TimeoutError instead of
        # being discarded (ADVICE r13)
        stop_exc: Exception | None = None
        try:
            q.stop()
        except Exception as exc:
            stop_exc = exc
        raise TimeoutError(
            f"streaming query {q.name!r} did not finish its availableNow "
            f"run within {timeout_sec}s; refusing to read a partial sink"
        ) from stop_exc


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
        .withColumn("ts", F.expr(_LONG_TO_NTZ))
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
    _await_or_die(q, 300)
    return spark.table(name)


def _session_gap_minutes(sf_dir: str) -> int:
    """Session gap threshold scaled to the synthetic events table's
    density (~sf x 1M events per sf=1 over 30 days, near-uniform): a
    FIXED gap is degenerate at some sf — never splitting on dense data
    (one giant session per user, zero deterministic closures) or always
    splitting on sparse data.  ~0.6x the per-user median inter-event
    gap keeps the split rate non-trivial at every test sf (165 min at
    sf0.01, 16 at sf0.1, 2 at sf1)."""
    import os
    import re

    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    try:
        sf = float(m.group(1)) if m else 0.1
    except ValueError:
        sf = 0.1
    return max(1, round(1.65 / sf))


def _st11_sql(sf_dir: str) -> str:
    gap = _session_gap_minutes(sf_dir)
    return f"""
    WITH ev AS (
      SELECT event_id % 64 AS user_id, ts, event_id,
             coalesce(value, 0.0) AS value
      FROM events WHERE ts IS NOT NULL
    ),
    marked AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts > lag(ts) OVER w + INTERVAL {gap} MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ),
    agg AS (
      SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
             CAST(count(*) AS BIGINT) AS n_events,
             round(sum(value), 6) AS total_value
      FROM sess GROUP BY user_id, sid
    ),
    umax AS (
      SELECT event_id % 64 AS user_id, max(ts) AS mt
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    )
    SELECT a.user_id, a.session_start, a.session_end, a.n_events,
           a.total_value
    FROM agg a JOIN umax u USING (user_id)
    WHERE u.mt > a.session_end + INTERVAL {gap} MINUTE
    """


@register(
    "st11_session_windows",
    sql=_st11_sql,
    doc="ST11: per-user session windows from a REAL stateful streaming "
    "query — file source, availableNow, applyInPandasWithState with "
    "EventTimeTimeout (streaming.sessions.session_stream; ref: the "
    "per-key stateful accumulators, websocket.py:400-520), memory "
    "sink.  The comparison keeps only the DETERMINISTIC emissions: "
    "sessions an in-data closure proved (a later event > gap after "
    "session_end exists for the user) — whether the final watermark's "
    "timer batch also flushed each user's LAST session is trigger-"
    "timing-dependent, so those rows are excluded on BOTH sides.  The "
    "oracle recomputes the same sessions as batch gaps-and-islands "
    "SQL: stream/batch parity is the assertion, same as st2.  The "
    "parity argument additionally assumes availableNow delivers ALL "
    "events in ONE micro-batch — true here because the source is the "
    "single events.parquet file and no maxFilesPerTrigger is set; a "
    "multi-file source could split the run into several batches, "
    "where intermediate watermark advances may flush sessions the "
    "deterministic-subset filter does not model (ADVICE r11).  Scale: "
    "state is O(1) per live user; the only exchange is the hash "
    "partition on user_id any per-user operator needs.",
)
def st11_session_windows(spark, sf_dir):
    from crypto_datalake_spark.streaming import session_stream

    name = "st11_sessions_sink"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    gap_min = _session_gap_minutes(sf_dir)
    stream = (
        spark.readStream.schema(_EVENTS_PHYSICAL)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
        .withColumn("ts", F.expr(_LONG_TO_NTZ))
        .where(F.col("ts").isNotNull())
        .select(
            F.pmod(F.col("event_id"), F.lit(64)).cast("long").alias("user_id"),
            F.col("event_id"),
            F.col("ts"),
            F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
        )
    )
    # Skip the trailing NO-DATA micro-batch for this availableNow replay
    # (r14 optimization): after the single data batch, Spark schedules an
    # empty batch solely to fire event-time timers, whose only emissions
    # are each user's LAST (still-open) session — rows the deterministic-
    # subset filter below discards unconditionally (no later event exists
    # past their session_end).  The empty batch costs a full state-store
    # load/commit cycle across every state partition (~2 s measured at
    # sf0.1: addBatch 2011 ms for 0 input rows) for output that is thrown
    # away.  Output identity with the flush ON is pinned by
    # test_st11_nodata_batch_skip_is_output_identical; a LIVE stream must
    # keep no-data batches (timers must fire between arrivals), so the
    # conf is scoped to this replay and restored.
    nodata_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev_nodata = spark.conf.get(nodata_key, "true")
    spark.conf.set(nodata_key, "false")
    try:
        q = (
            session_stream(stream, gap_minutes=gap_min, watermark="10 minutes")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _await_or_die(q, 300)
    finally:
        spark.conf.set(nodata_key, prev_nodata)
    sessions = spark.table(name)
    # deterministic subset: keep sessions whose closure is proven by the
    # DATA (a later event exists past the gap) — per-user max ts is a
    # 64-row broadcast
    ev = t(spark, sf_dir, "events")
    umax = (
        ev.where(F.col("ts").isNotNull())
        .groupBy(
            F.pmod(F.col("event_id"), F.lit(64)).cast("long").alias("user_id")
        )
        .agg(F.max("ts").alias("__mt"))
    )
    return (
        sessions.join(F.broadcast(umax), "user_id")
        .where(
            F.col("__mt")
            > F.col("session_end") + F.expr(f"INTERVAL {gap_min} MINUTES")
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            F.round("total_value", 6).alias("total_value"),
        )
    )


def synth_depth_events(spark, sf_dir):
    """Deterministic continuous depth-event stream from the events table
    (snapshot first, then pu-chained deltas) — shared by the registered
    query and the fold-vs-declarative equivalence test.

    The store is SYNTHESIZED ONCE per sf and persisted to a warehouse
    parquet table (same split as llm.ivf_centroid_table): in production
    the depth-event store IS materialized parquet written by the
    collector, so replay always reads files with natural split
    parallelism — rebuilding the synthetic store per query call was
    bench artifact, and caching it was cache-pressure roulette (the
    ~2 GB JSON store evicted under memory pressure and run times swung
    1.5-9 s). The test corpus is immutable, so the cache key is the sf
    name only.

    The one-time build ranks with the two-phase partition-parallel
    global_row_number (ordered symbol-first, minus each symbol's
    broadcast base offset), NOT ``Window.partitionBy(symbol)``: with a
    handful of hot symbols that window serialises the whole store onto
    as many tasks as there are symbols (5 in the bench data) — the same
    scale hazard the replay itself avoids (see replay_book_batch)."""
    import os

    from crypto_datalake_spark.io import warehouse_cached

    name = os.path.basename(os.path.normpath(sf_dir))
    store = warehouse_cached(
        spark,
        f"synth_depth_{name}",
        [os.path.join(sf_dir, "events.parquet")],
        lambda: _build_synth_depth(spark, sf_dir),
    )
    # the test-scale store is a few MB, so the file-combining cost model
    # hands the whole scan to ONE task — and every downstream from_json /
    # explode then runs single-threaded. Spread the rows across the
    # executor cores up front (a ~10 MB exchange); at production scale
    # the store is >>maxPartitionBytes and file splits parallelize the
    # scan naturally, making the repartition a no-op-cost safety net.
    return store.repartition(spark.sparkContext.defaultParallelism)


def _build_synth_depth(spark, sf_dir):
    from crypto_datalake_spark.ops.rank import global_row_number

    ev = t(spark, sf_dir, "events")
    ranked = global_row_number(
        ev,
        [F.col("event_type"), F.col("ts"), F.col("event_id")],
        out_col="__grk",
    )
    # global rank in (symbol, ts, event_id) order is monotone within each
    # symbol; subtracting the symbol's min rank (tiny broadcast agg) makes
    # it the per-symbol 1-based sequence the pu-chain needs
    base = ranked.groupBy("event_type").agg(F.min("__grk").alias("__base"))
    # disjoint price bands (bids < 100 < asks) keep the synthetic book
    # uncrossed, so spread/impact/health are all non-degenerate
    bid_price = 90.0 + F.pmod(F.col("value"), F.lit(10.0))
    ask_price = 101.0 + F.pmod(F.col("value"), F.lit(10.0))
    depth = (
        ranked.join(F.broadcast(base), "event_type")
        .withColumn("rn", (F.col("__grk") - F.col("__base") + 1).cast("int"))
        .select(
            F.col("event_type").alias("symbol"),
            F.col("ts").alias("event_time"),
            F.when(F.col("rn") == 1, "snapshot").otherwise("delta").alias("kind"),
            F.col("rn").alias("first_update_id"),
            F.col("rn").alias("final_update_id"),
            F.when(F.col("rn") > 1, F.col("rn") - 1).alias("prev_final_update_id"),
            F.format_string('[[%.6f, %.6f]]', bid_price, F.abs("value")).alias("bids"),
            F.format_string('[[%.6f, %.6f]]', ask_price, F.abs("value")).alias("asks"),
        )
    )
    return depth


@register(
    "st3_orderbook_replay",
    sql="""
    WITH ev AS (
      SELECT event_type AS symbol, ts, value,
             row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
      FROM events
    ),
    -- each non-null event applies one bid level and one ask level;
    -- qty <= 0 would delete the level (qty = round(abs(value),6) here)
    lv AS (
      SELECT symbol, rn, 'bid' AS side,
             round(90 + (value - 10 * floor(value / 10)), 6) AS price,
             round(abs(value), 6) AS qty
      FROM ev WHERE value IS NOT NULL
      UNION ALL
      SELECT symbol, rn, 'ask',
             round(101 + (value - 10 * floor(value / 10)), 6),
             round(abs(value), 6)
      FROM ev WHERE value IS NOT NULL
    ),
    -- final book = last write per (symbol, side, price); deleted if <= 0
    fin AS (
      SELECT symbol, side, price, qty FROM (
        SELECT *, row_number() OVER (
          PARTITION BY symbol, side, price ORDER BY rn DESC) AS rr
        FROM lv
      ) WHERE rr = 1 AND qty > 0
    ),
    ba AS (
      SELECT symbol,
             max(CASE WHEN side = 'bid' THEN price END) AS best_bid,
             min(CASE WHEN side = 'ask' THEN price END) AS best_ask
      FROM fin GROUP BY 1
    ),
    -- ST4 impact walk: fill 100k notional ascending the asks
    walk AS (
      SELECT symbol, price, price * qty AS notional,
             coalesce(sum(price * qty) OVER (
               PARTITION BY symbol ORDER BY price
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM fin WHERE side = 'ask'
    ),
    imp AS (
      SELECT symbol,
             sum(CASE WHEN cum_before < 100000
                      THEN least(100000 - cum_before, notional) ELSE 0 END) AS cost,
             sum(CASE WHEN cum_before < 100000
                      THEN least(100000 - cum_before, notional) / price ELSE 0 END) AS fq,
             coalesce(sum(notional), 0) >= 100000 AS fillable
      FROM walk GROUP BY 1
    ),
    tops AS (
      SELECT symbol, side, qty, row_number() OVER (
        PARTITION BY symbol, side
        ORDER BY CASE WHEN side = 'bid' THEN -price ELSE price END) AS rnk
      FROM fin
    ),
    topq AS (
      SELECT symbol,
             avg(CASE WHEN side = 'bid' THEN qty END)
               FILTER (WHERE rnk <= 10) AS avg_bid,
             avg(CASE WHEN side = 'ask' THEN qty END)
               FILTER (WHERE rnk <= 10) AS avg_ask
      FROM tops GROUP BY 1
    ),
    met AS (
      SELECT ba.symbol,
             CASE WHEN ok THEN round(best_bid, 6) END AS best_bid,
             CASE WHEN ok THEN round(best_ask, 6) END AS best_ask,
             CASE WHEN ok THEN round(mid, 6) END AS mid,
             CASE WHEN ok THEN round((best_ask - best_bid) / mid * 100, 6) END AS spread_pct,
             CASE WHEN ok AND fq > 0 THEN round(((cost / fq) - mid) / mid * 100, 6) END AS impact_pct,
             CASE WHEN ok THEN fillable ELSE FALSE END AS fillable,
             CASE WHEN ok THEN round(avg_bid, 6) END AS avg_bid_qty_top10,
             CASE WHEN ok THEN round(avg_ask, 6) END AS avg_ask_qty_top10,
             TRUE AS synced,
             CASE WHEN ok THEN
               (NOT fillable) OR (best_ask - best_bid) / mid * 100 > 2.0
               OR least(avg_bid, avg_ask) < 1.0
             ELSE TRUE END AS degraded
      FROM (
        SELECT *,
               best_bid IS NOT NULL AND best_ask IS NOT NULL
                 AND best_bid < best_ask AS ok,
               (best_bid + best_ask) / 2 AS mid
        FROM ba
      ) ba LEFT JOIN imp USING (symbol) LEFT JOIN topq USING (symbol)
    )
    -- LEFT joins + coalesces mirror the replay: a symbol whose book
    -- emptied out (every level deleted) or never crossed the threshold
    -- still emits degraded rows per observed minute, never disappears
    SELECT m.symbol, m.minute_ts,
           best_bid, best_ask, mid, spread_pct, impact_pct,
           coalesce(fillable, FALSE) AS fillable,
           avg_bid_qty_top10, avg_ask_qty_top10,
           coalesce(synced, TRUE) AS synced,
           coalesce(degraded, TRUE) AS degraded
    FROM (SELECT DISTINCT event_type AS symbol, date_trunc('minute', ts) AS minute_ts
          FROM events) m
    LEFT JOIN met USING (symbol)
    """,
    doc="ST3-ST5: order-book state machine replay — snapshot sync, "
    "sequence-continuity delta application, impact walk, health metrics "
    "(streaming.orderbook; ref websocket.py:234-413). Depth events are "
    "synthesized deterministically from the events table (first event per "
    "key = snapshot, then continuous deltas; bids land in [90,100), asks "
    "in [101,111) so the replayed book is never crossed and the full "
    "metrics path is exercised). Batch recovery uses the DECLARATIVE "
    "replay (replay_book_batch — window last-write per level, fully "
    "distributed; the scale path for a sequence-validated event store); "
    "the stateful fold is the streaming twin under "
    "applyInPandasWithState, and test_streaming.py asserts "
    "fold == declarative on continuous input. The oracle replays the "
    "same book in SQL: last qty per (symbol, side, price) via windows, "
    "best bid/ask from surviving levels, the 100k-notional impact walk "
    "as a cumulative-sum clamp, top-10 level-quality averages. Replay "
    "folds every event before emitting, so each observed minute "
    "carries the final-state metrics — which is what the SQL mirrors. "
    "Doubles rounded(6): replay and SQL aggregate sum in different "
    "orders (~1e-15 association drift).",
)
def st3_orderbook_replay(spark, sf_dir):
    from crypto_datalake_spark.streaming.orderbook import replay_book_batch

    # the replay reads its input three times (levels, observed minutes,
    # sync flags) — synth_depth_events hands back a materialized parquet
    # table, so each read is a parallel file scan with column pruning,
    # exactly the production shape (the collector writes the depth-event
    # store as parquet; replay recovers from it).
    depth = synth_depth_events(spark, sf_dir)
    metrics = replay_book_batch(depth)
    rounded = [
        "best_bid", "best_ask", "mid", "spread_pct", "impact_pct",
        "avg_bid_qty_top10", "avg_ask_qty_top10",
    ]
    return metrics.select(
        *[
            F.round(c, 6).alias(c) if c in rounded else F.col(c)
            for c in metrics.columns
        ]
    )


@register(
    "orderbook_segmented_replay",
    sql="""
    WITH ev AS (
      SELECT event_type AS symbol, ts, value,
             row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
      FROM events
    ),
    snapw AS (
      SELECT symbol,
             max(CASE WHEN (rn - 1) % 400 = 0 THEN rn END) AS last_snap,
             max(rn) AS last_u
      FROM ev GROUP BY 1
    ),
    lv AS (
      SELECT e.symbol, e.rn, 'bid' AS side,
             round(90 + (value - 10 * floor(value / 10)), 6) AS price,
             round(abs(value), 6) AS qty
      FROM ev e JOIN snapw s USING (symbol)
      WHERE value IS NOT NULL AND e.rn >= s.last_snap
      UNION ALL
      SELECT e.symbol, e.rn, 'ask',
             round(101 + (value - 10 * floor(value / 10)), 6),
             round(abs(value), 6)
      FROM ev e JOIN snapw s USING (symbol)
      WHERE value IS NOT NULL AND e.rn >= s.last_snap
    ),
    fin AS (
      SELECT symbol, side, price, qty FROM (
        SELECT *, row_number() OVER (
          PARTITION BY symbol, side, price ORDER BY rn DESC) AS rr
        FROM lv
      ) WHERE rr = 1 AND qty > 0
    )
    SELECT f.symbol, f.side, f.price, f.qty,
           CAST(s.last_u AS BIGINT) AS last_u, TRUE AS synced
    FROM fin f JOIN snapw s USING (symbol)
    """,
    doc="Segment-parallel EXACT replay of the stateful order-book fold "
    "(streaming.orderbook.replay_book_segmented, round 10 — the 100x "
    "mitigation for the fold's serial-within-a-symbol limit, SCALE.md). "
    "The synthetic store re-tags every 400th event as a snapshot, so "
    "each symbol replays as many independent segments folded in "
    "parallel (parallelism = total segments, not symbols); the driver "
    "pass realizes the chain and refolds only boundaries a non-empty "
    "buffer crossed (none here — continuous ids). Output: the final "
    "realized book exploded to one row per surviving level plus "
    "last_u/synced. Oracle: last write per (symbol, side, price) at or "
    "after each symbol's LAST snapshot, qty > 0 surviving — the "
    "snapshot reset makes earlier history irrelevant to the final "
    "state, which is exactly what makes segments independent. "
    "Segmentation semantics (buffered-bridge cascades, null-id "
    "snapshots, desyncs) are pinned by the test_streaming.py segmented "
    "family incl. a property sweep vs the sequential fold.",
)
def orderbook_segmented_replay(spark, sf_dir):
    from crypto_datalake_spark.streaming.orderbook import (
        replay_book_segmented,
    )

    depth = synth_depth_events(spark, sf_dir).withColumn(
        "kind",
        F.when(
            F.pmod(F.col("final_update_id") - 1, F.lit(400)) == 0,
            F.lit("snapshot"),
        ).otherwise(F.lit("delta")),
    )
    final = replay_book_segmented(depth)

    def _side(col, tag):
        return final.select(
            "symbol", "last_u", "synced",
            F.explode(
                F.from_json(F.col(col), "map<string,double>")
            ).alias("price_s", "qty"),
        ).select(
            "symbol",
            F.lit(tag).alias("side"),
            F.col("price_s").cast("double").alias("price"),
            F.col("qty"),
            F.col("last_u"),
            F.col("synced"),
        )

    return _side("bids", "bid").unionByName(_side("asks", "ask"))
