"""Streaming subsystem tests (SURVEY.md §2.8), mirroring the reference's
collector tests (tests/test_live_collector.py: depth-sync bridge rule,
liquidation semantics, latency; test_websocket_payload_processor.py:
retention cleanup).

Streaming queries run with availableNow over file sources into memory
sinks — bounded, deterministic, no wall-clock dependence.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest

from pyspark.sql import functions as F

from crypto_datalake_spark.streaming import (
    DEPTH_EVENT_SCHEMA,
    book_state_stream,
    foreach_batch_upsert,
    minute_feature_stream,
    retention_delete,
)
from crypto_datalake_spark.streaming.silver import heartbeat_stream

_EVENTS_DDL = (
    "symbol string, stream string, event_time timestamp_ntz, "
    "transact_time timestamp_ntz, arrival_time timestamp_ntz, side string, "
    "price double, qty double, orig_qty double, exec_qty double"
)


def _t(sec: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(seconds=sec)


@pytest.fixture()
def bronze_events(spark):
    # minute 0: two liqs (one SELL/long, one BUY/short) + a depth event
    # minute 1: trade only — liq columns must be NULL (0-vs-NULL)
    rows = [
        ("BTC", "liq", _t(10), _t(9.9), _t(10.2), "SELL", 100.0, 2.0, 3.0, 2.0),
        ("BTC", "liq", _t(20), _t(19.9), _t(20.1), "BUY", 200.0, 1.0, 1.0, 1.0),
        ("BTC", "depth", _t(30), _t(29.9), _t(30.05), None, None, None, None, None),
        ("BTC", "trade", _t(70), _t(69.9), _t(70.8), "BUY", 101.0, 5.0, None, None),
    ]
    return spark.createDataFrame(rows, _EVENTS_DDL)


def test_minute_features_batch_semantics(bronze_events):
    got = {r["minute_ts"]: r for r in minute_feature_stream(bronze_events).collect()}
    m0 = got[dt.datetime(2024, 1, 1, 0, 0)]
    assert m0["liq_long_notional"] == 200.0 and m0["liq_long_count"] == 1
    assert m0["liq_short_notional"] == 200.0 and m0["liq_short_count"] == 1
    # qty-weighted fill price: (100·2 + 200·1)/(2+1)
    assert m0["liq_avg_fill_price"] == pytest.approx(400.0 / 3.0)
    # unfilled ratio: Σ(orig−exec)/Σorig = (1+0)/4
    assert m0["liq_unfilled_ratio"] == pytest.approx(0.25)
    assert m0["has_liq"] and m0["has_depth"]
    assert not m0["latency_bad"]  # max engine latency 200 ms
    m1 = got[dt.datetime(2024, 1, 1, 0, 1)]
    assert m1["liq_long_notional"] is None  # NULL, not 0 — no liq coverage
    assert not m1["has_liq"]
    assert m1["latency_bad"]  # 800 ms engine latency > 500


def test_minute_features_streaming_equals_batch(spark, tmp_path, bronze_events):
    src = str(tmp_path / "bronze")
    bronze_events.write.parquet(src)
    stream = spark.readStream.schema(_EVENTS_DDL).parquet(src)
    q = (
        minute_feature_stream(stream)
        .writeStream.format("memory")
        .queryName("mf_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream timed out"
    got = spark.table("mf_stream")
    batch = minute_feature_stream(bronze_events)
    assert sorted(got.collect()) == sorted(batch.collect())


# --- order book ------------------------------------------------------------

def _depth_rows(spark, rows):
    return spark.createDataFrame(rows, DEPTH_EVENT_SCHEMA)


_SNAP = (
    "BTC", _t(5), "snapshot", None, 100, None,
    json.dumps([[100.0, 600.0], [99.0, 600.0]]),
    json.dumps([[101.0, 600.0], [102.0, 600.0]]),
)
# bridge delta: U=99 <= lastUpdateId+1=101 <= u=103
_BRIDGE = (
    "BTC", _t(6), "delta", 99, 103, None,
    json.dumps([[100.0, 700.0]]), json.dumps([]),
)
# continuous delta: pu == last_u == 103; deletes ask level 102
_NEXT = (
    "BTC", _t(7), "delta", 104, 110, 103,
    json.dumps([]), json.dumps([[102.0, 0.0]]),
)


def test_book_sync_and_metrics_batch(spark):
    out = book_state_stream(
        _depth_rows(spark, [_SNAP, _BRIDGE, _NEXT])
    ).collect()
    assert len(out) == 1  # one observed minute
    r = out[0]
    assert r["synced"]
    assert r["best_bid"] == 100.0 and r["best_ask"] == 101.0
    mid = 100.5
    assert r["mid"] == mid
    assert r["spread_pct"] == pytest.approx((101.0 - 100.0) / mid * 100)
    # impact walk: 60600 from level 101 (600 qty), rest unfillable (102 deleted)
    # → 100k notional NOT fillable after the delete
    assert not r["fillable"] and r["degraded"]
    assert r["avg_bid_qty_top10"] == pytest.approx(650.0)  # (700+600)/2


def test_book_sequence_break_degrades(spark):
    gap = ("BTC", _t(8), "delta", 120, 125, 999, json.dumps([[100.0, 1.0]]), json.dumps([]))
    out = book_state_stream(_depth_rows(spark, [_SNAP, _BRIDGE, gap])).collect()
    assert len(out) == 1
    assert not out[0]["synced"] and out[0]["degraded"]


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.parametrize(
    "backend",
    [
        "legacy",
        pytest.param(
            "tws",
            marks=pytest.mark.skipif(
                not _has_protobuf(),
                reason="transformWithState state server needs protobuf",
            ),
        ),
    ],
)
def test_book_buffer_until_snapshot_across_batches(spark, tmp_path, backend):
    from crypto_datalake_spark.streaming import book_state_stream_tws

    src = tmp_path / "depth"
    src.mkdir()
    # file 1: delta before any snapshot → buffered, unsynced metrics
    _depth_rows(spark, [("BTC", _t(1), "delta", 95, 99, None,
                         json.dumps([[100.0, 5.0]]), json.dumps([]))]) \
        .coalesce(1).write.parquet(str(src / "f1"))
    # file 2: snapshot at u=98 + the buffer drains (u=99 > 98, U=95 <= 99 <= 99)
    _depth_rows(spark, [("BTC", _t(65), "snapshot", None, 98, None,
                         json.dumps([[100.0, 600.0]]),
                         json.dumps([[101.0, 600.0], [102.0, 600.0]]))]) \
        .coalesce(1).write.parquet(str(src / "f2"))
    stream = spark.readStream.schema(DEPTH_EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src / "*"))
    fold = book_state_stream if backend == "legacy" else book_state_stream_tws
    q = (
        fold(stream)
        .writeStream.format("memory")
        .queryName("book_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream timed out"
    got = sorted(spark.table("book_stream").collect(), key=lambda r: r["minute_ts"])
    assert len(got) == 2
    assert not got[0]["synced"]           # pre-snapshot minute: buffered only
    assert got[1]["synced"]               # post-snapshot: book live
    assert got[1]["best_bid"] == 100.0    # buffered delta overwrote bid qty
    assert got[1]["fillable"]             # 101·600 + 102·600 > 100k notional


# --- silver sink / retention ----------------------------------------------

def test_foreach_batch_upsert_idempotent(spark, tmp_path, bronze_events):
    src = str(tmp_path / "bronze")
    bronze_events.write.parquet(src)
    lake = str(tmp_path / "silver")

    def run(ckpt):
        stream = spark.readStream.schema(_EVENTS_DDL).parquet(src)
        sink = foreach_batch_upsert(
            spark, lake,
            keys=["symbol", "minute_ts"], order_cols=["max_event_time"],
            partition_cols=["symbol"],
        )
        q = (
            minute_feature_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream timed out"

    run("ckpt1")
    run("ckpt2")  # full replay — upsert must keep the table deduplicated
    got = spark.read.parquet(lake)
    assert got.count() == 2
    assert got.where(F.col("minute_ts") == dt.datetime(2024, 1, 1, 0, 0)).head()[
        "liq_long_notional"
    ] == 200.0


def test_retention_delete_partition_granular(spark, tmp_path):
    lake = str(tmp_path / "events")
    df = spark.createDataFrame(
        [(d, i, float(i)) for d in ("2024-01-01", "2024-01-02", "2024-01-03")
         for i in range(3)],
        "day string, event_id int, value double",
    )
    df.write.partitionBy("day").parquet(lake)
    removed = retention_delete(spark, lake, "day", keep_values={"2024-01-02", "2024-01-03"})
    assert removed == 1
    remaining = spark.read.parquet(lake).select("day").distinct().collect()
    assert sorted(str(r["day"]) for r in remaining) == ["2024-01-02", "2024-01-03"]


def test_heartbeat_stream(bronze_events):
    got = {(r["stream"], r["minute_ts"]): r for r in heartbeat_stream(bronze_events).collect()}
    assert got[("liq", dt.datetime(2024, 1, 1, 0, 0))]["n_messages"] == 2
    assert got[("trade", dt.datetime(2024, 1, 1, 0, 1))]["alive"]


# --- transformWithState sessionization -------------------------------------

_SESS_DDL = "user_id bigint, event_id bigint, ts timestamp_ntz, value double"


def _sess_rows(spark, rows):
    return spark.createDataFrame(rows, _SESS_DDL)


def test_session_stream_matches_batch_sessionize(spark, tmp_path):
    """Stream sessions (closed in-data or by event-time timer) must be a
    subset of the batch gaps-and-islands sessions, and the deterministic
    closures must all be present."""
    from crypto_datalake_spark.ops.gaps import sessionize
    from crypto_datalake_spark.streaming import session_stream

    def m(minutes):  # event time helper
        return _t(minutes * 60)

    batch1 = [
        # user 1: session A (0, 10min), closed in-data by the 120min event;
        # session B (120, 125) stays open at end of batch1.
        (1, 1, m(0), 1.0),
        (1, 2, m(10), 2.0),
        (1, 3, m(120), 4.0),
        (1, 4, m(125), 8.0),
        # user 2: single event; closes via timer once watermark passes 35min.
        (2, 5, m(5), 16.0),
    ]
    batch2 = [(3, 6, m(600), 32.0)]  # watermark pusher

    src = tmp_path / "sess_src"
    src.mkdir()
    _sess_rows(spark, batch1).coalesce(1).write.parquet(str(src / "f1"))
    _sess_rows(spark, batch2).coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(_SESS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        session_stream(stream, gap_minutes=30, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream timed out"
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["total_value"])
        for r in spark.table("sessions_stream").collect()
    }

    all_rows = _sess_rows(spark, batch1 + batch2)
    batch_sessions = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["total_value"])
        for r in sessionize(all_rows, "ts", 30, ["user_id"], ["event_id"])
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .drop("session_id")
        .collect()
    }

    # every emitted session is a true batch session (boundaries + aggs agree)
    assert got <= batch_sessions
    # the in-data closure and the timer closure are deterministic: present.
    must_have = {
        (1, m(0), m(10), 2, 3.0),   # user 1 session A, closed by gap in data
        (2, m(5), m(5), 1, 16.0),   # user 2, closed by timer after batch 1
    }
    assert must_have <= got


def test_session_stream_tws_requires_protobuf(spark):
    """The transformWithState backend must fail fast (ImportError) when the
    state server's protobuf dep is absent — not crash mid-query."""
    from crypto_datalake_spark.streaming import session_stream_tws

    ev = _sess_rows(spark, []).select("user_id", "event_id", "ts", "value")
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError):
            session_stream_tws(ev)
        return
    # protobuf present: building the plan must succeed (not executed here).
    session_stream_tws(ev)


def test_book_stream_tws_requires_protobuf(spark):
    """Same fail-fast contract for the order-book TWS twin."""
    from crypto_datalake_spark.streaming import book_state_stream_tws

    depth = _depth_rows(spark, [])
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError):
            book_state_stream_tws(depth)
        return
    book_state_stream_tws(depth)


def test_declarative_replay_matches_fold(spark):
    """replay_book_batch (the distributed batch-recovery path) must equal
    the stateful fold on continuous input — both on the synthesized
    event-store replay and the hand-built snapshot/bridge sequence."""
    from pyspark.sql import functions as F

    from crypto_datalake_spark.queries.streaming_q import synth_depth_events
    from crypto_datalake_spark.streaming.orderbook import replay_book_batch

    def canon(df):
        rounded = [
            "best_bid", "best_ask", "mid", "spread_pct", "impact_pct",
            "avg_bid_qty_top10", "avg_ask_qty_top10",
        ]
        cols = [
            F.round(c, 6).alias(c) if c in rounded else F.col(c)
            for c in df.columns
        ]
        return sorted(map(tuple, df.select(*cols).collect()))

    for depth in (
        synth_depth_events(spark, "/root/testdata/sf0.001"),
        _depth_rows(spark, [_SNAP, _BRIDGE, _NEXT]),
    ):
        assert canon(replay_book_batch(depth)) == canon(book_state_stream(depth))


def test_declarative_replay_property_equivalence(spark):
    """Property sweep: replay_book_batch equals the stateful fold on
    random CONTRACT-SHAPED stores — snapshot first, pu-chained deltas,
    re-touched and deleted levels, multiple snapshots, disjoint
    bid/ask bands (the declarative path's never-crossed assumption)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crypto_datalake_spark.streaming.orderbook import replay_book_batch

    def canon(df):
        from pyspark.sql import functions as F

        rounded = [
            "best_bid", "best_ask", "mid", "spread_pct", "impact_pct",
            "avg_bid_qty_top10", "avg_ask_qty_top10",
        ]
        cols = [
            F.round(c, 6).alias(c) if c in rounded else F.col(c)
            for c in df.columns
        ]
        return sorted(map(tuple, df.select(*cols).collect()))

    BIDS = [95.0, 96.0, 97.0, 98.0, 99.0]
    ASKS = [101.0, 102.0, 103.0, 104.0]
    QTYS = [0.0, 1.0, 2.5, 600.0]  # 0 deletes; 600 makes books fillable
    levels = lambda prices: st.lists(  # noqa: E731
        st.tuples(st.sampled_from(prices), st.sampled_from(QTYS)),
        max_size=3,
    )
    op = st.tuples(
        st.sampled_from(["snap", "delta", "delta", "delta"]),
        levels(BIDS), levels(ASKS),
        st.integers(0, 2),  # extra id span of the delta
        st.integers(0, 1),  # minutes advanced since the previous event
    )

    @settings(deadline=None, max_examples=12)
    @given(ops=st.lists(op, min_size=1, max_size=12))
    def run(ops):
        last = 100
        minute = 0
        since_snap = 0
        rows = [
            ("S", _t(0), "snapshot", None, last, None,
             json.dumps([[99.0, 2.0]]), json.dumps([[101.0, 2.0]])),
        ]
        for kind, bids, asks, span, dt in ops:
            minute += dt * 60
            ts = _t(minute)
            if kind == "snap":
                # two snapshots at the SAME update id carry the same book
                # on a real feed (same id = same state); random content
                # there would be an impossible store, so require at
                # least one delta between snapshots
                if since_snap == 0:
                    continue
                since_snap = 0
                rows.append(("S", ts, "snapshot", None, last, None,
                             json.dumps(bids), json.dumps(asks)))
                continue
            since_snap += 1
            U = last + 1
            u = U + span
            rows.append(("S", ts, "delta", U, u, last,
                         json.dumps(bids), json.dumps(asks)))
            last = u
        depth = _depth_rows(spark, rows)
        assert canon(replay_book_batch(depth)) == canon(
            book_state_stream(depth)
        ), rows

    run()


def test_declarative_replay_crossed_store_is_out_of_contract(spark):
    """Contract limit, pinned: on a store whose deltas CROSS the book the
    fold desyncs at the crossing and buffers everything after, while the
    declarative replay keeps last-writing levels — content diverges, so
    recovery from a store that cannot guarantee an uncrossed book must
    use the fold (or replay_book_segmented), never replay_book_batch."""
    from crypto_datalake_spark.streaming.orderbook import replay_book_batch

    rows = [
        ("S", _t(0), "snapshot", None, 100, None,
         json.dumps([[99.0, 1.0]]), json.dumps([[101.0, 1.0]])),
        # crossing delta: bid 102 >= ask 101 -> fold desyncs here
        ("S", _t(60), "delta", 101, 105, 100,
         json.dumps([[102.0, 5.0]]), json.dumps([])),
        # post-crossing delta: fold BUFFERS it; declarative applies it
        ("S", _t(120), "delta", 106, 110, 105,
         json.dumps([[97.0, 3.0]]), json.dumps([])),
    ]
    depth = _depth_rows(spark, rows)
    fold = {(r["symbol"], r["minute_ts"]): r
            for r in book_state_stream(depth).collect()}
    decl = {(r["symbol"], r["minute_ts"]): r
            for r in replay_book_batch(depth).collect()}
    f = fold[("S", _t(120))]
    d = decl[("S", _t(120))]
    assert f["synced"] is False and f["degraded"] is True
    # the declarative path reports the snapshot as synced and serves the
    # crossed final book as degraded nulls — same degraded flag, but the
    # synced flag and (had the book uncrossed later) the content differ
    assert d["synced"] is True and d["degraded"] is True


def test_foreach_batch_upsert_atomic(spark, tmp_path, bronze_events):
    """atomic=True micro-batch sink: checkpoint replay composes with the
    manifest commit — the table state is identical after a full replay,
    read through the manifest."""
    from crypto_datalake_spark.txn import read_table

    src = str(tmp_path / "bronze_a")
    bronze_events.write.parquet(src)
    lake = str(tmp_path / "silver_a")

    def run(ckpt):
        stream = spark.readStream.schema(_EVENTS_DDL).parquet(src)
        sink = foreach_batch_upsert(
            spark, lake,
            keys=["symbol", "minute_ts"], order_cols=["max_event_time"],
            partition_cols=["symbol"], atomic=True,
        )
        q = (
            minute_feature_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream timed out"

    run("ckpt_a1")
    run("ckpt_a2")  # full replay
    got = read_table(spark, lake)
    assert got.count() == 2
    assert got.where(F.col("minute_ts") == dt.datetime(2024, 1, 1, 0, 0)).head()[
        "liq_long_notional"
    ] == 200.0


def test_foreach_batch_upsert_records_skipping_stats(
    spark, tmp_path, bronze_events
):
    """stats_cols on the atomic streaming sink: each micro-batch commit
    records per-partition min/max, so the streamed silver table is
    manifest-prunable with read_table_skipping."""
    from crypto_datalake_spark.txn import current_manifest, read_table_skipping

    src = str(tmp_path / "bronze_s")
    bronze_events.write.parquet(src)
    lake = str(tmp_path / "silver_s")
    stream = spark.readStream.schema(_EVENTS_DDL).parquet(src)
    sink = foreach_batch_upsert(
        spark, lake,
        keys=["symbol", "minute_ts"], order_cols=["max_event_time"],
        partition_cols=["symbol"], atomic=True,
        stats_cols=["minute_ts"],
    )
    q = (
        minute_feature_stream(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream timed out"
    m = current_manifest(spark, lake)
    assert "stats" in m and all("minute_ts" in s for s in m["stats"].values())
    # bounds before the table's first minute prune EVERYTHING
    assert read_table_skipping(
        spark, lake, {"minute_ts": (None, dt.datetime(2020, 1, 1))}
    ) is None
    # and a covering bound reads the full table
    df = read_table_skipping(
        spark, lake, {"minute_ts": (dt.datetime(2020, 1, 1), None)}
    )
    assert df.count() == 2


def test_session_stream_native_matches_batch(spark, tmp_path):
    """The built-in session_window backend emits the same closed sessions
    as the batch sessionize twin (away from the gap knife-edge)."""
    from crypto_datalake_spark.ops.gaps import sessionize
    from crypto_datalake_spark.streaming.sessions import session_stream_native

    def m(minutes):
        return _t(minutes * 60)

    rows = [
        (1, 1, m(0), 1.0),
        (1, 2, m(10), 2.0),
        (1, 3, m(120), 4.0),
        (1, 4, m(125), 8.0),
        (2, 5, m(5), 16.0),
        (3, 6, m(600), 32.0),  # watermark pusher closes everything above
    ]
    src = tmp_path / "sessn_src"
    src.mkdir()
    _sess_rows(spark, rows).coalesce(1).write.parquet(str(src / "f1"))

    stream = spark.readStream.schema(_SESS_DDL).parquet(str(src / "*"))
    q = (
        session_stream_native(stream, gap_minutes=30, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("sessions_native")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sessn_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream timed out"
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["total_value"])
        for r in spark.table("sessions_native").collect()
    }

    all_rows = _sess_rows(spark, rows)
    want_full = sessionize(all_rows, "ts", 30, ["user_id"]) \
        .groupBy("user_id", "session_id").agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["total_value"])
        for r in want_full.collect()
    }
    # every closed streaming session equals its batch twin; sessions not
    # yet past the watermark (the pusher's own) may be withheld
    assert got <= want
    closed_users = {g[0] for g in got}
    assert {1, 2} <= closed_users


def test_dedup_stream_within_watermark(spark, tmp_path):
    from crypto_datalake_spark.streaming.sessions import (
        dedup_stream_within_watermark,
    )

    def m(minutes):
        return _t(minutes * 60)

    rows = [
        (1, 1, m(0), 1.0),
        (1, 1, m(1), 1.0),   # re-delivery of (1,1) inside the watermark
        (1, 2, m(2), 2.0),
        (2, 1, m(3), 3.0),   # same event_id, different user: distinct key
    ]
    src = tmp_path / "dupe_src"
    src.mkdir()
    _sess_rows(spark, rows).coalesce(1).write.parquet(str(src / "f1"))

    stream = spark.readStream.schema(_SESS_DDL).parquet(str(src / "*"))
    q = (
        dedup_stream_within_watermark(stream, keys=["user_id", "event_id"])
        .writeStream.format("memory")
        .queryName("deduped_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dupe_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream timed out"
    got = sorted(
        (r["user_id"], r["event_id"]) for r in spark.table("deduped_stream").collect()
    )
    assert got == [(1, 1), (1, 2), (2, 1)]

    # batch frames fall back to plain dropDuplicates (same contract)
    batch = dedup_stream_within_watermark(_sess_rows(spark, rows),
                                          keys=["user_id", "event_id"])
    assert batch.count() == 3


def test_interval_join_streams_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join == the same join on batch
    frames: every (trade, mark) pair with the mark in [t-2min, t]."""
    from crypto_datalake_spark.streaming.joins import interval_join_streams

    def m(minutes):
        return _t(minutes * 60)

    trades = [(1, 10, m(5), 100.0), (1, 11, m(9), 101.0), (2, 12, m(5), 50.0)]
    marks = [(1, 20, m(4), 99.5), (1, 21, m(8), 100.5), (2, 22, m(0), 49.0),
             (3, 23, m(600), 0.0)]  # watermark pusher

    tdir, mdir = tmp_path / "ij_t", tmp_path / "ij_m"
    tdir.mkdir(); mdir.mkdir()
    _sess_rows(spark, trades).coalesce(1).write.parquet(str(tdir / "f"))
    _sess_rows(spark, marks).coalesce(1).write.parquet(str(mdir / "f"))

    def stream(d):
        return spark.readStream.schema(_SESS_DDL).parquet(str(d / "*"))

    joined = interval_join_streams(
        stream(tdir), stream(mdir), by="user_id",
        left_ts="ts", right_ts="ts", tolerance="2 minutes",
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("trade_id"),
        F.col("r.event_id").alias("mark_id"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ij_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ij_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream timed out"
    got = {(r["user_id"], r["trade_id"], r["mark_id"])
           for r in spark.table("ij_sink").collect()}

    want_df = interval_join_streams(
        _sess_rows(spark, trades), _sess_rows(spark, marks), by="user_id",
        left_ts="ts", right_ts="ts", tolerance="2 minutes",
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("trade_id"),
        F.col("r.event_id").alias("mark_id"),
    )
    want = {(r["user_id"], r["trade_id"], r["mark_id"]) for r in want_df.collect()}
    # trade@5 matches mark@4; trade@9 matches mark@8; trade@5/u2 has no
    # mark within 2min (mark@0 is 5min stale)
    assert want == {(1, 10, 20), (1, 11, 21)}
    assert got == want


def test_book_first_delta_after_snapshot_bridges_across_batches(spark, tmp_path):
    """A snapshot that arrives ALONE (empty buffer) must admit the next
    delta by the bridge rule (U <= lastUpdateId+1 <= u) — its pu chains
    to the previous STREAM event, not the REST snapshot, so strict
    pu-continuity would spuriously desync a valid book."""
    src = tmp_path / "depth"
    src.mkdir()
    # batch 1: snapshot only, lastUpdateId=100
    _depth_rows(spark, [("BTC", _t(5), "snapshot", None, 100, None,
                         json.dumps([[100.0, 600.0]]),
                         json.dumps([[101.0, 600.0], [102.0, 600.0]]))]) \
        .coalesce(1).write.parquet(str(src / "f1"))
    # batch 2: first live delta; pu=99 (chains to stream, NOT the
    # snapshot's 100) but U=98 <= 101 <= u=105 bridges correctly
    _depth_rows(spark, [("BTC", _t(65), "delta", 98, 105, 99,
                         json.dumps([[100.0, 700.0]]), json.dumps([]))]) \
        .coalesce(1).write.parquet(str(src / "f2"))
    stream = spark.readStream.schema(DEPTH_EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src / "*"))
    q = (
        book_state_stream(stream)
        .writeStream.format("memory")
        .queryName("book_bridge_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream timed out"
    got = sorted(spark.table("book_bridge_stream").collect(),
                 key=lambda r: r["minute_ts"])
    assert len(got) == 2
    assert got[0]["synced"] and got[1]["synced"]   # no spurious desync
    assert got[1]["best_bid"] == 100.0             # delta applied

    # and a genuine gap (u jumps past the bridge window) still degrades
    gap = ("BTC", _t(7), "delta", 300, 310, 299,
           json.dumps([[100.0, 1.0]]), json.dumps([]))
    out = book_state_stream(
        _depth_rows(spark, [("BTC", _t(5), "snapshot", None, 100, None,
                             json.dumps([[100.0, 600.0]]),
                             json.dumps([[101.0, 600.0]]))])
    )
    snap_only = out.collect()
    assert snap_only[0]["synced"]  # snapshot alone: synced, awaiting bridge


def test_unfilled_ratio_uses_raw_executed_qty(spark):
    """A fully-unfilled liquidation (z=0) must contribute its WHOLE
    original qty to the unfilled ratio — the display qty falls back to
    orig for such orders, which would count them as fully filled. A liq
    row with no executed qty at all makes the minute's ratio NULL
    (unsupported), mirroring the reference's latch."""
    rows = [
        # z=0 order: display qty = orig (3.0), raw exec = 0.0
        ("BTC", "liq", _t(10), _t(9.9), _t(10.2), "SELL", 100.0, 3.0, 3.0, 0.0),
        # partial fill: 1 of 2
        ("BTC", "liq", _t(20), _t(19.9), _t(20.1), "BUY", 200.0, 1.0, 2.0, 1.0),
    ]
    got = minute_feature_stream(
        spark.createDataFrame(rows, _EVENTS_DDL)
    ).collect()[0]
    # unfilled = (3-0) + (2-1) = 4 over orig total 5
    assert got["liq_unfilled_ratio"] == pytest.approx(4.0 / 5.0)

    unsupported = rows + [
        ("BTC", "liq", _t(30), _t(29.9), _t(30.1), "SELL", 99.0, 1.0, 1.0, None),
    ]
    got2 = minute_feature_stream(
        spark.createDataFrame(unsupported, _EVENTS_DDL)
    ).collect()[0]
    assert got2["liq_unfilled_ratio"] is None  # any unsupported row -> NULL


@pytest.mark.parametrize(
    ("u_first", "want_synced"),
    [
        (100, True),   # overlap (U <= lastUpdateId): both engines sync
        (101, True),   # exactly contiguous (U == lastUpdateId+1): this
                       # engine syncs (spot spec) — the REFERENCE
                       # degrades here (futures overlap rule,
                       # websocket.py:289-294); deliberate, documented
                       # divergence (same book content, different flag)
        (102, False),  # true gap (U > lastUpdateId+1): both degrade
    ],
)
def test_bridge_rule_first_delta_edges(spark, u_first, want_synced):
    """Pin the chosen first-delta bridge rule — spot-spec
    ``U <= lastUpdateId+1 <= u`` — at its decision boundary, on BOTH
    admission paths: the buffered bridge (delta arrived before the
    snapshot was processed, _sync_from_snapshot) and the live
    await_bridge path (snapshot arrived alone, _apply_delta)."""
    snap_t5 = ("BTC", _t(5), "snapshot", None, 100, None,
               json.dumps([[100.0, 5.0]]), json.dumps([[101.0, 5.0]]))
    snap_t3 = ("BTC", _t(3), "snapshot", None, 100, None,
               json.dumps([[100.0, 5.0]]), json.dumps([[101.0, 5.0]]))
    delta = ("BTC", _t(6), "delta", u_first, 105, 99,
             json.dumps([[100.0, 7.0]]), json.dumps([]))
    # live path: snapshot processed first (empty buffer -> await_bridge),
    # the delta admitted/rejected by the bridge rule
    live = book_state_stream(_depth_rows(spark, [snap_t5, delta])).collect()
    assert len(live) == 1
    assert live[0]["synced"] is want_synced, ("live", u_first)
    # buffered path: the delta pre-dates the snapshot in event order, so
    # it is buffered unsynced and bridged inside _sync_from_snapshot
    early_delta = ("BTC", _t(2), "delta", u_first, 105, 99,
                   json.dumps([[100.0, 7.0]]), json.dumps([]))
    buf = book_state_stream(_depth_rows(spark, [early_delta, snap_t3])).collect()
    assert len(buf) == 1
    assert buf[0]["synced"] is want_synced, ("buffered", u_first)
    if want_synced:  # the bridged delta was APPLIED, not just admitted
        assert live[0]["best_bid"] == 100.0
        assert buf[0]["best_bid"] == 100.0


def test_book_null_u_delta_degrades_not_crashes(spark):
    """A delta with NULL final_update_id arriving while the bridge is
    pending can never prove continuity — the book must degrade to
    unsynced, not crash the fold on `int <= None`."""
    snap = ("BTC", _t(5), "snapshot", None, 100, None,
            json.dumps([[100.0, 5.0]]), json.dumps([[101.0, 5.0]]))
    nullu = ("BTC", _t(6), "delta", 99, None, None,
             json.dumps([[100.0, 7.0]]), json.dumps([]))
    out = book_state_stream(_depth_rows(spark, [snap, nullu])).collect()
    assert len(out) == 1
    assert not out[0]["synced"] and out[0]["degraded"]


def test_stream_resume_same_checkpoint_is_incremental(spark, tmp_path, bronze_events):
    """Resuming on the SAME checkpoint after new source files land must
    process ONLY the new data (exactly-once incremental progress — the
    streaming form of the reference's watermark-driven 60 s poll), with
    prior results intact in the silver table."""
    src = str(tmp_path / "bronze_inc")
    bronze_events.write.parquet(src)
    lake = str(tmp_path / "silver_inc")
    ckpt = str(tmp_path / "ckpt_inc")
    real_sink = foreach_batch_upsert(
        spark, lake,
        keys=["symbol", "minute_ts"], order_cols=["max_event_time"],
        partition_cols=["symbol"],
    )
    seen: list[set] = []  # foreachBatch runs on the driver: capture per-run

    def sink(df, bid):
        pdf = df.persist()
        seen.append({r["minute_ts"] for r in pdf.collect()})
        real_sink(pdf, bid)
        pdf.unpersist()

    def run():
        stream = spark.readStream.schema(_EVENTS_DDL).parquet(src)
        q = (
            minute_feature_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream timed out"

    run()
    first_minutes = set().union(*seen) if seen else set()
    assert dt.datetime(2024, 1, 1, 0, 0) in first_minutes

    # new file: one trade in a NEW minute
    seen.clear()
    spark.createDataFrame(
        [("BTC", "trade", _t(130), _t(129.9), _t(130.4), "SELL", 99.0, 1.0, None, None)],
        _EVENTS_DDL,
    ).write.mode("append").parquet(src)
    run()
    resumed = set().union(*seen) if seen else set()
    # only the new minute's aggregate is re-emitted — minutes 0/1 were
    # checkpointed as processed and never recompute
    assert resumed == {dt.datetime(2024, 1, 1, 0, 2)}
    got = spark.read.parquet(lake)
    assert got.count() == 3  # minutes 0, 1, 2 all live in silver
    assert got.where(
        F.col("minute_ts") == dt.datetime(2024, 1, 1, 0, 0)
    ).head()["liq_long_notional"] == 200.0  # prior state intact


# ---- review regressions: order-book state machine (r9) ----


def test_book_stale_redelivery_does_not_desync(spark):
    """At-least-once transport redelivers an already-applied delta: the
    reference silently skips it BEFORE the pu check (websocket.py:305);
    pre-fix, the normal path hit pu != last_u and falsely desynced an
    intact book."""
    dup_bridge = _BRIDGE  # identical u=103 re-delivered after _NEXT
    out = book_state_stream(
        _depth_rows(spark, [_SNAP, _BRIDGE, _NEXT, dup_bridge])
    ).collect()
    assert len(out) == 1 and out[0]["synced"]
    assert out[0]["best_bid"] == 100.0 and out[0]["best_ask"] == 101.0


def test_book_puless_gap_desyncs(spark):
    """A pu-less feed's continuity falls back to the U check
    (websocket.py:316-321): a dropped delta must desync, not silently
    corrupt a book that reports healthy."""
    gapped = (  # U=120 > last_u(110)+1, pu ABSENT
        "BTC", _t(8), "delta", 120, 125, None,
        json.dumps([[100.0, 1.0]]), json.dumps([]),
    )
    out = book_state_stream(
        _depth_rows(spark, [_SNAP, _BRIDGE, _NEXT, gapped])
    ).collect()
    assert len(out) == 1 and not out[0]["synced"]
    # and a CONTIGUOUS pu-less delta still applies
    contiguous = (
        "BTC", _t(8), "delta", 111, 112, None,
        json.dumps([[100.0, 1.0]]), json.dumps([]),
    )
    out2 = book_state_stream(
        _depth_rows(spark, [_SNAP, _BRIDGE, _NEXT, contiguous])
    ).collect()
    assert len(out2) == 1 and out2[0]["synced"]


def test_book_crossed_by_deltas_desyncs(spark):
    """A delta sequence that CROSSES the book (bid >= ask) proves missed
    state: the reference marks the book unsynchronized
    (websocket.py:336-345) — pre-fix the fold kept synced=True and a
    later uncrossing delta would resume healthy-looking output from a
    never-resynced book."""
    crossing = (  # bid at 103 > best ask 101
        "BTC", _t(8), "delta", 111, 112, 110,
        json.dumps([[103.0, 5.0]]), json.dumps([]),
    )
    out = book_state_stream(
        _depth_rows(spark, [_SNAP, _BRIDGE, _NEXT, crossing])
    ).collect()
    assert len(out) == 1 and not out[0]["synced"]


def test_crossed_heap_float_canonicalization():
    """ADVICE r11: `_apply_levels` must push float(key) — the float of
    the canonical .10g key string — not the raw parsed price, so a
    pushed heap entry orders identically to `_heap`'s lazy rebuild
    (which only has the key).  Price pair differing only PAST 10
    significant digits: bid 99.99999999999 keys to "100", same as the
    ask at 100.0 — the rebuilt heap says crossed (100.0 >= 100.0);
    pre-fix the pushed heap compared the raw 99.99999999999 and said
    NOT crossed."""
    from crypto_datalake_spark.streaming.orderbook import (
        _apply_levels,
        _crossed,
        _heap,
    )

    def _book(with_heap: bool) -> dict:
        st = {"bids": {}, "asks": {}}
        hb = _heap(st, "bids", neg=True) if with_heap else None
        ha = _heap(st, "asks", neg=False) if with_heap else None
        _apply_levels(st["bids"], [(99.99999999999, 1.0)], hb, neg=True)
        _apply_levels(st["asks"], [(100.0, 1.0)], ha)
        return st

    pushed = _book(with_heap=True)
    rebuilt = _book(with_heap=False)  # heaps absent: _crossed lazily rebuilds
    # both sides keyed "100": the two paths must agree on the verdict
    assert set(pushed["bids"]) == set(rebuilt["bids"]) == {"100"}
    assert _crossed(pushed) is _crossed(rebuilt) is True


def test_book_null_id_snapshot_and_buffered_delta_no_crash(spark):
    """Null final_update_id on a snapshot (cannot anchor the bridge) or
    on a buffered delta must degrade/skip, never TypeError the task into
    a checkpoint-replay crash loop."""
    null_snap = (
        "BTC", _t(5), "snapshot", None, None, None,
        json.dumps([[100.0, 1.0]]), json.dumps([[101.0, 1.0]]),
    )
    out = book_state_stream(_depth_rows(spark, [null_snap])).collect()
    assert len(out) == 1 and not out[0]["synced"]
    # a null-u DELTA buffered before a valid snapshot is dropped by the
    # bridge filter instead of crashing the u > last_id comparison
    null_delta = (
        "BTC", _t(4), "delta", None, None, None,
        json.dumps([[99.5, 9.0]]), json.dumps([]),
    )
    out2 = book_state_stream(
        _depth_rows(spark, [null_delta, _SNAP, _BRIDGE])
    ).collect()
    assert len(out2) == 1 and out2[0]["synced"]
    assert out2[0]["best_bid"] == 100.0


def test_replay_presnapshot_tie_cannot_override_snapshot(spark):
    """replay_book_batch keeps only deltas STRICTLY after the snapshot's
    lastUpdateId: a stale pre-snapshot delta sharing that id tied with
    the snapshot in the (u, pos) last-write ordering and could override
    snapshot levels the fold would never let it touch."""
    from crypto_datalake_spark.streaming.orderbook import replay_book_batch

    stale_tie = (  # same u=100 as the snapshot, carries a WRONG bid qty
        "BTC", _t(4), "delta", 95, 100, None,
        json.dumps([[100.0, 999.0]]), json.dumps([]),
    )
    out = {
        r["symbol"]: r
        for r in replay_book_batch(
            _depth_rows(spark, [stale_tie, _SNAP, _BRIDGE, _NEXT])
        ).collect()
    }
    fold = {
        r["symbol"]: r
        for r in book_state_stream(
            _depth_rows(spark, [stale_tie, _SNAP, _BRIDGE, _NEXT])
        ).collect()
    }
    assert out["BTC"]["avg_bid_qty_top10"] == fold["BTC"]["avg_bid_qty_top10"]
    assert out["BTC"]["best_bid"] == 100.0


def test_session_stream_null_user_id_no_crash(spark, tmp_path):
    """A NULL-keyed session group must close/emit with user_id NULL —
    pd.array([None], dtype='int64') raised TypeError in the executor
    and crash-looped the query on checkpoint replay."""
    from crypto_datalake_spark.streaming.sessions import _session_pdf

    pdf = _session_pdf(None, 1_000_000, 2_000_000, 3, 4.5)
    assert pdf["user_id"].isna().all()
    assert pdf["n_events"].iloc[0] == 3


def test_load_zip_csv_skips_empty_member(spark, tmp_path):
    """One zero-byte CSV member inside an archive is 'no rows', not an
    error — same tolerance as load_csv_with_variants; pre-fix it killed
    the whole multi-archive load."""
    import io as _io
    import zipfile

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from crypto_datalake_spark.io import load_zip_csv

    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.csv", "open_time,open\n1,10.5\n")
        zf.writestr("empty.csv", "")
    (tmp_path / "day1.zip").write_bytes(buf.getvalue())
    schema = StructType(
        [StructField("ts", LongType()), StructField("open", DoubleType())]
    )
    out = load_zip_csv(
        spark, str(tmp_path), schema,
        column_variants={"ts": ["open_time"]},
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["open"] == 10.5


# --- property test: fold vs reference-fidelity model ------------------------

class _RefFidelityBook:
    """Direct port of the reference ``DepthOrderBook`` decision table
    (websocket.py:234-345) — buffer-until-snapshot, snapshot rebuild,
    buffered-bridge, stale-skip, pu continuity, pu-less U continuity,
    spread validation — with its ``DepthSyncError`` raises mapped to
    flags and exactly the engine's PINNED spot-spec substitutions
    (streaming/orderbook.py, _apply_delta docstring):

      1. buffered filter ``u > lastUpdateId`` (ref ``>=``, :283)
      2. bridge predicate ``U <= lastUpdateId+1 <= u``
         (ref ``U <= lastUpdateId <= u``, :289-294)
      3. the bridge rule also admits the first LIVE delta after an
         unbuffered snapshot (spot pu-chains don't align with REST
         snapshot ids, so the ref's plain pu check would desync), and
         the bridged event's pu is exempt for the same reason
      4. null-id tolerance: the reference's event schema forbids null
         ids — a malformed feed crashes it into resync; the flag-level
         analogue is degrade (synced=False)

    Everything NOT listed above follows the reference verbatim, so any
    fold/model disagreement is a continuity bug in the engine."""

    def __init__(self):
        self.bids: dict = {}
        self.asks: dict = {}
        self.buffer: list = []
        self.last_u = None
        self.synced = False
        self.await_bridge = False

    @staticmethod
    def _apply_levels(side: dict, levels: list) -> None:
        for price, qty in levels:
            key = f"{float(price):.10g}"
            if float(qty) <= 0:
                side.pop(key, None)
            else:
                side[key] = float(qty)

    def _crossed(self) -> bool:
        return bool(
            self.bids
            and self.asks
            and max(map(float, self.bids)) >= min(map(float, self.asks))
        )

    def snapshot(self, ev: dict) -> None:
        last_id = ev["u"]
        if last_id is None:                      # substitution 4
            self.synced = False
            self.buffer = []
            self.await_bridge = False
            return
        self.bids, self.asks = {}, {}
        self._apply_levels(self.bids, ev["bids"])
        self._apply_levels(self.asks, ev["asks"])
        self.last_u = last_id
        self.synced = True
        self.await_bridge = False
        pending = sorted(                        # ref sorts buffer by u (:266)
            (e for e in self.buffer
             if e["u"] is not None and e["u"] > last_id),  # substitution 1
            key=lambda e: e["u"],
        )
        self.buffer = []
        if not pending:
            if self._crossed():                  # ref :279 _validate_book_spread
                self.synced = False
                return
            self.await_bridge = True             # substitution 3
            return
        first = pending[0]
        if first["U"] is None or not (
            first["U"] <= last_id + 1 <= first["u"]  # substitution 2
        ):
            self.synced = False                  # ref :289 DepthSyncError
            return
        self._apply_event(dict(first, pu=None))  # substitution 3 (pu exempt)
        for e in pending[1:]:
            if not self.synced:
                break
            self._apply_event(e)

    def delta(self, ev: dict) -> None:
        if not self.synced:                      # ref :301 buffer_event
            self.buffer.append(ev)
            return
        if self.await_bridge:
            self.await_bridge = False
            if (
                ev["u"] is not None
                and self.last_u is not None
                and ev["u"] <= self.last_u
            ):
                self.await_bridge = True         # stale: keep waiting
                return
            if not (
                ev["U"] is not None
                and ev["u"] is not None
                and self.last_u is not None
                and ev["U"] <= self.last_u + 1 <= ev["u"]
            ):
                self.synced = False
                return
            self._apply_raw(ev)
            return
        self._apply_event(ev)

    def _apply_event(self, ev: dict) -> None:
        # ref apply_event :300-325 decision order
        if (
            self.last_u is not None
            and ev["u"] is not None
            and ev["u"] <= self.last_u
        ):
            return                               # stale skip (:305)
        if ev["u"] is None or (ev["pu"] is None and ev["U"] is None):
            self.synced = False                  # substitution 4
            return
        if ev["pu"] is not None and ev["pu"] != self.last_u:
            self.synced = False                  # pu check (:309)
            return
        if (
            ev["pu"] is None
            and ev["U"] is not None
            and ev["U"] > self.last_u + 1
        ):
            self.synced = False                  # pu-less U check (:316)
            return
        self._apply_raw(ev)

    def _apply_raw(self, ev: dict) -> None:
        self._apply_levels(self.bids, ev["bids"])
        self._apply_levels(self.asks, ev["asks"])
        self.last_u = ev["u"]
        if self._crossed():                      # ref :336 _validate_book_spread
            self.synced = False


def test_book_fold_matches_reference_model_property():
    """VERDICT r9 item 2: hypothesis sweep of the whole fold against the
    reference-fidelity model — snapshots at random ids (incl. null),
    deltas with contiguous/overlapping/gapped U, pu/pu-less/null-id,
    stale redeliveries, crossing levels — under RANDOM micro-batch
    splits with the production JSON state round-trip between batches.
    Asserts synced flag, last_u, and full book content after every
    batch.  ≥200 generated sequences."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crypto_datalake_spark.streaming.orderbook import _EMPTY, _fold_batch

    BID_PRICES = [99.0, 100.0, 100.5]
    ASK_PRICES = [100.5, 101.0, 102.0]   # 100.5 shared -> crossings happen
    QTYS = [0.0, 1.0, 2.5]

    levels = lambda prices: st.lists(  # noqa: E731
        st.tuples(st.sampled_from(prices), st.sampled_from(QTYS)),
        max_size=2,
    )

    op = st.one_of(
        st.tuples(st.just("snap"),
                  st.one_of(st.none(), st.integers(-3, 3)),
                  levels(BID_PRICES), levels(ASK_PRICES)),
        st.tuples(st.just("delta"),
                  st.tuples(
                      st.integers(-2, 3),            # U offset from last+1
                      st.integers(0, 2),             # span: u - U
                      st.sampled_from(["chain", "wrong", "none"]),  # pu
                      st.booleans(),                 # null out u
                      st.booleans(),                 # null out U
                  ),
                  levels(BID_PRICES), levels(ASK_PRICES)),
    )

    @settings(deadline=None, max_examples=400)
    @given(
        ops=st.lists(op, min_size=1, max_size=18),
        cuts=st.lists(st.integers(0, 17), max_size=4),
    )
    def run(ops, cuts):
        # materialize a realistic id stream from the op list
        gen_last = 10
        events = []
        for i, (kind, arg, bids, asks) in enumerate(ops):
            ts = pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i)
            if kind == "snap":
                sid = None if arg is None else gen_last + arg
                events.append(("S", ts, "snapshot", None, sid, None,
                               json.dumps(bids), json.dumps(asks)))
                if sid is not None:
                    gen_last = max(gen_last, sid)
                continue
            u_off, span, pu_kind, null_u, null_U = arg
            U = gen_last + 1 + u_off
            u = U + span
            pu = {"chain": gen_last, "wrong": gen_last + 7, "none": None}[pu_kind]
            if u > gen_last:
                gen_last = u
            events.append((
                "S", ts, "delta",
                None if null_U else U,
                None if null_u else u,
                pu,
                json.dumps(bids), json.dumps(asks),
            ))

        cols = ["symbol", "event_time", "kind", "first_update_id",
                "final_update_id", "prev_final_update_id", "bids", "asks"]

        model = _RefFidelityBook()
        st_fold = dict(_EMPTY, buffer=[])
        bounds = sorted({c for c in cuts if c < len(events)} | {len(events)})
        lo = 0
        for hi in bounds:
            batch = events[lo:hi]
            lo = hi
            if not batch:
                continue
            _fold_batch("S", st_fold, pd.DataFrame(batch, columns=cols))
            # production JSON state round-trip between micro-batches
            st_fold = json.loads(json.dumps(st_fold, default=str))
            for row in batch:
                ev = dict(U=row[3], u=row[4], pu=row[5],
                          bids=json.loads(row[6]), asks=json.loads(row[7]))
                if row[2] == "snapshot":
                    model.snapshot(ev)
                else:
                    model.delta(ev)
            assert st_fold["synced"] == model.synced, (events, st_fold, vars(model))
            if st_fold["synced"]:
                assert st_fold["last_u"] == model.last_u, (events,)
                assert st_fold["bids"] == model.bids, (events,)
                assert st_fold["asks"] == model.asks, (events,)
            assert st_fold.get("await_bridge", False) == model.await_bridge, (events,)

    run()


def test_session_late_row_never_rewinds_open_session(spark, tmp_path):
    """A late-but-in-watermark row must extend the open session without
    REWINDING its end: pre-r10 the fold set ``last = t`` unconditionally,
    so a late row shrank the gap window and the next on-time row could
    spuriously split (and mis-stamp) a session the batch twin keeps
    whole.  Delivery: (m0, m10) | late m5 | m40, gap 30 — the batch twin
    sees deltas 5/5/30 ≤ gap: ONE session (m0..m40, 4 events)."""
    from crypto_datalake_spark.streaming import session_stream

    def m(minutes):
        return _t(minutes * 60)

    src = tmp_path / "late_src"
    src.mkdir()
    _sess_rows(spark, [(1, 1, m(0), 1.0), (1, 2, m(10), 2.0)]) \
        .coalesce(1).write.parquet(str(src / "f1"))
    _sess_rows(spark, [(1, 3, m(5), 4.0)]) \
        .coalesce(1).write.parquet(str(src / "f2"))        # late, in-watermark
    _sess_rows(spark, [(1, 4, m(40), 8.0)]) \
        .coalesce(1).write.parquet(str(src / "f3"))        # on-time: 40-10=30 ≤ gap
    _sess_rows(spark, [(99, 5, m(600), 0.0)]) \
        .coalesce(1).write.parquet(str(src / "f4"))        # watermark pusher
    stream = (
        spark.readStream.schema(_SESS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        session_stream(stream, gap_minutes=30, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream timed out"
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["total_value"])
        for r in spark.table("late_sessions").collect()
    }
    # user 1 must close as ONE session by timer — not a rewound split
    assert (1, m(0), m(40), 4, 15.0) in got, got
    assert all(u != 1 or (s, e) == (m(0), m(40)) for u, s, e, _, _ in got), got


def test_session_fold_split_invariance_property():
    """The shared fold core is micro-batch-boundary invariant on
    in-order delivery: folding a global time-sorted event list in any
    contiguous chunking yields the same closed sessions and the same
    open-session tuple as a pure-Python gap-split model."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crypto_datalake_spark.streaming.sessions import _fold_events

    GAP_US = 10 * 60_000_000  # 10 minutes

    @settings(deadline=None, max_examples=200)
    @given(
        deltas=st.lists(
            st.sampled_from([0, 1, 5, 9, 10, 11, 25]), min_size=1, max_size=15
        ),
        cuts=st.lists(st.integers(0, 14), max_size=4),
    )
    def run(deltas, cuts):
        times, acc = [], 0
        for d in deltas:
            acc += d
            times.append(acc)  # minutes, non-decreasing (dups included)
        values = [float(i + 1) for i in range(len(times))]

        # model: split where the minute delta exceeds 10
        sessions, cur = [], [0]
        for i in range(1, len(times)):
            if times[i] - times[i - 1] > 10:
                sessions.append(cur)
                cur = []
            cur.append(i)
        want_closed = [
            (times[ix[0]], times[ix[-1]], len(ix), sum(values[i] for i in ix))
            for ix in sessions
        ]
        want_open = (times[cur[0]], times[cur[-1]], len(cur),
                     sum(values[i] for i in cur))

        bounds = sorted({c for c in cuts if c < len(times)} | {len(times)})
        state = (None, None, 0, 0.0)
        closed = []
        lo = 0
        base = pd.Timestamp("2024-01-01")
        for hi in bounds:
            if hi == lo:
                continue
            chunk = pd.DataFrame({
                "ts": [base + pd.Timedelta(minutes=t) for t in times[lo:hi]],
                "value": values[lo:hi],
            })
            out, state = _fold_events(7, chunk, *state, GAP_US)
            closed.extend(out)
            lo = hi

        base_us0 = int(base.value // 1000)

        def row(t4):  # _fold_events now returns (start, last, n, total)
            s, l, n, tot = t4
            mins = lambda x: (x - base_us0) // 60_000_000  # noqa: E731
            return (mins(s), mins(l), int(n), float(tot))

        assert [row(t4) for t4 in closed] == want_closed, (deltas, cuts)
        s, l, n, tot = state
        us = lambda mi: mi * 60_000_000  # noqa: E731
        base_us = int(base.value // 1000)
        assert (s - base_us, l - base_us, n, tot) == (
            us(want_open[0]), us(want_open[1]), want_open[2], want_open[3]
        ), (deltas, cuts, state)

    run()


def _fold_whole(symbol, rows):
    """Sequential twin: the whole history in one fold."""
    import pandas as pd

    from crypto_datalake_spark.streaming.orderbook import _EMPTY, _fold_batch

    cols = ["symbol", "event_time", "kind", "first_update_id",
            "final_update_id", "prev_final_update_id", "bids", "asks"]
    st = dict(_EMPTY, buffer=[])
    _fold_batch(symbol, st, pd.DataFrame(rows, columns=cols))
    return st


def _seg_state(df, symbol):
    r = {x["symbol"]: x for x in df.collect()}[symbol]
    return r


def test_replay_segmented_matches_sequential_fold(spark):
    """Healthy multi-segment store (every boundary crossed synced):
    phase-1 segment folds are realized as-is and the final state equals
    the sequential whole-history fold."""
    from crypto_datalake_spark.streaming.orderbook import (
        replay_book_segmented,
    )

    rows = [
        # segment 1: snapshot@100 + bridged delta + chained delta
        ("BTC", _t(1), "snapshot", None, 100, None,
         json.dumps([[99.0, 1.0]]), json.dumps([[101.0, 1.0]])),
        ("BTC", _t(2), "delta", 99, 105, None,
         json.dumps([[99.5, 2.0]]), json.dumps([])),
        ("BTC", _t(3), "delta", 106, 110, 105,
         json.dumps([]), json.dumps([[102.0, 3.0]])),
        # segment 2: fresh snapshot resets, then one chained delta
        ("BTC", _t(4), "snapshot", None, 200, None,
         json.dumps([[98.0, 5.0]]), json.dumps([[103.0, 5.0]])),
        ("BTC", _t(5), "delta", 201, 205, 200,
         json.dumps([[98.5, 1.5]]), json.dumps([])),
    ]
    got = _seg_state(
        replay_book_segmented(_depth_rows(spark, rows)), "BTC"
    )
    want = _fold_whole("BTC", rows)
    assert got["synced"] == want["synced"] is True
    assert got["last_u"] == want["last_u"] == 205
    assert json.loads(got["bids"]) == want["bids"]
    assert json.loads(got["asks"]) == want["asks"]
    assert got["buffered_count"] == len(want["buffer"]) == 0


def test_replay_segmented_repairs_buffer_crossing_boundary(spark):
    """A desynced segment leaves buffered deltas whose ids outrun the
    NEXT snapshot — the buffered-bridge case where phase-1's empty-entry
    fold is wrong and the driver repair must refold: the buffered
    delta's levels apply after the second snapshot's reset."""
    from crypto_datalake_spark.streaming.orderbook import (
        replay_book_segmented,
    )

    rows = [
        # segment 1: snapshot@100, then a GAP delta desyncs the book
        ("BTC", _t(1), "snapshot", None, 100, None,
         json.dumps([[99.0, 1.0]]), json.dumps([[101.0, 1.0]])),
        ("BTC", _t(2), "delta", 150, 160, 149,
         json.dumps([[99.5, 9.0]]), json.dumps([])),      # pu gap -> desync
        # these buffer while unsynced; their u outruns the next snapshot
        ("BTC", _t(3), "delta", 198, 205, None,
         json.dumps([[97.0, 7.0]]), json.dumps([])),
        ("BTC", _t(4), "delta", 206, 210, 205,
         json.dumps([]), json.dumps([[104.0, 4.0]])),
        # segment 2: snapshot@200 bridges from the buffer (U=198<=201<=205)
        ("BTC", _t(5), "snapshot", None, 200, None,
         json.dumps([[98.0, 5.0]]), json.dumps([[103.0, 5.0]])),
    ]
    got = _seg_state(
        replay_book_segmented(_depth_rows(spark, rows)), "BTC"
    )
    want = _fold_whole("BTC", rows)
    assert want["synced"]                       # sequential truth: bridged
    assert want["bids"].get("97") == 7.0        # buffered level applied
    assert got["synced"] == want["synced"]
    assert got["last_u"] == want["last_u"]
    assert json.loads(got["bids"]) == want["bids"], (got, want)
    assert json.loads(got["asks"]) == want["asks"]
    assert got["buffered_count"] == len(want["buffer"])


def test_replay_segmented_repair_then_passthrough_chain(spark):
    """Repair followed by a run of healthy empty-buffer segments before
    the final one — exercises the chain walk's lazy pass-through refs
    (phase-1 state content is fetched only for the FINAL segment and
    the repair's entry state, never for in-between healthy segments)."""
    from crypto_datalake_spark.streaming.orderbook import (
        replay_book_segmented,
    )

    rows = [
        # segment 1: snapshot@100, a pu-gap delta desyncs, one buffers
        ("BTC", _t(1), "snapshot", None, 100, None,
         json.dumps([[99.0, 1.0]]), json.dumps([[101.0, 1.0]])),
        ("BTC", _t(2), "delta", 150, 160, 149,
         json.dumps([[99.5, 9.0]]), json.dumps([])),
        ("BTC", _t(3), "delta", 198, 205, None,
         json.dumps([[97.0, 7.0]]), json.dumps([])),
        # segment 2: snapshot@200 must REFOLD with the crossed buffer
        ("BTC", _t(4), "snapshot", None, 200, None,
         json.dumps([[98.0, 5.0]]), json.dumps([[103.0, 5.0]])),
        # segments 3 and 4: healthy pass-throughs (empty exit buffers)
        ("BTC", _t(5), "snapshot", None, 300, None,
         json.dumps([[96.0, 2.0]]), json.dumps([[105.0, 2.0]])),
        ("BTC", _t(6), "snapshot", None, 400, None,
         json.dumps([[95.0, 3.0]]), json.dumps([[106.0, 3.0]])),
        # segment 5: final snapshot + one chained delta
        ("BTC", _t(7), "snapshot", None, 500, None,
         json.dumps([[94.0, 4.0]]), json.dumps([[107.0, 4.0]])),
        ("BTC", _t(8), "delta", 501, 505, 500,
         json.dumps([[94.5, 1.5]]), json.dumps([])),
    ]
    got = _seg_state(
        replay_book_segmented(_depth_rows(spark, rows)), "BTC"
    )
    want = _fold_whole("BTC", rows)
    assert want["synced"] and want["bids"].get("94.5") == 1.5
    assert got["synced"] == want["synced"]
    assert got["last_u"] == want["last_u"] == 505
    assert json.loads(got["bids"]) == want["bids"]
    assert json.loads(got["asks"]) == want["asks"]
    assert got["buffered_count"] == len(want["buffer"]) == 0


def test_replay_segmented_property_equivalence(spark):
    """Property sweep: the segment-parallel replay equals the sequential
    whole-history fold on random event stores — same generator family
    as the reference-model sweep (gaps, stales, null ids, crossings,
    buffered bridges), one multi-event store per example."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crypto_datalake_spark.streaming.orderbook import (
        replay_book_segmented,
    )

    import pandas as pd

    BIDS = [99.0, 100.0, 100.5]
    ASKS = [100.5, 101.0, 102.0]
    levels = lambda prices: st.lists(  # noqa: E731
        st.tuples(st.sampled_from(prices), st.sampled_from([0.0, 1.0, 2.5])),
        max_size=2,
    )
    op = st.one_of(
        st.tuples(st.just("snap"), st.one_of(st.none(), st.integers(-3, 3)),
                  levels(BIDS), levels(ASKS)),
        st.tuples(st.just("delta"),
                  st.tuples(st.integers(-2, 3), st.integers(0, 2),
                            st.sampled_from(["chain", "wrong", "none"]),
                            st.booleans(), st.booleans()),
                  levels(BIDS), levels(ASKS)),
    )

    # router coverage (VERDICT r11 item 6): accumulate phase-1 path
    # counts across every example; the pinned @example cases force at
    # least one fast-tier segment (clean snapshot + bridged chained
    # delta, non-crossing) and one exact-fold segment (delta before any
    # snapshot -> seg 0 has no leading snapshot), so a router that
    # silently always falls back (or always fast-paths) fails below.
    path_counts: dict = {}
    from hypothesis import example

    _FAST_OPS = [("snap", 0, [(99.0, 1.0)], [(101.0, 1.0)]),
                 ("delta", (0, 0, "chain", False, False),
                  [(100.0, 2.0)], [(102.0, 1.0)])]
    _FALLBACK_OPS = [("delta", (0, 0, "none", False, False),
                      [(99.0, 1.0)], []),
                     ("snap", 0, [], [(101.0, 1.0)])]

    def _exec(ops, counts):
        gen_last = 10
        rows = []
        for i, (kind, arg, bids, asks) in enumerate(ops):
            ts = _t(i * 60)
            if kind == "snap":
                sid = None if arg is None else gen_last + arg
                rows.append(("S", ts, "snapshot", None, sid, None,
                             json.dumps(bids), json.dumps(asks)))
                if sid is not None:
                    gen_last = max(gen_last, sid)
                continue
            u_off, span, pu_kind, null_u, null_U = arg
            U = gen_last + 1 + u_off
            u = U + span
            pu = {"chain": gen_last, "wrong": gen_last + 7,
                  "none": None}[pu_kind]
            if u > gen_last:
                gen_last = u
            rows.append(("S", ts, "delta",
                         None if null_U else U, None if null_u else u, pu,
                         json.dumps(bids), json.dumps(asks)))
        got = _seg_state(
            replay_book_segmented(_depth_rows(spark, rows), counts),
            "S",
        )
        want = _fold_whole("S", rows)
        assert got["synced"] == want["synced"], (ops, got, want)
        assert got["last_u"] == want["last_u"], ops
        assert json.loads(got["bids"]) == want["bids"], ops
        assert json.loads(got["asks"]) == want["asks"], ops
        assert got["buffered_count"] == len(want["buffer"]), ops

    @settings(deadline=None, max_examples=10)
    @example(ops=_FAST_OPS)
    @example(ops=_FALLBACK_OPS)
    @given(ops=st.lists(op, min_size=2, max_size=14))
    def run(ops):
        _exec(ops, path_counts)

    run()
    assert path_counts.get("fast", 0) > 0, path_counts
    assert path_counts.get("fallback", 0) > 0, path_counts
    # ADVICE r12: the aggregate counters above could be satisfied by a
    # random example even if a pinned one silently routed to the wrong
    # tier — run each pin with a FRESH counter and lock it to its tier
    fast_counts: dict = {}
    _exec(_FAST_OPS, fast_counts)
    assert fast_counts.get("fast", 0) >= 1, fast_counts
    assert fast_counts.get("fallback", 0) == 0, fast_counts
    fb_counts: dict = {}
    _exec(_FALLBACK_OPS, fb_counts)
    assert fb_counts.get("fallback", 0) >= 1, fb_counts


def test_replay_segmented_healthy_stream_is_one_fold_job(spark):
    """VERDICT r15 item 2: on a healthy multi-symbol store the fold
    phase runs ONE driver action — the light collect carries each
    symbol's final-segment state (its id is known at tag time), so the
    former clean-symbol batched fetch (broadcast build + leftsemi
    collect) never fires.  AQE splits one collect into several scheduler
    jobs, so the pin is the set of driver-action CALL SITES observed:
    exactly two (the tag phase's snapshot-key collect + the fused fold
    collect), and none inside ``_fetch_states``."""
    import re

    from crypto_datalake_spark.streaming.orderbook import (
        replay_book_segmented,
    )

    rows = []
    for sym, base in (("BTC", 100), ("ETH", 500)):
        rows += [
            (sym, _t(1), "snapshot", None, base, None,
             json.dumps([[99.0, 1.0]]), json.dumps([[101.0, 1.0]])),
            (sym, _t(2), "delta", base - 1, base + 5, None,
             json.dumps([[99.5, 2.0]]), json.dumps([])),
            # segment 2: fresh snapshot + chained delta
            (sym, _t(3), "snapshot", None, base + 100, None,
             json.dumps([[98.0, 5.0]]), json.dumps([[103.0, 5.0]])),
            (sym, _t(4), "delta", base + 101, base + 105, base + 100,
             json.dumps([[98.5, 1.5]]), json.dumps([])),
        ]
    sc = spark.sparkContext
    group = "seg-replay-fused-job-count"
    sc.setJobGroup(group, "segmented replay fold phase")
    try:
        df = replay_book_segmented(_depth_rows(spark, rows))
        st = sc.statusTracker()
        callsites = set()
        for j in st.getJobIdsForGroup(group):
            info = st.getJobInfo(j)
            for s in (info.stageIds if info else []):
                si = st.getStageInfo(s)
                m = si and re.search(r"at (\S+:\d+)", si.name)
                if m:
                    callsites.add(m.group(1))
    finally:
        sc.setJobGroup(None, None)
    assert len(callsites) == 2, callsites
    # and the fused collect did not change the answer
    for sym in ("BTC", "ETH"):
        got = _seg_state(df, sym)
        want = _fold_whole(sym, [r for r in rows if r[0] == sym])
        assert got["synced"] == want["synced"] is True
        assert got["last_u"] == want["last_u"]
        assert json.loads(got["bids"]) == want["bids"]
        assert json.loads(got["asks"]) == want["asks"]
        assert got["buffered_count"] == len(want["buffer"]) == 0


def test_post_repair_prefetch_plan():
    """ADVICE r10: the repair walk used to issue one targeted fetch job
    per post-repair segment whose content it needed, serially.  The
    optimistic simulation must enumerate exactly those needs (assuming
    refolds exit empty) so the driver batches them into the ONE
    up-front fetch: a refolded segment is never fetched, a realized
    segment is fetched iff its exit buffer feeds the next refold or it
    is the final segment."""
    from crypto_datalake_spark.streaming.orderbook import (
        _post_repair_prefetch,
    )

    order = [1, 2, 3, 4, 5]
    # repair at k=1 (seg 2 refolds); seg 3 realized with a crossing
    # buffer (fetched, feeds seg 4's refold); seg 5 realized final
    assert _post_repair_prefetch(order, {1: 1, 2: 0, 3: 2, 4: 0, 5: 0}, 1) == [3, 5]
    # healthy tail: only the final segment's books are needed
    assert _post_repair_prefetch([1, 2, 3], {1: 1, 2: 0, 3: 0}, 1) == [3]
    # the refolded segment IS the final one: nothing to fetch (its
    # state comes from the refold, not phase 1)
    assert _post_repair_prefetch([1, 2], {1: 1, 2: 7}, 1) == []
    # back-to-back crossings: every other segment refolds, the realized
    # ones in between are all fetched
    assert _post_repair_prefetch(
        [1, 2, 3, 4, 5, 6], {1: 1, 2: 0, 3: 1, 4: 0, 5: 1, 6: 0}, 1
    ) == [3, 5]
    # repair at the LAST boundary
    assert _post_repair_prefetch([1, 2, 3], {1: 0, 2: 3, 3: 0}, 2) == []


def test_fast_segment_state_matrix():
    """The hybrid fast path (r11): continuous segments produce exactly
    the exact fold's state; every irregularity — stale ids, pu gaps,
    possible crossing, null ids, extra snapshots — returns None so the
    exact fold decides.  (The segmented property sweep exercises both
    paths end-to-end; this pins the routing.)"""
    import numpy as np
    import pandas as pd

    from crypto_datalake_spark.streaming.orderbook import (
        _EMPTY,
        _fast_segment_state,
        _fold_batch,
        _state_blob,
    )

    rng = np.random.default_rng(7)

    def seg(n=60, stale=False, gap=False, cross=False, null_u=False,
            two_snaps=False, pu_less=False):
        rows = []
        vals = rng.uniform(0.5, 20.0, n)
        for i in range(n):
            v = vals[i]
            bid_p = 90 + v % 10
            ask_p = (101 + v % 10) if not cross else (89 + v % 10)
            u, U, pu = i + 1, i + 1, (i if i > 0 else None)
            if stale and i == 5:
                u, U, pu = 3, 3, 2
            if gap and i == 7:
                pu = 99999
            if null_u and i == 9:
                u = None
            if pu_less and i > 0:
                pu = None
            kind = "snapshot" if (i == 0 or (two_snaps and i == 30)) else "delta"
            qty = round(abs(v), 6) if i % 7 else 0.0   # deletions too
            rows.append(dict(
                symbol="S",
                event_time=pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i),
                kind=kind,
                first_update_id=U if kind == "delta" else None,
                final_update_id=u,
                prev_final_update_id=pu if kind == "delta" else None,
                bids=json.dumps([[round(bid_p, 6), qty]]),
                asks=json.dumps([[round(ask_p, 6), round(abs(v), 6)]]),
            ))
        return pd.DataFrame(rows)

    # canonical-key crossing (r13, same family as the heap-float fix): a
    # raw bid infinitesimally BELOW the ask that rounds to the SAME .10g
    # key ("100") — the exact fold's key-derived _crossed says crossed
    # (synced=False), so the fast path's superset pre-check must also
    # compare canonical floats and route this segment to the exact fold
    canon_cross = pd.DataFrame([dict(
        symbol="S",
        event_time=pd.Timestamp("2024-01-01"),
        kind="snapshot",
        first_update_id=None,
        final_update_id=1,
        prev_final_update_id=None,
        bids=json.dumps([[99.99999999999, 1.0]]),
        asks=json.dumps([[100.0, 1.0]]),
    )])

    fast_cases = dict(clean=seg(), pu_less=seg(pu_less=True), snap_only=seg(1))
    fallback_cases = dict(
        stale=seg(stale=True), gap=seg(gap=True), cross=seg(cross=True),
        null_u=seg(null_u=True), two_snaps=seg(two_snaps=True),
        canon_cross=canon_cross,
    )
    for name, pdf in fast_cases.items():
        fast = _fast_segment_state(pdf)
        assert fast is not None, name
        st = dict(_EMPTY, buffer=[])
        _fold_batch("S", st, pdf)
        exact = json.loads(_state_blob(st))
        got = json.loads(json.dumps(fast))
        # FULL state-dict equality (ADVICE r11): a snapshot-only segment
        # must carry await_bridge=True exactly like the exact fold — a
        # resumed or diffed segment state may not diverge between tiers
        assert got == exact, (name, got, exact)
        assert exact["buffer"] == []
        if name == "snap_only":
            assert got.get("await_bridge") is True, got
        else:
            assert "await_bridge" not in got, (name, got)
    for name, pdf in fallback_cases.items():
        assert _fast_segment_state(pdf) is None, name
    # ...and the exact fold the canon_cross segment routes to must judge
    # it CROSSED (the whole reason the fast path may not accept it)
    st = dict(_EMPTY, buffer=[])
    _fold_batch("S", st, canon_cross)
    assert st["synced"] is False


def test_tag_segments_matches_count_model(spark):
    """Property sweep for the r11 searchsorted segment tagging: seg
    must equal |normalized snapshot keys <= event key| — the exact
    count the original broadcast filter computed — including timestamp
    TIES between snapshots and deltas (delta sorts after: d=true),
    tied snapshots ordered by u, duplicate keys, null update ids
    (normalized 0), null kinds (delta), and symbols with no
    snapshots (seg 0)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crypto_datalake_spark.streaming.orderbook import _tag_segments

    ev = st.tuples(
        st.sampled_from(["A", "B"]),
        st.integers(0, 5),                        # timestamp minute (ties!)
        st.sampled_from(["snapshot", "delta", None]),
        st.one_of(st.none(), st.integers(-2, 6)), # final_update_id
    )

    @settings(deadline=None, max_examples=12)
    @given(rows=st.lists(ev, min_size=1, max_size=12))
    def run(rows):
        data = [
            (sym, _t(m * 60), kind, None, u, None, "[]", "[]")
            for sym, m, kind, u in rows
        ]
        df = spark.createDataFrame(
            data,
            "symbol string, event_time timestamp_ntz, kind string, "
            "first_update_id long, final_update_id long, "
            "prev_final_update_id long, bids string, asks string",
        )
        got = {
            (r["symbol"], r["event_time"], r["kind"], r["final_update_id"]): r["seg"]
            for r in _tag_segments(df).collect()
        }

        # model: per symbol, sorted normalized snapshot keys; count <=
        def key(m, kind, u):
            return (m, kind != "snapshot" if kind is not None else True,
                    u if u is not None else 0)

        snaps = {}
        for sym, m, kind, u in rows:
            if kind == "snapshot" and u is not None:
                snaps.setdefault(sym, []).append(key(m, kind, u))
        for ks in snaps.values():
            ks.sort()
        for sym, m, kind, u in rows:
            want = sum(1 for k in snaps.get(sym, []) if k <= key(m, kind, u))
            assert got[(sym, _t(m * 60), kind, u)] == want, (rows, sym, m, kind, u)

    run()


def test_await_or_die_raises_on_timeout_and_stops_query():
    """Regression (round-11 ADVICE): st2/st11 read their memory sink right
    after awaitTermination(300) without checking its boolean return, so a
    timed-out run silently compared PARTIAL results. _await_or_die must
    raise on a False return and stop the straggler query first."""
    import pytest

    from crypto_datalake_spark.queries.streaming_q import _await_or_die

    class FakeQuery:
        name = "fake_sink"

        def __init__(self, done):
            self._done = done
            self.stopped = False

        def awaitTermination(self, timeout):
            return self._done

        def stop(self):
            self.stopped = True

    ok = FakeQuery(done=True)
    _await_or_die(ok, 1)
    assert not ok.stopped

    slow = FakeQuery(done=False)
    with pytest.raises(TimeoutError, match="partial sink"):
        _await_or_die(slow, 1)
    assert slow.stopped

    # ADVICE r12: stop() itself throwing (query died between the False
    # return and the stop call) must NOT mask the TimeoutError — the
    # 'partial sink' diagnostic is the actionable message
    class DeadQuery(FakeQuery):
        def stop(self):
            raise RuntimeError("query terminated with exception")

    with pytest.raises(TimeoutError, match="partial sink"):
        _await_or_die(DeadQuery(done=False), 1)


def test_await_or_die_chains_stop_exception():
    """Regression (round-13 ADVICE): the stop-side exception used to be
    suppressed entirely, discarding the query's actual death cause. It
    must now ride along as __cause__ of the TimeoutError (raise ... from
    stop_exc) so both the 'partial sink' diagnostic AND the root cause
    surface; a clean stop leaves __cause__ unset."""
    import pytest

    from crypto_datalake_spark.queries.streaming_q import _await_or_die

    class FakeQuery:
        name = "fake_sink"

        def awaitTermination(self, timeout):
            return False

        def stop(self):
            pass

    class DeadQuery(FakeQuery):
        def stop(self):
            raise RuntimeError("root cause: executor lost")

    with pytest.raises(TimeoutError, match="partial sink") as ei:
        _await_or_die(DeadQuery(), 1)
    assert isinstance(ei.value.__cause__, RuntimeError)
    assert "root cause: executor lost" in str(ei.value.__cause__)

    with pytest.raises(TimeoutError, match="partial sink") as ei:
        _await_or_die(FakeQuery(), 1)
    assert ei.value.__cause__ is None


def test_st11_nodata_batch_skip_is_output_identical(spark, sf_dir):
    """r14 optimization: st11_session_windows disables the trailing
    no-data micro-batch for its availableNow replay (the empty batch
    exists only to fire event-time timers, whose emissions — each user's
    last open session — the deterministic-subset filter discards).  The
    registered output must be IDENTICAL with the flush batch forced back
    on; and the registered path must restore the session conf."""
    from crypto_datalake_spark.queries import REGISTRY

    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    spark.conf.set(key, "true")
    fast = sorted(map(tuple, REGISTRY["st11_session_windows"].fn(spark, sf_dir).collect()))
    # the registered path must have restored the conf it scoped
    assert spark.conf.get(key) == "true"
    # reference run with the timer-flush batch forced on: monkey-set the
    # conf inside a wrapper that pins it for the whole run
    import crypto_datalake_spark.queries.streaming_q as sq

    orig_set = spark.conf.set
    try:
        # neutralize the query's scoped disable so the flush batch runs
        spark.conf.set = lambda k, v: None if k == key else orig_set(k, v)
        ref = sorted(map(tuple, REGISTRY["st11_session_windows"].fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set = orig_set
    assert fast == ref
    assert len(fast) > 0
