"""WS-envelope source parsing (streaming/sources.py): unit parity with the
reference's payload processor, plus a REAL socket-transport integration
test feeding minute_feature_stream end-to-end."""

from __future__ import annotations

import json
import os
import socket
import threading
import time

import pytest
from pyspark.sql import functions as F

from crypto_datalake_spark.streaming.sources import (
    kafka_event_stream,
    parse_depth_envelope,
    parse_ws_envelope,
    socket_event_stream,
)

SYM = "BTCUSDT"


def _env(stream_suffix: str, data: dict) -> str:
    return json.dumps({"stream": f"btcusdt@{stream_suffix}", "data": data})


TRADE = _env("aggTrade", {"e": "aggTrade", "E": 1704067200123, "T": 1704067200120,
                          "s": SYM, "p": "42000.5", "q": "0.25", "m": True})
TRADE_NO_E = _env("aggTrade", {"T": 1704067201000, "s": SYM, "p": "42001", "q": "1"})
LIQ = _env("forceOrder", {"E": 1704067202000, "o": {
    "s": SYM, "S": "SELL", "p": "41900", "ap": "41890.5",
    "q": "2.0", "z": "1.5", "T": 1704067201990}})
LIQ_UNFILLED = _env("forceOrder", {"E": 1704067203000, "o": {
    "s": SYM, "S": "BUY", "p": "42100", "q": "3.0", "z": "0"}})
LIQ_BAD_SIDE = _env("forceOrder", {"E": 1704067203500, "o": {
    "s": SYM, "S": "??", "p": "1", "q": "1"}})
MARK = _env("markPrice@1s", {"E": 1704067204000, "s": SYM, "p": "42010.7",
                             "r": "0.0001", "T": 1704096000000})
DEPTH = _env("depth@100ms", {"E": 1704067205000, "T": 1704067204990, "s": SYM,
                             "U": 100, "u": 105, "pu": 99,
                             "b": [["41999.0", "1.5"], ["41998.0", "0"]],
                             "a": [["42001.0", "2.0"]]})
DEPTH_NO_IDS = _env("depth@100ms", {"E": 1704067206000, "s": SYM})
UNKNOWN = _env("kline_1m", {"E": 1704067207000})
GARBAGE = "{not json"


def _parse_batch(spark, lines):
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    return parse_ws_envelope(raw)


def test_envelope_parses_all_stream_kinds(spark):
    rows = {
        (r["stream"], r["event_time"].isoformat()): r
        for r in _parse_batch(
            spark, [TRADE, TRADE_NO_E, LIQ, LIQ_UNFILLED, MARK, DEPTH]
        ).collect()
    }
    assert len(rows) == 6

    tr = rows[("trade", "2024-01-01T00:00:00.123000")]
    assert tr["symbol"] == SYM and tr["price"] == 42000.5 and tr["qty"] == 0.25
    assert tr["side"] == "SELL"  # m=True => buyer is maker => taker sold
    assert tr["transact_time"].isoformat() == "2024-01-01T00:00:00.120000"

    tr2 = rows[("trade", "2024-01-01T00:00:01")]  # E missing -> T fallback
    assert tr2["side"] is None

    lq = rows[("liq", "2024-01-01T00:00:02")]
    assert lq["price"] == 41890.5  # average price preferred
    assert lq["qty"] == 1.5 and lq["orig_qty"] == 2.0  # executed wins
    assert lq["side"] == "SELL"

    lq2 = rows[("liq", "2024-01-01T00:00:03")]
    assert lq2["qty"] == 3.0  # zero executed -> original qty

    mk = rows[("mark", "2024-01-01T00:00:04")]
    assert mk["price"] == 42010.7 and mk["transact_time"] is None

    dp = rows[("depth", "2024-01-01T00:00:05")]
    assert dp["price"] is None and dp["stream"] == "depth"


def test_envelope_drops_invalid_rows(spark):
    got = _parse_batch(spark, [LIQ_BAD_SIDE, DEPTH_NO_IDS, UNKNOWN, GARBAGE])
    assert got.count() == 0


def test_depth_envelope_feeds_book_replay(spark):
    raw = spark.createDataFrame([(DEPTH,), (TRADE,), (GARBAGE,)], "value string")
    depth = parse_depth_envelope(raw)
    rows = depth.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["kind"] == "delta" and r["prev_final_update_id"] == 99
    assert json.loads(r["bids"]) == [[41999.0, 1.5], [41998.0, 0.0]]

    from crypto_datalake_spark.streaming.orderbook import replay_book_batch

    # a delta with no prior snapshot must NOT produce book metrics — the
    # replay enforces the reference's snapshot-sync rule
    m = replay_book_batch(depth).collect()
    assert len(m) == 1 and m[0]["best_bid"] is None and m[0]["degraded"]

    # prepend the REST-style snapshot (kind='snapshot', update id 99 = the
    # delta's pu) and the stitched stream replays to real metrics: the
    # zero-qty bid level is deleted, 41999 survives
    snap = spark.createDataFrame(
        [(SYM, m[0]["minute_ts"], "snapshot", 99, 99, None,
          "[[41999.5, 9.0], [41998.0, 3.0]]", "[[42002.0, 4.0]]")],
        depth.schema,
    )
    m2 = replay_book_batch(snap.unionByName(depth)).collect()
    assert len(m2) == 1
    assert m2[0]["best_bid"] == 41999.5 and m2[0]["best_ask"] == 42001.0
    assert not m2[0]["degraded"] or m2[0]["synced"]


def test_socket_transport_end_to_end(spark):
    """Real TCP server -> socket source -> envelope parse ->
    minute_feature_stream -> memory sink.  The full live path on the
    built-in transport."""
    from crypto_datalake_spark.streaming.minute_features import (
        minute_feature_stream,
    )

    lines = [TRADE, TRADE_NO_E, LIQ, LIQ_UNFILLED, MARK, DEPTH, GARBAGE]
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall(("\n".join(lines) + "\n").encode())
            while not stop.wait(0.2):  # keep the connection open
                pass

    th = threading.Thread(target=serve, daemon=True)
    th.start()

    name = "src_socket_sink"
    q = (
        minute_feature_stream(socket_event_stream(spark, "127.0.0.1", port))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        want_minutes = 1  # all six valid events fall in 2024-01-01 00:00
        while time.time() < deadline:
            rows = spark.table(name).collect()
            if rows and rows[0]["n_events"] >= 6:
                break
            time.sleep(0.5)
        rows = spark.table(name).collect()
        assert len(rows) == want_minutes, rows
        r = rows[0]
        assert r["symbol"] == SYM
        assert r["n_events"] == 6
        assert r["liq_long_count"] == 1   # the SELL liq
        assert r["liq_short_count"] == 1  # the BUY liq
    finally:
        stop.set()
        q.stop()
        srv.close()


def _kafka_available(spark, bootstrap: str) -> str | None:
    """Reason the Kafka e2e test cannot run, or None if it can: needs the
    spark-sql-kafka connector on the classpath AND a reachable broker."""
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", bootstrap
        ).option("subscribe", "probe").load()
    except Exception:
        return "spark-sql-kafka connector not on classpath"
    # bootstrap.servers is comma-separated; probe each entry, any one
    # reachable broker is enough to bootstrap the cluster metadata
    for entry in bootstrap.split(","):
        host, _, port = entry.strip().partition(":")
        try:
            with socket.create_connection((host, int(port or 9092)), timeout=2):
                return None
        except (OSError, ValueError):
            continue
    return f"no Kafka broker reachable at {bootstrap}"


def test_kafka_transport_end_to_end(spark):
    """Mirror of the socket e2e test on the production transport: Spark
    batch-writes the WS-envelope lines to a topic (the connector is its
    own producer — no Python Kafka client needed), then
    kafka_event_stream replays it from earliest through the same parser
    into a memory sink.  Runs wherever the connector + a broker exist
    ($KAFKA_BOOTSTRAP, default localhost:9092); skips cleanly otherwise."""
    import uuid

    bootstrap = os.environ.get("KAFKA_BOOTSTRAP", "localhost:9092")
    reason = _kafka_available(spark, bootstrap)
    if reason:
        pytest.skip(reason)

    topic = f"ws-events-{uuid.uuid4().hex[:8]}"
    lines = [TRADE, TRADE_NO_E, LIQ, LIQ_UNFILLED, MARK, DEPTH, GARBAGE]
    (
        spark.createDataFrame([(l,) for l in lines], "value string")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )

    name = "src_kafka_sink"
    q = (
        kafka_event_stream(spark, bootstrap, topic, starting_offsets="earliest")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream timed out"
    rows = spark.table(name).collect()
    assert len(rows) == 6  # GARBAGE dropped, six valid events parsed
    kinds = sorted(r["stream"] for r in rows)
    assert kinds == ["depth", "liq", "liq", "mark", "trade", "trade"]
    # broker timestamps flow through as arrival_time (latency decomposition)
    assert all(r["arrival_time"] is not None for r in rows)


def test_kafka_gate_raises_clear_error_without_connector(spark):
    try:
        df = kafka_event_stream(spark, "localhost:9092", "ws-events")
    except RuntimeError as e:
        assert "spark-sql-kafka" in str(e)
        return
    # connector present in this environment: the stream must at least
    # carry the bronze schema (no broker contact happens until start())
    from crypto_datalake_spark.streaming.minute_features import EVENT_COLUMNS

    assert tuple(df.columns) == EVENT_COLUMNS
