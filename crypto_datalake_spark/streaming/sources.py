"""Live stream sources: WS-envelope parsing over socket / Kafka inputs.

The reference runs four Binance futures WS streams through one combined
connection and dispatches on the envelope's stream suffix
(/root/reference/src/binance_minute_lake/sources/websocket.py:1874-1901
``process_stream_payload``; :1903-1907 combined ``{"stream": ..., "data":
...}`` unwrap; per-stream field extraction :1909-2020).

Spark realization: the transport (socket source, Kafka source) delivers
raw JSON lines; ONE declarative parser — ``from_json`` + conditional
expressions, fully JVM-side, no Python in the hot path — turns them into
the bronze event schema ``minute_features.EVENT_COLUMNS`` expects, and a
sibling turns depth rows into ``orderbook.book_state_stream`` input.  The
parser is pure column logic, so it is identical (and identically tested)
on batch and streaming frames; transports are interchangeable.

Validity rules mirror the reference exactly:
- depth: requires E, U, u (websocket.py:1916-1920)
- liq:   side ∈ {BUY, SELL}; price = ap else p; qty = executed (z else l)
         if > 0 else original q; event_time = E else o.T; drops otherwise
         (websocket.py:1941-1972)
- trade: event_time = E else T (websocket.py:1988-1996)
- mark:  requires E (websocket.py:2009-2012)
- malformed JSON / unknown stream names are dropped, matching the
  reference's debug-log-and-continue (websocket.py:2108-2112)

Kafka needs the ``spark-sql-kafka`` connector on the classpath (not baked
into this container) — ``kafka_event_stream`` raises a clear error when
absent and the integration test skips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Binance field names collide under Spark's case-INsensitive schema
# resolution (E/e event-time vs type, U/u update-id range, o.S/o.s side vs
# symbol), so a single from_json struct cannot hold them.  JSONPath is
# case-sensitive, so extraction uses get_json_object per field — still
# pure JVM expressions inside whole-stage codegen; the repeated parse of a
# ~200-byte message is the price of the collision, paid only on matched
# branches.


def _stream_kind(stream_col):
    s = F.lower(stream_col)
    return (
        F.when(s.contains("@depth"), "depth")
        .when(s.contains("@forceorder"), "liq")
        .when(s.contains("@aggtrade"), "trade")
        .when(s.contains("@markprice"), "mark")
    )


def parse_ws_envelope(
    raw: DataFrame, value_col: str = "value", arrival_col: str | None = None
) -> DataFrame:
    """Combined-stream JSON lines → bronze event rows (EVENT_COLUMNS).

    ``arrival_col``: an existing timestamp column to use as arrival time
    (Kafka's broker ``timestamp``); defaults to processing-time
    ``current_timestamp`` like the reference's ``now_ms()`` receipt stamp
    (websocket.py:2111).
    """
    v = F.col(value_col)
    g = lambda path: F.get_json_object(v, f"$.{path}")  # noqa: E731
    glong = lambda path: g(path).cast("bigint")  # noqa: E731
    gdbl = lambda path: g(path).cast("double")  # noqa: E731

    kind = _stream_kind(g("stream"))
    arrival = F.col(arrival_col) if arrival_col else F.current_timestamp()

    is_liq = kind == "liq"
    liq_exec = F.coalesce(gdbl("data.o.z"), gdbl("data.o.l"))
    liq_qty = F.when(liq_exec > 0, liq_exec).otherwise(gdbl("data.o.q"))
    liq_price = F.coalesce(gdbl("data.o.ap"), gdbl("data.o.p"))

    event_ms = (
        F.when(is_liq, F.coalesce(glong("data.E"), glong("data.o.T")))
        .when(kind == "trade", F.coalesce(glong("data.E"), glong("data.T")))
        .otherwise(glong("data.E"))
    )
    symbol = F.upper(
        F.coalesce(
            g("data.s"), g("data.o.s"), F.split(g("stream"), "@").getItem(0)
        )
    )

    parsed = raw.select(
        symbol.alias("symbol"),
        kind.alias("stream"),
        F.timestamp_millis(event_ms).alias("event_time"),
        F.timestamp_millis(
            F.when(kind.isin("depth", "trade"), glong("data.T"))
        ).alias("transact_time"),
        arrival.cast("timestamp").alias("arrival_time"),
        F.when(is_liq, g("data.o.S"))
        .when(
            kind == "trade",
            # aggTrade m = buyer-is-maker: the TAKER side of the print
            F.when(g("data.m") == "true", "SELL").when(
                g("data.m") == "false", "BUY"
            ),
        )
        .alias("side"),
        F.when(is_liq, liq_price).otherwise(gdbl("data.p")).alias("price"),
        F.when(is_liq, liq_qty).otherwise(gdbl("data.q")).alias("qty"),
        F.when(is_liq, gdbl("data.o.q")).alias("orig_qty"),
        # raw executed qty clamped to [0, orig] (websocket.py:1079-1087);
        # null when z/l or q missing → the minute fold reports the
        # unfilled ratio as unsupported for that minute
        F.when(
            is_liq & liq_exec.isNotNull() & gdbl("data.o.q").isNotNull(),
            F.least(F.greatest(liq_exec, F.lit(0.0)), gdbl("data.o.q")),
        ).alias("exec_qty"),
        # depth continuity ids, kept for the book path / DQ
        glong("data.U").alias("first_update_id"),
        glong("data.u").alias("final_update_id"),
    )
    valid = (
        F.when(
            F.col("stream") == "depth",
            F.col("event_time").isNotNull()
            & F.col("first_update_id").isNotNull()
            & F.col("final_update_id").isNotNull(),
        )
        .when(
            F.col("stream") == "liq",
            F.col("side").isin("BUY", "SELL")
            & F.col("price").isNotNull()
            & (F.col("qty") > 0)
            & F.col("event_time").isNotNull(),
        )
        .when(F.col("stream") == "trade", F.col("event_time").isNotNull())
        .when(F.col("stream") == "mark", F.col("event_time").isNotNull())
        .otherwise(F.lit(False))  # unknown stream / unparseable JSON
    )
    from crypto_datalake_spark.streaming.minute_features import EVENT_COLUMNS

    return parsed.where(valid).select(*EVENT_COLUMNS)


def parse_depth_envelope(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Combined-stream JSON lines → ``book_state_stream`` depth-delta rows
    (WS only carries deltas; snapshots enter via the REST resync path,
    websocket.py:2164-2240)."""
    v = F.col(value_col)
    g = lambda path: F.get_json_object(v, f"$.{path}")  # noqa: E731
    to_levels = lambda side: F.to_json(  # noqa: E731
        F.transform(
            F.from_json(g(f"data.{side}"), "ARRAY<ARRAY<STRING>>"),
            lambda lvl: F.transform(lvl, lambda x: x.cast("double")),
        )
    )
    out = raw.where(_stream_kind(g("stream")) == "depth").select(
        F.upper(
            F.coalesce(g("data.s"), F.split(g("stream"), "@").getItem(0))
        ).alias("symbol"),
        F.timestamp_millis(g("data.E").cast("bigint")).alias("event_time"),
        F.lit("delta").alias("kind"),
        g("data.U").cast("bigint").alias("first_update_id"),
        g("data.u").cast("bigint").alias("final_update_id"),
        g("data.pu").cast("bigint").alias("prev_final_update_id"),
        to_levels("b").alias("bids"),
        to_levels("a").alias("asks"),
    )
    return out.where(
        F.col("event_time").isNotNull()
        & F.col("first_update_id").isNotNull()
        & F.col("final_update_id").isNotNull()
    )


def socket_event_stream(
    spark: SparkSession, host: str = "127.0.0.1", port: int = 9999
) -> DataFrame:
    """Raw JSON lines over TCP → bronze events.  The socket source is
    Spark-built-in (no extra jars) — the dev/integration transport; swap
    for Kafka in production (same parser, durable + replayable)."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return parse_ws_envelope(raw)


def kafka_event_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka topic of WS-envelope JSON → bronze events.  The production
    transport: partition the topic by symbol so downstream (symbol,
    minute) aggregation state is fed mostly-locally; broker timestamps
    become arrival_time (latency decomposition stays meaningful across
    restarts, unlike processing-time stamps)."""
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topics)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # pragma: no cover - container has no connector
        # rebrand ONLY the missing-connector failure — a genuine config
        # error (bad offsets JSON, malformed bootstrap string) must
        # surface as itself, not send the operator chasing the classpath
        if "Failed to find data source" not in str(
            e
        ) and "ClassNotFoundException" not in str(e):
            raise
        raise RuntimeError(
            "Kafka source unavailable: the spark-sql-kafka connector must be "
            "on the classpath (spark.jars.packages="
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>)"
        ) from e
    return parse_ws_envelope(
        raw.select(F.col("value").cast("string").alias("value"), "timestamp"),
        arrival_col="timestamp",
    )
