"""Streaming sessionization — stateful per-key session windows
(SURVEY.md §2.8 ST2/ST11 family; ref: per-symbol stateful accumulators in
/root/reference/src/binance_minute_lake/sources/websocket.py:400-520).

`session_stream` groups an event stream by user and emits one row per
*closed* session: a session closes either (a) in-data, when a later event
for the same user arrives more than `gap` after the previous one, or
(b) by event-time timeout, when the watermark passes `last_event + gap`
(the streaming analogue of "no more data can belong to this session" —
late rows inside the watermark can still extend a session, which is why
closure waits for the watermark, not wall-clock).

Two implementations of the same contract:

- `session_stream` — `applyInPandasWithState` + EventTimeTimeout. This is
  the default: it runs on a plain PySpark worker with no extra deps.
- `session_stream_tws` / `SessionizeProcessor` — the Spark 4
  `transformWithStateInPandas` version (typed value state + explicit
  event-time timers). Its state server requires `protobuf` on the Python
  workers; `session_stream_tws` raises ImportError up front when the
  dependency is missing (as in this container), so callers can fall back.

The batch twin is `ops.gaps.sessionize` (same boundaries, same
aggregates); `tests/test_streaming.py` checks the emitted sessions agree.

Scale: state is O(1) per live user (4 scalars); the only exchange is the
hash partition on user_id that any per-user operator needs. Skewed users
cost one task their event volume — the state itself never grows with
events, only with concurrently-live users.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp_ntz, session_end timestamp_ntz, "
    "n_events bigint, total_value double"
)

_STATE_SCHEMA = "start_us long, last_us long, n_events long, total_value double"


def _us(ts: pd.Series) -> np.ndarray:
    return ts.values.astype("datetime64[us]").astype("int64")


def _session_pdf(user_id, start_us, last_us, n, total) -> pd.DataFrame:
    return _closed_sessions_pdf(user_id, [(start_us, last_us, n, total)])


def _closed_sessions_pdf(user_id, sessions: list) -> pd.DataFrame:
    """ONE frame for a batch of closed (start_us, last_us, n, total)
    tuples — a frame per session made batch replay O(sessions) pandas
    constructions (~100 µs each, the whole cost of a dense replay).

    user_id is Int64 (nullable), not int64: a NULL-keyed group's
    closing/timeout emission must carry user_id NULL —
    ``pd.array([None], dtype="int64")`` raises TypeError in the
    executor and crash-loops the query on checkpoint replay."""
    return pd.DataFrame(
        {
            "user_id": pd.array([user_id] * len(sessions), dtype="Int64"),
            "session_start": np.array(
                [s for s, _, _, _ in sessions], dtype="datetime64[us]"
            ),
            "session_end": np.array(
                [e for _, e, _, _ in sessions], dtype="datetime64[us]"
            ),
            "n_events": pd.array(
                [n for _, _, n, _ in sessions], dtype="int64"
            ),
            "total_value": pd.array(
                [float(t) for _, _, _, t in sessions], dtype="float64"
            ),
        }
    )


def _fold_events(user_id, pdf: pd.DataFrame, start, last, n, total, gap_us):
    """Fold sorted events into the open session; returns the closed
    sessions as (start_us, last_us, n, total) tuples plus the updated
    open-session tuple. Shared by both backends.

    All arithmetic is in MICROSECONDS (matching `ops.gaps.sessionize` and
    the lake's µs timestamps) so sub-second excess over the gap breaks the
    session exactly like the batch twin.

    A LATE row (t <= last: a prior micro-batch already advanced the open
    session past it, but the row is inside the watermark) extends the
    session's counts and may pull ``session_start`` back, but must never
    REWIND ``last`` — a rewound end both mis-stamps the eventual emission
    and shrinks the gap window so the next on-time row can spuriously
    split a session the batch twin keeps whole.  (A late row older than
    ``start - gap`` still folds into the open session rather than
    reconstructing an already-missed earlier one — the same
    once-emitted-is-final caveat every watermark streaming agg has.)"""
    closed = []  # (start_us, last_us, n, total) tuples, emission order
    for t, v in zip(_us(pdf["ts"]), pdf["value"].astype("float64").to_numpy()):
        t = int(t)
        if last is not None and t - last > gap_us:
            closed.append((start, last, n, total))
            start, n, total = None, 0, 0.0
        start = t if start is None else min(start, t)
        last = t if last is None else max(last, t)
        n += 1
        total += float(v)
    return closed, (start, last, n, total)


def _session_fn(gap_us: int):
    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            # Watermark passed last+gap with no new rows: the session is
            # final — no in-watermark row can extend it any more.
            start, last, n, total = state.get
            state.remove()
            yield _session_pdf(user_id, start, last, n, total)
            return
        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        start, last, n, total = state.get if state.exists else (None, None, 0, 0.0)
        closed, open_sess = _fold_events(
            user_id, pdf, start, last, n, total, gap_us
        )
        state.update(open_sess)
        # GroupState timeouts are in epoch-ms; round the µs deadline UP so
        # the timer never fires before the gap has truly elapsed.
        state.setTimeoutTimestamp(-(-(open_sess[1] + gap_us) // 1000))
        if closed:
            yield _closed_sessions_pdf(user_id, closed)

    return fn


def session_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Closed sessions per user from a streaming event frame with columns
    user_id, event_id, ts, value (`applyInPandasWithState` backend)."""
    ev = _with_watermark(events, watermark)
    return ev.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60_000_000),
        SESSION_OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def _with_watermark(events: DataFrame, watermark: str) -> DataFrame:
    ev = events.select("user_id", "event_id", "ts", "value")
    # Watermarks require instant-typed TIMESTAMP; lake timestamps are NTZ
    # (same bridge as minute_features — session tz is pinned UTC, so the
    # cast is value-preserving).
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev.withWatermark("ts", watermark)


def session_stream_native(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Same closed-session contract via Spark's BUILT-IN
    ``F.session_window`` — zero Python in the hot path (state handling,
    gap-merging, and watermark expiry all run in the JVM's native session
    aggregation), which makes it the preferred backend whenever the
    session result is a pure aggregate of its events (our case: count +
    sum + bounds).  The pandas/TWS backends above remain for sessions
    carrying non-aggregatable state (order books, pattern machines).

    Semantics note vs ``session_stream``: Spark's session_window treats a
    gap EQUAL to the threshold as the same session (window is
    [start, last+gap)); the fold backends break strictly-greater.  The
    boundary case requires an event at exactly ``last + gap`` — minute
    data with second-level jitter never produces it; tests pin agreement
    away from the knife-edge.
    """
    ev = _with_watermark(events, watermark)
    agg = ev.groupBy(
        "user_id", F.session_window("ts", f"{gap_minutes} minutes")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )
    return agg.select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    )


def dedup_stream_within_watermark(
    events: DataFrame,
    keys: list[str] = ("user_id", "event_id"),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """At-source duplicate suppression for at-least-once feeds (ST11's
    dup half) via the built-in ``dropDuplicatesWithinWatermark``: keeps
    the first arrival per key and drops re-deliveries that land within
    the watermark horizon, with state expiring as the watermark advances
    — bounded state, no custom fold.  Downstream keep-last upserts stay
    as the durable second line of defense (exact dedup across restarts);
    this trims the duplicate volume before it ever hits a shuffle."""
    ev = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if ev.isStreaming:
        ev = ev.withWatermark(ts_col, watermark)
        return ev.dropDuplicatesWithinWatermark(list(keys))
    return ev.dropDuplicates(list(keys))


# --- transformWithState variant (Spark 4 state-v2 API) ---------------------


def _make_processor(gap_seconds: int):
    """Build the `StatefulProcessor` lazily: the class is importable on any
    PySpark 4 driver, but executing it needs `protobuf` on the workers."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class SessionizeProcessor(StatefulProcessor):
        """Per-user session accumulator with event-time timer expiry."""

        def __init__(self):
            self._gap_us = gap_seconds * 1_000_000

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._sess = handle.getValueState("session", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            user_id = key[0]
            pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            if self._sess.exists():
                start, last, n, total = tuple(self._sess.get())
            else:
                start, last, n, total = None, None, 0, 0.0
            closed, open_sess = _fold_events(
                user_id, pdf, start, last, n, total, self._gap_us
            )
            self._sess.update(open_sess)
            # One live timer per key: the session can only close gap after
            # the newest event, so earlier-registered expiries are stale.
            for old in self._handle.listTimers():
                self._handle.deleteTimer(old)
            # TWS timers are epoch-ms; round the µs deadline up.
            self._handle.registerTimer(-(-(open_sess[1] + self._gap_us) // 1000))
            if closed:
                yield _closed_sessions_pdf(user_id, closed)

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            if self._sess.exists():
                start, last, n, total = tuple(self._sess.get())
                self._sess.clear()
                yield _session_pdf(key[0], start, last, n, total)

        def close(self) -> None:
            pass

    return SessionizeProcessor()


def session_stream_tws(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """`transformWithStateInPandas` backend — same contract as
    `session_stream`. Raises ImportError when the TWS state server's
    `protobuf` dependency is not installed on the workers."""
    import google.protobuf  # noqa: F401 — fail fast, not mid-query

    ev = _with_watermark(events, watermark)
    return ev.groupBy("user_id").transformWithStateInPandas(
        _make_processor(gap_minutes * 60),
        SESSION_OUTPUT_SCHEMA,
        "append",
        "eventtime",
    )
