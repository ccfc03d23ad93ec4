"""Stateful order-book stream: sync, delta application, impact, health.

Reference (/root/reference/src/binance_minute_lake/sources/websocket.py):
- ``DepthOrderBook`` state machine (:234-345): buffer deltas until a REST
  snapshot arrives; bridge rule — first applied delta must satisfy
  ``U <= lastUpdateId+1 <= u``; thereafter sequence continuity
  ``pu == last_u`` else the book degrades to unsynced; ``qty <= 0``
  deletes a level; a crossed book (bid >= ask) degrades.
- Simulated market-impact walk (:357-389): fill IMPACT_NOTIONAL ascending
  the asks; ``impact = (avg_exec − mid)/mid``; fillable flag.
- Book-health metrics (:391-413, 18-23): spread_pct; mean qty of top-10
  levels per side; degraded if unsynced ∨ ¬fillable ∨ spread > 2% ∨
  avg level qty < 1.0.

Spark realization: ``applyInPandasWithState`` keyed by symbol. The book
lives in the state value (JSON — price→qty maps); each micro-batch applies
its events in (event_time, final_update_id) order and emits one metrics
row per observed minute. The REST-snapshot resync has no streaming
analogue, so snapshots arrive as control rows on the same stream
(kind='snapshot') — a control-stream union, SURVEY.md §7.3(a).

Scale: state is per-symbol (bounded: one book), so 1000 symbols = 1000
keys spread across executors; shuffle is one exchange on symbol per
micro-batch. Python is the right tool here — the work is inherently
sequential per key and tiny per event.
"""

from __future__ import annotations

import heapq
import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

IMPACT_NOTIONAL = 100_000.0
MAX_SPREAD_PCT = 2.0
MIN_AVG_LEVEL_QTY = 1.0

DEPTH_EVENT_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("event_time", TimestampNTZType()),
        StructField("kind", StringType()),  # snapshot | delta
        StructField("first_update_id", LongType()),  # U
        StructField("final_update_id", LongType()),  # u (= lastUpdateId for snapshot)
        StructField("prev_final_update_id", LongType()),  # pu
        StructField("bids", StringType()),  # JSON [[price, qty], ...]
        StructField("asks", StringType()),
    ]
)

BOOK_METRICS_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("minute_ts", TimestampNTZType()),
        StructField("best_bid", DoubleType()),
        StructField("best_ask", DoubleType()),
        StructField("mid", DoubleType()),
        StructField("spread_pct", DoubleType()),
        StructField("impact_pct", DoubleType()),
        StructField("fillable", BooleanType()),
        StructField("avg_bid_qty_top10", DoubleType()),
        StructField("avg_ask_qty_top10", DoubleType()),
        StructField("synced", BooleanType()),
        StructField("degraded", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("blob", StringType())])

_EMPTY = {"bids": {}, "asks": {}, "last_u": None, "synced": False, "buffer": []}

# Bound the pre-snapshot delta buffer: an unsynced symbol whose snapshot
# never arrives (resync job down) would otherwise grow per-key state —
# and its per-batch JSON serialization — linearly with event volume.
# Oldest deltas are useless for the bridge anyway (it needs u >
# lastUpdateId), so trimming from the front only risks missing a bridge
# against a VERY stale snapshot, which the next snapshot repairs.
MAX_BUFFERED_DELTAS = 10_000


def _apply_levels(book_side: dict, levels: list, heap: list | None = None, neg: bool = False) -> None:
    for price, qty in levels:
        fp = float(price)
        key = f"{fp:.10g}"
        if float(qty) <= 0:
            book_side.pop(key, None)
        else:
            if heap is not None and key not in book_side:
                # 2-element LISTS, not tuples: callers may round-trip the
                # whole state through JSON (which turns tuples into
                # lists), and heapq comparisons between a pushed tuple
                # and a reloaded list would TypeError.
                # float(key), NOT fp: the heap float must derive from the
                # canonical .10g key string so a pushed entry orders
                # identically to _heap's lazy rebuild (which only has the
                # key) — prices differing past 10 significant digits
                # would otherwise give _crossed a different verdict
                # pushed vs rebuilt (ADVICE r11)
                fk = float(key)
                heapq.heappush(heap, [(-fk if neg else fk), key])
            book_side[key] = float(qty)


def _heap(st: dict, side: str, neg: bool) -> list:
    """Lazy best-price heap for one book side (transient, never
    serialized — see ``_state_blob``).  Invariant: every key present in
    ``st[side]`` has at least one heap entry; deletions leave stale
    entries that peek time pops (lazy deletion), so maintenance is
    amortized O(log levels) per update."""
    h = st.get("_h_" + side)
    if h is None:
        h = [[(-float(p) if neg else float(p)), p] for p in st[side]]
        heapq.heapify(h)
        st["_h_" + side] = h
    return h


def _crossed(st: dict) -> bool:
    """bid >= ask cross test in amortized O(log levels).  The naive
    ``max(map(float, bids)) >= min(map(float, asks))`` scan is O(book)
    PER EVENT and dominated the batch-replay profile (the book grows to
    hundreds of levels within a segment)."""
    bids, asks = st["bids"], st["asks"]
    if not (bids and asks):
        return False
    hb = _heap(st, "bids", neg=True)
    while hb[0][1] not in bids:
        heapq.heappop(hb)
    ha = _heap(st, "asks", neg=False)
    while ha[0][1] not in asks:
        heapq.heappop(ha)
    return -hb[0][0] >= ha[0][0]


def _state_blob(st: dict) -> str:
    """Serialize the book state for persistence/transfer.  Transient
    ``_``-prefixed caches (the best-price heaps) are derived from the
    book dicts and rebuilt lazily on first use — never serialized."""
    return json.dumps(
        {k: v for k, v in st.items() if not k.startswith("_")}, default=str
    )


def _apply_delta(st: dict, ev: dict) -> None:
    """One depth diff against a synced book (websocket.py:300-345).

    The FIRST delta applied after a snapshot uses the bridge rule
    (``U <= lastUpdateId+1 <= u``) instead of pu-continuity: its ``pu``
    chains to the previous STREAM event, not to the REST snapshot's
    lastUpdateId, so the strict check would spuriously desync a
    perfectly bridged book whenever the snapshot and its first following
    delta land in different micro-batches (the buffered-delta bridge in
    ``_sync_from_snapshot`` only covers deltas that arrived BEFORE the
    snapshot was processed).

    DELIBERATE divergence from the reference (websocket.py:289-294),
    which requires OVERLAP — ``U <= lastUpdateId <= u`` (the Binance
    USDS-futures spec, where REST snapshot ids align with the stream
    sequence).  This engine uses the Binance SPOT spec's
    ``U <= lastUpdateId+1 <= u``, which additionally admits an
    EXACTLY-CONTIGUOUS first delta (``U == lastUpdateId+1``) — a
    contiguous delta provably misses nothing, so desyncing on it would
    force a needless re-snapshot.  On that one edge the two engines
    report different ``synced``/``degraded`` flags; the book CONTENT is
    identical in every accepted case.  Pinned by
    test_streaming.py::test_bridge_rule_first_delta_edges."""
    if st.pop("await_bridge", False):
        if ev["u"] is not None and st["last_u"] is not None and ev["u"] <= st["last_u"]:
            st["await_bridge"] = True  # stale pre-snapshot delta: skip, keep waiting
            return
        if not (
            ev["U"] is not None
            and ev["u"] is not None
            and st["last_u"] is not None
            and ev["U"] <= st["last_u"] + 1 <= ev["u"]
        ):
            # a null-u delta can never prove the bridge — degrade instead
            # of letting the chained comparison hit `int <= None`
            st["synced"] = False  # gap between snapshot and first delta
            return
    else:
        if (
            st["last_u"] is not None
            and ev["u"] is not None
            and ev["u"] <= st["last_u"]
        ):
            # stale redelivery (at-least-once transport): already applied
            # — the reference silently skips BEFORE the pu check
            # (websocket.py:305); falling through would hit pu != last_u
            # and falsely desync a perfectly intact book
            return
        if ev["u"] is None or (ev["pu"] is None and ev["U"] is None):
            # a null-u delta cannot anchor the NEXT continuity check
            # (last_u would become None and every later pu/U/stale
            # check short-circuits — continuity silently dead while
            # synced stays True); a delta with neither pu nor U cannot
            # prove continuity INTO the book either.  The reference's
            # event schema forbids these (websocket.py ints); on a
            # malformed feed it crashes into resync — degrading is the
            # flag-level analogue, consistent with the bridge path's
            # null-u rule above.
            st["synced"] = False
            return
        if st["last_u"] is not None and ev["pu"] is not None and ev["pu"] != st["last_u"]:
            st["synced"] = False  # sequence break → resync required
            return
        if (
            st["last_u"] is not None
            and ev["pu"] is None
            and ev["U"] is not None
            and ev["U"] > st["last_u"] + 1
        ):
            # pu-less feed: continuity falls back to the U check
            # (websocket.py:316-321) — without it a dropped delta
            # silently corrupts the book while it reports synced
            st["synced"] = False
            return
    _apply_levels(st["bids"], ev["bids"], _heap(st, "bids", neg=True), neg=True)
    _apply_levels(st["asks"], ev["asks"], _heap(st, "asks", neg=False))
    st["last_u"] = ev["u"]
    # book-spread invariant after every apply (websocket.py:336-345 →
    # mark_degraded): a crossed book proves missed/corrupt state — keep
    # applying deltas to it and a later uncrossing delta would let
    # degraded=False rows flow from a book that was never resynced
    if _crossed(st):
        st["synced"] = False


def _sync_from_snapshot(st: dict, snap: dict) -> None:
    """Snapshot + buffered-delta bridge (websocket.py:262-299)."""
    last_id = snap["u"]
    if last_id is None:
        # a snapshot without lastUpdateId cannot anchor the bridge or
        # any later continuity check — unusable; wait for the next one
        # (comparing buffered u's against None would crash the task
        # into a replay loop instead)
        st["synced"] = False
        st["buffer"] = []
        st.pop("await_bridge", None)
        return
    st["bids"] = {}
    st["asks"] = {}
    st.pop("_h_bids", None)  # heaps mirror the dicts just rebuilt
    st.pop("_h_asks", None)
    _apply_levels(st["bids"], snap["bids"])
    _apply_levels(st["asks"], snap["asks"])
    st["last_u"] = last_id
    st["synced"] = True
    st.pop("await_bridge", None)
    # null-u deltas can neither bridge nor order — drop them here (the
    # fold's own null-u guards cover the live path).  The strict
    # ``u > last_id`` filter (vs the reference's ``u >= lastUpdateId``,
    # websocket.py:283) is internally consistent with the spot-spec
    # bridge below: a delta with ``u == lastUpdateId`` is fully covered
    # by the snapshot, and the reference itself skips it as stale right
    # after admitting it through the filter.
    pending = sorted(
        (e for e in st["buffer"] if e["u"] is not None and e["u"] > last_id),
        key=lambda e: e["u"],
    )
    if not pending:
        # the reference validates the book spread on the snapshot itself
        # when no buffered delta applies (websocket.py:279-288,
        # _validate_book_spread → mark_degraded): a crossed snapshot is
        # corrupt data and must not serve synced rows.  With pending
        # deltas the validation happens after each apply instead —
        # same as the reference's apply_event path.
        if _crossed(st):
            st["synced"] = False
            st["buffer"] = []
            return
        # no buffered delta to bridge with: the NEXT live delta must be
        # admitted by the bridge rule, not pu-continuity (_apply_delta)
        st["await_bridge"] = True
    if pending:
        first = pending[0]
        # spot-spec bridge (U <= lastUpdateId+1 <= u) — deliberately one
        # update-id more permissive than the reference's futures-spec
        # overlap rule (U <= lastUpdateId <= u, websocket.py:289-294);
        # see the _apply_delta docstring for the full rationale
        if first["U"] is None or not (first["U"] <= last_id + 1 <= first["u"]):
            st["synced"] = False  # bridge check failed — wait for next snapshot
            st["buffer"] = []
            return
        first_applied = dict(first, pu=None)  # bridge event skips pu check
        _apply_delta(st, first_applied)
        for e in pending[1:]:
            if not st["synced"]:
                break
            _apply_delta(st, e)
    st["buffer"] = []


def _book_metrics(st: dict, symbol: str, minute_ts) -> dict:
    bids = sorted(((float(p), q) for p, q in st["bids"].items()), reverse=True)
    asks = sorted((float(p), q) for p, q in st["asks"].items())
    row = dict(
        symbol=symbol, minute_ts=minute_ts, best_bid=None, best_ask=None,
        mid=None, spread_pct=None, impact_pct=None, fillable=False,
        avg_bid_qty_top10=None, avg_ask_qty_top10=None,
        synced=bool(st["synced"]), degraded=True,
    )
    if not (st["synced"] and bids and asks):
        return row
    best_bid, best_ask = bids[0][0], asks[0][0]
    if best_bid >= best_ask:  # crossed book invariant
        row["synced"] = st["synced"]
        return row
    mid = (best_bid + best_ask) / 2.0
    spread_pct = (best_ask - best_bid) / mid * 100.0
    # ST4: walk asks ascending, fill IMPACT_NOTIONAL
    remaining = IMPACT_NOTIONAL
    cost = 0.0
    filled_qty = 0.0
    for price, qty in asks:
        level_notional = price * qty
        take = min(remaining, level_notional)
        cost += take
        filled_qty += take / price
        remaining -= take
        if remaining <= 0:
            break
    fillable = remaining <= 0
    impact_pct = ((cost / filled_qty) - mid) / mid * 100.0 if filled_qty > 0 else None
    # ST5: health
    avg_bid = sum(q for _, q in bids[:10]) / min(len(bids), 10)
    avg_ask = sum(q for _, q in asks[:10]) / min(len(asks), 10)
    degraded = (
        (not st["synced"])
        or (not fillable)
        or spread_pct > MAX_SPREAD_PCT
        or min(avg_bid, avg_ask) < MIN_AVG_LEVEL_QTY
    )
    row.update(
        best_bid=best_bid, best_ask=best_ask, mid=mid, spread_pct=spread_pct,
        impact_pct=impact_pct, fillable=fillable,
        avg_bid_qty_top10=avg_bid, avg_ask_qty_top10=avg_ask, degraded=degraded,
    )
    return row


def _process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (symbol,) = key
    st = json.loads(state.get[0]) if state.exists else dict(_EMPTY, buffer=[])
    # concat the whole micro-batch before folding: the event sort must see
    # every chunk of the group, not each Arrow batch independently
    chunks = [pdf for pdf in pdfs if len(pdf)]
    out_rows = _fold_batch(symbol, st, pd.concat(chunks)) if chunks else []
    state.update((_state_blob(st),))
    if out_rows:
        yield pd.DataFrame(out_rows)


def book_state_stream(depth_events: DataFrame) -> DataFrame:
    """Depth event stream → per-minute book metrics with per-symbol state.

    Accepts streaming or batch input (batch replays through the same fold —
    the recovery-from-event-store path, websocket.py:239).

    Output contract: UPDATE semantics per (symbol, minute_ts).  A minute
    whose events straddle micro-batches is re-emitted each batch with
    the then-current end-of-batch book state; the LATEST emission is the
    one to keep.  Consume through a keep-last upsert keyed on
    (symbol, minute_ts) — ``silver.foreach_batch_upsert`` is exactly
    that — never a blind append that would double-count the minute."""
    if depth_events.isStreaming:
        return depth_events.groupBy("symbol").applyInPandasWithState(
            _process,
            BOOK_METRICS_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    # batch replay: run the same fold per symbol via applyInPandas
    from pyspark.sql.functions import col  # local import to keep top clean

    class _FakeState:
        exists = False

        def update(self, v):
            pass

    def _batch(pdf: pd.DataFrame) -> pd.DataFrame:
        sym = pdf["symbol"].iloc[0]
        frames = list(_process((sym,), iter([pdf]), _FakeState()))
        return (
            pd.concat(frames)
            if frames
            else pd.DataFrame(columns=[f.name for f in BOOK_METRICS_SCHEMA.fields])
        )

    return depth_events.groupBy(col("symbol")).applyInPandas(
        _batch, BOOK_METRICS_SCHEMA
    )


def _fold_batch(symbol: str, st: dict, pdf: pd.DataFrame) -> list[dict]:
    """Apply one micro-batch of depth events to ``st`` in place and return
    the per-minute metric rows — the shared core of both streaming
    backends (and of batch replay via ``book_state_stream``).

    Column prep is vectorized (one ``dt.floor``/``isna`` pass per
    column, not per event): at batch-replay scale the per-event
    ``Timestamp.floor`` and ``pd.isna`` calls were ~half the fold's
    profile."""
    if not len(pdf):
        return []

    def _ids(col: str) -> list:
        s = pdf[col]
        return [
            None if isna else int(v)
            for v, isna in zip(s.tolist(), s.isna().tolist())
        ]

    minutes = pdf["event_time"].dt.floor("min").tolist()
    events = [
        dict(
            event_time=t,
            minute=m,
            kind=k,
            U=uu,
            u=u,
            pu=pu,
            bids=json.loads(b) if b else [],
            asks=json.loads(a) if a else [],
        )
        for t, m, k, uu, u, pu, b, a in zip(
            pdf["event_time"].tolist(),
            minutes,
            pdf["kind"].tolist(),
            _ids("first_update_id"),
            _ids("final_update_id"),
            _ids("prev_final_update_id"),
            pdf["bids"].tolist(),
            pdf["asks"].tolist(),
        )
    ]
    events.sort(key=lambda e: (e["event_time"], -1 if e["kind"] == "snapshot" else e["u"] or 0))

    touched_minutes: dict = {}
    for ev in events:
        if ev["kind"] == "snapshot":
            _sync_from_snapshot(st, ev)
        elif st["synced"]:
            _apply_delta(st, ev)
        else:
            st["buffer"].append(ev)  # buffer-until-snapshot
            if len(st["buffer"]) > MAX_BUFFERED_DELTAS:  # bound per-key state
                del st["buffer"][: len(st["buffer"]) - MAX_BUFFERED_DELTAS]
        touched_minutes[ev["minute"]] = True
    if not touched_minutes:
        return []
    # every emitted minute reflects the post-batch state, so compute the
    # metrics (book sort + impact walk) ONCE and replicate per minute —
    # a batch replay touching thousands of minutes would otherwise
    # re-sort the whole book per minute
    base = _book_metrics(st, symbol, None)
    return [dict(base, minute_ts=minute) for minute in touched_minutes]


def _make_book_processor():
    """Build the order-book `StatefulProcessor` lazily: importable on any
    PySpark 4 driver, but executing it needs `protobuf` on the workers
    (the TWS state server speaks protobuf to the JVM)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class OrderBookProcessor(StatefulProcessor):
        """Per-symbol depth-diff fold on the Spark-4 state-v2 API.

        Same contract and same fold helpers (`_sync_from_snapshot`,
        `_apply_delta`, `_book_metrics`) as the legacy
        `applyInPandasWithState` backend — equivalence is by shared code,
        not by parallel reimplementation. No timers: the book never
        expires (reference keeps one live book per symbol for the
        process lifetime, websocket.py:234-345)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._book = handle.getValueState("book", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            (symbol,) = key
            st = (
                json.loads(tuple(self._book.get())[0])
                if self._book.exists()
                else dict(_EMPTY, buffer=[])
            )
            chunks = [pdf for pdf in rows if len(pdf)]
            out_rows = _fold_batch(symbol, st, pd.concat(chunks)) if chunks else []
            self._book.update((_state_blob(st),))
            if out_rows:
                yield pd.DataFrame(out_rows)

        def close(self) -> None:
            pass

    return OrderBookProcessor()


def book_state_stream_tws(depth_events: DataFrame) -> DataFrame:
    """`transformWithStateInPandas` twin of ``book_state_stream`` — the
    non-deprecated Spark-4 stateful API, same per-symbol book fold and the
    same BOOK_METRICS_SCHEMA output. Raises ImportError up front when the
    TWS state server's `protobuf` dependency is missing, so callers can
    fall back to the legacy backend instead of crashing mid-query.  The
    probe runs on the DRIVER — airtight in local mode (driver == workers,
    this container) but advisory on a cluster with heterogeneous images,
    where the workers need protobuf too (ship it via the same image or
    --archives env, as with any Python worker dep)."""
    import google.protobuf  # noqa: F401 — fail fast, not mid-query

    return depth_events.groupBy("symbol").transformWithStateInPandas(
        _make_book_processor(),
        BOOK_METRICS_SCHEMA,
        "append",
        "none",
    )


def replay_book_batch(depth_events: DataFrame) -> DataFrame:
    """Declarative batch replay of a CONTINUOUS depth-event store.

    The scale path for recovery from an event store whose sequence
    integrity was validated on write (pu-chain continuous, snapshot
    first), and whose replayed book never CROSSES mid-stream (true for
    any real exchange feed — the matching engine clears crossed
    orders; on a crossing the fold desyncs and buffers everything
    after, while last-write-per-level keeps applying, so content
    diverges — pinned by
    test_declarative_replay_crossed_store_is_out_of_contract): the
    final book is "last write per (symbol, side, price) at or after
    the last snapshot, surviving qty > 0" — pure window functions,
    fully distributed, no per-symbol sequential Python. The stateful
    fold (``book_state_stream``) remains the general path (it alone
    handles gaps, buffering, bridge checks, and crossed data) and the
    streaming twin; ``tests/test_streaming.py`` asserts this function
    matches the fold on continuous input, directly and by property
    sweep over random contract-shaped stores.

    Emits the same shape as the fold's batch mode: one row per observed
    (symbol, minute) carrying the final-state metrics; symbols with no
    snapshot in the batch emit unsynced/degraded rows.
    """
    from pyspark.sql import Window, functions as F

    # Last-snapshot watermark per symbol as a tiny AGGREGATE (map-side
    # partial combine, |symbols| output rows) broadcast back onto the
    # events — NOT a Window.partitionBy("symbol"): that window sorts the
    # full event store into one task per symbol, and with few hot symbols
    # (5 in the bench data, dozens on a real exchange) it serialises the
    # whole scan onto a handful of cores regardless of cluster size.
    snaps = depth_events.groupBy("symbol").agg(
        F.max(
            F.when(F.col("kind") == "snapshot", F.col("final_update_id"))
        ).alias("__snap_u")
    )
    live = depth_events.join(
        F.broadcast(snaps.where(F.col("__snap_u").isNotNull())), "symbol"
    ).where(
        # deltas STRICTLY after the snapshot (the fold's bridge rule):
        # a pre-snapshot delta sharing the snapshot's update id ties
        # with it in the (u, pos) last-write ordering and could override
        # snapshot levels; the snapshot row itself is the u == __snap_u
        # base the book rebuilds from
        (F.col("final_update_id") > F.col("__snap_u"))
        | (
            (F.col("kind") == "snapshot")
            & (F.col("final_update_id") == F.col("__snap_u"))
        )
    )

    # ONE explode over both sides (DataFrame reuse re-evaluates the whole
    # subplan per consumer in Spark — a bids/asks union would parse every
    # event's JSON twice, and separate best/impact/top-k frames would
    # re-explode it three more times)
    def side_structs(json_col: str, side: str):
        return F.transform(
            F.from_json(json_col, "array<array<double>>"),
            lambda x: F.struct(
                F.lit(side).alias("side"),
                x[0].alias("price"),
                x[1].alias("qty"),
            ),
        )

    lv = live.select(
        "symbol",
        F.col("final_update_id").alias("u"),
        F.posexplode(
            F.concat(side_structs("bids", "bid"), side_structs("asks", "ask"))
        ).alias("pos", "lv"),
    ).select("symbol", "u", "pos", "lv.side", "lv.price", "lv.qty")

    # Last write per (symbol, side, price) as max_by over (u, pos) — an
    # aggregation with map-side partial combine instead of a row_number
    # window: no per-key sort, no skew hazard on hot price levels, and
    # the reduce side shrinks to |distinct levels| rows. pos breaks ties
    # when one event lists the same price twice (array order = apply
    # order in the fold, websocket.py:300-345).
    fin = (
        lv.groupBy("symbol", "side", "price")
        .agg(F.max_by("qty", F.struct("u", "pos")).alias("qty"))
        .where(F.col("qty") > 0)
    )

    # ONE window pass (rank within side + ask-notional running sum share the
    # (symbol, side) sort) then ONE conditional aggregation computes best
    # bid/ask, the ST4 impact walk, and the ST5 top-10 averages together —
    # fin is consumed exactly once.
    is_bid = F.col("side") == "bid"
    is_ask = F.col("side") == "ask"
    w_side = Window.partitionBy("symbol", "side").orderBy(
        F.when(is_bid, -F.col("price")).otherwise(F.col("price"))
    )
    annotated = (
        fin.withColumn("notional", F.col("price") * F.col("qty"))
        .withColumn("__rnk", F.row_number().over(w_side))
        .withColumn(
            "cum_before",
            F.coalesce(
                F.sum("notional").over(
                    w_side.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0.0),
            ),
        )
    )
    take = F.when(
        is_ask & (F.col("cum_before") < IMPACT_NOTIONAL),
        F.least(F.lit(IMPACT_NOTIONAL) - F.col("cum_before"), F.col("notional")),
    ).otherwise(F.lit(0.0))
    met = (
        annotated.groupBy("symbol")
        .agg(
            F.max(F.when(is_bid, F.col("price"))).alias("best_bid"),
            F.min(F.when(is_ask, F.col("price"))).alias("best_ask"),
            F.sum(take).alias("cost"),
            F.sum(take / F.col("price")).alias("fq"),
            (
                F.coalesce(F.sum(F.when(is_ask, F.col("notional"))), F.lit(0.0))
                >= IMPACT_NOTIONAL
            ).alias("fillable"),
            F.avg(F.when(is_bid & (F.col("__rnk") <= 10), F.col("qty"))).alias("avg_bid"),
            F.avg(F.when(is_ask & (F.col("__rnk") <= 10), F.col("qty"))).alias("avg_ask"),
        )
    )

    minutes = depth_events.select(
        "symbol", F.date_trunc("minute", "event_time").cast("timestamp_ntz").alias("minute_ts")
    ).distinct()
    # synced == "a snapshot was applied" (fold semantics) — True even when
    # every level was subsequently deleted; derived from the same tiny
    # snaps aggregate, no second pass over the event store
    synced = snaps.select(
        "symbol", F.col("__snap_u").isNotNull().alias("synced")
    )

    met = met.withColumn(
        "mid", (F.col("best_bid") + F.col("best_ask")) / 2
    ).withColumn(
        "ok",
        F.col("best_bid").isNotNull()
        & F.col("best_ask").isNotNull()
        & (F.col("best_bid") < F.col("best_ask")),
    )
    ok = F.col("ok")
    spread = (F.col("best_ask") - F.col("best_bid")) / F.col("mid") * 100
    # synced/met are |symbols|-row aggregates — broadcast both so the
    # minute spine never shuffles
    out = (
        minutes.join(F.broadcast(synced), "symbol", "left")
        .join(F.broadcast(met), "symbol", "left")
    ).select(
        "symbol",
        "minute_ts",
        F.when(ok, F.col("best_bid")).alias("best_bid"),
        F.when(ok, F.col("best_ask")).alias("best_ask"),
        F.when(ok, F.col("mid")).alias("mid"),
        F.when(ok, spread).alias("spread_pct"),
        F.when(ok & (F.col("fq") > 0), ((F.col("cost") / F.col("fq")) - F.col("mid")) / F.col("mid") * 100).alias("impact_pct"),
        F.coalesce(F.when(ok, F.col("fillable")), F.lit(False)).alias("fillable"),
        F.when(ok, F.col("avg_bid")).alias("avg_bid_qty_top10"),
        F.when(ok, F.col("avg_ask")).alias("avg_ask_qty_top10"),
        F.coalesce(F.col("synced"), F.lit(False)).alias("synced"),
        F.coalesce(
            F.when(
                ok,
                (~F.col("fillable"))
                | (spread > MAX_SPREAD_PCT)
                | (F.least(F.col("avg_bid"), F.col("avg_ask")) < MIN_AVG_LEVEL_QTY),
            ),
            F.lit(True),
        ).alias("degraded"),
    )
    return out


def _tag_segments(depth_events: DataFrame) -> DataFrame:
    """Tag every depth event with its segment id — WITHOUT a
    ``Window.partitionBy("symbol")`` running sum, which would sort each
    symbol's whole event history in one task (the same few-hot-symbols
    skew ``replay_book_batch`` documents).  A segment starts at a
    snapshot WITH a lastUpdateId (only those reset the book — a null-id
    snapshot merely desyncs, keeping last_u and the stale book, so it
    cannot anchor an independent fold), and snapshots are RARE by
    construction (periodic REST fetches vs per-update deltas), so the
    per-symbol sorted snapshot-key arrays are a tiny broadcast and
    seg = |keys ≤ this event's key| is a map-side expression — fully
    parallel over the event scan (plan-pinned windowless/broadcast by
    ``test_scale_plans.py``).

    The lookup is a VECTORIZED BINARY SEARCH (``np.searchsorted``)
    inside Arrow-batched ``mapInPandas`` — O(log snapshots) per event
    with numpy constants.  Two pure-Catalyst forms were built and
    measured first (sf1, 1M events, 500 snapshots/symbol): the original
    ``size(filter(keys, s -> s <= key))`` costs O(events x snapshots)
    INTERPRETED comparisons (higher-order array functions don't
    codegen; ~7 s, 60% of the query), and an unrolled 31-step
    element_at binary search costs O(steps) chained projections that
    each re-materialize the row INCLUDING the multi-KB key array
    (~6.7 s).  The searchsorted pass is ~0.5 s.  This query is
    designed-Python in the registry audit already (the phase-1 fold),
    and the tag keeps its data movement contract: map-side over the
    scan, no shuffle, no Window.

    Tie semantics match the original filter-count exactly: a delta at a
    snapshot's timestamp sorts AFTER it (d=true > d=false), so every
    tied key counts; a snapshot row counts tied keys by u (its own key
    included — sorted u within equal t, bisect right).  Null fields are
    normalized exactly like the struct key did (t -> -inf, kind null ->
    delta, u -> 0)."""
    import numpy as np
    from pyspark.sql import functions as F

    MIN_NS = np.iinfo("int64").min

    def _t_ns(col) -> np.ndarray:
        ts = pd.to_datetime(col)
        out = ts.values.astype("datetime64[ns]").astype("int64")
        return np.where(ts.isna().to_numpy(), MIN_NS, out)

    # tiny per-symbol snapshot-key table: one column-pruned pass over
    # the snapshot rows only, collected and broadcast — the same
    # "snapshots are RARE" size contract the broadcast join relied on
    snap_rows = (
        depth_events.where(
            (F.col("kind") == "snapshot")
            & F.col("final_update_id").isNotNull()
        )
        .select("symbol", "event_time", F.col("final_update_id").alias("u"))
        .collect()
    )
    keys: dict = {}
    for r in snap_rows:
        t = r["event_time"]
        t_ns = MIN_NS if t is None else pd.Timestamp(t).value
        keys.setdefault(r["symbol"], []).append((t_ns, int(r["u"])))
    kmap = {
        sym: (
            np.array([t for t, _ in sorted(ks)], dtype="int64"),
            np.array([u for _, u in sorted(ks)], dtype="int64"),
        )
        for sym, ks in keys.items()
    }
    bc = depth_events.sparkSession.sparkContext.broadcast(kmap)
    # fresh StructType — StructType.add MUTATES the df's cached schema
    out_schema = StructType(
        list(depth_events.schema.fields)
        + [StructField("seg", LongType()), StructField("fin", BooleanType())]
    )

    def _tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        km = bc.value
        for pdf in batches:
            seg = np.zeros(len(pdf), dtype="int64")
            # fin: this event belongs to its symbol's FINAL segment.  The
            # final segment id is |snapshot keys| (the last snapshot row
            # always counts its own key, so some row always reaches it);
            # symbols with no keyed snapshots — including null symbols,
            # which groupby drops — have only seg 0, their final segment.
            # Known at TAG time from the broadcast key table, this saves
            # the replay a whole driver job: the fold's light collect can
            # carry the final-segment states along (r15, VERDICT item 2).
            fin = np.ones(len(pdf), dtype=bool)
            if len(pdf):
                t_ns = _t_ns(pdf["event_time"])
                u_raw = pdf["final_update_id"]
                u_norm = np.where(
                    u_raw.isna().to_numpy(),
                    0,
                    u_raw.fillna(0).to_numpy().astype("int64"),
                )
                is_snap = (pdf["kind"] == "snapshot").to_numpy()  # null -> delta
                # null-symbol rows keep seg 0 (the join form never
                # matched them either); pandas groupby drops NaN keys
                for sym, idx in pdf.groupby("symbol", sort=False).indices.items():
                    ks = km.get(sym)
                    if ks is None:
                        continue
                    ts_keys, u_keys = ks
                    sub_t = t_ns[idx]
                    sub_u = u_norm[idx]
                    sub_snap = is_snap[idx]
                    # deltas sort after every tied snapshot key: count
                    # of keys <= event = upper_bound on t alone
                    hi = np.searchsorted(ts_keys, sub_t, side="right")
                    s = hi.copy()
                    # snapshot rows (rare by contract): tied keys count
                    # by u — u ascends within equal t in the sorted key
                    # table, so the tie range bisects directly
                    for j in np.flatnonzero(sub_snap):
                        lo = np.searchsorted(ts_keys, sub_t[j], side="left")
                        s[j] = lo + np.searchsorted(
                            u_keys[lo : hi[j]], sub_u[j], side="right"
                        )
                    seg[idx] = s
                    fin[idx] = s == len(ts_keys)
            yield pdf.assign(seg=seg, fin=fin)

    return depth_events.mapInPandas(_tag, out_schema)


def _fast_segment_state(pdf: pd.DataFrame) -> dict | None:
    """Vectorized final state of ONE segment folded from empty entry
    state — the hybrid tier VERDICT r10 asked for: inside a CONTINUOUS
    segment (one leading snapshot-with-id, strictly increasing non-null
    update ids, pu-chain intact, provably never crossed) the fold's
    event-by-event checks all pass and its result reduces to
    last-write-per-(side, price) over the snapshot + deltas.  Returns
    None whenever ANY precondition fails — stales, gaps, null ids,
    null times, extra/missing snapshots, possible crossing — and the
    caller runs the exact Python fold instead, so semantics are pinned
    by construction (plus the existing segmented equivalence property
    sweep, which exercises both paths).

    The crossing precondition is conservative but sound: best_bid at
    any prefix is <= the max bid price ever written with qty > 0, and
    best_ask >= the min ask price ever present, so
    ``max_bid_written < min_ask_written`` proves no prefix ever
    crossed.  Interleaved bid/ask price bands (a fast-moving market
    within one segment) fail the test and take the exact fold — a
    correctness fallback, not an error."""
    n = len(pdf)
    if n == 0:
        return None
    ts = pd.to_datetime(pdf["event_time"])
    if ts.isna().any():
        return None
    t_ns = ts.values.astype("datetime64[ns]").astype("int64")
    kind = pdf["kind"].to_numpy()
    is_delta = kind != "snapshot"  # a null kind sorts/applies as a
    # delta, exactly like the fold's `ev["kind"] == "snapshot"` test
    u_raw = pdf["final_update_id"]
    if u_raw.isna().any():
        return None
    u = u_raw.to_numpy().astype("int64")
    order = _np_lexsort_fold_order(t_ns, is_delta, u)
    kind_s, u_s = kind[order], u[order]
    # exactly ONE snapshot, first in fold order
    if kind_s[0] != "snapshot" or (kind_s == "snapshot").sum() != 1:
        return None
    snap_u = int(u_s[0])
    du = u_s[1:]
    if len(du) and not (
        (du[1:] > du[:-1]).all() and du[0] > snap_u
    ):
        return None  # stale/duplicate ids: the fold's skip logic applies
    if len(du):
        U_raw = pdf["first_update_id"].to_numpy(dtype="object")[order][1:]
        pu_raw = pdf["prev_final_update_id"].to_numpy(dtype="object")[order][1:]
        U_na = pd.isna(U_raw)
        pu_na = pd.isna(pu_raw)
        # bridge: first delta must prove U <= snap_u + 1 <= u
        if U_na[0] or not (int(U_raw[0]) <= snap_u + 1 <= int(du[0])):
            return None
        # pu-continuity for the rest (the bridge delta skips pu)
        prev = du[:-1]
        rest = slice(1, None)
        ok_pu = ~pu_na[rest] & (
            pd.array(pu_raw[rest], dtype="Int64").to_numpy(
                dtype="int64", na_value=0
            )
            == prev[: len(du) - 1]
        )
        ok_U = (
            pu_na[rest]
            & ~U_na[rest]
            & (
                pd.array(U_raw[rest], dtype="Int64").to_numpy(
                    dtype="int64", na_value=1 << 62
                )
                <= prev[: len(du) - 1] + 1
            )
        )
        if not (ok_pu | ok_U).all():
            return None
    # ONE json parse per side for the whole segment (per-row loads was
    # ~a third of the fold's remaining profile)
    def _parse(col: pd.Series) -> list:
        parts = ["[]" if (x is None or x == "") else x for x in col.tolist()]
        return json.loads("[" + ",".join(parts) + "]")

    bids_all = _parse(pdf["bids"].iloc[order])
    asks_all = _parse(pdf["asks"].iloc[order])
    # CANONICAL floats (float of the .10g key string), not raw parses:
    # the exact fold's _crossed compares key-derived floats, so a raw
    # bid infinitesimally below a raw ask that rounds to the SAME key
    # would read not-crossed here but crossed in the fold — the fast
    # path would then claim synced=True where the fold says False
    # (same family as the _apply_levels heap-float fix, ADVICE r11)
    max_bid = None
    min_ask = None
    for levels in bids_all:
        for p, q in levels:
            if float(q) > 0:
                fp = float(f"{float(p):.10g}")
                if max_bid is None or fp > max_bid:
                    max_bid = fp
    for levels in asks_all:
        for p, q in levels:
            if float(q) > 0:
                fp = float(f"{float(p):.10g}")
                if min_ask is None or fp < min_ask:
                    min_ask = fp
    if max_bid is not None and min_ask is not None and max_bid >= min_ask:
        return None  # could have crossed at some prefix: exact fold decides
    bids: dict = {}
    asks: dict = {}
    for book, all_levels in ((bids, bids_all), (asks, asks_all)):
        for levels in all_levels:
            for p, q in levels:
                fq = float(q)
                key = f"{float(p):.10g}"
                if fq <= 0:
                    book.pop(key, None)
                else:
                    book[key] = fq
    state = {
        "bids": bids,
        "asks": asks,
        "last_u": int(u_s[-1]),
        "synced": True,
        "buffer": [],
    }
    if not len(du):
        # snapshot-only segment: the exact fold leaves await_bridge=True
        # (no buffered delta bridged, so the NEXT live delta must pass
        # the bridge rule, not pu-continuity).  Match the full state
        # blob, not just books — a resumed/diffed segment state would
        # otherwise diverge between tiers (ADVICE r11)
        state["await_bridge"] = True
    return state


def _np_lexsort_fold_order(t_ns, is_delta, u):
    """Stable fold ordering (event_time, snapshot-first, u) as index
    array — mirrors ``_fold_batch``'s sort key exactly for non-null
    times/ids (the only inputs the fast path accepts)."""
    import numpy as np

    return np.lexsort((u, is_delta, t_ns))


def _post_repair_prefetch(order: list, segs: dict, k: int) -> list:
    """Segment ids whose FULL phase-1 state the repair walk will need
    after a repair at chain position ``k``, assuming every refold exits
    with an empty buffer (true unless the repair cascades — rare).
    Walk simulation on exit-buffer sizes alone: the segment at ``k`` is
    refolded in Python (no fetch); afterwards a phase-1-realized
    segment's content is needed iff its exit buffer is non-empty (it
    feeds the NEXT refold, which then needs no fetch itself) or it is
    the final segment (books feed the output).  Lets the driver batch
    ALL post-repair fetches into the one up-front ``_fetch_states``
    job; per-segment fallback fetches remain only for true cascades."""
    needs = []
    refold_next = True  # order[k] itself is refolded, never fetched
    for seg_id in order[k:]:
        if refold_next:
            refold_next = False
            continue
        if segs[seg_id] != 0:
            needs.append(seg_id)
            refold_next = True
        elif seg_id == order[-1]:
            needs.append(seg_id)
    return needs


def replay_book_segmented(depth_events: DataFrame, path_counts: dict | None = None):
    """Segment-parallel EXACT replay of the stateful fold over a batch
    event store — the 100x mitigation for the fold's serial-within-a-
    symbol limit (SCALE.md): each snapshot starts a new segment, and a
    segment's book depends on earlier history ONLY through the delta
    buffer carried into its opening snapshot, so segments fold in
    parallel and a cheap driver pass repairs the rare chains where a
    buffer actually crossed a boundary.

    Phases:

    1. (distributed) Tag every event with its segment id (running count
       of snapshots per symbol) and fold each (symbol, segment)
       independently from an empty entry state.  Work is O(events),
       parallelism is O(total segments) — not O(symbols).
    2. (driver, O(segments)) Walk each symbol's segments in order.  A
       segment's phase-1 fold is realized iff the previous segment's
       REALIZED exit buffer is empty — true for every boundary the book
       crossed synced, i.e. all of them on a healthy stream.  Otherwise
       the segment refolds with the realized entry buffer (events
       fetched for just that segment); a repair can cascade only while
       consecutive segments keep exiting unsynced.
    3. The final realized state per symbol is returned as one row:
       (symbol, synced, last_u, bids, asks, buffered_count), with the
       books as canonical sorted-key JSON.

    Equivalence with folding the whole history sequentially is exact —
    ``tests/test_streaming.py`` pins it directly and by property sweep,
    including desync/bridge-buffer cascades.  The driver never holds
    every segment's book: phase 2's chain walk collects
    ``(symbol, seg, buffer_n)`` — the walk's realization decision needs
    nothing but exit-buffer EMPTINESS — plus each symbol's FINAL-
    segment state in the SAME collect (the final segment id is known at
    tag time from the snapshot-key table, so the fold phase runs ONE
    driver job on a healthy stream; r15, VERDICT item 2).  Repair entry
    states and the optimistically simulated post-repair chain
    (``_post_repair_prefetch``) are fetched from the persisted,
    executor-cached phase-1 frame in one batched job; targeted
    fallback jobs fire only when a refold CASCADES (exits with a
    non-empty buffer, diverging the walk from the simulation) — zero
    on a healthy stream.  Driver memory is O(segments) light rows +
    O(symbols) final books, not O(total levels across all segments).

    Reference analogue: the sequential ``DepthOrderBook`` recovery walk
    (websocket.py:234-345); the segmentation is this engine's
    distribution strategy, not a semantic change."""
    from pyspark.sql import functions as F

    STATE_OUT = StructType(
        [
            StructField("symbol", StringType()),
            StructField("seg", LongType()),
            StructField("buffer_n", LongType()),
            StructField("fast", BooleanType()),
            StructField("is_final", BooleanType()),
            StructField("state", StringType()),
        ]
    )

    tagged = _tag_segments(depth_events)

    def _fold_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        sym = pdf["symbol"].iloc[0]
        seg = int(pdf["seg"].iloc[0])
        is_final = bool(pdf["fin"].iloc[0])  # constant per (symbol, seg)
        body = pdf.drop(columns=["seg", "fin"])
        # hybrid tier: continuous segments (the overwhelming majority on
        # a healthy stream) reduce to a vectorized last-write-per-level;
        # anything irregular falls back to the exact event-by-event fold
        st = _fast_segment_state(body)
        fast = st is not None
        if st is None:
            st = dict(_EMPTY, buffer=[])
            _fold_batch(sym, st, body)
        return pd.DataFrame(
            {"symbol": [sym], "seg": [seg],
             "buffer_n": [len(st["buffer"])], "fast": [fast],
             "is_final": [is_final], "state": [_state_blob(st)]}
        )

    # phase-1 states (books + buffers) stay DISTRIBUTED in the executor
    # cache; the driver's chain walk needs only exit-buffer EMPTINESS
    # plus each symbol's FINAL-segment state (known at tag time — the
    # `fin` flag), so ONE collect serves both: O(segments) light rows +
    # O(symbols) final states, never every segment's book.  On a healthy
    # stream this is the fold phase's ONLY driver job (r15: previously
    # the clean-symbol final states cost a second, batched fetch job).
    phase1 = (
        tagged.groupBy("symbol", "seg")
        .applyInPandas(_fold_segment, STATE_OUT)
        .persist()
    )
    light = phase1.select(
        "symbol", "seg", "buffer_n", "fast",
        F.when(F.col("is_final"), F.col("state")).alias("state"),
    ).collect()

    by_symbol: dict = {}
    final_states: dict = {}
    for r in light:
        by_symbol.setdefault(r["symbol"], {})[r["seg"]] = r["buffer_n"]
        if r["state"] is not None:
            final_states[(r["symbol"], r["seg"])] = json.loads(r["state"])
    if path_counts is not None:
        # router observability: how many phase-1 segments took the
        # vectorized fast tier vs the exact fold — the equivalence
        # property sweep asserts BOTH are > 0 across its examples, so a
        # silently-always-falling-back (or always-fast) router cannot
        # pass green
        path_counts["fast"] = path_counts.get("fast", 0) + sum(
            1 for r in light if r["fast"]
        )
        path_counts["fallback"] = path_counts.get("fallback", 0) + sum(
            1 for r in light if not r["fast"]
        )

    def _fetch_states(pairs: list) -> dict:
        """Full phase-1 states for the given (symbol, seg) pairs — one
        broadcast-semi-join job over the cached phase-1 frame.  A
        per-pair OR chain would build an O(|symbols|)-deep Catalyst
        boolean tree (quadratic analysis, driver stack overflow at a
        few thousand symbols); the join keeps the predicate flat at
        any fleet size."""
        if not pairs:
            return {}
        spark = depth_events.sparkSession
        want = spark.createDataFrame(
            [(s, int(g)) for s, g in pairs], "symbol string, seg long"
        )
        return {
            (r["symbol"], r["seg"]): json.loads(r["state"])
            for r in phase1.join(
                F.broadcast(want),
                on=[
                    phase1["symbol"].eqNullSafe(want["symbol"]),
                    phase1["seg"] == want["seg"],
                ],
                how="leftsemi",
            )
            .select("symbol", "seg", "state")
            .collect()
        }

    # the walk below materializes `tagged` only if a repair fires —
    # persist is marked AFTER phase-1 ran, so a healthy stream never
    # pays for caching the raw event store
    tagged = tagged.persist()
    try:
        # Pass A (no Spark jobs): per symbol, walk the chain on buffer_n
        # alone until the first boundary a non-empty buffer crosses.
        # Clean symbols resolve to their LAST segment; repair symbols
        # record (repair position, the realized segment whose buffer
        # must cross) plus the OPTIMISTIC post-repair needs (every
        # phase-1 state the walk consumes if no refold cascades).  One
        # batched fetch then serves every clean symbol's final book,
        # every repair's entry state, and the post-repair chain —
        # per-segment fallback jobs fire only on true cascades (a
        # refold exiting with a non-empty buffer).
        clean: dict = {}   # sym -> final seg id
        repairs: dict = {}  # sym -> (index into order, realized seg id)
        prefetch: list = []  # (sym, seg) pairs the repair walks will need
        for sym, segs in by_symbol.items():
            order = sorted(segs)
            realized_seg = order[0]
            plan = ("clean", order[-1])
            for k in range(1, len(order)):
                if segs[realized_seg] == 0:
                    realized_seg = order[k]
                    continue
                plan = ("repair", k, realized_seg)
                break
            if plan[0] == "clean":
                clean[sym] = plan[1]
            else:
                repairs[sym] = (plan[1], plan[2])
                prefetch.extend(
                    (sym, seg_id)
                    for seg_id in _post_repair_prefetch(order, segs, plan[1])
                )

        # clean symbols' final states already rode the light collect
        # (`final_states`); only repair entry states and post-repair
        # prefetches that are NOT final segments still need the batched
        # fetch — an empty list runs zero Spark jobs on a healthy stream
        fetched = dict(final_states)
        fetched.update(_fetch_states(
            [
                p
                for p in (
                    [(sym, seg_id) for sym, seg_id in clean.items()]
                    + [(sym, seg_id) for sym, (_, seg_id) in repairs.items()]
                    + prefetch
                )
                if p not in fetched
            ]
        ))

        final_rows = []
        for sym, segs in by_symbol.items():
            order = sorted(segs)
            if sym in clean:
                realized = fetched[(sym, clean[sym])]
            else:
                k, realized_seg = repairs[sym]
                realized = fetched[(sym, realized_seg)]
                for seg_id in order[k:]:
                    if not realized["buffer"]:
                        # back on the healthy chain: the phase-1 state's
                        # CONTENT matters only when this segment is
                        # final (books feed the output) or its exit
                        # buffer is non-empty (it feeds the next
                        # refold) — anything else is a pass-through
                        # whose emptiness buffer_n already proves
                        if segs[seg_id] == 0 and seg_id != order[-1]:
                            realized = {"buffer": []}
                            continue
                        # served by the batched up-front fetch unless a
                        # cascade diverged the walk from the optimistic
                        # plan — only then a targeted fallback job
                        realized = fetched.get((sym, seg_id)) or _fetch_states(
                            [(sym, seg_id)]
                        )[(sym, seg_id)]
                        continue
                    # a non-empty buffer crosses this boundary: refold
                    # just this segment with the realized entry buffer
                    pdf = (
                        tagged.where(
                            (F.col("symbol").eqNullSafe(F.lit(sym)))
                            & (F.col("seg") == seg_id)
                        )
                        .drop("seg", "fin")
                        .toPandas()
                    )
                    st = dict(_EMPTY, buffer=list(realized["buffer"]))
                    _fold_batch(sym, st, pdf)
                    realized = json.loads(_state_blob(st))
            final_rows.append(
                (
                    sym,
                    bool(realized["synced"]),
                    realized["last_u"],
                    json.dumps(realized["bids"], sort_keys=True),
                    json.dumps(realized["asks"], sort_keys=True),
                    len(realized["buffer"]),
                )
            )
    finally:
        tagged.unpersist()
        phase1.unpersist()

    spark = depth_events.sparkSession
    return spark.createDataFrame(
        final_rows,
        "symbol string, synced boolean, last_u long, "
        "bids string, asks string, buffered_count long",
    )
