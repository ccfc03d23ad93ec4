"""Gap detection and window coalescing (gaps-and-islands).

Reference semantics:
- missing-bucket detection: complete source buckets ANTI existing index —
  /root/reference/src/aggregator/validator.py:17-52
- coalescing sorted missing bucket_starts into contiguous [start, end]
  windows — /root/reference/src/aggregator/backfill.py:105-121

The reference coalesces on a collected Python list; here it is the classic
gaps-and-islands window trick (ts − row_number·step is constant within a
contiguous run), fully distributed: one sort-shuffle, no driver collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def missing_slots(spine: DataFrame, present: DataFrame, on: str = "slot_ts") -> DataFrame:
    """Slots in the dense spine with no row in ``present`` (left-anti join).

    Scale note: the spine is generated (spark.range) and cheap; the anti
    join shuffles on the slot key and AQE broadcasts whichever side is
    small enough.
    """
    return spine.join(present.select(F.col(on)).distinct(), on, "left_anti")


def islands(
    df: DataFrame,
    ts_col: str,
    step_minutes: int,
    by: Sequence[str] = (),
    bucket_slots: int = 1440,
) -> DataFrame:
    """Coalesce a set of step-aligned timestamps into contiguous
    [window_start, window_end] ranges (inclusive), per ``by`` group.

    Output: by..., window_start, window_end, n_slots.

    Scale shape — two-phase, no unpartitioned window over the data:

    1. bucket slots by value (``bucket_slots`` slots per bucket, one day
       for a minute step) and find runs INSIDE each (by, bucket) — the
       classic ts−row_number trick, parallel across buckets;
    2. only runs touching a bucket edge (first/last slot of their bucket)
       can continue across buckets.  Those boundary runs — at most two per
       bucket, regardless of data volume — go through a per-``by`` chain
       merge (lag + running-sum sessionize over slot adjacency); interior
       runs pass straight through.

    The single remaining per-group-ordered window therefore scans a frame
    bounded by 2×#buckets rows, not by the data. A fully contiguous year
    of minutes is ~365 boundary runs folding into one island.
    """
    step = step_minutes * 60
    base = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    slot = F.floor(
        F.timestamp_diff("SECOND", base, F.col(ts_col)) / F.lit(step)
    ).cast("long")
    d = df.select(*by, slot.alias("__slot")).distinct()
    # FLOOR division, not `div` (which truncates toward zero): truncation
    # would make bucket 0 double-width across negative slots (pre-1970
    # timestamps) and misalign the edge detection below, silently
    # splitting islands that cross slot 0.
    d = d.withColumn(
        "__bucket", F.floor(F.col("__slot") / F.lit(int(bucket_slots))).cast("long")
    )

    # phase 1: runs inside each (by, bucket)
    w1 = Window.partitionBy(*by, "__bucket").orderBy(F.col("__slot").asc())
    segs = (
        d.withColumn("__grp", F.col("__slot") - F.row_number().over(w1))
        .groupBy(*by, "__bucket", "__grp")
        .agg(
            F.min("__slot").alias("__s"),
            F.max("__slot").alias("__e"),
            F.count(F.lit(1)).alias("n_slots"),
        )
        .drop("__grp")
    )
    at_edge = (F.col("__s") == F.col("__bucket") * bucket_slots) | (
        F.col("__e") == (F.col("__bucket") + 1) * bucket_slots - 1
    )
    interior = segs.where(~at_edge)
    boundary = segs.where(at_edge)

    # phase 2: chain-merge boundary runs (≤ 2 per bucket) per group
    w2 = Window.partitionBy(*by).orderBy(F.col("__s").asc())
    brk = F.when(
        F.lag("__e").over(w2).isNull()
        | (F.col("__s") != F.lag("__e").over(w2) + 1),
        F.lit(1),
    ).otherwise(F.lit(0))
    merged = (
        boundary.withColumn("__brk", brk)
        .withColumn(
            "__chain",
            F.sum("__brk").over(w2.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(*by, "__chain")
        .agg(
            F.min("__s").alias("__s"),
            F.max("__e").alias("__e"),
            F.sum("n_slots").alias("n_slots"),
        )
        .drop("__chain")
    )

    ts_of = lambda c: F.timestamp_add("SECOND", (F.col(c) * step).cast("long"), base)  # noqa: E731
    return (
        interior.select(*by, "__s", "__e", "n_slots")
        .unionByName(merged.select(*by, "__s", "__e", "n_slots"))
        .select(
            *by,
            ts_of("__s").alias("window_start"),
            ts_of("__e").alias("window_end"),
            F.col("n_slots"),
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap_minutes: int,
    by: Sequence[str],
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign a session id per ``by`` group: a new session starts when the
    gap to the previous event exceeds ``gap_minutes`` (sessionization —
    the event-row generalization of :func:`islands`, and the batch twin
    of ``streaming.sessions.session_stream``).

    Output: all input columns + ``session_id`` (1-based, per group, in
    event-time order). One sort-shuffle on ``by``; the lag and the
    running sum share the same window frame so Catalyst evaluates both
    in a single Window node.

    ``order_tiebreak``: extra columns making the within-group order total
    (deterministic session boundaries when timestamps collide).
    """
    w = Window.partitionBy(*by).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in order_tiebreak]
    )
    prev = F.lag(ts_col).over(w)
    # Compare at MICROSECOND precision: timestamp_diff truncates to its
    # unit, so a SECOND-unit compare would silently forgive sub-second
    # excess over the gap (gap+0.5s != break) and disagree with exact
    # interval arithmetic (the DuckDB oracle, and any SQL engine).
    brk = F.when(
        prev.isNull()
        | (
            F.timestamp_diff("MICROSECOND", prev, F.col(ts_col))
            > gap_minutes * 60_000_000
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        df.withColumn("__brk", brk)  # separate step: no window-in-window
        .withColumn(
            "session_id",
            F.sum("__brk")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .drop("__brk")
    )
