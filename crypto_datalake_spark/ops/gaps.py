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
) -> DataFrame:
    """Coalesce a set of step-aligned timestamps into contiguous
    [window_start, window_end] ranges (inclusive), per ``by`` group.

    Output: by..., window_start, window_end, n_slots.
    """
    step = step_minutes * 60
    w = Window.partitionBy(*by).orderBy(F.col(ts_col).asc())
    base = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    secs = F.timestamp_diff("SECOND", base, F.col(ts_col))
    grp = (secs / step - F.row_number().over(w)).cast("long")
    return (
        df.select(*by, F.col(ts_col), grp.alias("__grp"))
        .groupBy(*by, "__grp")
        .agg(
            F.min(ts_col).alias("window_start"),
            F.max(ts_col).alias("window_end"),
            F.count(F.lit(1)).alias("n_slots"),
        )
        .drop("__grp")
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
