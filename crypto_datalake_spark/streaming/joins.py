"""Stream-stream joins with watermark-bounded state (§2.3's J-family at
streaming time).

The reference joins its live feature streams only AFTER minute
aggregation (one row per symbol-minute, websocket.py:901-1127).  That
covers aligned grains; what it cannot express is enrichment at EVENT
grain — every trade tagged with the latest mark-price event within a
freshness horizon, while both sides are still flowing.  Spark's
watermarked stream-stream join is the native shape for that: each side
declares a watermark, the join condition bounds event-time distance, and
the state store retains only rows inside the horizon (bounded state by
construction — the join can run forever).

Scale: state per key = rows within the tolerance window on each side;
the shuffle is the usual hash partition on the join key.  Tolerance
directly prices state: double the horizon, double the retained rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    tolerance: str = "2 minutes",
    left_watermark: str = "2 minutes",
    right_watermark: str = "4 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``by`` where the right event lies in
    ``[left_ts - tolerance, left_ts]`` — the interval (bounded as-of)
    join, streaming edition.

    The right watermark should exceed the left one by at least the
    tolerance: a right row must stay in state until no left row that
    could still arrive can reach back to it.  For outer joins Spark
    additionally requires the time bound to decide when an unmatched row
    can be emitted — the same condition serves both.

    Works identically on batch frames (watermarks are skipped); the
    equivalence test pins stream == batch output.
    """
    l_ = left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
    r_ = right.withColumn(right_ts, F.col(right_ts).cast("timestamp"))
    if l_.isStreaming:
        l_ = l_.withWatermark(left_ts, left_watermark)
    if r_.isStreaming:
        r_ = r_.withWatermark(right_ts, right_watermark)
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{by}") == F.col(f"r.{by}"))
        & (rt <= lt)
        & (rt >= lt - F.expr(f"INTERVAL {tolerance}"))
    )
    return l_.alias("l").join(r_.alias("r"), cond, how)
