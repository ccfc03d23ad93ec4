"""Distributed prefix sums — the scale-out form of a running total.

A plain ``SUM() OVER (PARTITION BY stream ORDER BY k)`` serializes each
stream into ONE task: fine for thousands of streams, fatal when a corpus
has a handful of giant streams (the exact shape of per-source sequence
packing over a crawl).  The classic fix is the two-phase scan (Blelloch):

1. bucket each row by its ORDER key (value-based, so the result is
   deterministic and independent of physical partitioning), compute the
   running sum LOCALLY per (stream, bucket) — parallelism = streams x
   buckets;
2. aggregate one total per (stream, bucket) — a frame 3-6 orders of
   magnitude smaller than the data — take the exclusive running sum of
   bucket totals per stream (cheap: bucket-count rows), and broadcast-join
   the offsets back.

``cum_before = bucket_offset + local_running_sum``.  Total cost: one
shuffle of the data on (stream, bucket) + one tiny aggregate — vs the
single-task pipeline of the naive window.  At 10^9 rows and bucket width
4096 the phase-2 frame is ~250k rows; if streams ever get large enough
that THAT frame serializes, the same trick nests once more.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKET_WIDTH = 4096

_B = "__bucket"
_LOCAL = "__local_before"
_BTOT = "__bucket_total"
_BOFF = "__bucket_offset"


def cum_before(
    df: DataFrame,
    stream_cols: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
) -> DataFrame:
    """Exclusive running sum of ``value_col`` per stream in ``order_col``
    order, computed as a two-phase distributed scan (see module docstring).

    ``order_col`` must be integral (bucketed by value-range division);
    rows with equal (stream, order) values are summed into the same
    position — the local frame is a RANGE frame, so every tied row gets
    the sum of strictly-smaller order values (deterministic regardless of
    physical row order; a ROWS frame would hand ties distinct,
    arbitrarily-ordered prefixes).
    """
    streams = list(stream_cols)
    # floor division (not truncating `div`) keeps bucket ids aligned and
    # uniform for negative order keys too
    bucketed = df.withColumn(
        _B, F.floor(F.col(order_col) / F.lit(int(bucket_width))).cast("long")
    )

    # phase 1: local exclusive running sum inside each (stream, bucket);
    # RANGE (value-based) frame so equal order keys share one position
    local_w = (
        Window.partitionBy(*streams, _B)
        .orderBy(order_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        _LOCAL, F.coalesce(F.sum(value_col).over(local_w), F.lit(0))
    )

    # phase 2: per-bucket totals -> exclusive running sum of totals per
    # stream.  This frame is bucket-count-sized; the per-stream window
    # here scans buckets, not rows.
    totals = bucketed.groupBy(*streams, _B).agg(F.sum(value_col).alias(_BTOT))
    off_w = (
        Window.partitionBy(*streams)
        .orderBy(_B)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        _BOFF, F.coalesce(F.sum(_BTOT).over(off_w), F.lit(0))
    ).drop(_BTOT)

    # broadcast the tiny offset frame back onto the bucketed data — no
    # second shuffle of the data itself
    # no cast: sum() already widens integers to long, and a forced
    # cast("long") would silently truncate fractional prefixes for
    # double value columns (cumulative notional etc.)
    return (
        local.join(F.broadcast(offsets), [*streams, _B])
        .withColumn(out_col, F.col(_BOFF) + F.col(_LOCAL))
        .drop(_B, _LOCAL, _BOFF)
    )
