"""Forward-fill, unlimited and row-limited.

Reference semantics:
- limited ffill (60 minutes) in the minute builder —
  /root/reference/src/binance_minute_lake/transforms/minute_builder.py:624-642
- unlimited ffill pre-aggregation in the API —
  /root/reference/src/live_data_api_service/aggregation.py:16-24

The limited variant uses a row-bounded frame, which equals a time-bounded
fill ONLY on a dense spine (one row per minute) — same contract as the
reference, which also ffills after spine densification.  Callers on sparse
data must densify first (ops.time.minute_spine + left join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ffill(
    df: DataFrame,
    cols: Sequence[str],
    order_by: Sequence[str],
    partition_by: Sequence[str] = (),
    limit: int | None = None,
) -> DataFrame:
    """Forward-fill ``cols`` in ``order_by`` order within ``partition_by``.

    ``limit``: max rows to carry a value forward (None = unbounded).
    Single window shuffle; no Python path.
    """
    if limit is None:
        frame = (Window.unboundedPreceding, Window.currentRow)
    else:
        frame = (-limit, Window.currentRow)
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*[F.col(c).asc() for c in order_by])
        .rowsBetween(*frame)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out
