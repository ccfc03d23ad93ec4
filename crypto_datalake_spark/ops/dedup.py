"""Dedup and priority-merge operators.

Reference semantics:
- keep-last dedup after multi-key tie-break sort —
  /root/reference/src/aggregator/source_reader.py:52-59
- `.unique(subset=["timestamp"], keep="last")` throughout the minute
  builder — transforms/minute_builder.py:172, 306, 376
- union-dedup merge, local row wins over remote —
  /root/reference/src/live_data_api_service/utils.py:59-70

Polars' positional ``keep="last"`` is order-defined; in a distributed
engine that order must be made explicit, so both operators take an explicit
tie-break column list and resolve via one ``row_number`` window (single
shuffle on the key columns, map-side combine-free but AQE-coalesced).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__rn"


def _order_desc_nulls_last(cols: Sequence[str | Column]) -> list[Column]:
    out = []
    for c in cols:
        col = F.col(c) if isinstance(c, str) else c
        out.append(col.desc_nulls_last())
    return out


def keep_last(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
) -> DataFrame:
    """Keep, per key, the row ranking FIRST under ``order_by`` descending
    (nulls last) — i.e. the "latest" row under the reference's tie-break
    list [ts, arrival_time, event_time, transact_time, update_id_end]."""
    w = Window.partitionBy(*keys).orderBy(*_order_desc_nulls_last(order_by))
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .where(F.col(_RN) == 1)
        .drop(_RN)
    )


def union_dedup(
    primary: DataFrame,
    secondary: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column] = (),
) -> DataFrame:
    """Merge two frames on ``keys``; rows from ``primary`` win ties
    (reference merge_canonical_frames: concat → sort → unique keep-last,
    with the local frame concatenated last so it wins)."""
    p = primary.withColumn("__prio", F.lit(2))
    s = secondary.withColumn("__prio", F.lit(1))
    merged = p.unionByName(s, allowMissingColumns=True)
    return keep_last(merged, keys, [*order_by, "__prio"]).drop("__prio")
