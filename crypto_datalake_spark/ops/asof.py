"""As-of join with tolerance / direction / key shift.

Reference semantics (Polars ``join_asof``):
- backward with 30-min tolerance — /root/reference/src/binance_minute_lake/transforms/minute_builder.py:418-444
- backward at shifted (bar-close) key — /root/reference/src/live_data_api_service/alignment.py:69-80
- backward with max-age freshness gate — alignment.py:81-92

Spark has no native as-of join.  Two candidate plans:

1. range join ``ON r.ts <= l.ts AND r.ts > l.ts - tol`` + keep-latest —
   O(|L|·|matches|) blowup, and Spark executes it as BroadcastNestedLoop
   unless one side is tiny.  Rejected for scale.
2. **union + ordered window (implemented here)** — tag right rows, union
   with left rows, one shuffle on (by, ts, tag); ``last(value ignore nulls)``
   over an unbounded-preceding frame gives every left row the most recent
   right value.  Cost is a single sort-shuffle of |L|+|R| rows, the same
   shape as Polars' sorted merge — this is the plan that survives 100 TB.

Equal timestamps match inclusively (right row sorts before left rows of the
same key via the tag column), like Polars' backward join_asof.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str | None = None,
    by: Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
    shift_left_seconds: int = 0,
    matched_ts_col: str | None = None,
) -> DataFrame:
    """Attach, to each left row, the latest (backward) / earliest (forward)
    right row by timestamp, optionally within ``tolerance_seconds``.

    ``shift_left_seconds`` implements the reference's as-of-at-bar-close:
    the left key is shifted by +bar before matching (alignment.py:69-80),
    while the output keeps the original left timestamp.

    ``matched_ts_col``: if set, expose the matched right timestamp (for
    freshness gates layered on top, alignment.py:81-92).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    right_on = right_on or on
    if value_cols is None:
        value_cols = [c for c in right.columns if c != right_on and c not in by]
    clash = set(value_cols) & set(left.columns)
    if clash:
        # the union-based plan merges same-named columns, so a left row's
        # "matched" value could be filled from ANOTHER LEFT ROW's own
        # column — silent corruption, and a duplicate output column.
        # Rename on one side before joining.
        raise ValueError(
            f"as-of value column(s) {sorted(clash)} also exist on the left "
            "side; rename them on one side (the union-based as-of cannot "
            "disambiguate same-named columns)"
        )

    jts = "__join_ts"
    row = "__r_row"
    tag = "__is_left"

    # the matched timestamp and EVERY value column travel in ONE struct:
    # filling each column with last-non-null independently would let a
    # NULL-valued right row desync value from matched-ts — the value
    # comes from an older row while __m_ts reflects the newer one, so a
    # stale value sails through the tolerance gate as fresh.  The as-of
    # contract is "the latest right ROW" (Polars join_asof), nulls and
    # all, which is also what the DuckDB ASOF oracles return.
    r = right.select(
        *by,
        F.col(right_on).alias(jts),
        F.struct(
            F.col(right_on).alias("ts"),
            *[F.col(c) for c in value_cols],
        ).alias(row),
    ).withColumn(tag, F.lit(0))

    left_key = F.col(on)
    if shift_left_seconds:
        left_key = F.timestamp_add("SECOND", F.lit(shift_left_seconds), left_key)
    l = left.withColumn(jts, left_key).withColumn(tag, F.lit(1))

    merged = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        # right rows (tag 0) sort first at equal ts → inclusive match
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(jts).asc(), F.col(tag).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(jts).desc(), F.col(tag).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    filled = (
        merged.withColumn("__m", F.last(F.col(row), ignorenulls=True).over(w))
        .where(F.col(tag) == 1)
        .select(
            "*",
            F.col("__m.ts").alias("__m_ts"),
            *[F.col(f"__m.{c}").alias(f"__m_{c}") for c in value_cols],
        )
    )

    if tolerance_seconds is not None:
        # Exact microsecond-precision comparison (no truncation/rounding
        # asymmetry at the tolerance boundary across engines).
        cutoff = (
            F.timestamp_add("SECOND", F.lit(-tolerance_seconds), F.col(jts))
            if direction == "backward"
            else F.timestamp_add("SECOND", F.lit(tolerance_seconds), F.col(jts))
        )
        in_tol = (
            (F.col("__m_ts") >= cutoff)
            if direction == "backward"
            else (F.col("__m_ts") <= cutoff)
        )
        ok = F.col("__m_ts").isNotNull() & in_tol
    else:
        ok = F.col("__m_ts").isNotNull()

    out = filled.select(
        *[F.col(c) for c in left.columns],
        *[F.when(ok, F.col(f"__m_{c}")).otherwise(F.lit(None)).alias(c) for c in value_cols],
        *(
            [F.when(ok, F.col("__m_ts")).otherwise(F.lit(None)).alias(matched_ts_col)]
            if matched_ts_col
            else []
        ),
    )
    return out
