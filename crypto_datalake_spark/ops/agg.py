"""Aggregation building blocks.

Reference semantics:
- notional-weighted average, NULL when weight sum is 0 —
  /root/reference/src/aggregator/aggregation_rules.py:138-160, 246-253
- weighted average with simple-mean fallback — aggregation_rules.py:143-160, 205-216
- ratio-of-sums recomputation (vwap, avg_trade_size, taker_buy_ratio;
  NOT avg-of-ratios) — aggregation_rules.py:234-245
- first/last non-null within bucket — aggregation_rules.py:199-203
- nearest-rank p95 — /root/reference/src/binance_minute_lake/sources/websocket.py:100-105
  and live_data_api_service/aggregation.py:58-59

Determinism discipline (this is what makes DuckDB-oracle hash parity
possible):
- ``dsum`` sums money-like doubles through DECIMAL — exact, associative,
  order-independent, hence bit-identical across engines and shuffle
  schedules.  A plain double sum varies in the last bits with partial-agg
  order; at 100 TB that also means non-reproducible reruns.
- first/last-non-null use arg-min/max over an explicit event-order column
  (Polars' positional first()/last() has no distributed meaning).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(28,6)"
# Narrower type for products: (18,6)×(18,6) stays inside width 38 in BOTH
# Spark and DuckDB (DuckDB silently converts to DOUBLE — losing exactness —
# when a decimal multiply would exceed width 38).
DEC_MUL = "decimal(18,6)"


def dec(c: Column | str, typ: str = DEC) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(typ)


def dsum(c: Column | str, typ: str = DEC) -> Column:
    """Exact (decimal) sum of a fixed-scale double column, as double."""
    return F.sum(dec(c, typ)).cast("double")


def _to_double(decimal_sum: Column) -> Column:
    """Decimal → double via an intermediate rescale to scale 6.

    A scale-12 decimal → double conversion divides the int128 units by
    10^12; once |units| exceeds 2^53 that division is no longer exact and
    DuckDB lands ~1 ulp away from Spark's BigDecimal path.  Rescaling to
    scale 6 first (both engines round half-away-from-zero) keeps the unit
    count inside 2^53 for any realistic magnitude → bit-identical doubles.
    """
    return decimal_sum.cast("decimal(38,6)").cast("double")


def dsum_prod(x: Column | str, y: Column | str) -> Column:
    """Exact Σ(x·y) of fixed-scale doubles, as double."""
    return _to_double(F.sum(dec(x, DEC_MUL) * dec(y, DEC_MUL)))


def wavg(x: Column | str, w: Column | str) -> Column:
    """Σ(x·w)/Σ(w), NULL when Σw = 0.

    Sums are exact decimals; the division is double/double (identical IEEE
    result everywhere — decimal division rounding is engine-specific).
    """
    xs = F.sum(dec(x, DEC_MUL) * dec(w, DEC_MUL))
    ws = F.sum(dec(w, DEC_MUL))
    return F.when(ws != 0, _to_double(xs) / _to_double(ws)).otherwise(F.lit(None))


def wavg_with_mean_fallback(x: Column | str, w: Column | str) -> Column:
    """Weighted average, falling back to the simple mean of x when the
    weight sum is 0; weights are nulled pairwise where x is null."""
    xc = F.col(x) if isinstance(x, str) else x
    wc = F.col(w) if isinstance(w, str) else w
    wp = F.when(xc.isNotNull(), wc)  # pairwise deletion
    xs = F.sum(dec(xc, DEC_MUL) * dec(wp, DEC_MUL))
    ws = F.sum(dec(wp, DEC_MUL))
    mean = F.sum(dec(xc)).cast("double") / F.count(xc).cast("double")
    return F.when(ws != 0, _to_double(xs) / _to_double(ws)).otherwise(mean)


def ratio_of_sums(num: Column | str, den: Column | str) -> Column:
    """Σnum/Σden with zero-guard (exact decimal sums, double division)."""
    ns = F.sum(dec(num))
    ds = F.sum(dec(den))
    return F.when(ds != 0, ns.cast("double") / ds.cast("double")).otherwise(F.lit(None))


def first_nonnull(x: Column | str, order: Column | str) -> Column:
    """Earliest non-null x by the explicit order column (deterministic
    replacement for Polars drop_nulls().first())."""
    xc = F.col(x) if isinstance(x, str) else x
    oc = F.col(order) if isinstance(order, str) else order
    return F.min_by(xc, F.when(xc.isNotNull(), oc))


def last_nonnull(x: Column | str, order: Column | str) -> Column:
    """Latest non-null x by the explicit order column."""
    xc = F.col(x) if isinstance(x, str) else x
    oc = F.col(order) if isinstance(order, str) else order
    return F.max_by(xc, F.when(xc.isNotNull(), oc))


def bool_or(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.max(col)


def nearest_rank_percentile(
    df: DataFrame,
    value_col: str,
    p: float,
    by: Sequence[str] = (),
    out_col: str = "pct",
) -> DataFrame:
    """Exact nearest-rank percentile: the value at rank ceil(p·n) of the
    sorted non-null values, per group.

    The reference uses nearest-rank (not interpolated) p95; neither
    Spark's ``percentile`` (interpolating) nor ``percentile_approx``
    reproduces it exactly, so rank it explicitly: one window sort-shuffle,
    then a group-max — no collect.  Ties broken by value order only (equal
    values are interchangeable).
    """
    nn = df.where(F.col(value_col).isNotNull())
    w = Window.partitionBy(*by).orderBy(F.col(value_col).asc())
    wn = Window.partitionBy(*by)
    ranked = nn.select(
        *by,
        F.col(value_col),
        F.row_number().over(w).alias("__rk"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    return (
        ranked.where(F.col("__rk") == F.ceil(F.lit(p) * F.col("__n")))
        .select(*by, F.col(value_col).alias(out_col))
    )
