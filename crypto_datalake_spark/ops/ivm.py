"""Incremental view maintenance for grouped aggregates over the txn
CDC feed.

`txn.table_diff` prices change capture at the churn, never the table;
this module closes the loop: a materialized ``GROUP BY`` view of
sum/count/avg measures is maintained by applying the delete+insert
feed as signed deltas — the classic IVM identity ``Σ_new = Σ_old +
Σ(inserts) − Σ(deletes)`` — so refreshing a 100 TB rollup after a
one-partition commit costs one aggregation OVER THE DIFF plus a join
against the (group-sized, not table-sized) state.

The state stores sums as DECIMAL (ops.agg discipline), which is what
makes this sound: decimal addition is exact and associative, so
``apply_delta`` is BIT-IDENTICAL to a full recompute at the new
version — not approximately equal — and repeated maintenance never
accumulates drift (the float-IVM failure mode).  Groups whose row
count reaches zero are dropped, exactly as a recompute would; new
groups enter through the full-outer merge.  Group keys join
null-safely, so NULL-keyed groups maintain correctly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crypto_datalake_spark.ops.agg import DEC, dec

_N = "__n_rows"

# Spark widens a DECIMAL(p,s) sum to DECIMAL(min(38, p+10), s); the
# state columns grouped_agg_state materializes therefore carry this
# type, and every maintenance merge must stay in it.
DEC_SUM = "decimal(38,6)"


def grouped_agg_state(
    df: DataFrame, keys: list[str], measures: dict[str, str]
) -> DataFrame:
    """Materialize the maintainable state of ``SELECT keys, sum(col)…,
    count(*) FROM df GROUP BY keys``: per measure a decimal sum (stored
    0 for all-NULL groups) plus its NON-NULL count — SQL's sum is NULL
    when every input is NULL, and a signed delta alone cannot tell
    "sums to zero" from "no non-null values left", so the nn count is
    what lets the view render NULL exactly like a recompute — plus the
    group row count (retires emptied groups)."""
    aggs = []
    for a, src in measures.items():
        aggs.append(
            F.coalesce(F.sum(dec(src, DEC)), F.lit(0).cast(DEC)).alias(a)
        )
        aggs.append(F.count(src).alias(f"{a}__nn"))
    return df.groupBy(*keys).agg(*aggs, F.count(F.lit(1)).alias(_N))


def apply_delta(
    state: DataFrame,
    diff: DataFrame,
    keys: list[str],
    measures: dict[str, str],
) -> DataFrame:
    """Fold a ``table_diff`` feed into the state: inserts add, deletes
    subtract, groups with zero remaining rows drop.  Cost: one
    aggregation over the DIFF + one full-outer join against the state —
    never a table scan."""
    ins = F.col("__change") == "insert"
    delta_aggs = []
    for a, src in measures.items():
        delta_aggs.append(
            F.coalesce(
                F.sum(F.when(ins, dec(src, DEC)).otherwise(-dec(src, DEC))),
                F.lit(0).cast(DEC),
            ).alias(a)
        )
        delta_aggs.append(
            F.sum(
                F.when(ins & F.col(src).isNotNull(), 1)
                .when(~ins & F.col(src).isNotNull(), -1)
                .otherwise(0)
            ).alias(f"{a}__nn")
        )
    delta = diff.groupBy(*keys).agg(
        *delta_aggs, F.sum(F.when(ins, 1).otherwise(-1)).alias(_N)
    )
    s, d = state.alias("s"), delta.alias("d")
    # initial lit(True): a GLOBAL view (keys=[]) joins its single state
    # row to its single delta row — an empty reduce() would raise
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"s.{k}").eqNullSafe(F.col(f"d.{k}")) for k in keys],
        F.lit(True),
    )
    cols = [
        F.coalesce(F.col(f"s.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ]

    def _merged(col: str, zero):
        return F.coalesce(F.col(f"s.{col}"), zero) + F.coalesce(
            F.col(f"d.{col}"), zero
        )

    for a in measures:
        # decimal + decimal is exact; an absent side contributes 0.
        # Re-cast to DEC_SUM — the widened sum type grouped_agg_state
        # produces (Spark widens sum precision by +10) — NOT DEC: a
        # narrowing cast here would overflow groups whose running sum
        # exceeds 28,6 capacity while a full recompute stayed correct,
        # and would leave maintained vs recomputed state with
        # different column types.
        cols.append(_merged(a, F.lit(0).cast(DEC_SUM)).cast(DEC_SUM).alias(a))
        cols.append(_merged(f"{a}__nn", F.lit(0)).alias(f"{a}__nn"))
    cols.append(_merged(_N, F.lit(0)).alias(_N))
    return s.join(d, cond, "full_outer").select(*cols).where(F.col(_N) > 0)


def state_view(state: DataFrame, measures: dict[str, str]) -> DataFrame:
    """The serving shape of the state: per measure the sum as double
    (NULL when the group holds no non-null values, exactly as a
    recomputed SQL sum would be) and the SQL-AVG average (sum over the
    NON-NULL count — not count(*)), plus ``n_rows``."""
    aux = {f"{a}__nn" for a in measures}
    sel = [
        c for c in state.columns if c not in measures and c != _N and c not in aux
    ]
    for a in measures:
        nn = F.col(f"{a}__nn")
        sel.append(F.when(nn > 0, F.col(a).cast("double")).alias(a))
        sel.append(
            F.when(nn > 0, F.col(a).cast("double") / nn.cast("double")).alias(
                f"{a}_avg"
            )
        )
    sel.append(F.col(_N).alias("n_rows"))
    return state.select(*sel)
