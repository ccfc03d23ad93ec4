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


def grouped_agg_state(
    df: DataFrame, keys: list[str], measures: dict[str, str]
) -> DataFrame:
    """Materialize the maintainable state of ``SELECT keys, sum(col)…,
    count(*) FROM df GROUP BY keys``: one decimal sum per measure alias
    plus the group row count (needed to retire emptied groups)."""
    return df.groupBy(*keys).agg(
        *[F.sum(dec(src, DEC)).alias(a) for a, src in measures.items()],
        F.count(F.lit(1)).alias(_N),
    )


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
    delta = diff.groupBy(*keys).agg(
        *[
            F.sum(
                F.when(ins, dec(src, DEC)).otherwise(-dec(src, DEC))
            ).alias(a)
            for a, src in measures.items()
        ],
        F.sum(F.when(ins, 1).otherwise(-1)).alias(_N),
    )
    s, d = state.alias("s"), delta.alias("d")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"s.{k}").eqNullSafe(F.col(f"d.{k}")) for k in keys],
    )
    cols = [
        F.coalesce(F.col(f"s.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ]
    for a in measures:
        # decimal + decimal is exact; an absent side contributes 0
        cols.append(
            (
                F.coalesce(F.col(f"s.{a}"), F.lit(0).cast(DEC))
                + F.coalesce(F.col(f"d.{a}"), F.lit(0).cast(DEC))
            ).cast(DEC).alias(a)
        )
    cols.append(
        (
            F.coalesce(F.col(f"s.{_N}"), F.lit(0))
            + F.coalesce(F.col(f"d.{_N}"), F.lit(0))
        ).alias(_N)
    )
    return s.join(d, cond, "full_outer").select(*cols).where(F.col(_N) > 0)


def state_view(state: DataFrame, measures: dict[str, str]) -> DataFrame:
    """The serving shape of the state: doubles for the sums, ``n_rows``,
    and an exact-sum-over-exact-count average per measure."""
    out = state
    sel = [c for c in state.columns if c not in measures and c != _N]
    for a in measures:
        sel.append(F.col(a).cast("double").alias(a))
        sel.append(
            (F.col(a).cast("double") / F.col(_N).cast("double")).alias(
                f"{a}_avg"
            )
        )
    sel.append(F.col(_N).alias("n_rows"))
    return out.select(*sel)
