"""Skew mitigation: salted two-phase aggregation.

The reference is single-node so skew never bites it; at cluster scale a
hot key (one symbol carrying most of the volume, one boilerplate band
key in LSH dedup) straggles its shuffle partition. AQE's skew-join
splitting handles *join* skew; *aggregation* skew over associative
measures is handled here by salting: spread each key over ``n_salts``
map-side partitions, aggregate partials, then re-aggregate without the
salt. Total work is unchanged; the largest shuffle partition shrinks by
~n_salts.

Only associative/decomposable aggregates can be salted this way (sum,
count, min, max, bool-or — exactly the §2.4 rollup measures). Averages
and ratios must be expressed as Σ-pairs first (ops.agg discipline), at
which point they are sums and salt fine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase grouped aggregation with a synthetic salt key.

    ``aggs`` maps output column name → (partial_agg_expr, merge_agg_expr)
    where the partial runs per (keys, salt) and the merge combines the
    per-salt partials per key, e.g. ``{"n": (F.count(F.lit(1)),
    F.sum("n")), "total": (F.sum("v"), F.sum("total"))}``.

    The salt is deterministic (hash of all columns' concat modulo
    n_salts would be non-deterministic under retries with float cols;
    a monotonically-increasing-id modulo is stable within a task attempt
    and any uniform spread works — the salt never reaches the result).
    """
    salted = df.withColumn(
        "__salt", (F.monotonically_increasing_id() % n_salts).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )
