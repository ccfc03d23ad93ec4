"""Distributed global ranking — no single-task sort over the data.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses the
whole input into ONE task (Spark itself logs "No Partition Defined ...
serious performance degradation").  The scale-out equivalent is the
range-partitioned two-phase rank:

1. ``repartitionByRange`` on the order columns — rows land in range-sorted
   partitions (equal keys always share a partition, so ranks stay
   deterministic);
2. rank locally inside each physical partition — ``sortWithinPartitions``
   plus ``monotonically_increasing_id``, whose documented structure is
   ``partitionId * 2^33 + rowIndexInPartition``: decomposing it yields the
   0-based sorted position within the partition with NO exchange and NO
   window (the expression is non-deterministic, so Catalyst cannot push it
   below the Sort; evaluation order is the sorted order).  The previous
   implementation ranked with ``Window.partitionBy(spark_partition_id())``,
   which forced an extra full-data ``Exchange hashpartitioning(__pid)`` —
   Catalyst cannot prove rows are already clustered by their own partition
   id — and that exchange was itself maximally skewed (every row of a
   partition hashes to the same key).  Dropping it removes one full-data
   shuffle from every consumer (r14 optimization; equivalence pinned by
   tests/test_rank_islands.py + the property sweep).
3. add each partition's exclusive row-count offset — a frame of
   #partitions rows, computed with one tiny aggregate and broadcast back.

The only serial structure left is the offset prefix over #partitions
values — constant-bounded, independent of data volume.  Same shape as
``ops/prefix.cum_before`` (two-phase scan), applied to ranking.

Bound: the id decomposition caps a single partition at 2^33 rows (the
expression's own documented limit) — far above any sane partition size
(a 2^33-row partition is a skew bug long before it is a rank bug).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__pid"
_LRK = "__local_rk"
_MID = "__mid"
_OFF = "__rank_offset"
_PART_CAP = 2**33  # monotonically_increasing_id: partitionId * 2^33 + idx


def _local_ranked(df: DataFrame, order_exprs: Sequence[Column]) -> DataFrame:
    """Sort each physical partition and attach (__pid, __local_rk) from the
    monotonically_increasing_id decomposition — zero exchanges, zero
    windows.  Deterministic given deterministic partition contents (the
    callers pin those: global_row_number checkpoints its range exchange;
    ranked_topk only needs per-partition top-k membership, which any
    partitioning serves)."""
    return (
        df.sortWithinPartitions(*order_exprs)
        .withColumn(_MID, F.monotonically_increasing_id())
        .withColumn(_PID, F.shiftrightunsigned(F.col(_MID), 33))
        .withColumn(_LRK, F.pmod(F.col(_MID), F.lit(_PART_CAP)) + 1)
        .drop(_MID)
    )


def global_row_number(
    df: DataFrame,
    order_exprs: Sequence[Column],
    out_col: str = "rk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global ``row_number`` in ``order_exprs`` order without a
    single-partition window over the data.

    ``order_exprs`` should define a TOTAL order (add a unique tiebreak
    column) so the result is deterministic.
    """
    ranged = (
        df.repartitionByRange(num_partitions, *order_exprs)
        if num_partitions
        else df.repartitionByRange(*order_exprs)
    )
    # MATERIALIZE the range exchange before deriving the two branches
    # (local ranks + partition counts).  repartitionByRange samples its
    # boundaries; if the exchange were recomputed per branch (exchange
    # reuse disabled, task-retry lineage recompute), the two branches
    # could see DIFFERENT boundaries and offsets would misalign with
    # local ranks.  localCheckpoint pins one physical realization —
    # recompute becomes impossible (fail-loud on block loss, never a
    # silently wrong rank); a long-lived cluster job would use
    # reliable-checkpoint or persist-to-table instead.
    ranged = ranged.localCheckpoint(eager=False)
    local = _local_ranked(ranged, order_exprs)

    # exclusive prefix of partition row-counts: #partitions rows, ordered
    # by pid (range partitions are already in global key order)
    counts = (
        ranged.withColumn(_PID, F.spark_partition_id().cast("long"))
        .groupBy(_PID)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    off_w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        _OFF, F.coalesce(F.sum("__n").over(off_w), F.lit(0))
    ).drop("__n")

    return (
        local.join(F.broadcast(offsets), _PID)
        # LONG, not int: the whole point of this helper is corpora too
        # big for a single-task window, i.e. exactly the sizes where a
        # global row number can exceed 2^31 — an int cast would wrap
        # silently (non-ANSI) and any rank-equality downstream (e.g. the
        # quality_lm_perplexity tercile cutoffs) would match nothing
        .withColumn(out_col, (F.col(_OFF) + F.col(_LRK)).cast("long"))
        .drop(_PID, _LRK, _OFF)
    )


def ranked_topk(
    df: DataFrame,
    order_exprs: Sequence[Column],
    k: int,
    out_col: str = "rk",
) -> DataFrame:
    """Global top-k WITH exact ranks: prune to the best k rows per input
    partition first (parallel, exchange-free — the sorted-position filter
    replaces the former per-partition window and its hashpartitioning
    exchange), then rank only the surviving ≤ k·P rows.  The final
    total-order window runs over a constant-bounded frame, so it is
    scale-safe the way phase 2 of a two-phase scan is."""
    pruned = (
        _local_ranked(df, order_exprs)
        .where(F.col(_LRK) <= k)
        .drop(_PID, _LRK)
    )
    final_w = Window.orderBy(*order_exprs)
    return (
        pruned.withColumn(out_col, F.row_number().over(final_w))
        .where(F.col(out_col) <= k)
    )
