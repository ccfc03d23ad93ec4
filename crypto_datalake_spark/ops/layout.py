"""Z-order (Morton) clustering keys for multi-dimensional data layout.

The 100-TB lever this buys: parquet pruning is driven by per-file /
per-row-group min-max stats, and a lake sorted by ONE column (time)
cannot skip anything for a predicate on another (key).  Interleaving
the bits of several dimension buckets into one sort key makes files
cluster in every interleaved dimension at once, so a (time AND key)
box predicate skips the files whose bounding boxes miss it — the same
mechanism Delta Lake's OPTIMIZE ZORDER BY and Databricks clustering
use.  The key is computed with codegen'd integer expressions (no UDF),
the layout write is one range repartition + in-partition sort, and the
benefit is verified empirically in tests/test_layout.py by reading
footers back: z-ordered files carry strictly tighter bounding boxes
and a box predicate prunes strictly more files than a time-sorted
layout of the same data.

Bucketing maps each dimension to ``[0, 2^bits)`` by min-max scaling in
double arithmetic (IEEE-identical across engines, so the key is
DuckDB-oracle-able); a constant dimension collapses to bucket 0.  Bit
interleaving is generated as a flat OR-chain of shift/mask terms —
``bits × n_dims`` cheap integer ops inside whole-stage codegen.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

ZBITS = 16  # buckets per dimension; 2 dims x 16 bits fill 32 key bits


def dim_bucket(col: Column, cmin: Column, cmax: Column, bits: int = ZBITS) -> Column:
    """Min-max scale ``col`` into an integer bucket in ``[0, 2^bits)``.

    All arithmetic is double (exact same IEEE result in any engine);
    the max value lands in the top bucket via the least() clamp, and a
    constant dimension (span 0) collapses to bucket 0."""
    nb = 1 << bits
    span = (cmax - cmin).cast("double")
    raw = F.floor((col - cmin).cast("double") / span * F.lit(float(nb)))
    return (
        F.when(span > 0, F.least(F.lit(nb - 1).cast("long"), raw))
        .otherwise(F.lit(0))
        .cast("long")
    )


def interleave_bits(cols: list[Column], bits: int = ZBITS) -> Column:
    """Morton-interleave ``bits`` low bits of each bucket column: output
    bit ``i*len(cols)+j`` is bit ``i`` of ``cols[j]``."""
    n = len(cols)
    terms = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return reduce(Column.bitwiseOR, terms).cast("long")


def dim_bucket_sql(expr: str, emin: str, emax: str, bits: int = ZBITS) -> str:
    """DuckDB twin of :func:`dim_bucket` — identical double arithmetic."""
    nb = 1 << bits
    span = f"(CAST({emax} AS DOUBLE) - CAST({emin} AS DOUBLE))"
    raw = (
        f"CAST(floor((CAST({expr} AS DOUBLE) - CAST({emin} AS DOUBLE))"
        f" / {span} * {float(nb)}) AS BIGINT)"
    )
    return (
        f"CAST(CASE WHEN {span} > 0 THEN least({nb - 1}, {raw})"
        f" ELSE 0 END AS BIGINT)"
    )


def interleave_bits_sql(exprs: list[str], bits: int = ZBITS) -> str:
    """DuckDB twin of :func:`interleave_bits` (same bit layout)."""
    n = len(exprs)
    terms = [
        f"((({e} >> {i}) & 1) << {i * n + j})"
        for j, e in enumerate(exprs)
        for i in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def write_zordered(df, path: str, zkey: Column, n_files: int) -> None:
    """Publish ``df`` as ``n_files`` parquet files clustered on ``zkey``:
    one range repartition on the key (co-locates z-adjacent rows) plus
    an in-partition sort (tightens row-group stats within each file).
    The z-key itself is NOT written — it's a layout device, not data."""
    (
        df.withColumn("__z", zkey)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
