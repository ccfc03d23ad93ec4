"""Lake sinks: idempotent partitioned upsert writes (SURVEY.md §2.1 S4-S6).

The reference writes hour partitions atomically: read-existing → concat →
dedup-keep-last → tmp file → rename, preserving LIVE_ONLY columns on
rewrite (/root/reference/src/binance_minute_lake/writer/atomic.py:27-117;
src/aggregator/target_writer.py:14-46).

Spark-native equivalent: ``spark.sql.sources.partitionOverwriteMode=dynamic``
replaces exactly the partitions present in the incoming frame — the same
atomic-replace granularity as the reference's per-hour tmp+rename, without
driver-side path math. The merge itself (union + keep-last + live-column
preservation) is one shuffle keyed on the upsert keys.

At scale: only the partitions being repaired are read back (partition
pruning on the join against incoming partition keys), so a 100 TB lake
repairs a 2-hour window by touching 2 hours of files. On Delta this whole
module collapses to ``MERGE INTO`` — the API is kept MERGE-shaped on
purpose.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_datalake_spark.ops.dedup import keep_last


def upsert_partitioned(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
    partition_cols: Sequence[str],
    preserve_cols: Sequence[str] = (),
    flag_cols: Sequence[str] = (),
) -> None:
    """Merge ``incoming`` into the partitioned parquet lake at ``path``.

    - ``keys``: upsert identity (e.g. symbol+timestamp / tf+symbol+bucket_start);
      incoming rows win over existing on the same key (keep-last by
      ``order_cols`` with incoming priority — ref atomic.py:65-97).
    - ``preserve_cols``: LIVE_ONLY values coalesced from existing when the
      incoming row has NULL (ref atomic.py:65-97, S6).
    - ``flag_cols``: boolean coverage flags OR-ed across versions.

    Only partitions present in ``incoming`` are rewritten (dynamic overwrite);
    existing data is read partition-pruned via a semi-join on the incoming
    partition values (broadcast — the incoming side of a repair is small).
    """
    cols = incoming.columns
    try:
        existing = spark.read.parquet(path).select(*cols)
    except Exception:  # first write: nothing to merge
        existing = None

    out = incoming
    if existing is not None:
        touched = incoming.select(*partition_cols).distinct()
        existing = existing.join(F.broadcast(touched), list(partition_cols), "left_semi")
        if preserve_cols or flag_cols:
            old = existing.select(
                *keys,
                *[F.col(c).alias(f"__old_{c}") for c in (*preserve_cols, *flag_cols)],
            )
            merged = incoming.join(old, list(keys), "left")
            for c in preserve_cols:
                merged = merged.withColumn(c, F.coalesce(F.col(c), F.col(f"__old_{c}")))
            for c in flag_cols:
                merged = merged.withColumn(
                    c,
                    F.coalesce(F.col(c), F.lit(False))
                    | F.coalesce(F.col(f"__old_{c}"), F.lit(False)),
                )
            incoming = merged.select(*cols)
        out = (
            incoming.withColumn("__prio", F.lit(1))
            .unionByName(existing.withColumn("__prio", F.lit(0)))
        )
        out = keep_last(out, keys, [*order_cols, "__prio"]).drop("__prio")

    (
        out.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "timestamp",
    granularity: str = "hour",
    extra_partition_cols: Sequence[str] = ("symbol",),
) -> list[str]:
    """Derive hive partition columns from a timestamp and write
    (ref atomic.py:99-111 path scheme symbol=S/year/month/day/hour).

    Returns the partition column names (callers pass them to
    ``upsert_partitioned`` / read-side pruning filters).
    """
    parts = [*extra_partition_cols, "year", "month", "day"]
    out = (
        df.withColumn("year", F.year(ts_col))
        .withColumn("month", F.month(ts_col))
        .withColumn("day", F.dayofmonth(ts_col))
    )
    if granularity == "hour":
        out = out.withColumn("hour", F.hour(ts_col))
        parts.append("hour")
    (
        out.repartition(*[F.col(c) for c in parts])
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*parts)
        .parquet(path)
    )
    return parts
