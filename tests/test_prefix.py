"""Two-phase distributed prefix sum (ops/prefix.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crypto_datalake_spark.ops.prefix import cum_before


def _naive(df, streams, order_col, value_col):
    w = (
        Window.partitionBy(*streams)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.withColumn(
        "cum_before", F.coalesce(F.sum(value_col).over(w), F.lit(0)).cast("long")
    )


def test_matches_single_window_across_bucket_boundaries(spark):
    # bucket_width=7 over 200 rows x 3 streams: every stream crosses ~10
    # bucket boundaries, so the offset-stitching path is fully exercised;
    # sparse/non-contiguous order keys (id*3) and an empty-bucket gap too
    df = (
        spark.range(0, 200)
        .select(
            (F.col("id") % 3).cast("string").alias("src"),
            (F.col("id") * 3).alias("k"),
            (F.pmod(F.col("id") * 7919, F.lit(13)) + 1).alias("v"),
        )
        .where((F.col("k") < 210) | (F.col("k") > 300))  # hole in the range
    )
    got = cum_before(df, ["src"], "k", "v", bucket_width=7)
    want = _naive(df, ["src"], "k", "v")
    j = got.alias("g").join(
        want.alias("w"), (F.col("g.src") == F.col("w.src")) & (F.col("g.k") == F.col("w.k"))
    )
    assert j.count() == df.count()
    assert j.where(F.col("g.cum_before") != F.col("w.cum_before")).count() == 0


def test_plan_has_no_stream_only_window_over_rows(spark, sf_dir):
    """The scale contract: the window that scans DATA rows must be
    partitioned by (stream, bucket), never by the stream alone — a
    stream-only partition spec serializes each source into one task.
    The only stream-only window allowed is phase 2's, which consumes the
    bucket-count-sized aggregate (its child is a HashAggregate)."""
    import contextlib
    import io

    from crypto_datalake_spark.queries import REGISTRY

    df = REGISTRY["sequence_packing"].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    plan = buf.getvalue()

    windows = [l for l in plan.splitlines() if l.lstrip().startswith("+- Window") or l.lstrip().startswith("Window")]
    assert windows, plan
    data_windows = [l for l in windows if "__bucket" in l]
    stream_only = [l for l in windows if "__bucket" not in l]
    # phase 1 (over data) carries the bucket key
    assert data_windows, plan
    # any stream-only window must be the phase-2 offsets scan: its input
    # is the aggregated totals, identifiable by the __bucket_total column
    for l in stream_only:
        assert "__bucket_total" in l, l
