"""Partition-parallel global rank (ops/rank.py) and two-phase islands
(ops/gaps.py) — equivalence with the naive single-window forms, plus the
plan contract: no unpartitioned window ever scans the DATA (bounded frames
only)."""

from __future__ import annotations

import contextlib
import datetime as dt
import io

from pyspark.sql import Window
from pyspark.sql import functions as F

from crypto_datalake_spark.ops.gaps import islands
from crypto_datalake_spark.ops.rank import global_row_number, ranked_topk


def _plan(df, mode="simple"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_global_row_number_matches_naive(spark):
    df = spark.range(0, 5000).select(
        F.col("id"),
        F.pmod(F.col("id") * 7919 + 13, F.lit(997)).alias("v"),
    )
    order = [F.col("v").desc(), F.col("id").asc()]
    got = global_row_number(df, order, num_partitions=8)
    naive = df.withColumn("rk", F.row_number().over(Window.orderBy(*order)))
    diff = (
        got.select("id", "rk")
        .join(naive.select("id", F.col("rk").alias("rk2")), "id")
        .where(F.col("rk") != F.col("rk2"))
    )
    assert diff.count() == 0


def test_ranked_topk_matches_naive(spark):
    df = spark.range(0, 3000).repartition(8).select(
        F.col("id"), F.pmod(F.col("id") * 31, F.lit(500)).alias("v")
    )
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {(r["id"], r["rk"]) for r in ranked_topk(df, order, 100).collect()}
    naive = df.withColumn("rk", F.row_number().over(Window.orderBy(*order))).where(
        "rk <= 100"
    )
    want = {(r["id"], r["rk"]) for r in naive.collect()}
    assert got == want


def _naive_islands(df, ts_col, step_minutes, by=()):
    step = step_minutes * 60
    w = Window.partitionBy(*by).orderBy(F.col(ts_col).asc())
    base = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    secs = F.timestamp_diff("SECOND", base, F.col(ts_col))
    grp = (secs / step - F.row_number().over(w)).cast("long")
    return (
        df.select(*by, F.col(ts_col), grp.alias("__grp"))
        .groupBy(*by, "__grp")
        .agg(
            F.min(ts_col).alias("window_start"),
            F.max(ts_col).alias("window_end"),
            F.count(F.lit(1)).alias("n_slots"),
        )
        .drop("__grp")
    )


def test_islands_matches_naive_across_bucket_edges(spark):
    # slot pattern stressing every stitch case: runs fully inside a bucket,
    # runs ending exactly at a bucket edge, runs spanning 3+ buckets, and
    # single-slot runs at bucket starts.  bucket_slots=10 so edges abound.
    keep = (
        list(range(0, 35))        # spans buckets 0..3
        + list(range(38, 40))     # ends at bucket-3 edge
        + list(range(40, 41))     # continues into bucket 4 -> stitches
        + list(range(55, 58))     # interior of bucket 5
        + [60, 62, 64]            # singles at/inside bucket 6
        + list(range(90, 100))    # exactly one full bucket
    )
    base = dt.datetime(2024, 1, 1)
    rows = [(("A" if s % 2 == 0 else "A"), base + dt.timedelta(minutes=s)) for s in keep]
    df = spark.createDataFrame(rows, "sym string, ts timestamp_ntz")

    got = islands(df, "ts", 1, by=["sym"], bucket_slots=10)
    want = _naive_islands(df, "ts", 1, by=["sym"])
    key = lambda r: (r["sym"], r["window_start"])  # noqa: E731
    g = sorted(map(tuple, got.collect()), key=lambda t: t[:2])
    w = sorted(map(tuple, want.collect()), key=lambda t: t[:2])
    assert g == w


def test_islands_plan_buckets_the_data_window(spark):
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(base + dt.timedelta(minutes=i),) for i in range(100)], "ts timestamp_ntz"
    )
    plan = _plan(islands(df, "ts", 1, bucket_slots=10))
    win_lines = [l for l in plan.splitlines() if "Window [" in l]
    data_wins = [l for l in win_lines if "__bucket" in l]
    global_wins = [l for l in win_lines if "__bucket" not in l]
    assert data_wins, plan
    # the only unpartitioned windows consume the boundary-run frame
    # (post-aggregate, identifiable by the run columns __s/__e)
    for l in global_wins:
        assert "__s" in l or "__e" in l, l


def test_o1_plan_prunes_before_global_window(spark, sf_dir):
    from crypto_datalake_spark.queries import REGISTRY

    plan = _plan(REGISTRY["o1_sort_rank_nulls_last"].fn(spark, sf_dir))
    win_lines = [l for l in plan.splitlines() if "Window [" in l]
    # the local prune is a sorted-position filter (monotonically_increasing_id
    # decomposition, r14) — NO per-partition window, NO hashpartitioning(__pid)
    # exchange; the only window left is the bounded global rank over the ≤ k·P
    # survivors, sitting above the __local_rk prune filter
    assert len(win_lines) == 1, plan
    assert "__pid" not in plan, plan
    # the prune filter survives as the collapsed sorted-position predicate
    assert "monotonically_increasing_id" in plan, plan
    assert "pmod(__mid" in plan, plan


def test_ranked_topk_plan_has_no_local_exchange(spark):
    # the prune phase must not exchange: the only Exchange in a ranked_topk
    # plan is the SinglePartition one feeding the bounded final window
    df = spark.range(0, 3000).repartition(8).select(
        F.col("id"), F.pmod(F.col("id") * 31, F.lit(500)).alias("v")
    )
    order = [F.col("v").desc(), F.col("id").asc()]
    plan = _plan(ranked_topk(df, order, 100))
    ex_lines = [
        l for l in plan.splitlines()
        if "Exchange" in l and "REPARTITION" not in l
    ]
    assert all("SinglePartition" in l for l in ex_lines), plan
