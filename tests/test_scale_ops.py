"""Scale-path operators: bucketed co-located joins, salted aggregation."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from crypto_datalake_spark.ops.agg import dsum
from crypto_datalake_spark.ops.skew import salted_agg
from tests.test_scale_plans import plan_text


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # Pre-bucketing both sides on the join key co-locates matching rows:
    # the join plan has NO hashpartitioning exchange — the shuffle was
    # paid once at write time and amortized over every subsequent join.
    spark.sql("DROP TABLE IF EXISTS b_fact")
    spark.sql("DROP TABLE IF EXISTS b_dim")
    fact = spark.range(0, 10_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    # external tables under tmp_path (warehouse dir is a static conf)
    fact.write.bucketBy(8, "k").sortBy("k").option(
        "path", str(tmp_path / "b_fact")
    ).saveAsTable("b_fact")
    dim.write.bucketBy(8, "k").sortBy("k").option(
        "path", str(tmp_path / "b_dim")
    ).saveAsTable("b_dim")
    joined = (
        spark.table("b_fact")
        .join(spark.table("b_dim"), "k")
        .groupBy("k")
        .agg(F.sum("v").alias("sv"), F.max("w").alias("mw"))
    )
    p = plan_text(joined, "simple")
    assert not re.search(r"Exchange hashpartitioning\([kw#0-9L, ]*\bk#", p), p
    assert joined.count() == 500
    spark.sql("DROP TABLE IF EXISTS b_fact")
    spark.sql("DROP TABLE IF EXISTS b_dim")


def test_salted_agg_matches_direct(spark, sf_dir):
    from crypto_datalake_spark.queries.common import events

    ev = events(spark, sf_dir)
    direct = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("total")
    )
    salted = salted_agg(
        ev,
        ["event_type"],
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "total": (
                F.sum(F.col("value").cast("decimal(28,6)")),
                F.sum("total").cast("double"),
            ),
        },
        n_salts=16,
    )
    d = {r["event_type"]: (r["n"], r["total"]) for r in direct.collect()}
    s = {r["event_type"]: (r["n"], r["total"]) for r in salted.collect()}
    assert d == s  # decimal partials → exact equality, any salt spread
