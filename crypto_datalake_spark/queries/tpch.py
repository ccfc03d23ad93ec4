"""Headline analytical queries (bench workload) — multi-join + heavy agg
shapes over the TPC-H-ish tables.

These certify the composed engine (scan → broadcast/shuffle join → hash agg
→ ordered limit) and are the queries bench.py times at sf0.1.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_datalake_spark.ops.agg import dsum, dsum_prod
from crypto_datalake_spark.queries.common import t
from crypto_datalake_spark.queries.registry import register


@register(
    "q1_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST((1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
      CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_price,
      CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_disc,
      CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: full-scan hash aggregation with derived measures. "
    "Whole-stage-codegen'd single shuffle; decimal sums keep the result "
    "shuffle-schedule-independent. Charge factor (1-d)(1+t) is computed in "
    "double then quantised identically on both sides.",
)
def q1_pricing_summary(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    n = F.count(F.lit(1))
    charge_factor = (F.lit(1.0) - F.col("l_discount")) * (F.lit(1.0) + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum_prod("l_extendedprice", F.lit(1.0) - F.col("l_discount")).alias("sum_disc_price"),
        dsum_prod("l_extendedprice", charge_factor).alias("sum_charge"),
        (dsum("l_quantity") / n.cast("double")).alias("avg_qty"),
        (dsum("l_extendedprice") / n.cast("double")).alias("avg_price"),
        (dsum("l_discount") / n.cast("double")).alias("avg_disc"),
        n.alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    sql="""
    SELECT l.l_orderkey AS orderkey, o.o_orderdate AS orderdate,
      CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l.l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1996-01-01'
    GROUP BY 1, 2
    ORDER BY revenue DESC, orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: dimension-filtered 3-way join + agg + ordered "
    "top-k. customer is broadcast (small side); lineitem⋈orders shuffles "
    "on orderkey once. Deterministic tie-break on orderkey.",
)
def q3_shipping_priority(spark, sf_dir):
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp_ntz")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
        )
        .agg(
            dsum_prod("l_extendedprice", F.lit(1.0) - F.col("l_discount")).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(10)
    )


@register(
    "q5_region_revenue",
    sql="""
    SELECT n.n_name AS nation,
      CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l.l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
      CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey AND s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
    """,
    doc="TPC-H Q5 shape: star join over region/nation/customer/supplier "
    "with local-supplier condition. All dimensions broadcast; the only "
    "shuffle is lineitem⋈orders + the final agg.",
)
def q5_region_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(n),
            (c.c_nationkey == n.n_nationkey) & (s.s_nationkey == n.n_nationkey),
        )
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum_prod("l_extendedprice", F.lit(1.0) - F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q_order_priority_exists",
    sql="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY 1
    """,
    doc="TPC-H Q4 shape: semi-join (EXISTS) + agg — the complement of the "
    "reference's anti-join J7. Spark plans a left-semi hash join.",
)
def q_order_priority_exists(spark, sf_dir):
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem")
    matched = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))
