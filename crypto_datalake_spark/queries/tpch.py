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


@register(
    "q6_forecast_revenue",
    sql="""
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                     * CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0
    """,
    doc="TPC-H Q6 shape: tight multi-predicate filter + scalar aggregate. "
    "All three predicates push to the parquet scan (row-group min/max "
    "skipping); no shuffle at all — the cheapest query class.",
)
def q6_forecast_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    ).agg(
        dsum_prod("l_extendedprice", "l_discount").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q10_returned_items",
    sql="""
    SELECT c.c_custkey, c.c_name, n.n_name,
      CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))
                * CAST(1.0 - l.l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
        AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: 4-table star join (fact × 2 dims + date-filtered "
    "bridge) + top-k by aggregated revenue. nation broadcasts; customer "
    "joins shuffle-hash under AQE; TakeOrderedAndProject caps the sort.",
)
def q10_returned_items(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum_prod(
                "l_extendedprice", F.lit(1.0) - F.col("l_discount")
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q12_priority_shipclass",
    sql="""
    SELECT l.l_returnflag,
      CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape (adapted to the available columns): fact-fact "
    "equi-join + two-class conditional counts. One shuffle join on "
    "orderkey, conditional sums fold map-side.",
)
def q12_priority_shipclass(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    sql="""
    SELECT
      100.0 * CAST(CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,6))
                      * CAST(1.0 - l.l_discount AS DECIMAL(18,6))
                 ELSE CAST(0.0 AS DECIMAL(38,6)) END) AS DECIMAL(38,6)) AS DOUBLE)
        / CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))
                    * CAST(1.0 - l.l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
        AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
    doc="TPC-H Q14 shape: dimension join + conditional ratio-of-sums "
    "(promo share of revenue). part broadcasts under the AQE threshold; "
    "the ratio is computed over exact decimal sums (A7 discipline).",
)
def q14_promo_revenue(spark, sf_dir):
    from crypto_datalake_spark.ops.agg import DEC_MUL, dec

    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    p = t(spark, sf_dir, "part")
    disc_price = dec("l_extendedprice", DEC_MUL) * dec(
        F.lit(1.0) - F.col("l_discount"), DEC_MUL
    )
    promo = F.when(
        F.col("p_type").like("PROMO%"), disc_price
    ).otherwise(F.lit(0.0).cast("decimal(38,6)"))
    num = F.sum(promo).cast("decimal(38,6)").cast("double")
    den = F.sum(disc_price).cast("decimal(38,6)").cast("double")
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        (F.lit(100.0) * num / den).alias("promo_revenue_pct")
    )
