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


_REV_SUM_SQL = (
    "CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6)) "
    "* CAST(1.0 - l.l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)"
)


@register(
    "q2_min_price_supplier",
    sql="""
    WITH px AS (
      SELECT l_partkey, min(l_extendedprice) AS min_price
      FROM lineitem GROUP BY 1
    )
    SELECT p.p_partkey, p.p_brand, s.s_name, l.l_extendedprice AS price
    FROM lineitem l
    JOIN px ON l.l_partkey = px.l_partkey AND l.l_extendedprice = px.min_price
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE p.p_size <= 5
    QUALIFY row_number() OVER (
      PARTITION BY p.p_partkey
      ORDER BY l.l_suppkey, l.l_orderkey, l.l_linenumber
    ) = 1
    ORDER BY price DESC, p.p_partkey LIMIT 100
    """,
    doc="TPC-H Q2 shape (adapted: no partsupp table): correlated-min "
    "join-back — per-part minimum price located via a self-agg + equi-join "
    "on (partkey, min_price), deterministic single-row tie-break, dimension "
    "filter, ordered top-k. The per-part agg and the join shuffle on the "
    "same key (l_partkey) so AQE can reuse the exchange.",
)
def q2_min_price_supplier(spark, sf_dir):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    px = li.groupBy("l_partkey").agg(F.min("l_extendedprice").alias("min_price"))
    p = t(spark, sf_dir, "part").where(F.col("p_size") <= 5)
    s = t(spark, sf_dir, "supplier")
    w = Window.partitionBy("p_partkey").orderBy(
        "l_suppkey", "l_orderkey", "l_linenumber"
    )
    return (
        li.join(
            px,
            (li.l_partkey == px.l_partkey)
            & (li.l_extendedprice == px.min_price),
        )
        .drop(px.l_partkey)
        .join(p, F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "p_partkey", "p_brand", "s_name",
            F.col("l_extendedprice").alias("price"),
        )
        .orderBy(F.col("price").desc(), F.col("p_partkey").asc())
        .limit(100)
    )


@register(
    "q7_nation_pair_trade",
    sql=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {_REV_SUM_SQL} AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: bidirectional nation-pair trade volume by year — "
    "6-table join with a disjunctive cross-dimension predicate. Both "
    "nation sides broadcast; the pair predicate lands after the joins "
    "(not pushable) but the shipdate range pushes to the scan.",
)
def q7_nation_pair_trade(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            dsum_prod("l_extendedprice", F.lit(1.0) - F.col("l_discount")).alias(
                "revenue"
            )
        )
    )


@register(
    "q13_order_count_distribution",
    sql="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY 1
    )
    GROUP BY 1
    """,
    doc="TPC-H Q13 shape: customer order-count distribution — left outer "
    "join with an extra non-equi condition inside the join (not a WHERE: "
    "customers with zero orders must survive), two stacked aggregations. "
    "The second agg's input is tiny (one row per customer) so its shuffle "
    "is negligible.",
)
def q13_order_count_distribution(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "q15_top_supplier",
    sql="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                  * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6))
               AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
    doc="TPC-H Q15 shape: top supplier by quarterly revenue — agg view + "
    "scalar-subquery max + join back. The max is a broadcast single-row "
    "join against the same agg (computed once per branch); revenue "
    "equality is exact because the sum is decimal, so ties are "
    "deterministic across engines and shuffle schedules.",
)
def q15_top_supplier(spark, sf_dir):
    from crypto_datalake_spark.ops.agg import DEC_MUL, dec

    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            dec("l_extendedprice", DEC_MUL)
            * dec(F.lit(1.0) - F.col("l_discount"), DEC_MUL)
        )
        .cast("decimal(38,6)")
        .alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    s = t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_rev == F.col("__mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q18_large_volume_orders",
    sql="""
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2, 3
    HAVING sum(CAST(l.l_quantity AS DECIMAL(28,6))) > 300
    """,
    doc="TPC-H Q18 shape: large-volume orders — full fact-fact join + "
    "group-by-order HAVING on an exact decimal sum. At scale the right "
    "plan pre-aggregates lineitem by orderkey before joining customer "
    "(done here): the HAVING filter cuts ~99% of groups before the "
    "dimension join.",
)
def q18_large_volume_orders(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    c = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300.0)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "total_qty")
    )


@register(
    "rollup_region_nation_revenue",
    sql=f"""
    SELECT coalesce(sub.r_name, 'ALL') AS region,
           coalesce(sub.n_name, 'ALL') AS nation,
           CAST(sub.lvl AS BIGINT) AS lvl,
           sub.revenue, sub.n_rows
    FROM (
      SELECT r.r_name, n.n_name, GROUPING(r.r_name, n.n_name) AS lvl,
             {_REV_SUM_SQL} AS revenue,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY ROLLUP (r.r_name, n.n_name)
    ) sub
    """,
    doc="ROLLUP multi-level aggregation: revenue by (region, nation), "
    "(region), and grand total in one pass, with GROUPING() level ids — "
    "the multi-granularity rollup a lakehouse serving layer materializes "
    "(SURVEY.md §2.4 flags grouping-set support as an engine-parity "
    "extension). Spark expands the rollup map-side; one shuffle.",
)
def rollup_region_nation_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping_id("r_name", "n_name").cast("long").alias("lvl"),
            dsum_prod("l_extendedprice", F.lit(1.0) - F.col("l_discount")).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "lvl",
            "revenue",
            "n_rows",
        )
    )


@register(
    "q16_supplier_cnt_by_part",
    sql="""
    SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type NOT LIKE 'PROMO%'
      AND p.p_size <= 10
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2
    """,
    doc="TPC-H Q16 shape: supplier diversity per (brand, size) — NOT-IN "
    "subquery (planned as a broadcast anti-join on the excluded supplier "
    "set) composed with a distinct-count aggregation. The anti-join side "
    "is dimension-sized and broadcasts; distinct-count expands then "
    "two-phase aggregates.",
)
def q16_supplier_cnt_by_part(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(
        (~F.col("p_type").like("PROMO%")) & (F.col("p_size") <= 10)
    )
    bad = t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        # NOT IN three-valued logic: a NULL l_suppkey is excluded by the
        # oracle's NOT IN (NULL matches nothing either way, but NOT
        # (NULL IN ...) is NULL → filtered), while left_anti would KEEP
        # it. Filter nulls first so the translation matches. (The bad-
        # supplier side is a primary key — never NULL — so the
        # subquery-contains-NULL arm of NOT IN cannot fire.)
        li.where(F.col("l_suppkey").isNotNull())
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_qty_revenue",
    sql="""
    SELECT
      CAST(sum(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0 AS avg_yearly,
      CAST(count(*) AS BIGINT) AS n_small
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_type = 'SMALL'
      AND l.l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey
      )
    GROUP BY ALL
    """,
    doc="TPC-H Q17 shape: correlated per-part average-quantity subquery "
    "gating a revenue aggregate (container predicate adapted to p_type — "
    "the fixture part table has no container column). Planned as: filter "
    "part (tiny) → broadcast-join lineitem → per-part avg on the already-"
    "reduced subset → broadcast back. l_quantity is integral so the "
    "double avg is exact and the threshold compare is deterministic.",
)
def q17_small_qty_revenue(spark, sf_dir):
    p = (
        t(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#23") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    matched = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).drop("p_partkey")
    thresholds = matched.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        matched.join(F.broadcast(thresholds), "l_partkey")
        .where(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register(
    "q19_disjunctive_bracket_revenue",
    sql="""
    SELECT
      CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l.l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
      CAST(count(*) AS BIGINT) AS n_matched
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    GROUP BY ALL
    """,
    doc="TPC-H Q19 shape: OR-of-conjunctions join predicate mixing "
    "fact and dimension columns (size brackets substitute for the "
    "fixture-absent container column). The derivable union envelope "
    "(brand IN (...), size <= 15, quantity <= 30) is applied explicitly "
    "on each side so the scans prune before the broadcast join; the "
    "exact disjunction evaluates post-join.",
)
def q19_disjunctive_bracket_revenue(spark, sf_dir):
    p = t(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    )
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size") <= smax)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(
            arm("Brand#12", 5, 1, 11)
            | arm("Brand#23", 10, 10, 20)
            | arm("Brand#34", 15, 20, 30)
        )
        .agg(
            dsum_prod("l_extendedprice", F.lit(1.0) - F.col("l_discount")).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_matched"),
        )
    )


@register(
    "q20_top_shippers_semijoin",
    sql="""
    WITH red AS (
      SELECT l.l_suppkey, CAST(sum(l.l_quantity) AS DOUBLE) AS red_qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'red%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
    )
    SELECT s.s_name, r.red_qty
    FROM supplier s
    JOIN red r ON s.s_suppkey = r.l_suppkey
    WHERE r.red_qty > (SELECT 1.5 * avg(red_qty) FROM red)
    ORDER BY s.s_name
    """,
    doc="TPC-H Q20 shape: supplier semi-join against an aggregated "
    "shipment subquery with a scale-free HAVING threshold (1.5x the "
    "mean shipped quantity, replacing the partsupp availqty gate — the "
    "fixture has no partsupp table). part filters by name prefix and "
    "broadcasts; the aggregate reduces lineitem to one row per supplier "
    "before the threshold and the supplier join, so only supplier-sized "
    "data crosses the final exchange. Integral quantities keep the "
    "double avg exact.",
)
def q20_top_shippers_semijoin(spark, sf_dir):
    p = (
        t(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    red = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").cast("double").alias("red_qty"))
    )
    thr = red.agg((F.lit(1.5) * F.avg("red_qty")).alias("thr"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        red.join(F.broadcast(thr))
        .where(F.col("red_qty") > F.col("thr"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "red_qty")
        .orderBy("s_name")
    )


@register(
    "q21_sole_blame_supplier",
    sql="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape: the sole-at-fault supplier on multi-supplier "
    "finished orders (returnflag='R' stands in for receipt>commit — the "
    "fixture lineitem has no commit/receipt dates). The oracle states it "
    "as EXISTS / NOT-EXISTS self-joins; the Spark plan collapses both "
    "correlated subqueries into a two-level aggregate: (orderkey, "
    "suppkey) pairs with their flagged-row counts, then per-order "
    "supplier/flagged tallies over the pairs. No distinct-expand (two "
    "countDistincts would double the shuffled rows — measured ~30% "
    "slower), and the re-join happens on the already pair-reduced data, "
    "not raw lineitem. Equivalence: 'another supplier exists' = n_supp "
    "> 1; 'no other flagged supplier' = n_flagged = 1 (the pair itself "
    "is flagged); numwait = the pair's flagged-row count.",
)
def q21_sole_blame_supplier(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("r_rows")
    )
    ord_stats = pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.count(F.when(F.col("r_rows") > 0, 1)).alias("n_flagged"),
    )
    o = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        pair.where(F.col("r_rows") > 0)
        .join(
            ord_stats.where((F.col("n_supp") > 1) & (F.col("n_flagged") == 1)),
            "l_orderkey",
        )
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("r_rows").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@register(
    "q22_dormant_customer_balance",
    sql="""
    SELECT cntrycode,
      CAST(count(*) AS BIGINT) AS numcust,
      CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT right(c.c_name, 1) AS cntrycode, c.c_acctbal
      FROM customer c
      WHERE right(c.c_name, 1) IN ('1','3','5','7','9')
        AND c.c_acctbal > (
          SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*)
          FROM customer c2
          WHERE c2.c_acctbal > 0.0
            AND right(c2.c_name, 1) IN ('1','3','5','7','9')
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        )
    )
    GROUP BY cntrycode
    """,
    doc="TPC-H Q22 shape: above-average-balance customers with no orders, "
    "bucketed by a code digit (last digit of c_name substitutes for the "
    "fixture-absent phone country code). Global-average scalar subquery "
    "(1-row broadcast), anti-join against orders, then a tiny hash agg. "
    "The average is computed as exact-decimal-sum / count on both "
    "engines so the threshold compare never straddles a double ulp.",
)
def q22_dormant_customer_balance(spark, sf_dir):
    code = F.expr("right(c_name, 1)")
    c = (
        t(spark, sf_dir, "customer")
        .where(code.isin("1", "3", "5", "7", "9"))
        .select(code.alias("cntrycode"), "c_acctbal", "c_custkey")
    )
    thr = c.where(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal") / F.count(F.lit(1)).cast("double")).alias("avg_bal")
    )
    o = t(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


@register(
    "q11_nation_revenue_concentration",
    sql="""
    WITH nat AS (
      SELECT n.n_name AS nation,
        CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l.l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS revenue_dec
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1
    )
    SELECT nation, CAST(revenue_dec AS DOUBLE) AS revenue
    FROM nat
    WHERE 20 * CAST(revenue_dec AS DECIMAL(30,6)) > (SELECT sum(revenue_dec) FROM nat)
    ORDER BY revenue DESC, nation
    """,
    doc="TPC-H Q11 shape: per-group value share gated against a fraction "
    "of the global total (supplier-nation revenue substitutes for the "
    "fixture-absent partsupp stock value). The group aggregate is "
    "computed once and reused for both arms — the global total is the "
    "sum of the 25 group DECIMALS, broadcast back as a 1-row scalar. "
    "The 5% gate is the exact-integer form 20·revenue > total so both "
    "engines compare in decimal with no fractional literal (a double "
    "0.05 would promote the compare to double and can flip within one "
    "ulp of the boundary).",
)
def q11_nation_revenue_concentration(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nat = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,6)")
                * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,6)")
            )
            .cast("decimal(38,6)")
            .alias("revenue_dec")
        )
    )
    total = nat.agg(F.sum("revenue_dec").alias("total_dec"))
    return (
        nat.join(F.broadcast(total))
        # exact-integer 5% gate: 20·revenue > total keeps both engines in
        # decimal arithmetic (narrow the operand first so 20·x fits p=38)
        .where(
            F.lit(20) * F.col("revenue_dec").cast("decimal(30,6)")
            > F.col("total_dec")
        )
        .select("nation", F.col("revenue_dec").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "nation")
    )


@register(
    "q8_national_market_share",
    sql="""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))
                 * CAST(CASE WHEN n2.n_name = 'NATION_1'
                             THEN 1.0 - l.l_discount ELSE 0.0 END
                        AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
             / CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))
                 * CAST(1.0 - l.l_discount AS DECIMAL(18,6)))
                        AS DECIMAL(38,6)) AS DOUBLE) AS mkt_share
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n1.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'PROMO'
      AND r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q8 shape: national market share — NATION_1's fraction of "
    "PROMO-part revenue sold into the ASIA customer market by order "
    "year, an 8-table join with a conditional aggregate. Every "
    "dimension (part filter, supplier→nation, customer→nation→region) "
    "broadcasts; the only shuffles are lineitem⋈orders on orderkey and "
    "the year agg. Numerator and denominator are exact decimal sums "
    "cast to double before the one IEEE division.",
)
def q8_national_market_share(spark, sf_dir):
    from crypto_datalake_spark.ops.agg import DEC_MUL, _to_double, dec

    li = t(spark, sf_dir, "lineitem")
    p = (
        t(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    r = (
        t(spark, sf_dir, "region")
        .where(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol = dec("l_extendedprice", DEC_MUL) * dec(
        F.lit(1.0) - F.col("l_discount"), DEC_MUL
    )
    nat_vol = dec("l_extendedprice", DEC_MUL) * dec(
        F.when(F.col("supp_nation") == "NATION_1", F.lit(1.0) - F.col("l_discount"))
        .otherwise(F.lit(0.0)),
        DEC_MUL,
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (_to_double(F.sum(nat_vol)) / _to_double(F.sum(vol))).alias(
                "mkt_share"
            )
        )
    )


@register(
    "q9_product_type_profit",
    sql="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))
                   * CAST(1.0 - l.l_discount AS DECIMAL(18,6))
                 - CAST(0.8 * p.p_retailprice AS DECIMAL(18,6))
                   * CAST(l.l_quantity AS DECIMAL(18,6)))
                AS DECIMAL(38,6)) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape: product-type profit by supplier nation and "
    "order year — revenue minus cost per line over a part-name "
    "substring filter. The fixture has no partsupp, so cost is a "
    "0.8·p_retailprice·quantity proxy (same join/agg shape, same "
    "decimal discipline: the per-line profit is one exact decimal "
    "expression summed exactly, cast to double once). part/supplier/"
    "nation broadcast; lineitem⋈orders shuffles on orderkey.",
)
def q9_product_type_profit(spark, sf_dir):
    from crypto_datalake_spark.ops.agg import DEC_MUL, _to_double, dec

    li = t(spark, sf_dir, "lineitem")
    p = (
        t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    profit = dec("l_extendedprice", DEC_MUL) * dec(
        F.lit(1.0) - F.col("l_discount"), DEC_MUL
    ) - dec(F.lit(0.8) * F.col("p_retailprice"), DEC_MUL) * dec(
        "l_quantity", DEC_MUL
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(_to_double(F.sum(profit)).alias("sum_profit"))
    )
