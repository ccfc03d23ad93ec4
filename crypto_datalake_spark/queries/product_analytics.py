"""Event-sequence analytics over the events table: ordered funnel
conversion and signup-cohort retention.

Two classic product-analytics shapes that certify event-ORDER
composition (the reference's order-book replay is the same class —
SURVEY §2.8 ST3 — but these are the batch forms every events lake
serves):

- ``funnel_conversion`` — strictly-ordered view → click → purchase per
  user.  Spark side is the SCALE shape: ONE shuffle collects each
  user's (ts, type) events, and a codegen'd ``aggregate`` over the
  sorted array walks the funnel per user — no self-joins, no repeated
  event-table passes (the relational formulation joins the event table
  once per stage).  The DuckDB oracle IS that relational formulation
  (correlated stage-min joins), so the compare certifies the two
  semantics agree.  Per-user arrays are bounded by per-user activity;
  a pathological user caps at array memory, not shuffle width —
  the same per-key-bounded-state posture as the orderbook fold.

- ``retention_cohorts`` — users grouped by first-signup day, activity
  counted per week offset.  One per-user cohort aggregate, one
  co-partitioned user join, one (cohort, week) distinct-count — all
  map-side-combinable shuffles on bounded keys.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_datalake_spark.io import load_table
from crypto_datalake_spark.queries.registry import register

_FUNNEL = ("view", "click", "purchase")


@register(
    "funnel_conversion",
    sql="""
    WITH t1 AS (
      SELECT user_id, min(ts) AS ts1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS ts2
      FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.ts1
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS ts3
      FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.ts2
      WHERE e.event_type = 'purchase' GROUP BY 1
    ),
    n AS (
      SELECT (SELECT count(*) FROM t1) AS n1,
             (SELECT count(*) FROM t2) AS n2,
             (SELECT count(*) FROM t3) AS n3
    )
    SELECT stage, stage_idx, n_users, conv_from_prev, conv_from_start
    FROM (
      SELECT 'view' AS stage, CAST(1 AS BIGINT) AS stage_idx,
             CAST(n1 AS BIGINT) AS n_users,
             CAST(NULL AS DOUBLE) AS conv_from_prev,
             CAST(1.0 AS DOUBLE) AS conv_from_start
      FROM n
      UNION ALL
      SELECT 'click', 2, CAST(n2 AS BIGINT),
             CASE WHEN n1 > 0
                  THEN CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) END,
             CASE WHEN n1 > 0
                  THEN CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) END
      FROM n
      UNION ALL
      SELECT 'purchase', 3, CAST(n3 AS BIGINT),
             CASE WHEN n2 > 0
                  THEN CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE) END,
             CASE WHEN n1 > 0
                  THEN CAST(n3 AS DOUBLE) / CAST(n1 AS DOUBLE) END
      FROM n
    )
    """,
    doc="Strictly-ordered funnel (view → click → purchase): per user, "
    "the first view, the first click AFTER it, the first purchase "
    "after that; per-stage reached-user counts and conversion rates. "
    "Spark plan: ONE shuffle collects each user's (ts, type) pairs, a "
    "codegen'd aggregate over the sorted array walks the funnel — no "
    "per-stage self-joins, one event-table pass regardless of funnel "
    "depth. Oracle: the relational correlated-stage-min formulation, "
    "so the compare certifies the array walk implements exactly the "
    "strict-ordering semantics.",
)
def funnel_conversion(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(*_FUNNEL)
    )
    per_user = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_type"))
        ).alias("evts")
    )
    # stage walk: acc = (stage reached so far, ts of last stage hit);
    # advance on the next funnel event strictly after acc.t
    walk = F.aggregate(
        F.col("evts"),
        F.struct(
            F.lit(0).alias("stage"),
            F.lit(None).cast("timestamp_ntz").alias("t"),
        ),
        lambda acc, x: F.when(
            (acc.stage == 0) & (x.event_type == _FUNNEL[0]),
            F.struct(F.lit(1).alias("stage"), x.ts.alias("t")),
        )
        .when(
            (acc.stage == 1) & (x.event_type == _FUNNEL[1]) & (x.ts > acc.t),
            F.struct(F.lit(2).alias("stage"), x.ts.alias("t")),
        )
        .when(
            (acc.stage == 2) & (x.event_type == _FUNNEL[2]) & (x.ts > acc.t),
            F.struct(F.lit(3).alias("stage"), x.ts.alias("t")),
        )
        .otherwise(acc),
    )
    reached = per_user.select(walk.getField("stage").alias("max_stage"))
    counts = reached.agg(
        *[
            F.count(F.when(F.col("max_stage") >= k, 1)).alias(f"n{k}")
            for k in (1, 2, 3)
        ]
    )
    def rate(num: str, den: str):
        # NULL, not NaN/error, when the upstream stage is empty (ANSI-
        # safe on the Spark side, NaN-free on the DuckDB side)
        return F.when(
            F.col(den) > 0,
            F.col(num).cast("double") / F.col(den).cast("double"),
        )

    stages = []
    for k, name in enumerate(_FUNNEL, start=1):
        prev = (
            F.lit(None).cast("double")
            if k == 1
            else rate(f"n{k}", f"n{k-1}")
        )
        stages.append(
            counts.select(
                F.lit(name).alias("stage"),
                F.lit(k).cast("long").alias("stage_idx"),
                F.col(f"n{k}").alias("n_users"),
                prev.alias("conv_from_prev"),
                (
                    F.lit(1.0)
                    if k == 1
                    else rate(f"n{k}", "n1")
                ).alias("conv_from_start"),
            )
        )
    out = stages[0]
    for s in stages[1:]:
        out = out.unionAll(s)
    return out


@register(
    "retention_cohorts",
    sql="""
    WITH cohort AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day, min(ts) AS t0
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    act AS (
      SELECT c.cohort_day,
             CAST((CAST(e.ts AS DATE) - c.cohort_day) // 7 AS BIGINT)
               AS week_offset,
             e.user_id
      FROM events e JOIN cohort c ON e.user_id = c.user_id
      WHERE e.ts >= c.t0
    ),
    sz AS (
      SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
      FROM cohort GROUP BY 1
    )
    SELECT a.cohort_day, a.week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active,
           s.cohort_size,
           CAST(count(DISTINCT a.user_id) AS DOUBLE)
             / CAST(s.cohort_size AS DOUBLE) AS retention
    FROM act a JOIN sz s USING (cohort_day)
    GROUP BY 1, 2, s.cohort_size
    """,
    doc="Signup-cohort weekly retention: users grouped by first-signup "
    "day; any event at or after the signup counts as activity in its "
    "week offset from the cohort day. One per-user cohort aggregate, "
    "one user-key join (co-partitioned at scale), one "
    "(cohort, week_offset) distinct-count with map-side partial "
    "aggregation — bounded keys end-to-end, no windows, no self-join "
    "per week. Full static DuckDB oracle.",
)
def retention_cohorts(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    cohort = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
        .select("user_id", "t0", F.to_date("t0").alias("cohort_day"))
    )
    act = (
        e.join(cohort, "user_id")
        .where(F.col("ts") >= F.col("t0"))
        .select(
            "cohort_day",
            F.floor(
                F.datediff(F.to_date("ts"), F.col("cohort_day")) / 7
            )
            .cast("long")
            .alias("week_offset"),
            "user_id",
        )
    )
    sz = cohort.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        act.groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(F.broadcast(sz), "cohort_day")
        .select(
            "cohort_day",
            "week_offset",
            "n_active",
            "cohort_size",
            (
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("retention"),
        )
    )
