"""Spine joins, as-of alignment suite, anti-joins, gaps-and-islands —
SURVEY.md §2.3 (J1-J7) and §2.6 (O3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_datalake_spark.ops.agg import dsum
from crypto_datalake_spark.ops.asof import asof_join
from crypto_datalake_spark.ops.gaps import islands, missing_slots
from crypto_datalake_spark.ops.time import minute_spine
from crypto_datalake_spark.queries.common import SQL_SPINE, SPINE_END, SPINE_START, events
from crypto_datalake_spark.queries.registry import register

# Shared sub-frame: per-minute rollup of events inside the spine window.
_SQL_MINUTE_AGG = """
  SELECT date_trunc('minute', ts) AS minute_ts,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-08 00:00:00'
  GROUP BY 1
"""


def _minute_agg(spark, sf_dir):
    ev = events(spark, sf_dir).where(
        (F.col("ts") >= F.lit(SPINE_START).cast("timestamp_ntz"))
        & (F.col("ts") < F.lit(SPINE_END).cast("timestamp_ntz"))
    )
    return ev.groupBy("minute_ts").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
    )


@register(
    "j1_spine_left_join",
    sql=f"""
    WITH spine AS ({SQL_SPINE}),
    m AS ({_SQL_MINUTE_AGG})
    SELECT s.slot_ts,
           CAST(coalesce(m.n_events, 0) AS BIGINT) AS n_events,
           coalesce(m.sum_value, 0.0) AS sum_value
    FROM spine s LEFT JOIN m ON m.minute_ts = s.slot_ts
    """,
    doc="J1+P4: dense minute-spine densification + left equi-join + "
    "coalesce-to-zero (ref: transforms/minute_builder.py:93-143). The "
    "spine is generated distributed (spark.range), the join broadcasts "
    "whichever side is small under AQE.",
)
def j1_spine_left_join(spark, sf_dir):
    spine = minute_spine(spark, SPINE_START, SPINE_END, 1)
    m = _minute_agg(spark, sf_dir)
    return spine.join(
        m, spine.slot_ts == m.minute_ts, "left"
    ).select(
        "slot_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


@register(
    "j7_anti_join_gaps",
    sql=f"""
    WITH spine AS ({SQL_SPINE}),
    m AS (SELECT DISTINCT date_trunc('minute', ts) AS minute_ts FROM events)
    SELECT s.slot_ts FROM spine s
    WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.minute_ts = s.slot_ts)
    """,
    doc="J7: anti-join missing-slot detection "
    "(ref: aggregator/validator.py:45-52 missing-bucket ANTI index).",
)
def j7_anti_join_gaps(spark, sf_dir):
    spine = minute_spine(spark, SPINE_START, SPINE_END, 1)
    present = events(spark, sf_dir).select(F.col("minute_ts").alias("slot_ts"))
    return missing_slots(spine, present, "slot_ts")


@register(
    "o3_gaps_islands",
    sql="""
    WITH m AS (SELECT DISTINCT date_trunc('minute', ts) AS minute_ts FROM events
               WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'),
    g AS (
      SELECT minute_ts,
             CAST(epoch(minute_ts)/60 AS BIGINT)
               - row_number() OVER (ORDER BY minute_ts) AS grp
      FROM m
    )
    SELECT min(minute_ts) AS window_start,
           max(minute_ts) AS window_end,
           CAST(count(*) AS BIGINT) AS n_slots
    FROM g GROUP BY grp
    """,
    doc="O3: gaps-and-islands window coalescing of contiguous minutes "
    "(ref: aggregator/backfill.py:105-121 — driver-side loop there; a "
    "single window shuffle here).",
)
def o3_gaps_islands(spark, sf_dir):
    ev = events(spark, sf_dir).where(
        (F.col("ts") >= F.lit(SPINE_START).cast("timestamp_ntz"))
        & (F.col("ts") < F.lit(SPINE_END).cast("timestamp_ntz"))
    )
    m = ev.select("minute_ts").distinct()
    return islands(m, "minute_ts", 1)


# --- as-of suite -----------------------------------------------------------
# Left: 15-minute spine over week 1. Right: purchase events per user.
# DuckDB's native ASOF JOIN is the oracle (inclusive backward match), with
# the tolerance applied as a post-filter on match age, exactly as our
# asof_join does.

_SQL_ASOF_BASE = """
    WITH spine AS (
      SELECT u.user_id, s.slot_ts
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN ({spine}) s
      WHERE CAST(epoch(s.slot_ts) AS BIGINT) % 900 = 0
    ),
    src AS (
      SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
    )
"""


def _asof_spine(spark, sf_dir):
    spine = minute_spine(spark, SPINE_START, SPINE_END, 15)
    users = events(spark, sf_dir).select("user_id").distinct()
    return users.crossJoin(spine)


def _purchases(spark, sf_dir):
    # event_id rides along as the dedup tiebreak (ts alone is not a
    # total order); as-of consumers simply don't select it
    return (
        events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
    )


@register(
    "j2_asof_backward_tolerance",
    sql=_SQL_ASOF_BASE.format(spine=SQL_SPINE)
    + """
    SELECT s.user_id, s.slot_ts,
           CASE WHEN e.ts IS NOT NULL
                  AND e.ts >= s.slot_ts - INTERVAL 1800 SECOND
                THEN e.value END AS last_value
    FROM spine s
    ASOF LEFT JOIN src e
      ON s.user_id = e.user_id AND e.ts <= s.slot_ts
    """,
    doc="J2: backward as-of join with 30-min tolerance, per key "
    "(ref: transforms/minute_builder.py:418-444, L/S-ratio alignment; "
    "Polars join_asof(strategy='backward', tolerance=30m)). Implemented "
    "union+window — one shuffle, no range-join blowup.",
)
def j2_asof_backward_tolerance(spark, sf_dir):
    spine = _asof_spine(spark, sf_dir)
    src = _purchases(spark, sf_dir)
    out = asof_join(
        spine,
        src.withColumnRenamed("value", "last_value"),
        on="slot_ts",
        right_on="ts",
        by=["user_id"],
        value_cols=["last_value"],
        tolerance_seconds=1800,
    )
    return out.select("user_id", "slot_ts", "last_value")


@register(
    "j4_asof_at_close",
    sql=_SQL_ASOF_BASE.format(spine=SQL_SPINE)
    + """
    SELECT s.user_id, s.slot_ts, e.value AS close_value
    FROM spine s
    ASOF LEFT JOIN src e
      ON s.user_id = e.user_id AND e.ts <= s.slot_ts + INTERVAL 15 MINUTE
    """,
    doc="J4: as-of backward evaluated at bar CLOSE (left key shifted by the "
    "bar length before matching; ref: live_data_api_service/alignment.py:69-80, "
    "funding 'last known as of close').",
)
def j4_asof_at_close(spark, sf_dir):
    spine = _asof_spine(spark, sf_dir)
    src = _purchases(spark, sf_dir)
    out = asof_join(
        spine,
        src.withColumnRenamed("value", "close_value"),
        on="slot_ts",
        right_on="ts",
        by=["user_id"],
        value_cols=["close_value"],
        shift_left_seconds=900,
    )
    return out.select("user_id", "slot_ts", "close_value")


@register(
    "j5_asof_max_age",
    sql=_SQL_ASOF_BASE.format(spine=SQL_SPINE)
    + """
    SELECT s.user_id, s.slot_ts,
           CASE WHEN e.ts >= s.slot_ts - INTERVAL 900 SECOND
                THEN e.value END AS fresh_value,
           CASE WHEN e.ts >= s.slot_ts - INTERVAL 900 SECOND
                THEN e.ts END AS matched_ts
    FROM spine s
    ASOF LEFT JOIN src e
      ON s.user_id = e.user_id AND e.ts <= s.slot_ts
    """,
    doc="J5: FORWARD_FILL_WITH_MAX_AGE — as-of backward then null-out "
    "matches older than one bar (ref: alignment.py:81-92; "
    "service.py:1286-1301 freshness gate).",
)
def j5_asof_max_age(spark, sf_dir):
    spine = _asof_spine(spark, sf_dir)
    src = _purchases(spark, sf_dir)
    out = asof_join(
        spine,
        src.withColumnRenamed("value", "fresh_value"),
        on="slot_ts",
        right_on="ts",
        by=["user_id"],
        value_cols=["fresh_value"],
        tolerance_seconds=900,
        matched_ts_col="matched_ts",
    )
    return out.select("user_id", "slot_ts", "fresh_value", "matched_ts")


@register(
    "j3_exact_bucket_align",
    sql=f"""
    WITH bars AS (
      SELECT DISTINCT TIMESTAMP '1970-01-01 00:00:00'
        + to_seconds(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT)) AS bucket_ts
      FROM events
      WHERE ts >= TIMESTAMP '{SPINE_START}' AND ts < TIMESTAMP '{SPINE_END}'
    ),
    aux AS (
      SELECT TIMESTAMP '1970-01-01 00:00:00'
        + to_seconds(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT)) AS bucket_ts,
             value AS aux_value
      FROM events WHERE event_type = 'purchase'
      QUALIFY row_number() OVER (
        PARTITION BY TIMESTAMP '1970-01-01 00:00:00'
          + to_seconds(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT))
        ORDER BY ts DESC, event_id DESC
      ) = 1
    )
    SELECT b.bucket_ts, a.aux_value
    FROM bars b LEFT JOIN aux a USING (bucket_ts)
    """,
    doc="J3: EXACT_TIMESTAMP alignment — normalize the aux series timestamp "
    "to the bar-open bucket (keep-last within bucket), then left equi-join "
    "(ref: live_data_api_service/alignment.py:15-34, 37-79). Equi-join on "
    "the bucketed key → plain hash join, broadcastable aux side.",
)
def j3_exact_bucket_align(spark, sf_dir):
    from crypto_datalake_spark.ops.dedup import keep_last
    from crypto_datalake_spark.ops.time import bucket_floor

    ev = events(spark, sf_dir)
    bars = (
        ev.where(
            (F.col("ts") >= F.lit(SPINE_START).cast("timestamp_ntz"))
            & (F.col("ts") < F.lit(SPINE_END).cast("timestamp_ntz"))
        )
        .select(bucket_floor("ts", 15).alias("bucket_ts"))
        .distinct()
    )
    aux = keep_last(
        ev.where(F.col("event_type") == "purchase").withColumn(
            "bucket_ts", bucket_floor("ts", 15)
        ),
        ["bucket_ts"],
        ["ts", "event_id"],
    ).select("bucket_ts", F.col("value").alias("aux_value"))
    return bars.join(aux, "bucket_ts", "left")


@register(
    "j6_exact_asof_fallback",
    sql=_SQL_ASOF_BASE.format(spine=SQL_SPINE)
    + """
    , exact AS (
      SELECT user_id,
             TIMESTAMP '1970-01-01 00:00:00'
               + to_seconds(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT)) AS slot_ts,
             value AS exact_value
      FROM src
      QUALIFY row_number() OVER (
        PARTITION BY user_id, TIMESTAMP '1970-01-01 00:00:00'
          + to_seconds(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT))
        ORDER BY ts DESC, event_id DESC
      ) = 1
    ),
    asof_m AS (
      SELECT s.user_id, s.slot_ts,
             CASE WHEN e.ts >= s.slot_ts - INTERVAL 900 SECOND
                  THEN e.value END AS asof_value
      FROM spine s
      ASOF LEFT JOIN src e ON s.user_id = e.user_id AND e.ts <= s.slot_ts
    )
    SELECT s.user_id, s.slot_ts,
           coalesce(x.exact_value, a.asof_value) AS value,
           CASE WHEN x.exact_value IS NOT NULL THEN 'exact'
                WHEN a.asof_value IS NOT NULL THEN 'asof'
                ELSE 'none' END AS align_path
    FROM spine s
    LEFT JOIN exact x ON x.user_id = s.user_id AND x.slot_ts = s.slot_ts
    LEFT JOIN asof_m a ON a.user_id = s.user_id AND a.slot_ts = s.slot_ts
    """,
    doc="J6: exact→as-of fallback cascade — try exact bucket alignment, "
    "fall back to as-of-backward capped at one bar, record which path "
    "populated each bar (ref: live_data_api_service/service.py:1259-1301). "
    "Both branches share the spine scan; coalesce picks per-row.",
)
def j6_exact_asof_fallback(spark, sf_dir):
    from crypto_datalake_spark.ops.dedup import keep_last
    from crypto_datalake_spark.ops.time import bucket_floor

    spine = _asof_spine(spark, sf_dir)
    src = _purchases(spark, sf_dir)
    exact = keep_last(
        src.withColumn("slot_ts", bucket_floor("ts", 15)),
        ["user_id", "slot_ts"],
        ["ts", "event_id"],  # event_id tiebreak: ts alone is not a total
        # order, so same-ts purchases would pick a shuffle-dependent row
    ).select("user_id", "slot_ts", F.col("value").alias("exact_value"))
    # The as-of output preserves every spine row (left semantics), so the
    # exact arm joins onto it directly — the spine is evaluated once, not
    # three times, and two exchanges drop out of the plan.
    asof = asof_join(
        spine,
        src.withColumnRenamed("value", "asof_value"),
        on="slot_ts",
        right_on="ts",
        by=["user_id"],
        value_cols=["asof_value"],
        tolerance_seconds=900,
    ).select("user_id", "slot_ts", "asof_value")
    return (
        asof.join(exact, ["user_id", "slot_ts"], "left")
        .select(
            "user_id",
            "slot_ts",
            F.coalesce("exact_value", "asof_value").alias("value"),
            F.when(F.col("exact_value").isNotNull(), "exact")
            .when(F.col("asof_value").isNotNull(), "asof")
            .otherwise("none")
            .alias("align_path"),
        )
    )


@register(
    "j8_overlay_coalesce",
    sql="""
    WITH base AS (
      SELECT event_id, user_id, value,
             CASE WHEN event_type = 'error' THEN TRUE ELSE FALSE END AS flag
      FROM events
    ),
    live AS (
      SELECT event_id, value * 10.0 AS live_value,
             CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
                  THEN TRUE ELSE FALSE END AS live_flag
      FROM events WHERE event_type IN ('purchase', 'click')
    )
    SELECT b.event_id, b.user_id,
           coalesce(l.live_value, b.value) AS value,
           (b.flag OR coalesce(l.live_flag, FALSE)) AS flag
    FROM base b LEFT JOIN live l USING (event_id)
    """,
    doc="J8/S6: left join + column-wise overlay merge — prefer-live "
    "coalesce for values, boolean OR for coverage flags "
    "(ref: live_data_api_service/service.py:968-1034; writer/atomic.py:65-97 "
    "LIVE_ONLY preservation).",
)
def j8_overlay_coalesce(spark, sf_dir):
    from crypto_datalake_spark.queries.common import spread

    # the live branch's JSON parse runs before the join's exchange —
    # spread an under-parallel scan so it isn't single-task (identity
    # at scale; the a8/spread doctrine)
    ev = spread(events(spark, sf_dir))
    base = ev.select(
        "event_id",
        "user_id",
        "value",
        (F.col("event_type") == "error").alias("flag"),
    )
    live = ev.where(F.col("event_type").isin("purchase", "click")).select(
        "event_id",
        (F.col("value") * 10.0).alias("live_value"),
        (F.get_json_object("props", "$.k").cast("long") >= 50).alias("live_flag"),
    )
    return base.join(live, "event_id", "left").select(
        "event_id",
        "user_id",
        F.coalesce("live_value", "value").alias("value"),
        (F.col("flag") | F.coalesce("live_flag", F.lit(False))).alias("flag"),
    )


@register(
    "o5_user_sessions",
    sql="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
        CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS brk
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    grp AS (
      SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM ordered
    )
    SELECT user_id, session_id,
      min(ts) AS session_start, max(ts) AS session_end,
      CAST(count(*) AS BIGINT) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM grp GROUP BY 1, 2
    """,
    doc="Sessionization (gaps-and-islands over event rows): per-user "
    "sessions split at >30-minute inactivity gaps, with per-session "
    "aggregates. One sort-shuffle on user_id; lag + running sum share "
    "the window; the session agg reuses the same partitioning so no "
    "second exchange. Batch twin of streaming.sessions.session_stream "
    "(transformWithStateInPandas) — equivalence is tested in "
    "tests/test_streaming.py. event_id breaks timestamp ties so "
    "boundaries are deterministic.",
)
def o5_user_sessions(spark, sf_dir):
    from crypto_datalake_spark.ops.gaps import sessionize

    ev = events(spark, sf_dir).where(
        (F.col("ts") >= F.lit(SPINE_START).cast("timestamp_ntz"))
        & (F.col("ts") < F.lit(SPINE_END).cast("timestamp_ntz"))
    )
    sess = sessionize(
        ev.select("user_id", "event_id", "ts", "value"),
        "ts",
        30,
        by=["user_id"],
        order_tiebreak=["event_id"],
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
    )
