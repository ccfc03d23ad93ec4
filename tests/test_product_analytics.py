"""Funnel/retention semantics the corpus-level oracle can't isolate:
strict event ordering, non-converting orders, cohort week boundaries.

Oracle parity for both registered queries is swept by
tests/test_oracle_parity.py.
"""

from __future__ import annotations

from crypto_datalake_spark.queries import REGISTRY


def _events(spark, rows):
    df = spark.createDataFrame(
        [(i, ts, uid, et, 0.0, "{}") for i, (ts, uid, et) in enumerate(rows)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    )
    from pyspark.sql import functions as F

    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def _run_funnel(spark, rows, monkeypatch, tmp_path):
    import crypto_datalake_spark.queries.product_analytics as pa

    ev = _events(spark, rows)
    monkeypatch.setattr(pa, "load_table", lambda s, d, n: ev)
    out = REGISTRY["funnel_conversion"].fn(spark, str(tmp_path))
    return {r["stage"]: r for r in out.collect()}


def test_funnel_requires_strict_order(spark, monkeypatch, tmp_path):
    rows = [
        # user 1: full ordered funnel
        ("2024-01-01 00:00:00", 1, "view"),
        ("2024-01-01 01:00:00", 1, "click"),
        ("2024-01-01 02:00:00", 1, "purchase"),
        # user 2: purchase BEFORE click — stops at click
        ("2024-01-01 00:00:00", 2, "view"),
        ("2024-01-01 02:00:00", 2, "click"),
        ("2024-01-01 01:00:00", 2, "purchase"),
        # user 3: click before any view — never enters the funnel past view?
        # no view at all: not counted anywhere
        ("2024-01-01 00:00:00", 3, "click"),
        ("2024-01-01 01:00:00", 3, "purchase"),
        # user 4: view only
        ("2024-01-01 00:00:00", 4, "view"),
    ]
    out = _run_funnel(spark, rows, monkeypatch, tmp_path)
    assert out["view"]["n_users"] == 3          # users 1, 2, 4
    assert out["click"]["n_users"] == 2         # users 1, 2
    assert out["purchase"]["n_users"] == 1      # user 1 only
    assert out["purchase"]["conv_from_prev"] == 0.5
    assert out["purchase"]["conv_from_start"] == 1 / 3
    assert out["view"]["conv_from_prev"] is None


def test_funnel_uses_first_view_not_best_view(spark, monkeypatch, tmp_path):
    # the click precedes the FIRST view but follows a later view: the
    # strict semantics anchor on the first view, so no conversion
    rows = [
        ("2024-01-01 02:00:00", 1, "view"),
        ("2024-01-01 01:00:00", 1, "click"),
        ("2024-01-01 00:30:00", 1, "view"),  # first view is 00:30
        ("2024-01-01 03:00:00", 1, "purchase"),
    ]
    out = _run_funnel(spark, rows, monkeypatch, tmp_path)
    assert out["view"]["n_users"] == 1
    # click at 01:00 IS after first view 00:30 -> converts; purchase after
    assert out["click"]["n_users"] == 1
    assert out["purchase"]["n_users"] == 1

    rows2 = [
        ("2024-01-01 02:00:00", 1, "view"),
        ("2024-01-01 01:00:00", 1, "click"),  # before the only view
        ("2024-01-01 03:00:00", 1, "purchase"),
    ]
    out2 = _run_funnel(spark, rows2, monkeypatch, tmp_path)
    assert out2["click"]["n_users"] == 0
    # purchase can't fire without a click stage
    assert out2["purchase"]["n_users"] == 0


def test_retention_week_boundaries(spark, monkeypatch, tmp_path):
    import crypto_datalake_spark.queries.product_analytics as pa

    rows = [
        ("2024-01-01 12:00:00", 1, "signup"),
        ("2024-01-07 23:00:00", 1, "click"),   # day 6 -> week 0
        ("2024-01-08 01:00:00", 1, "view"),    # day 7 -> week 1
        ("2024-01-22 01:00:00", 1, "view"),    # day 21 -> week 3
        ("2023-12-31 01:00:00", 1, "view"),    # BEFORE signup: excluded
        ("2024-01-01 00:00:00", 2, "signup"),  # same cohort day
    ]
    ev = _events(spark, rows)
    monkeypatch.setattr(pa, "load_table", lambda s, d, n: ev)
    out = REGISTRY["retention_cohorts"].fn(spark, str(tmp_path))
    got = {
        (str(r["cohort_day"]), r["week_offset"]): r for r in out.collect()
    }
    key0 = ("2024-01-01", 0)
    assert got[key0]["cohort_size"] == 2
    # week 0 actives: user 1 (signup + day-6 click) and user 2 (signup)
    assert got[key0]["n_active"] == 2 and got[key0]["retention"] == 1.0
    assert got[("2024-01-01", 1)]["n_active"] == 1
    assert got[("2024-01-01", 3)]["n_active"] == 1
    assert ("2023-12-26", 0) not in got and all(
        k[1] >= 0 for k in got
    ), "pre-signup activity must not create negative weeks"


def test_funnel_plan_one_event_pass_no_python(spark, sf_dir):
    from tests.test_scale_plans import plan_text

    p = plan_text(REGISTRY["funnel_conversion"].fn(spark, sf_dir), "simple")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "SortMergeJoin" not in p  # no per-stage self-joins
    # one scan per stage-row of the tiny counts frame is fine; the
    # events table must be aggregated (no join against itself)
    assert "CartesianProduct" not in p


def test_dq_expectations_counts_each_rule(spark, monkeypatch, tmp_path):
    # dq_expectations imports load_table from io at call time
    import crypto_datalake_spark.io as cio

    rows = [
        ("2024-01-05 00:00:00", 1, "view"),         # clean
        ("2024-01-05 00:01:00", 1, "teleport"),     # unknown type
        ("2023-12-31 23:59:59", 2, "click"),        # out of 2024
        ("2024-01-05 00:02:00", 2, "purchase"),     # dup event_id below
    ]
    df = spark.createDataFrame(
        [
            (i if i < 3 else 0, ts, uid, et, v, "{}")
            for i, ((ts, uid, et), v) in enumerate(
                zip(rows, [1.0, -2.0, 500.0, 1.0])
            )
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    )
    from pyspark.sql import functions as F

    ev = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    monkeypatch.setattr(cio, "load_table", lambda s, d, n: ev)
    out = {
        r["rule"]: r
        for r in REGISTRY["dq_expectations"].fn(spark, str(tmp_path)).collect()
    }
    assert out["value_positive"]["n_violations"] == 1        # -2.0
    assert out["value_below_cap"]["n_violations"] == 1       # 500.0
    assert out["event_type_known"]["n_violations"] == 1      # teleport
    assert out["ts_in_2024"]["n_violations"] == 1            # 2023 row
    assert out["event_id_unique"]["n_violations"] == 1       # id 0 twice
    assert all(not out[r]["passed"] for r in out)
    assert all(out[r]["n_rows"] == 4 for r in out)


def test_token_budget_plan_hits_target_in_expectation(spark, sf_dir):
    from crypto_datalake_spark.queries import REGISTRY

    rows = REGISTRY["sample_token_budget_plan"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # expected sampled tokens = rate * avail * epochs == target (9dp)
        assert abs(
            r["rate"] * r["avail_tokens"] * r["epochs"] - r["target_tokens"]
        ) < max(1e-6 * r["target_tokens"], 1e-3)
        assert 0.0 < r["rate"] <= 1.0
        assert r["epochs"] >= 1
        # upsampling only when the domain is genuinely short of tokens
        assert (r["epochs"] > 1) == (r["avail_tokens"] < r["target_tokens"])


def test_token_budget_plan_downsamples_rich_domains(spark, monkeypatch, tmp_path):
    # the planner reads via queries.common.t, which bound load_table at
    # import time — patch the binding common actually calls
    import crypto_datalake_spark.queries.common as cio
    from crypto_datalake_spark.queries import REGISTRY

    body = "tok " * 60_000  # one domain holds the whole budget many times
    docs = spark.createDataFrame(
        [(1, body.strip(), "en", "rich", len(body)),
         (2, "tiny doc", "en", "poor", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(cio, "load_table", lambda s, d, n: docs)
    out = {
        r["source"]: r
        for r in REGISTRY["sample_token_budget_plan"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    rich, poor = out["rich"], out["poor"]
    assert rich["epochs"] == 1 and rich["rate"] < 1.0   # downsample
    assert poor["epochs"] > 1                            # upsample by repeat
    assert rich["target_tokens"] == poor["target_tokens"] == 25_000.0


def test_quantile_bins_balanced_and_null_safe(spark, monkeypatch, tmp_path):
    # features_q binds load_table at module import — patch its binding
    import crypto_datalake_spark.queries.features_q as cio
    from crypto_datalake_spark.queries import REGISTRY
    from pyspark.sql import functions as F

    # values 1..8 in one type: quartile edges 2/4/6 -> two rows per bin;
    # plus a NULL value that must keep a NULL bin
    rows = [(i, "2024-01-05 00:00:00", 1, "click", float(i), "{}") for i in range(1, 9)]
    rows.append((9, "2024-01-05 00:00:00", 1, "click", None, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    monkeypatch.setattr(cio, "load_table", lambda s, d, n: ev)
    out = {
        r["event_id"]: r["bin"]
        for r in REGISTRY["feature_quantile_bins"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 3, 8: 3, 9: None}


def test_target_encode_leaves_one_out(spark, monkeypatch, tmp_path):
    import crypto_datalake_spark.queries.features_q as cio
    from crypto_datalake_spark.queries import REGISTRY
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-05 00:00:00", 1, "click", 10.0, "{}"),
        (2, "2024-01-05 00:01:00", 1, "click", 20.0, "{}"),
        (3, "2024-01-05 00:02:00", 1, "click", 30.0, "{}"),
        (4, "2024-01-05 00:03:00", 1, "view", 7.0, "{}"),   # singleton
        (5, "2024-01-05 00:04:00", 1, "click", None, "{}"),  # null target
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    monkeypatch.setattr(cio, "load_table", lambda s, d, n: ev)
    out = {
        r["event_id"]: r["te"]
        for r in REGISTRY["feature_target_encode"].fn(spark, str(tmp_path)).collect()
    }
    assert out[1] == 25.0 and out[2] == 20.0 and out[3] == 15.0  # LOO means
    assert out[4] is None  # singleton category: no peers to average
    assert out[5] is None  # null target contributes nothing, encodes nothing
