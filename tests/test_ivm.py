"""Incremental view maintenance over the txn CDC feed: delta-apply must
equal a full recompute BIT-EXACTLY at every version — updates, new
groups, retired groups, null keys, and repeated ticks without drift.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from crypto_datalake_spark import txn
from crypto_datalake_spark.ops.ivm import (
    apply_delta,
    grouped_agg_state,
    state_view,
)

_T = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
KW = dict(keys=["sym", "ts"], order_cols=["ts"], partition_cols=["day"])
KEYS = ["sym"]
MEAS = {"v_sum": "v"}


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "sym string, ts timestamp_ntz, v double, day string"
    )


def _rows(state):
    # None-tolerant deterministic ordering; values compared exactly
    return sorted(
        (tuple(r) for r in state.collect()),
        key=lambda t: [(v is None, str(v)) for v in t],
    )


def test_delta_apply_equals_recompute_across_versions(spark, tmp_path):
    path = str(tmp_path / "lake")
    txn.atomic_upsert_partitioned(
        spark,
        _df(spark, [("A", _T(0), 1.25, "d1"), ("A", _T(1), 2.5, "d1"),
                    ("B", _T(0), 3.0, "d2")]),
        path, **KW,
    )
    state = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)

    # v2: update A, introduce C (new group + new partition)
    txn.atomic_upsert_partitioned(
        spark,
        _df(spark, [("A", _T(1), 20.0, "d1"), ("C", _T(2), 5.0, "d3")]),
        path, **KW,
    )
    state = apply_delta(state, txn.table_diff(spark, path, 1, 2), KEYS, MEAS)
    want = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)
    assert _rows(state) == _rows(want)

    # v3: delete every B row -> the B group must retire from the state
    txn.atomic_merge_into(
        spark,
        _df(spark, [("B", _T(0), 0.0, "d2")]),
        path,
        on=["sym", "ts"],
        partition_cols=["day"],
        delete_condition=F.lit(True),
        insert=False,
    )
    state = apply_delta(state, txn.table_diff(spark, path, 2, 3), KEYS, MEAS)
    want = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)
    assert _rows(state) == _rows(want)
    assert all(r[0] != "B" for r in _rows(state))

    # serving shape: exact-sum / exact-count average
    view = {r["sym"]: r for r in state_view(state, MEAS).collect()}
    assert view["A"]["v_sum"] == 21.25 and view["A"]["n_rows"] == 2
    assert view["A"]["v_sum_avg"] == 21.25 / 2


def test_many_ticks_no_drift(spark, tmp_path):
    """Ten maintenance ticks of float-valued churn: decimal state keeps
    delta-apply EXACTLY equal to recompute at every tick (the float-IVM
    failure mode this module exists to rule out)."""
    path = str(tmp_path / "lake")
    txn.atomic_upsert_partitioned(
        spark, _df(spark, [("A", _T(0), 0.1, "d1")]), path, **KW
    )
    state = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)
    for tick in range(1, 11):
        txn.atomic_upsert_partitioned(
            spark,
            _df(spark, [("A", _T(tick), 0.1 * tick, "d1"),
                        ("A", _T(tick - 1), 0.3, "d1")]),
            path, **KW,
        )
        state = apply_delta(
            state, txn.table_diff(spark, path, tick, tick + 1), KEYS, MEAS
        )
        want = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)
        assert _rows(state) == _rows(want), f"drift at tick {tick}"


def test_null_group_key_maintains(spark, tmp_path):
    path = str(tmp_path / "lake")
    txn.atomic_upsert_partitioned(
        spark,
        _df(spark, [(None, _T(0), 1.0, "d1"), ("A", _T(1), 2.0, "d1")]),
        path, **KW,
    )
    state = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)
    txn.atomic_upsert_partitioned(
        spark, _df(spark, [(None, _T(2), 4.0, "d1")]), path, **KW
    )
    state = apply_delta(state, txn.table_diff(spark, path, 1, 2), KEYS, MEAS)
    want = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)
    assert _rows(state) == _rows(want)
    nulls = [r for r in state.collect() if r["sym"] is None]
    assert len(nulls) == 1 and nulls[0]["__n_rows"] == 2
