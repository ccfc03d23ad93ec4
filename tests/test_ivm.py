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


def test_all_null_measure_group_matches_recompute(spark, tmp_path):
    """The NULL-measure edge: when a CDC tick deletes a group's last
    non-null value, SQL's recomputed sum is NULL — the maintained state
    must say NULL too, not 0 (the signed-delta failure mode the per-
    measure non-null count exists to close)."""
    path = str(tmp_path / "lake")
    txn.atomic_upsert_partitioned(
        spark,
        _df(spark, [("A", _T(0), 5.0, "d1"), ("A", _T(1), None, "d1")]),
        path, **KW,
    )
    state = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)
    # delete the only non-null row: A keeps one (all-NULL) row
    txn.atomic_merge_into(
        spark,
        _df(spark, [("A", _T(0), 0.0, "d1")]),
        path,
        on=["sym", "ts"],
        partition_cols=["day"],
        delete_condition=F.lit(True),
        insert=False,
    )
    state = apply_delta(state, txn.table_diff(spark, path, 1, 2), KEYS, MEAS)
    want = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)
    assert _rows(state) == _rows(want)
    view = {r["sym"]: r for r in state_view(state, MEAS).collect()}
    assert view["A"]["v_sum"] is None          # NULL, never 0.0
    assert view["A"]["v_sum_avg"] is None
    assert view["A"]["n_rows"] == 1

    # and re-inserting a value resurrects the sum exactly
    txn.atomic_upsert_partitioned(
        spark, _df(spark, [("A", _T(2), 2.5, "d1")]), path, **KW
    )
    state = apply_delta(state, txn.table_diff(spark, path, 2, 3), KEYS, MEAS)
    assert _rows(state) == _rows(
        grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)
    )
    view = {r["sym"]: r for r in state_view(state, MEAS).collect()}
    assert view["A"]["v_sum"] == 2.5 and view["A"]["v_sum_avg"] == 2.5


# --------------------------------------------------------------- purge

def _all_generation_rows(spark, path):
    """Every row readable from ANY parquet file still on disk under the
    table (all generations, not just the live manifest)."""
    import glob

    files = glob.glob(f"{path}/**/*.parquet", recursive=True)
    if not files:
        return []
    return spark.read.parquet(*files).collect()


def test_purge_rows_erases_live_and_history(spark, tmp_path):
    path = str(tmp_path / "lake")
    txn.atomic_upsert_partitioned(
        spark,
        _df(spark, [("A", _T(0), 1.0, "d1"), ("B", _T(1), 2.0, "d1"),
                    ("B", _T(2), 3.0, "d2"), ("C", _T(3), 4.0, "d3")]),
        path, **KW,
    )
    # a second commit so pre-purge history exists
    txn.atomic_upsert_partitioned(
        spark, _df(spark, [("A", _T(4), 5.0, "d1")]), path, **KW
    )
    pre_purge_version = txn.current_manifest(spark, path)["version"]

    m = txn.purge_rows(spark, path, F.col("sym") == "B", ["day"])
    assert m is not None

    # live: B gone, everything else intact; d2 (all-B) vanished entirely
    live = {(r["sym"], r["day"]) for r in txn.read_table(spark, path).collect()}
    assert live == {("A", "d1"), ("C", "d3")}
    assert m["partitions"].keys() == {"day=d1", "day=d3"}

    # history: pre-purge manifests are gone -> time travel fails loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="vacuumed or never committed"):
        txn.read_table(spark, path, at_version=pre_purge_version)

    # NO file on disk — any generation — still holds a B row
    assert all(r["sym"] != "B" for r in _all_generation_rows(spark, path))


def test_purge_keeps_null_predicate_rows_and_untouched_generations(
    spark, tmp_path
):
    path = str(tmp_path / "lake")
    txn.atomic_upsert_partitioned(
        spark,
        _df(spark, [("A", _T(0), 1.0, "d1"), (None, _T(1), 2.0, "d1"),
                    ("C", _T(2), 3.0, "d2")]),
        path, **KW,
    )
    before = dict(txn.current_manifest(spark, path)["partitions"])
    # predicate is NULL for the NULL-sym row: it must SURVIVE the purge
    txn.purge_rows(spark, path, F.col("sym") == "A", ["day"])
    live = {(r["sym"], r["day"]) for r in txn.read_table(spark, path).collect()}
    assert live == {(None, "d1"), ("C", "d2")}
    # untouched d2 keeps its generation byte-for-byte
    after = dict(txn.current_manifest(spark, path)["partitions"])
    assert after["day=d2"] == before["day=d2"]
    assert after["day=d1"] != before["day=d1"]


def test_purge_no_match_is_a_noop(spark, tmp_path):
    path = str(tmp_path / "lake")
    txn.atomic_upsert_partitioned(
        spark, _df(spark, [("A", _T(0), 1.0, "d1")]), path, **KW
    )
    before = txn.current_manifest(spark, path)
    m = txn.purge_rows(spark, path, F.col("sym") == "ZZZ", ["day"])
    assert m["version"] == before["version"]  # no commit, history intact


# ------------------------------------------------------- data skipping

def test_manifest_data_skipping_prunes_and_stays_correct(spark, tmp_path):
    path = str(tmp_path / "lake")
    rows = [("A", _T(0), 1.0, "d1"), ("B", _T(1), 2.0, "d1"),
            ("C", _T(10), 10.0, "d2"), ("D", _T(11), 11.0, "d2"),
            ("E", _T(30), 30.0, "d3")]
    txn.atomic_upsert_partitioned(
        spark, _df(spark, rows), path, stats_cols=["v", "ts"], **KW
    )
    m = txn.current_manifest(spark, path)
    assert m["stats"]["day=d1"]["v"] == [1.0, 2.0]
    assert m["stats"]["day=d3"]["v"] == [30.0, 30.0]

    # v in [9, 12]: stats exclude d1 and d3 -> only d2 files listed
    df = txn.read_table_skipping(spark, path, {"v": (9.0, 12.0)})
    assert all("day=d2" in f for f in df.inputFiles())
    got = sorted(r["sym"] for r in df.where(F.col("v").between(9.0, 12.0)).collect())
    assert got == ["C", "D"]

    # timestamp bounds prune too (ISO rendering is order-preserving)
    df2 = txn.read_table_skipping(spark, path, {"ts": (_T(25), None)})
    assert all("day=d3" in f for f in df2.inputFiles())

    # stats refresh on rewrite: bump d1's values, old bounds must not
    # exclude the new rows
    txn.atomic_upsert_partitioned(
        spark, _df(spark, [("A", _T(0), 100.0, "d1")]), path,
        stats_cols=["v", "ts"], **KW,
    )
    m2 = txn.current_manifest(spark, path)
    assert m2["stats"]["day=d1"]["v"] == [2.0, 100.0]
    assert m2["stats"]["day=d2"] == m["stats"]["day=d2"]  # carried forward
    df3 = txn.read_table_skipping(spark, path, {"v": (50.0, None)})
    assert {r["sym"] for r in df3.where(F.col("v") >= 50.0).collect()} == {"A"}

    # nothing overlaps -> None (read nothing, open nothing)
    assert txn.read_table_skipping(spark, path, {"v": (1e6, None)}) is None


def test_data_skipping_safe_without_stats(spark, tmp_path):
    """A commit that records no stats disables skipping rather than
    mis-pruning: read_table_skipping reads everything and stays correct."""
    path = str(tmp_path / "lake")
    txn.atomic_upsert_partitioned(
        spark,
        _df(spark, [("A", _T(0), 1.0, "d1"), ("B", _T(10), 10.0, "d2")]),
        path, **KW,  # no stats_cols
    )
    df = txn.read_table_skipping(spark, path, {"v": (9.0, 12.0)})
    assert {r["day"] for r in df.collect()} == {"d1", "d2"}  # nothing pruned
    got = [r["sym"] for r in df.where(F.col("v").between(9.0, 12.0)).collect()]
    assert got == ["B"]


def test_stats_survive_merge_purge_and_compaction(spark, tmp_path):
    """Rewrite commits must not silently disable data skipping: merge
    and purge refresh stats for the partitions they rewrite and carry
    untouched ones forward; compaction (same rows) carries verbatim."""
    path = str(tmp_path / "lake")
    txn.atomic_upsert_partitioned(
        spark,
        _df(spark, [("A", _T(0), 1.0, "d1"), ("B", _T(1), 50.0, "d2")]),
        path, stats_cols=["v"], **KW,
    )
    # merge-delete the A row: d1 vanishes, d2's stats carry forward
    txn.atomic_merge_into(
        spark, _df(spark, [("A", _T(0), 0.0, "d1")]), path,
        on=["sym", "ts"], partition_cols=["day"],
        delete_condition=F.lit(True), insert=False,
    )
    m = txn.current_manifest(spark, path)
    assert m["stats"] == {"day=d2": {"v": [50.0, 50.0]}}
    assert txn.read_table_skipping(spark, path, {"v": (100.0, None)}) is None

    # upsert a new low-v row into d2, then purge it: d2's stats refresh
    txn.atomic_upsert_partitioned(
        spark, _df(spark, [("C", _T(2), 1.0, "d2")]), path,
        stats_cols=["v"], **KW,
    )
    assert txn.current_manifest(spark, path)["stats"]["day=d2"]["v"] == [1.0, 50.0]
    txn.purge_rows(spark, path, F.col("sym") == "C", ["day"])
    m2 = txn.current_manifest(spark, path)
    assert m2["stats"]["day=d2"]["v"] == [50.0, 50.0]  # fresh, not stale

    # compaction: same rows -> stats carry verbatim
    txn.compact_partitions(spark, path)
    assert txn.current_manifest(spark, path)["stats"] == m2["stats"]
    df = txn.read_table_skipping(spark, path, {"v": (40.0, 60.0)})
    assert [r["sym"] for r in df.collect()] == ["B"]


def test_wide_sum_keeps_widened_decimal_no_overflow(spark, tmp_path):
    """Spark widens a DECIMAL(28,6) sum to DECIMAL(38,6); the maintained
    state must keep that widened type through apply_delta.  A running
    sum past 28,6 capacity (>= 1e22) overflowed under a narrowing
    re-cast while a full recompute stayed correct — the exact
    maintained-vs-recomputed divergence this test pins shut."""
    path = str(tmp_path / "lake")
    big = 9.0e21  # two rows -> 1.8e22 > DECIMAL(28,6) capacity
    txn.atomic_upsert_partitioned(
        spark, _df(spark, [("A", _T(0), big, "d1")]), path, **KW
    )
    state = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)
    want = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)
    assert dict(state.dtypes) == dict(want.dtypes)

    txn.atomic_upsert_partitioned(
        spark, _df(spark, [("A", _T(1), big, "d1")]), path, **KW
    )
    state = apply_delta(state, txn.table_diff(spark, path, 1, 2), KEYS, MEAS)
    want = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)
    assert dict(state.dtypes) == dict(want.dtypes)  # still the sum type
    assert _rows(state) == _rows(want)
    (row,) = state.collect()
    assert row["v_sum"] is not None and float(row["v_sum"]) == 2 * big


# ------------------------------------------------------ streaming IVM

def test_streaming_maintained_view_bit_identical(spark, tmp_path):
    """availableNow stream through foreach_batch_upsert_maintained: after
    N micro-batches the maintained GROUP BY view is BIT-IDENTICAL to a
    recompute — including the all-NULL-measure group — and a crash
    window between the table commit and the view commit self-heals on
    the next tick (the view diffs from ITS recorded base, not from
    'the version before this batch')."""
    import time

    from crypto_datalake_spark.streaming.silver import (
        foreach_batch_upsert_maintained,
    )

    path = str(tmp_path / "lake")
    view = str(tmp_path / "view")
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    batches = [
        [("A", _T(0), 1.25, "d1"), ("B", _T(0), 3.0, "d2")],
        [("A", _T(1), 20.0, "d1"), ("C", _T(2), 5.0, "d3"),
         ("A", _T(0), 2.0, "d1")],                       # update A@t0
        [("D", _T(3), None, "d1"), ("D", _T(4), None, "d1")],  # NULL group
    ]
    for i, rows in enumerate(batches):
        _df(spark, rows).coalesce(1).write.parquet(str(incoming / f"f{i}"))
        time.sleep(1.05)  # file source orders batches by mod time

    sink = foreach_batch_upsert_maintained(
        spark, path, view,
        keys=["sym", "ts"], order_cols=["ts"], partition_cols=["day"],
        group_keys=KEYS, measures=MEAS,
    )
    q = (
        spark.readStream.schema("sym string, ts timestamp_ntz, v double, day string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(incoming) + "/*")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream timed out"

    def check():
        got = txn.read_table(spark, view)
        want = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)
        assert dict(got.dtypes) == dict(want.dtypes)
        assert _rows(got.select(*want.columns)) == _rows(want)
        view_rows = {r["sym"]: r for r in state_view(got, MEAS).collect()}
        return view_rows

    vr = check()
    assert vr["A"]["v_sum"] == 22.0 and vr["A"]["n_rows"] == 2
    assert vr["D"]["v_sum"] is None          # NULL, never 0.0

    # crash window: the TABLE moves without the view (exactly the state
    # a crash between the two commits leaves) — the next tick, even an
    # EMPTY batch, catches the view up from its recorded base
    txn.atomic_upsert_partitioned(
        spark, _df(spark, [("B", _T(9), 7.0, "d2")]), path, **KW
    )
    sink(spark.createDataFrame([], "sym string, ts timestamp_ntz, v double, day string"), 99)
    vr = check()
    assert vr["B"]["v_sum"] == 10.0

    # replay of an already-applied batch: content-idempotent upsert ->
    # empty diff -> view untouched (no double-count)
    sink(_df(spark, batches[1]), 1)
    vr = check()
    assert vr["A"]["v_sum"] == 22.0

    # vacuumed base: history truncated under the recorded view_of ->
    # one full recompute, then incremental again
    for i in range(4):  # push head far ahead, view left behind
        txn.atomic_upsert_partitioned(
            spark, _df(spark, [("E", _T(10 + i), float(i), "d4")]), path, **KW
        )
    txn.vacuum(spark, path, keep_manifests=1)
    sink(_df(spark, [("F", _T(20), 1.0, "d5")]), 100)
    vr = check()
    assert vr["E"]["v_sum"] == 0.0 + 1.0 + 2.0 + 3.0
    assert vr["F"]["v_sum"] == 1.0


def test_maintained_view_foreign_manifest_recomputes(spark, tmp_path):
    """A manifest at view_path that never recorded view_of (manual
    write, or a pre-IVM table being adopted) must trigger one full
    recompute — not a KeyError, not a stale serve."""
    from crypto_datalake_spark.streaming.silver import (
        foreach_batch_upsert_maintained,
    )

    path = str(tmp_path / "lake")
    view = str(tmp_path / "view")
    # a foreign (no view_of) manifest at the view path
    txn.atomic_overwrite(
        spark,
        spark.createDataFrame([("Z", 1)], "sym string, junk int"),
        view,
    )
    sink = foreach_batch_upsert_maintained(
        spark, path, view,
        keys=["sym", "ts"], order_cols=["ts"], partition_cols=["day"],
        group_keys=KEYS, measures=MEAS,
    )
    sink(_df(spark, [("A", _T(0), 2.5, "d1"), ("B", _T(1), 4.0, "d2")]), 0)
    got = txn.read_table(spark, view)
    want = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)
    assert _rows(got.select(*want.columns)) == _rows(want)
    assert txn.current_manifest(spark, view)["view_of"] == 1
    # and maintenance is incremental again from here
    sink(_df(spark, [("A", _T(2), 1.5, "d1")]), 1)
    got = txn.read_table(spark, view)
    want = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)
    assert _rows(got.select(*want.columns)) == _rows(want)


def test_maintained_view_recovers_after_empty_view_commit(spark, tmp_path):
    """An EMPTY committed view ({} partition map — base purged, every
    group retired) must keep maintaining when later non-empty batches
    arrive.  Pre-fix, the incremental path handed ``read_table``'s None
    straight to ``apply_delta`` (AttributeError on '.alias'), and since
    ``view_of`` never advanced the streaming query crash-looped on
    every restart.  Repro from round-9 ADVICE: sink(data) →
    purge_rows(everything) → sink(empty) → sink(new data)."""
    from crypto_datalake_spark.streaming.silver import (
        foreach_batch_upsert_maintained,
    )

    path = str(tmp_path / "lake")
    view = str(tmp_path / "view")
    sink = foreach_batch_upsert_maintained(
        spark, path, view,
        keys=["sym", "ts"], order_cols=["ts"], partition_cols=["day"],
        group_keys=KEYS, measures=MEAS,
    )
    sink(_df(spark, [("A", _T(0), 2.0, "d1"), ("B", _T(1), 3.0, "d2")]), 0)

    # purge EVERYTHING out-of-band: base manifest becomes {} partitions
    txn.purge_rows(spark, path, F.lit(True), ["day"])
    assert txn.current_manifest(spark, path)["partitions"] == {}

    # the next tick (empty batch) folds the view down to empty and
    # commits a {}-partition view manifest
    sink(_df(spark, []), 1)
    vm = txn.current_manifest(spark, view)
    assert vm["partitions"] == {}
    assert vm["view_of"] == txn.current_manifest(spark, path)["version"]

    # new data after the empty view commit: pre-fix this raised
    # AttributeError and crash-looped; post-fix the view catches up
    sink(_df(spark, [("C", _T(2), 5.0, "d3"), ("C", _T(3), 7.0, "d3")]), 2)
    got = txn.read_table(spark, view)
    assert got is not None
    want = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)
    assert _rows(got.select(*want.columns)) == _rows(want)
    assert (
        txn.current_manifest(spark, view)["view_of"]
        == txn.current_manifest(spark, path)["version"]
    )

    # and incremental again from here (no recompute-only recovery)
    sink(_df(spark, [("C", _T(4), 1.0, "d3"), ("D", _T(5), 9.0, "d4")]), 3)
    got = txn.read_table(spark, view)
    want = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)
    assert _rows(got.select(*want.columns)) == _rows(want)


def test_maintained_view_random_ops_property(spark, tmp_path):
    """Generalize the r9-ADVICE empty-view crash class: under RANDOM
    interleavings of maintained-sink ticks (incl. empty batches and
    null group keys), out-of-band purges (partial, full), and history
    vacuums, every sink tick must leave the view BIT-EQUAL to a full
    recompute of the then-current base table, with ``view_of`` at the
    base head — no crash, no stale serve, no lost delta."""
    from hypothesis import HealthCheck, example, given, settings
    from hypothesis import strategies as st

    from crypto_datalake_spark.streaming.silver import (
        foreach_batch_upsert_maintained,
    )

    row = st.tuples(
        st.sampled_from(["A", "B", None]),        # group key (null included)
        st.integers(0, 5),                        # minute -> ts (dup keys ok)
        st.sampled_from([1.25, 2.5, -3.0, 0.0]),  # value
        st.sampled_from(["d1", "d2"]),            # partition
    )
    # sink weighted 2x (the tick that must self-heal), purge_all 2x (the
    # r9 crash class lives downstream of a full purge)
    op = st.one_of(
        st.tuples(st.just("sink"), st.just([])),  # empty tick: the empty-
        # view-commit edge (r9 crash) needs one right after a full purge
        st.tuples(st.just("sink"), st.lists(row, min_size=1, max_size=4)),
        st.tuples(st.just("sink"), st.lists(row, min_size=1, max_size=4)),
        st.tuples(st.just("purge_sym"), st.sampled_from(["A", "B"])),
        st.tuples(st.just("purge_all"), st.none()),
        st.tuples(st.just("purge_all"), st.none()),
        st.tuples(st.just("vacuum"), st.none()),
    )
    counter = {"n": 0}

    @settings(
        deadline=None,
        max_examples=15,
        suppress_health_check=list(HealthCheck),
    )
    @given(ops=st.lists(op, min_size=3, max_size=7))
    # the r9 crash sequence, pinned so every run covers it (random draws
    # reach this 4-op ordered pattern only ~25% of the time per example)
    @example(ops=[
        ("sink", [("A", 0, 2.5, "d1")]),
        ("purge_all", None),
        ("sink", []),
        ("sink", [("B", 1, 1.25, "d2")]),
    ])
    def run(ops):
        counter["n"] += 1
        path = str(tmp_path / f"lake{counter['n']}")
        view = str(tmp_path / f"view{counter['n']}")
        sink = foreach_batch_upsert_maintained(
            spark, path, view,
            keys=["sym", "ts"], order_cols=["ts"], partition_cols=["day"],
            group_keys=KEYS, measures=MEAS,
        )
        batch_id = 0
        for kind, arg in ops:
            if kind == "sink":
                rows = [(s, _T(m), v, d) for s, m, v, d in arg]
                sink(_df(spark, rows), batch_id)
                batch_id += 1
            elif txn.current_manifest(spark, path) is None:
                continue  # nothing to purge/vacuum yet
            elif kind == "purge_sym":
                txn.purge_rows(spark, path, F.col("sym") == arg, ["day"])
            elif kind == "purge_all":
                txn.purge_rows(spark, path, F.lit(True), ["day"])
            else:
                txn.vacuum(spark, path, keep_manifests=1)
            if kind != "sink":
                continue
            # invariant after EVERY sink tick: view == full recompute
            m = txn.current_manifest(spark, path)
            if m is None:
                assert txn.current_manifest(spark, view) is None
                continue
            vm = txn.current_manifest(spark, view)
            assert vm is not None and vm["view_of"] == m["version"], ops
            got = txn.read_table(spark, view)
            base = txn.read_table(spark, path)
            if base is None:  # base purged empty -> view must be empty
                assert got is None or got.isEmpty(), ops
                continue
            want = grouped_agg_state(base, KEYS, MEAS)
            assert got is not None, ops
            assert _rows(got.select(*want.columns)) == _rows(want), ops

    run()


def test_recompute_tick_reads_manifest_lazily(spark, tmp_path, monkeypatch):
    """ADVICE r10: `_base_frame` used to resolve the manifest
    unconditionally, so every full-recompute tick paid a SECOND
    manifest read even when read_table returned a non-empty frame.
    The manifest thunk must resolve only on the empty-table path:
    a first tick over a non-empty table performs exactly the ONE
    `_manifest_at` read that read_table(at_version=head) itself does."""
    from crypto_datalake_spark.streaming.silver import (
        foreach_batch_upsert_maintained,
    )

    path = str(tmp_path / "lake")
    view = str(tmp_path / "view")
    sink = foreach_batch_upsert_maintained(
        spark, path, view,
        keys=["sym", "ts"], order_cols=["ts"], partition_cols=["day"],
        group_keys=KEYS, measures=MEAS,
    )

    calls = []
    real = txn._manifest_at

    def counting(spark_, table_path, version):
        calls.append((table_path, version))
        return real(spark_, table_path, version)

    monkeypatch.setattr(txn, "_manifest_at", counting)
    # first tick: vm is None -> full recompute via _base_frame(head)
    sink(_df(spark, [("A", _T(0), 1.0, "d1"), ("B", _T(1), 2.0, "d2")]), 0)
    monkeypatch.undo()

    base_reads = [c for c in calls if c[0] == path]
    assert len(base_reads) == 1, base_reads  # read_table's own, no extra

    got = {r["sym"]: r for r in state_view(txn.read_table(spark, view), MEAS).collect()}
    assert got["A"]["v_sum"] == 1.0 and got["B"]["v_sum"] == 2.0
