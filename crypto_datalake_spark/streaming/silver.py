"""Silver-table maintenance: streaming upsert sink + retention (ST9-ST12).

Reference: per-minute features are upserted into SQLite
(websocket.py:723-796), merged memory∪store at read (ST9, :901-1127), and
raw events are retention-pruned (ST10, :798-899). Late data is repaired by
re-aggregating recent windows (ST11, aggregator/incremental.py:51-57).

Spark realization:
- ``foreach_batch_upsert`` — every micro-batch MERGEs into the partitioned
  silver lake via sinks.upsert_partitioned; idempotent per key, so
  at-least-once delivery is safe (checkpoint + keep-last = exactly-once
  effect on the table).
- ``retention_delete`` — partition-granular delete: rewrites nothing, just
  drops whole partition directories older than the cutoff (the Delta
  ``DELETE WHERE`` analogue for plain parquet).
- query-time overlay (ST12) is a plain union-keep-last of silver over
  batch — ops.dedup.union_dedup already covers it.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_datalake_spark.sinks import upsert_partitioned


def foreach_batch_upsert(
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
    partition_cols: Sequence[str],
    derive_partitions: Callable[[DataFrame], DataFrame] | None = None,
    atomic: bool = False,
    stats_cols: Sequence[str] = (),
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function that upserts each micro-batch.

    ``atomic=True`` commits each micro-batch through the generation
    manifest (``txn.atomic_upsert_partitioned``): a driver crash mid-batch
    leaves readers on the previous generation instead of a half-written
    batch, and the streaming checkpoint replays the batch into a clean
    retry — exactly-once table state even across multi-partition batches.
    ``stats_cols`` (atomic only) records per-partition min/max column
    stats in each commit so readers can manifest-prune
    (``txn.read_table_skipping``) the streamed table.
    """

    if stats_cols and not atomic:
        raise ValueError(
            "stats_cols requires atomic=True — only manifest commits can "
            "record data-skipping stats; a silent drop would surface as "
            "an unprunable table at read time"
        )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if derive_partitions is not None:
            batch_df = derive_partitions(batch_df)
        if batch_df.isEmpty():
            return
        if atomic:
            from crypto_datalake_spark.txn import atomic_upsert_partitioned

            atomic_upsert_partitioned(
                spark, batch_df, path,
                keys=keys, order_cols=order_cols, partition_cols=partition_cols,
                stats_cols=stats_cols,
            )
        else:
            upsert_partitioned(
                spark, batch_df, path,
                keys=keys, order_cols=order_cols, partition_cols=partition_cols,
            )

    return _sink


def foreach_batch_upsert_maintained(
    spark: SparkSession,
    path: str,
    view_path: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
    partition_cols: Sequence[str],
    group_keys: Sequence[str],
    measures: dict[str, str],
    derive_partitions: Callable[[DataFrame], DataFrame] | None = None,
    stats_cols: Sequence[str] = (),
) -> Callable[[DataFrame, int], None]:
    """:func:`foreach_batch_upsert` (atomic) plus streaming IVM: after
    each micro-batch's manifest commit, the materialized ``GROUP BY
    group_keys`` sum/count/avg view at ``view_path`` catches up by
    folding ``txn.table_diff`` as signed decimal deltas (ops/ivm) —
    BIT-IDENTICAL to a recompute at every commit, priced at the churn.

    Crash/replay discipline (the at-least-once contract): the view's
    manifest records ``view_of`` = the BASE-table version it reflects,
    and each tick diffs from THAT recorded version to the new head —
    never from "the version before this batch" — so a crash between the
    table commit and the view commit just widens the next tick's diff
    window instead of silently losing a delta, and a checkpoint replay
    (content-idempotent upsert ⇒ empty diff ⇒ ``view_of`` already at
    head) is a no-op.  If the recorded base has been vacuumed out of the
    table's history, maintenance degrades to one full recompute and
    resumes incrementally from the new head."""
    from crypto_datalake_spark import txn
    from crypto_datalake_spark.ops.ivm import apply_delta, grouped_agg_state
    from crypto_datalake_spark.sinks import frame_schema_hash

    base_sink = foreach_batch_upsert(
        spark, path, keys, order_cols, partition_cols,
        derive_partitions=derive_partitions, atomic=True,
        stats_cols=stats_cols,
    )
    gk, ms = list(group_keys), dict(measures)

    def _commit_view(state: DataFrame, head: int, base_version):
        import json as _json

        state = state.localCheckpoint()  # isEmpty + write share one run
        extra = dict(
            base_version=base_version,
            schema_hash=frame_schema_hash(state),
            table_schema=_json.loads(state.schema.json()),
            view_of=head,
        )
        if state.isEmpty():
            # an EMPTY view (emptied base, or all groups retired) commits
            # an empty partition map — writing a zero-row generation
            # would publish a directory the manifest points at but the
            # writer never materialized (PATH_NOT_FOUND on read)
            txn.commit_manifest(spark, view_path, {}, **extra)
            return
        gid = txn.write_generation(state, view_path, [])
        txn.commit_manifest(spark, view_path, {txn.ROOT_PART: gid}, **extra)

    def _frame_or_empty(df: DataFrame | None, manifest_thunk, what: str):
        """``read_table`` result, or a zero-row frame rebuilt from the
        manifest's recorded ``table_schema`` when the table is EMPTY
        ({} partition map).  Both the base (externally purged) and the
        view (committed empty after a purge) hit this: handing
        read_table's None onward would crash every restart — the
        streaming query crash-loops because ``view_of`` never
        advances.  ``manifest_thunk`` is a zero-arg callable so the
        COMMON tick (non-empty table) never pays the manifest read —
        only the empty-frame path resolves it."""
        if df is not None:
            return df
        st = txn._manifest_struct(manifest_thunk())
        if st is None:  # pre-schema manifest AND no partitions
            raise ValueError(
                f"{what} is empty and records no table schema — "
                "cannot materialize an empty frame shape"
            )
        return spark.createDataFrame([], st)

    def _base_frame(head: int) -> DataFrame:
        return _frame_or_empty(
            txn.read_table(spark, path, at_version=head),
            lambda: txn._manifest_at(spark, path, head),
            f"{path} v{head}",
        )

    def _view_frame(vm: dict) -> DataFrame:
        # `_commit_view` always records table_schema, even for empty commits
        return _frame_or_empty(
            txn.read_table(spark, view_path), lambda: vm,
            f"{view_path} v{vm['version']}",
        )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        base_sink(batch_df, batch_id)
        m = txn.current_manifest(spark, path)
        if m is None:
            return  # empty batch on an empty table: nothing to maintain
        head = m["version"]
        vm = txn.current_manifest(spark, view_path)
        if vm is not None and vm.get("view_of") == head:
            return  # replay: the table commit was content-idempotent
        if vm is None:
            state = grouped_agg_state(_base_frame(head), gk, ms)
            _commit_view(state, head, base_version=None)
            return
        base = vm.get("view_of")
        if base is not None:
            try:
                diff = txn.table_diff(spark, path, base, head)
            except ValueError:
                base = None  # recorded base vacuumed out of history
        if base is None:
            # no usable base (vacuumed, or a foreign manifest at
            # view_path that never recorded view_of): one full
            # recompute, then incremental again from the new head
            state = grouped_agg_state(_base_frame(head), gk, ms)
            _commit_view(state, head, base_version=vm["version"])
            return
        state = apply_delta(_view_frame(vm), diff, gk, ms)
        _commit_view(state, head, base_version=vm["version"])

    return _sink


def retention_delete(
    spark, path: str, partition_col: str, keep_values: set
) -> int:
    """Drop partition directories whose ``partition_col=value`` is not in
    ``keep_values`` (ref: 12-hour event retention, websocket.py:798-899).

    Returns the number of partitions removed. Partition-granular — no file
    rewrite, O(partitions to drop) filesystem ops, through the Hadoop
    FileSystem so the same code serves local, HDFS, and object-store
    lakes (a pathlib walk silently returns 0 on any non-local path —
    retention would never run exactly where it matters).

    Directory names are Hive-ESCAPED (``:`` → ``%3A``, null →
    ``__HIVE_DEFAULT_PARTITION__``), so values are unescaped before the
    keep check — raw string comparison would never match a timestamp
    partition and silently delete every partition, kept or not.  Null
    partitions are kept iff ``None`` is in ``keep_values``.  Booleans
    render in Spark's lowercase form (``True`` → ``true`` — Python
    ``str()`` would mismatch the directory and DELETE a kept
    partition).  Fractional-second timestamps and sci-notation floats
    still mismatch ``str()`` rendering — partition on
    truncated/formatted STRING columns, as every caller here does.
    """
    from urllib.parse import unquote

    from crypto_datalake_spark.txn import _fs

    _, fs, root = _fs(spark, path)
    if not fs.exists(root):
        return 0

    def _render(v):
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    keep = {_render(v) for v in keep_values if v is not None}
    keep_null = any(v is None for v in keep_values)
    prefix = partition_col + "="
    removed = 0
    stack = [root]
    while stack:
        cur = stack.pop()
        for st in fs.listStatus(cur):
            if not st.isDirectory():
                continue
            nm = st.getPath().getName()
            if not nm.startswith(prefix):
                stack.append(st.getPath())  # e.g. symbol=X above hour=
                continue
            raw = nm.split("=", 1)[1]
            if raw == "__HIVE_DEFAULT_PARTITION__":
                if not keep_null:
                    fs.delete(st.getPath(), True)
                    removed += 1
            elif unquote(raw) not in keep:
                fs.delete(st.getPath(), True)
                removed += 1
    return removed


def heartbeat_stream(events: DataFrame, watermark: str = "3 minutes") -> DataFrame:
    """ST8: per-consumer per-minute liveness — alive flag + last message
    time (websocket.py:1325-1401). A trivial windowed agg."""
    events = events.withColumn("event_time", F.col("event_time").cast("timestamp"))
    if events.isStreaming:
        events = events.withWatermark("event_time", watermark)
    agg = events.groupBy(
        F.col("stream"), F.window("event_time", "1 minute").alias("w")
    ).agg(
        F.max("arrival_time").alias("last_message_time"),
        F.count(F.lit(1)).alias("n_messages"),
        F.lit(True).alias("alive"),
    )
    return agg.select(
        "stream", F.col("w.start").cast("timestamp_ntz").alias("minute_ts"),
        "last_message_time", "n_messages", "alive",
    )
