"""Streaming corpus ingestion: crawl files → quality gate → dedup
against the growing corpus → audited silver append.

The production shape for continuously ingesting training-data crawls
(the LLM-pipeline twin of streaming/silver.py's market-data flow):
documents arrive as parquet files, each micro-batch is scored by the
SAME batch operators the catalog registers — repetition signals
(queries/curation.py), the incremental-LSH novelty core
(queries/scrub.batch_novelty_counts), the shared candidate/verify
stages (queries/dedup.band_candidate_pairs / verified_pairs) and the
cluster-canonical keep policy (queries/dedup.connected_components) —
and every document is appended to the audit table with its verdict;
accepted docs ALSO append to the corpus store, so a near-dup of a doc
accepted three batches ago is rejected even though it never appeared in
the seed corpus.

Policies (each an explicit decision, not an accident of join shape):
- Quality gate first: empty/NULL text, token-length bounds, Gopher
  repetition flags. Totality invariant: EVERY incoming doc gets exactly
  one audit row per processing — NULL-text docs are audited
  'empty_text', never silently dropped by a join.
- Cross-batch dedup: batch vs the corpus store (minus this batch's own
  replayed copies, see below).
- Intra-batch dedup: mirrored pages arriving in ONE crawl file dedup
  against each other with the repo's canonical policy — connected
  components over verified pairs, one keeper per cluster: replay docs
  first (their text is already persisted), then minimum doc_id
  (dedup_cluster_canonical's transitive-closure semantics; the greedy
  keep-against-retained-only alternative is order-dependent across
  batch splits). Fresh docs compete only if they passed quality AND
  corpus novelty — a gate-rejected fresh doc never drags its batch
  partner down; replay docs compete UNCONDITIONALLY so persisted text
  always anchors its cluster, and the verdict (not the election)
  guarantees a replay is still audited accepted.
- Id conflicts: a batch doc whose doc_id exists in the corpus with
  DIFFERENT text is rejected 'id_conflict' — accepting it would either
  silently drop the append (audit/corpus divergence) or double the id.

Scale notes:
- foreachBatch, not a stateful operator: dedup-vs-corpus is a join
  against a TABLE (the corpus band index), not against bounded stream
  state — the corpus is unbounded and lives in storage, exactly the
  case Structured Streaming's foreachBatch exists for.
- The corpus band index is PERSISTED (``<corpus>_bandindex``): one row
  per corpus doc carrying its shingle set and band keys, appended at
  accept time — so the shingle+minhash pass over a corpus doc's text
  is paid exactly ONCE, when it is accepted, and each batch's
  dedup-vs-corpus join reads the index instead of re-tokenizing the
  whole corpus (the non-incremental cost earlier rounds flagged,
  closed). The index self-heals: any corpus doc missing an index row
  (crash between corpus and index appends, or a pre-index seed corpus
  bootstrapping) is detected by an id anti-join and backfilled from
  its text before the batch's novelty join, so a crash gap degrades to
  O(gap) recompute, never to a false accept. At 100 TB the next seam
  is layout, not logic: bucket the index by band_key so the per-batch
  candidate join prunes buckets instead of scanning the index.
- Appends are plain parquet appends; the checkpoint gives
  at-least-once. Replays are SAFE and converge: a batch doc that is a
  byte-copy of a corpus row (same doc_id AND same md5(text)) is always
  audited ACCEPTED — the verdict-level invariant, since its text is
  persisted no matter which gate it would fail today (its copy is also
  excluded from the novelty reference so it cannot reject its own
  batch partners' anchor role) — and the append path never writes a
  doc_id the corpus already holds. An exactly-once variant would route the accept
  append through txn.atomic_upsert_partitioned keyed on doc_id
  (streaming/silver.py's atomic foreachBatch precedent).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# quality gate bounds (Gopher-flavored, tuned for the synthetic corpus)
_MIN_TOKENS = 4
_MAX_TOKENS = 10_000


def _quality_verdict(batch: DataFrame) -> DataFrame:
    """(doc_id, quality_ok, quality_reason), TOTAL over the batch:
    repetition_signals drops NULL-text docs (split(NULL) explodes to
    nothing), so verdicts left-join back onto the batch ids and a
    missing signal row means empty/NULL text — rejected, never silently
    lost from the audit."""
    from crypto_datalake_spark.queries.curation import repetition_signals

    sig = repetition_signals(batch)
    return (
        batch.select("doc_id")
        .join(sig, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("n_tokens").isNull(), F.lit("empty_text"))
            .when(F.col("n_tokens") < _MIN_TOKENS, F.lit("too_short"))
            .when(F.col("n_tokens") > _MAX_TOKENS, F.lit("too_long"))
            .when(F.col("repetitive"), F.lit("repetitive"))
            .alias("quality_reason"),
        )
        .withColumn("quality_ok", F.col("quality_reason").isNull())
    )


def _corpus_novelty(
    batch_ids, in_sig, in_bands, idx: DataFrame, bloom: DataFrame | None = None
) -> DataFrame:
    """(doc_id, n_dup_existing, is_novel) for the batch vs the PERSISTED
    corpus band index — the production incremental core, two-sided.
    Takes the batch's (sig, bands) so the signature pass is computed
    ONCE per micro-batch and shared with the intra-batch stage; the
    corpus side is read from the index (shingles + band keys persisted
    at accept time), never re-derived from text.

    ``bloom``: optional packed-long Bloom over the CORPUS's band keys
    (word_idx, bits — :func:`_healed_bloom`).  When given, batch band
    keys the Bloom rejects — the crawl steady state is novel content —
    are dropped map-side BEFORE the index join, and the surviving
    candidate keys are broadcast-semi-joined into the index scan so the
    corpus side is filtered at the scan instead of shuffled corpus-wide.
    Semantics-free by the Bloom contract: no false negatives (a
    truly-matching key always survives), and a false positive just
    reaches the exact band join and matches nothing."""
    from crypto_datalake_spark.queries.scrub import (
        batch_novelty_counts,
        novelty_verdict,
    )

    ex_sig = idx.where(F.col("shingles").isNotNull()).select(
        "doc_id", "shingles"
    )
    ex_bands = (
        idx.where(F.col("bands").isNotNull())
        .select("doc_id", F.explode("bands").alias("bk"))
        .select("doc_id", "bk.band_id", "bk.band_key")
    )
    if bloom is not None:
        from crypto_datalake_spark.queries.paragraphs import bloom_candidates

        keys = in_bands.select(_band_key_h().alias("h")).distinct()
        cand = bloom_candidates(keys, bloom).localCheckpoint()
        in_bands = (
            in_bands.withColumn("h", _band_key_h())
            .join(F.broadcast(cand), "h", "left_semi")
            .drop("h")
        )
        ex_bands = (
            ex_bands.withColumn("h", _band_key_h())
            .join(F.broadcast(cand), "h", "left_semi")
            .drop("h")
        )
    return novelty_verdict(
        batch_ids,
        batch_novelty_counts(in_sig, in_bands, ex_sig, ex_bands),
    )


_INDEX_SCHEMA = (
    "doc_id long, shingles array<string>, "
    "bands array<struct<band_id: int, band_key: string>>"
)


def _family_fp() -> str:
    """Fingerprint of the LSH family (shingle/minhash/banding constants
    in queries/dedup.py) — shared by the band index and Bloom paths so
    both artifacts roll over together on any parameter change."""
    import hashlib

    from crypto_datalake_spark.queries import dedup as dk

    key = (
        f"{dk._SP_SHINGLES}|{dk._SP_H}|{dk._MH_P}|{dk._N_HASH}|"
        f"{dk._BAND_SIZE}|{dk._sp_minhash(0)}"
    )
    return hashlib.md5(key.encode()).hexdigest()[:8]


def default_index_path(corpus_path: str) -> str:
    """``<corpus>_bandindex_<fp>`` where ``fp`` fingerprints the LSH
    family (shingle/minhash/banding constants in queries/dedup.py).  A
    change to any dedup parameter changes the path, so the next batch
    bootstraps a fresh index under the NEW family instead of silently
    band-joining new-family batch keys against old-family persisted
    keys — which would never match and turn every cross-corpus near-dup
    into a permanent false accept.  Stale-family directories are inert
    (nothing computes their path anymore) and reclaimable by ops."""
    return f"{corpus_path.rstrip('/')}_bandindex_{_family_fp()}"


def default_bloom_path(corpus_path: str) -> str:
    """``<corpus>_bandbloom_<fp>``: the packed-long Bloom sidecar over
    the band index's keys (the dedup_bloom_incremental tier, wired in
    front of the ingest novelty join).  Keyed by the SAME family
    fingerprint as the index plus the Bloom parameters, so a family or
    Bloom-shape change bootstraps both artifacts together.  Recovery
    unit is the WHOLE directory: an emptied/removed Bloom rebuilds from
    the index on the next batch (:func:`_healed_bloom`); deleting
    individual parquet files inside it is NOT supported (the Bloom is
    lossy, so a partial store cannot be detected — unlike the per-doc
    index, whose anti-join heal is row-granular)."""
    from crypto_datalake_spark.queries.paragraphs import _BLOOM_G, _BLOOM_M

    return (
        f"{corpus_path.rstrip('/')}_bandbloom_{_family_fp()}"
        f"_m{_BLOOM_M.bit_length() - 1}g{_BLOOM_G}"
    )


def _band_key_h():
    """The Bloom key for one (band_id, band_key) row: band_id is folded
    in so equal key strings from DIFFERENT bands stay distinct."""
    return F.concat_ws("|", F.col("band_id").cast("string"), F.col("band_key"))


def _bloom_words_for_bands(bands: DataFrame) -> DataFrame:
    """Packed Bloom words (word_idx, bits) over a (doc_id, band_id,
    band_key) frame's distinct keys — append-friendly: the reader
    bit_or-merges words across appended row groups, so accept-time
    appends never rewrite the store."""
    from crypto_datalake_spark.queries.paragraphs import bloom_build

    return bloom_build(bands.select(_band_key_h().alias("h")).distinct())


def compact_bloom(spark: SparkSession, bloom_path: str) -> int:
    """Fold the append-only Bloom sidecar back to ≤ m/64 rows (one per
    populated word): each accepted batch appends its own pre-aggregated
    words, so reads pay a growing bit_or-merge until someone compacts.

    Loss-proof by construction rather than by mutual exclusion: write
    the merged words to a tmp directory, rename the old store ASIDE,
    rename the tmp into place, move any file that was APPENDED to the
    store after the merge's snapshot from the aside into the new store
    (Bloom rows bit_or-merge at read, so a duplicated append is
    harmless while a dropped one is a silent-false-accept hole), then
    delete the aside.  If an interleaved append RECREATES the store dir
    inside the swap window (``mode('append')`` creates it), the
    directory rename is abandoned — it would nest on HDFS or fail on
    local FS — and the swap degrades to file-by-file folds of the
    compacted file plus the aside's post-snapshot appends into the
    recreated store.  Crash recovery on the next call: a missing store
    with an aside restores the aside; an aside left beside a LIVE store
    folds its files back in (superset-safe duplicates) instead of being
    deleted — no crash point or interleaved append loses bits.  Every
    fold VERIFIES each file landed in the store before any source dir
    is deleted; a shortfall keeps the aside (the only copy of those
    bits) and raises instead of silently dropping it.  All
    filesystem steps go through the Hadoop FileSystem (txn._fs), so the
    same code serves local, HDFS, and object-store paths, and the
    name-prefix listing sweep needs no glob (metachar-proof).  Returns
    the compacted row count; no-op (0) when the store doesn't exist."""
    import uuid

    from crypto_datalake_spark.txn import _fs

    base = bloom_path.rstrip("/")
    jvm, fs, base_p = _fs(spark, base)
    hpath = jvm.org.apache.hadoop.fs.Path
    name = base_p.getName()
    parent = base_p.getParent()

    def _fold_files_into_base(src_dir) -> bool:
        # parquet part names carry write-uuids, so collisions are
        # practically impossible; skip-if-exists guards regardless.
        # Returns True only when EVERY file verifiably landed in base —
        # rename return values are not trusted blindly, because a fold
        # whose moves silently failed must never license deleting the
        # source dir (the only copy of those Bloom bits: a dropped bit
        # is a permanent silent false-accept)
        ok = True
        for st in fs.listStatus(src_dir):
            fn = st.getPath().getName()
            if not fn.endswith(".parquet"):
                continue
            dst = hpath(f"{base}/{fn}")
            if not fs.exists(dst):
                fs.rename(st.getPath(), dst)
            if not fs.exists(dst):
                ok = False
        return ok

    retired, compact_tmps = [], []
    if parent is not None and fs.exists(parent):
        for st in fs.listStatus(parent):
            nm = st.getPath().getName()
            if nm.startswith(name + "__retired_"):
                retired.append(st.getPath())
            elif nm.startswith(name + "__compact_"):
                compact_tmps.append(st.getPath())
    retired.sort(key=lambda p: p.getName())
    if retired and not fs.exists(base_p):
        # crash between the two renames: the aside IS the full store
        restored = retired.pop(0)
        if not fs.rename(restored, base_p):
            if not fs.exists(base_p):
                raise IOError(
                    f"compact_bloom: restoring aside {restored} failed — "
                    "store left missing, aside retained"
                )
            # a concurrent append recreated the store MID-restore, so
            # the rename was refused and the aside still sits beside
            # the live store: push it back onto the retired list so
            # THIS call folds its bits in — leaving it for the next
            # compact_bloom would make membership reads miss those
            # bits in between.  (An FS that nested it INSIDE the store
            # instead is handled by the nested-dir sweep below.)
            if fs.exists(restored):
                retired.insert(0, restored)
    for p in retired:
        # an aside beside a live store may hold appends the swap window
        # parked there — fold them back (duplicate bits are safe, lost
        # bits are not), then drop the dir; a fold that did not fully
        # land keeps its aside for the next call instead of deleting
        # the only copy of those bits
        if not fs.exists(base_p) or not _fold_files_into_base(p):
            continue
        fs.delete(p, True)
    for p in compact_tmps:
        fs.delete(p, True)  # never swapped in: derived content only
    if fs.exists(base_p):
        # a crashed/failed un-nest (below) — or an FS whose dir rename
        # nests instead of refusing — can leave a partially-folded
        # __compact_ or __retired_ dir INSIDE the store, where the
        # parent-level orphan sweep above never looks: fold its files
        # in (bit_or-duplicate-safe) and drop it; on an incomplete fold
        # keep the nest for the next call rather than lose bits
        for st in fs.listStatus(base_p):
            nm = st.getPath().getName()
            if (
                nm.startswith(name + "__compact_")
                or nm.startswith(name + "__retired_")
            ) and st.isDirectory():
                if _fold_files_into_base(st.getPath()):
                    fs.delete(st.getPath(), True)

    if not fs.exists(base_p):
        return 0
    # snapshot BEFORE the read: a file that lands between snapshot and
    # read is both read and preserved (duplicate-safe); the reverse
    # order could mark an unread file as merged and lose it
    snapshot = {st.getPath().getName() for st in fs.listStatus(base_p)}
    words = _read_store(
        spark, bloom_path, ["word_idx", "bits"], "word_idx long, bits long"
    )
    if words.isEmpty():
        return 0
    merged = words.groupBy("word_idx").agg(
        F.expr("bit_or(bits)").alias("bits")
    ).coalesce(1).localCheckpoint()  # read fully BEFORE touching the store
    tmp = f"{base}__compact_{uuid.uuid4().hex[:8]}"
    merged.write.parquet(tmp)
    tmp_p = hpath(tmp)
    aside_p = hpath(f"{base}__retired_{uuid.uuid4().hex[:8]}")
    if not fs.rename(base_p, aside_p):
        raise IOError(f"compact_bloom: rename {base} aside failed")

    def _fold_aside_appends() -> bool:
        # preserve any append that landed after the snapshot (it moved
        # with the aside): fold those files into the compacted store.
        # Returns True only when every such file verifiably landed.
        ok = True
        for st in fs.listStatus(aside_p):
            fn = st.getPath().getName()
            if fn not in snapshot and fn.endswith(".parquet"):
                dst = hpath(f"{base}/{fn}")
                if not fs.exists(dst):
                    fs.rename(st.getPath(), dst)
                if not fs.exists(dst):
                    ok = False
        return ok

    def _drop_aside_after(*folds_ok: bool) -> None:
        # the aside is the ONLY copy of every pre-compaction bit until
        # the folds land — delete it only on verified success; on any
        # shortfall keep it and surface the failure (the next call's
        # recovery folds a retained aside back in, so nothing is lost,
        # while deleting here would be the silent false-accept hole)
        if all(folds_ok):
            fs.delete(aside_p, True)
            return
        raise IOError(
            f"compact_bloom: fold into {base} incomplete — aside "
            f"{aside_p} retained for next-call recovery"
        )

    def _degraded_fold() -> None:
        # an ingest append landed in the swap window and RECREATED the
        # store dir (``mode('append')`` creates it) — a directory
        # rename there nests tmp inside base on HDFS (compacted bits
        # unreadable, a silent false-accept hole once the aside is
        # deleted) or fails on local FS.  Degrade to file-by-file
        # folds, which are append-safe: the compacted file covers the
        # snapshot; post-snapshot aside files are the pre-aside
        # appends; the recreated base already holds the in-window ones.
        if not fs.exists(base_p):
            fs.mkdirs(base_p)
        tmp_ok = _fold_files_into_base(tmp_p)
        aside_ok = _fold_aside_appends()
        if tmp_ok:
            # tmp is DERIVED from the snapshot (which the aside still
            # holds), so an unfolded tmp is safe to leave for the
            # next call's orphan sweep — but never delete it unfolded
            # while also dropping the aside
            fs.delete(tmp_p, True)
        _drop_aside_after(tmp_ok, aside_ok)

    if fs.exists(base_p) or not fs.rename(tmp_p, base_p):
        _degraded_fold()
        return merged.count()
    nested = hpath(f"{base}/{tmp_p.getName()}")
    nested_ok = True
    if fs.exists(nested) and fs.getFileStatus(nested).isDirectory():
        # HDFS renames onto an existing dir by nesting src INSIDE dst:
        # an append recreated base between the exists check and the
        # rename.  Un-nest the compacted files so they stay readable.
        nested_ok = _fold_files_into_base(nested)
        if nested_ok:
            fs.delete(nested, True)
        else:
            # move the unreadable nest back OUT to a __compact_ orphan
            # so the store dir stays clean; the aside (kept below)
            # still holds every original bit.  If this rename ALSO
            # fails the nest is stuck inside the store — say so loudly:
            # the next call's recovery sweeps nested __compact_ dirs
            # (above), so it is cleaned up then, but the caller should
            # know the store dir is dirty now
            if not fs.rename(nested, tmp_p) and fs.exists(nested):
                _fold_aside_appends()  # best-effort; aside keeps them anyway
                raise IOError(
                    f"compact_bloom: fold into {base} incomplete AND the "
                    f"partially-folded nest {nested} is stuck inside the "
                    f"store (rename out failed) — aside {aside_p} retained; "
                    "next-call recovery folds the nested __compact_ dir "
                    "back in"
                )
    _drop_aside_after(nested_ok, _fold_aside_appends())
    return merged.count()


def _healed_bloom(
    spark: SparkSession, idx: DataFrame, bloom_path: str
) -> DataFrame:
    """The corpus band-key Bloom, bit_or-merged across appends, rebuilt
    FROM THE INDEX when the store is missing/empty while the index is
    not (a deleted sidecar, or a pre-Bloom corpus being upgraded).  The
    superset invariant — Bloom bits cover every key the index holds —
    is maintained by write ordering everywhere else (bloom append
    BEFORE index append, in both the accept and heal paths), so an
    under-approximating Bloom can only mean a missing store, which this
    rebuild closes.  Over-approximation (ghost keys from trimmed
    corpora, crash between bloom and index appends) is always safe:
    false positives fall through to the exact band join."""
    words = _read_store(
        spark, bloom_path, ["word_idx", "bits"], "word_idx long, bits long"
    )
    if words.isEmpty():
        ex_bands = idx.where(F.col("bands").isNotNull()).select(
            F.explode("bands").alias("bk")
        ).select("bk.band_id", "bk.band_key")
        if ex_bands.isEmpty():
            return words.groupBy("word_idx").agg(
                F.expr("bit_or(bits)").alias("bits")
            )
        _bloom_words_for_bands(ex_bands).write.mode("overwrite").parquet(
            bloom_path
        )
        words = _read_store(
            spark, bloom_path, ["word_idx", "bits"], "word_idx long, bits long"
        )
    return words.groupBy("word_idx").agg(F.expr("bit_or(bits)").alias("bits"))


def _index_rows_for(docs: DataFrame, sig=None, bands=None) -> DataFrame:
    """One band-index row per doc of a (doc_id, text) frame: shingle set
    + collected band keys (NULL for sub-3-token docs, which produce no
    signature — persisting the NULL row keeps the self-heal anti-join
    empty instead of re-deriving those docs every batch).  Pass the
    batch's already-computed ``(sig, bands)`` to reuse them (accept-time
    append); omit them only where text is all there is (the heal)."""
    if sig is None or bands is None:
        from crypto_datalake_spark.queries.dedup import lsh_signatures

        sig, bands = lsh_signatures(docs)
    ids = docs.select("doc_id")
    per_doc = (
        bands.join(ids, "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("band_id", "band_key")).alias("bands"))
    )
    return (
        ids.join(sig.select("doc_id", "shingles"), "doc_id", "left")
        .join(per_doc, "doc_id", "left")
    )


def _store_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence probe (no Spark job, any filesystem) — the
    bloom maintenance decisions below depend on whether a store EXISTS,
    not on whether this run's prefilter flag is set."""
    from crypto_datalake_spark.txn import _fs

    _, fs, p = _fs(spark, path.rstrip("/"))
    return bool(fs.exists(p))


def _read_store(
    spark: SparkSession, path: str, cols: list[str], empty_schema: str
) -> DataFrame:
    """Read a pipeline store, or an empty typed frame ONLY when the
    store does not exist yet (bootstrap).  Any other read failure —
    transient storage errors, corrupt footers — must fail the batch so
    the checkpoint retries it; swallowing those would dedup against an
    empty reference and permanently accept duplicates."""
    from crypto_datalake_spark.sinks import is_missing_target_error

    try:
        return spark.read.parquet(path).select(*cols)
    except AnalysisException as e:
        if is_missing_target_error(e):
            return spark.createDataFrame([], empty_schema)
        raise


def _healed_index(
    spark: SparkSession, corpus: DataFrame, index_path: str,
    bloom_path: str | None = None,
) -> DataFrame:
    """The band index restricted to CURRENT corpus docs, with any
    corpus doc missing from it backfilled (bootstrap over a seed
    corpus, or the crash window between the corpus and index appends).
    The steady-state probe anti-joins doc_id columns only — the corpus
    text column is touched solely in the backfill branch, and backfill
    cost is O(gap).  The returned frame is semi-joined to corpus ids,
    so index rows whose doc is no longer in the corpus (an externally
    reset/trimmed corpus with a leftover index) cannot false-reject new
    content against deleted text."""
    idx = _read_store(
        spark, index_path, ["doc_id", "shingles", "bands"], _INDEX_SCHEMA
    )
    corpus_ids = corpus.select("doc_id")
    gap_ids = corpus_ids.join(idx.select("doc_id"), "doc_id", "left_anti")
    if not gap_ids.isEmpty():
        from crypto_datalake_spark.queries.dedup import lsh_signatures

        missing = corpus.join(gap_ids, "doc_id", "left_semi")
        sig, bands = lsh_signatures(missing)
        bands = bands.localCheckpoint()  # bloom words + index rows
        if bloom_path is not None and _store_exists(spark, bloom_path):
            # Bloom BEFORE index (the accept-path ordering): a crash
            # between the two leaves extra Bloom bits (safe FPs), never
            # index keys the Bloom doesn't cover (silent false accepts).
            # Gap words append only into an EXISTING store: creating the
            # store here with gap-only words would make _healed_bloom
            # see it as non-empty and skip the full rebuild, leaving
            # every PRE-EXISTING index key uncovered forever (silent
            # false accepts) — a missing store stays missing so the
            # rebuild covers the whole healed index.
            _bloom_words_for_bands(bands).write.mode("append").parquet(
                bloom_path
            )
        _index_rows_for(missing, sig, bands).write.mode("append").parquet(
            index_path
        )
        idx = _read_store(
            spark, index_path, ["doc_id", "shingles", "bands"], _INDEX_SCHEMA
        )
    return idx.join(corpus_ids, "doc_id", "left_semi")


def _intra_batch_losers(eligible: DataFrame, in_sig, in_bands) -> DataFrame:
    """(doc_id) of every eligible doc that is NOT its near-dup cluster's
    keeper — the production candidate/verify stages plus connected
    components, so one crawl file carrying three mirrored pages keeps
    exactly one. ``eligible`` carries an ``is_replay`` flag and the
    keeper is replay-first, then minimum doc_id: a replay doc's text is
    ALREADY in the corpus (its copy was excluded from the novelty
    reference), so electing a lower-id batch partner instead would
    append a near-dup of persisted content — for true crash replays the
    two rules agree, since the persisted doc won min-id on the first
    run. Replay docs may appear in the returned loser set (two seeded
    near-dup replays in one cluster); the VERDICT enforces that a
    replay is still audited accepted — one invariant, one layer."""
    from crypto_datalake_spark.queries.dedup import (
        band_candidate_pairs,
        connected_components,
        verified_pairs,
    )

    # the batch-wide signatures, filtered to the eligible docs — no
    # second shingle/minhash pass over the same texts
    ids = eligible.select("doc_id")
    sig = in_sig.join(ids, "doc_id", "left_semi")
    bands = in_bands.join(ids, "doc_id", "left_semi")
    pairs = verified_pairs(sig, band_candidate_pairs(bands)).select(
        "doc_a", "doc_b"
    )
    labels = connected_components(ids, pairs)
    ranked = labels.join(
        eligible.select("doc_id", "is_replay"), "doc_id"
    ).withColumn(
        "__ord",
        F.struct(
            (~F.col("is_replay")).cast("int"),  # replays first
            F.col("doc_id"),
        ),
    )
    keepers = ranked.groupBy("label").agg(
        F.min_by("doc_id", F.col("__ord")).alias("keep_id")
    )
    return (
        ranked.join(keepers, "label")
        .where(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )


def _read_corpus(spark: SparkSession, corpus_path: str) -> DataFrame:
    """Corpus store, or an empty frame ONLY when the store does not
    exist yet (bootstrap) — see :func:`_read_store`."""
    return _read_store(
        spark, corpus_path, ["doc_id", "text"], "doc_id long, text string"
    )


def ingest_batch(
    spark: SparkSession, batch: DataFrame, corpus_path: str, audit_path: str,
    batch_id: int, index_path: str | None = None,
    bloom_path: str | None = None, use_bloom: bool = True,
) -> None:
    """Score ONE micro-batch and append: every doc to the audit table
    with its verdict, accepted docs to the corpus store AND the band
    index (``index_path``, default :func:`default_index_path` — the
    corpus path suffixed with the LSH-family fingerprint) AND the band-
    key Bloom sidecar (``bloom_path``, default
    :func:`default_bloom_path`; ``use_bloom=False`` disables the tier —
    verdicts are identical either way, the Bloom only prices the
    novelty probe)."""
    if batch.isEmpty():
        return
    if index_path is None:
        index_path = default_index_path(corpus_path)
    if bloom_path is None:
        bloom_path = default_bloom_path(corpus_path)
    # one row per doc_id, deterministically (min text): a crawl file
    # repeating an id would otherwise multiply rows through every
    # doc_id join below and double-append to the corpus
    batch = (
        batch.groupBy("doc_id")
        .agg(F.min("text").alias("text"))
        .localCheckpoint()
    )
    corpus = _read_corpus(spark, corpus_path)
    # replay detection is by CONTENT, not id: same doc_id + same
    # md5(text) = a copy this batch already appended before a crash.
    # Hash only the corpus rows whose id the batch mentions (semi-join
    # first): hashing the whole corpus would be an unbounded per-batch
    # full-text pass, and both detections require an id match anyway.
    # NULL-safe hash: a corpus row with NULL text re-crawled as NULL is
    # still a byte-copy (a plain equi-join on md5(NULL)=NULL would drop
    # it into id_conflict, auditing a replayed copy as rejected); the
    # sentinel cannot collide with any md5 hex digest
    h = F.coalesce(F.md5(F.col("text").cast("binary")), F.lit("__NULL__"))
    b_keyed = batch.select("doc_id", h.alias("text_hash"))
    c_keyed = corpus.join(batch.select("doc_id"), "doc_id", "left_semi").select(
        "doc_id", h.alias("text_hash")
    )
    replay_ids = (
        b_keyed.join(c_keyed, ["doc_id", "text_hash"])
        .select("doc_id")
        .localCheckpoint()  # three consumers: conflicts, novelty ref, verdicts
    )
    conflict_ids = (
        b_keyed.join(c_keyed.select("doc_id"), "doc_id")
        .join(replay_ids, "doc_id", "left_anti")
        .select("doc_id")
        .withColumn("id_conflict", F.lit(True))
    )
    # the Bloom tier is MAINTAINED whenever its store exists, even with
    # use_bloom=False (which gates only the prefilter): skipping
    # maintenance for some batches would leave index rows the Bloom
    # never covers, so a later re-enable silently false-accepts their
    # near-dups forever — the toggle must be safe in both directions
    maintain_bloom = use_bloom or _store_exists(spark, bloom_path)
    # novelty reference = the persisted band index (self-healed against
    # the corpus) minus this batch's own replayed copies
    healed = _healed_index(
        spark, corpus, index_path, bloom_path if maintain_bloom else None
    )
    novelty_ref = healed.join(replay_ids, "doc_id", "left_anti")
    # the Bloom covers the FULL index (it cannot exclude the replay
    # docs — it is lossy); their keys surface as safe false positives
    # that the exact band join against novelty_ref then drops
    bloom = _healed_bloom(spark, healed, bloom_path) if use_bloom else None

    from crypto_datalake_spark.queries.dedup import lsh_signatures

    in_sig, in_bands = lsh_signatures(batch)
    q = _quality_verdict(batch)
    n = _corpus_novelty(
        batch.select("doc_id"), in_sig, in_bands, novelty_ref, bloom
    )
    pre = (
        batch.join(q, "doc_id")
        .join(n, "doc_id")
        .join(conflict_ids, "doc_id", "left")
        .join(
            replay_ids.withColumn("is_replay", F.lit(True)), "doc_id", "left"
        )
        .withColumn("id_conflict", F.coalesce("id_conflict", F.lit(False)))
        .withColumn("is_replay", F.coalesce("is_replay", F.lit(False)))
        .localCheckpoint()  # feeds eligibility AND the final verdict join
    )
    # replay docs are eligible UNCONDITIONALLY: a persisted doc that
    # fails today's gates (re-tuned quality thresholds, a cross-batch
    # novelty hit) must still ANCHOR its cluster, or a fresh near-dup
    # of its persisted text would sail in as the cluster's only member
    eligible = pre.where(
        F.col("is_replay")
        | (F.col("quality_ok") & F.col("is_novel") & ~F.col("id_conflict"))
    ).select("doc_id", "text", "is_replay")
    losers = _intra_batch_losers(eligible, in_sig, in_bands).withColumn(
        "intra_dup", F.lit(True)
    )
    verdicts = (
        pre.join(losers, "doc_id", "left")
        .withColumn("intra_dup", F.coalesce("intra_dup", F.lit(False)))
        .select(
            "doc_id",
            "text",
            "n_dup_existing",
            # the replay invariant lives HERE, at the verdict: a replay
            # doc's exact text is in the corpus, so the only consistent
            # audit is 'accepted' no matter which gate it would fail —
            # a seeded near-dup pair re-crawled across two separate
            # batches knocks each copy out via corpus novelty (its
            # partner stays in the reference), and a persisted doc can
            # fail today's quality thresholds; auditing either as
            # rejected would contradict the corpus state
            (
                F.col("is_replay")
                | (
                    F.col("quality_ok")
                    & F.col("is_novel")
                    & ~F.col("id_conflict")
                    & ~F.col("intra_dup")
                )
            ).alias("accepted"),
            F.when(
                ~F.col("is_replay"),
                F.coalesce(
                    F.col("quality_reason"),
                    F.when(F.col("id_conflict"), F.lit("id_conflict")),
                    F.when(
                        ~F.col("is_novel") | F.col("intra_dup"),
                        F.lit("near_duplicate"),
                    ),
                ),
            ).alias("reject_reason"),
            F.lit(batch_id).cast("long").alias("batch_id"),
        )
        # one physical realization: the audit append and the corpus
        # append must agree on the verdicts
        .localCheckpoint()
    )
    verdicts.write.mode("append").parquet(audit_path)
    accepted = (
        verdicts.where("accepted")
        .select("doc_id", "text")
        # replay safety: never append a doc_id the corpus already holds
        .join(corpus.select("doc_id"), "doc_id", "left_anti")
    )
    if not accepted.isEmpty():
        accepted = accepted.localCheckpoint()  # corpus + index appends
        # divergence tripwire: every accepted id is (by the anti-join
        # above) absent from the corpus — if the index still holds a row
        # for it, the corpus was reset/trimmed around a leftover index
        # and the stale row's shingles would shadow this doc's text in
        # every future batch.  That state is not self-healable by id,
        # so fail LOUDLY instead of corrupting dedup silently.
        stale = accepted.select("doc_id").join(
            _read_store(spark, index_path, ["doc_id"], "doc_id long"),
            "doc_id", "left_semi",
        )
        if not stale.isEmpty():
            raise RuntimeError(
                f"band index {index_path} holds rows for doc_ids absent "
                "from the corpus that this batch is re-introducing — the "
                "corpus was reset or trimmed around a leftover index. "
                "Delete the index directory (it rebuilds from the corpus "
                "on the next batch) before re-running."
            )
        accepted.write.mode("append").parquet(corpus_path)
        # append order corpus -> bloom -> index: a crash after the
        # corpus leaves an index gap the next batch's self-heal
        # backfills from text; a crash after the bloom leaves extra
        # Bloom bits (safe false positives). The reverse orders would
        # either index text the corpus lost (permanent false reject)
        # or index keys the Bloom misses (silent false accept).
        acc_bands = in_bands.join(
            accepted.select("doc_id"), "doc_id", "left_semi"
        ).localCheckpoint()  # bloom words + index rows
        if maintain_bloom:
            _bloom_words_for_bands(acc_bands).write.mode("append").parquet(
                bloom_path
            )
        _index_rows_for(accepted, in_sig, acc_bands).write.mode(
            "append"
        ).parquet(index_path)


def corpus_ingest_stream(
    spark: SparkSession,
    incoming_dir: str,
    corpus_path: str,
    audit_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    index_path: str | None = None,
    bloom_path: str | None = None,
    use_bloom: bool = True,
):
    """Wire the ingest as a file-source stream; availableNow drains the
    incoming directory one file per micro-batch (so acceptance order is
    the file order and later batches dedup against earlier accepts)."""
    incoming = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(incoming_dir)
    )
    return (
        incoming.writeStream.foreachBatch(
            lambda df, bid: ingest_batch(
                spark, df, corpus_path, audit_path, bid,
                index_path=index_path, bloom_path=bloom_path,
                use_bloom=use_bloom,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
