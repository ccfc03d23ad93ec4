"""Streaming corpus ingestion: crawl files → quality gate → dedup
against the growing corpus → audited silver append.

The production shape for continuously ingesting training-data crawls
(the LLM-pipeline twin of streaming/silver.py's market-data flow):
documents arrive as parquet files, each micro-batch is scored by the
SAME batch operators the catalog registers — repetition signals
(queries/curation.py) and the incremental-LSH novelty core
(queries/scrub.batch_novelty_counts) — and every document is appended
to the audit table with its verdict; accepted docs ALSO append to the
corpus store, so a near-dup of a doc accepted three batches ago is
rejected even though it never appeared in the seed corpus.

Scale notes:
- foreachBatch, not a stateful operator: dedup-vs-corpus is a join
  against a TABLE (the corpus band index), not against bounded stream
  state — the corpus is unbounded and lives in storage, exactly the
  case Structured Streaming's foreachBatch exists for.
- Each batch recomputes signatures only for its own docs; the corpus
  side is a parquet scan. At 100 TB the corpus band index is a
  persisted bucketed table (the signature pass is paid once at accept
  time, the per-batch join prunes by band_key); recomputing corpus
  signatures per batch, as this sandbox-sized twin does for
  simplicity, would be the one non-incremental cost — the docstring of
  batch_novelty_counts marks the seam where the persisted index drops
  in.
- Appends are plain parquet appends (one file per batch side); the
  checkpoint gives at-least-once. Replays are SAFE: corpus rows whose
  doc_id is in the current batch are excluded from the novelty
  reference (a replayed doc never collides with its own earlier copy,
  so it re-audits with the same verdict), and accepted docs already
  present in the corpus by doc_id are not appended twice — replay
  converges to the same corpus and an audit whose duplicate rows agree.
  An exactly-once variant would route the accept append through
  txn.atomic_upsert_partitioned keyed on doc_id (streaming/silver.py's
  atomic foreachBatch precedent).
"""

from __future__ import annotations

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


def _novelty_verdict(batch: DataFrame, corpus: DataFrame) -> DataFrame:
    """(doc_id, n_dup_existing, is_novel) for the batch vs the corpus
    PLUS intra-batch dedup — the production incremental core two-sided,
    and a keep-lowest-doc_id pass within the batch (one crawl file
    carrying mirrored pages must not seed the corpus with both copies)."""
    from crypto_datalake_spark.queries.dedup import _JACCARD_MIN, lsh_signatures
    from crypto_datalake_spark.queries.scrub import (
        batch_novelty_counts,
        novelty_verdict,
    )

    in_sig, in_bands = lsh_signatures(batch)
    ex_sig, ex_bands = lsh_signatures(corpus)
    vs_corpus = novelty_verdict(
        batch.select("doc_id"),
        batch_novelty_counts(in_sig, in_bands, ex_sig, ex_bands),
    )
    # intra-batch: a doc is a duplicate if it verifies against a
    # LOWER-doc_id batch partner (the canonical-keeper policy of
    # dedup_exact_hash) — the production candidate join again, in its
    # directional (doc_a < doc_b) form
    from crypto_datalake_spark.queries.dedup import band_candidate_pairs

    pairs = band_candidate_pairs(in_bands)  # doc_a < doc_b collisions
    x = in_sig.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa"))
    y = in_sig.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb"))
    jac = (
        F.size(F.array_intersect("sa", "sb")).cast("double")
        / F.size(F.array_union("sa", "sb")).cast("double")
    )
    intra_dup_ids = (
        pairs.join(x, "doc_a")
        .join(y, "doc_b")
        .where(jac >= _JACCARD_MIN)
        .select(F.col("doc_b").alias("doc_id"))  # higher id loses
        .distinct()
        .withColumn("intra_dup", F.lit(True))
    )
    return (
        vs_corpus.join(intra_dup_ids, "doc_id", "left")
        .select(
            "doc_id",
            "n_dup_existing",
            (F.col("is_novel") & F.col("intra_dup").isNull()).alias("is_novel"),
        )
    )


def ingest_batch(
    spark: SparkSession, batch: DataFrame, corpus_path: str, audit_path: str,
    batch_id: int,
) -> None:
    """Score ONE micro-batch and append: every doc to the audit table
    with its verdict, accepted docs to the corpus store."""
    if batch.isEmpty():
        return
    batch = batch.select("doc_id", "text").localCheckpoint()
    try:
        corpus = spark.read.parquet(corpus_path).select("doc_id", "text")
    except Exception:
        # bootstrap: no seed corpus yet — first batch dedups only
        # against itself
        corpus = spark.createDataFrame([], "doc_id long, text string")
    # replay safety: a replayed batch must not collide with its own
    # earlier copies in the corpus — same-id corpus rows are not a
    # novelty reference (see module docstring)
    corpus_ids = corpus.select("doc_id")
    novelty_ref = corpus.join(batch.select("doc_id"), "doc_id", "left_anti")
    q = _quality_verdict(batch)
    n = _novelty_verdict(batch, novelty_ref)
    verdicts = (
        batch.join(q, "doc_id")
        .join(n, "doc_id")
        .select(
            "doc_id",
            "text",
            "n_dup_existing",
            (F.col("quality_ok") & F.col("is_novel")).alias("accepted"),
            F.coalesce(
                F.col("quality_reason"),
                F.when(~F.col("is_novel"), F.lit("near_duplicate")),
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
        .join(corpus_ids, "doc_id", "left_anti")
    )
    if not accepted.isEmpty():
        accepted.write.mode("append").parquet(corpus_path)


def corpus_ingest_stream(
    spark: SparkSession,
    incoming_dir: str,
    corpus_path: str,
    audit_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
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
                spark, df, corpus_path, audit_path, bid
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
