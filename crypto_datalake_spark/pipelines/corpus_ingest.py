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
  checkpoint gives at-least-once, and the audit table carries batch_id
  so replays are identifiable. An exactly-once variant would route the
  accept append through txn.atomic_upsert_partitioned keyed on doc_id
  (streaming/silver.py's atomic foreachBatch precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# quality gate bounds (Gopher-flavored, tuned for the synthetic corpus)
_MIN_TOKENS = 4
_MAX_TOKENS = 10_000


def _quality_verdict(batch: DataFrame) -> DataFrame:
    """(doc_id, quality_ok, quality_reason) via the registered
    repetition-signal operator plus token-length bounds."""
    from crypto_datalake_spark.queries.curation import repetition_signals

    sig = repetition_signals(batch)
    return sig.select(
        "doc_id",
        F.when(F.col("n_tokens") < _MIN_TOKENS, F.lit("too_short"))
        .when(F.col("n_tokens") > _MAX_TOKENS, F.lit("too_long"))
        .when(F.col("repetitive"), F.lit("repetitive"))
        .alias("quality_reason"),
    ).withColumn("quality_ok", F.col("quality_reason").isNull())


def _novelty_verdict(batch: DataFrame, corpus: DataFrame) -> DataFrame:
    """(doc_id, n_dup_existing, is_novel) for the batch vs the corpus —
    the production incremental-dedup core, two-sided signatures."""
    from crypto_datalake_spark.queries.dedup import lsh_signatures
    from crypto_datalake_spark.queries.scrub import batch_novelty_counts

    in_sig, in_bands = lsh_signatures(batch)
    ex_sig, ex_bands = lsh_signatures(corpus)
    ver = batch_novelty_counts(in_sig, in_bands, ex_sig, ex_bands)
    return batch.select("doc_id").join(
        ver, batch.doc_id == ver.in_id, "left"
    ).select(
        "doc_id",
        F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup_existing"),
        (F.coalesce("n_dup", F.lit(0)) == 0).alias("is_novel"),
    )


def ingest_batch(
    spark: SparkSession, batch: DataFrame, corpus_path: str, audit_path: str,
    batch_id: int,
) -> None:
    """Score ONE micro-batch and append: every doc to the audit table
    with its verdict, accepted docs to the corpus store."""
    batch = batch.select("doc_id", "text").localCheckpoint()
    if batch.isEmpty():
        return
    corpus = spark.read.parquet(corpus_path).select("doc_id", "text")
    q = _quality_verdict(batch)
    n = _novelty_verdict(batch, corpus)
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
    accepted = verdicts.where("accepted").select("doc_id", "text")
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
