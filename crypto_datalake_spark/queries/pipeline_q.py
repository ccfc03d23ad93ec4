"""End-to-end curation pipeline: normalize → dedup → quality → pack.

The composed production shape of the LLM-data tier — one auditable
query that tells you, for EVERY input document, where it went:
normalized and exact-deduplicated (C4/CCNet canonicalization so case/
whitespace variants collide), gated on quality signals (Gopher-style
token-count + stopword-ratio thresholds), and — for survivors — packed
into fixed-token-budget training sequences.  Each stage reuses the
SAME definitions as its standalone operator (``text_normalize``,
``dedup_exact_hash``, ``text_quality_score``, ``sequence_packing``),
so the composition can never drift from the parts.

Disposition ledger semantics (the audit artifact a data team actually
wants from a curation run): ``dropped_dedup`` wins over
``dropped_quality`` (a duplicate is a duplicate regardless of its
quality), ``canonical_doc_id`` names the surviving copy for dedup
drops, and pack coordinates are NULL for any dropped doc — packing
counts ONLY kept documents, so the ledger's pack layout is exactly
the layout of the post-curation corpus.

Scale shape: one normalize+hash+window shuffle on the content hash
(the dedup tier), row-local quality expressions (codegen'd, free),
and the TWO-PHASE distributed prefix sum for packing
(:mod:`crypto_datalake_spark.ops.prefix` — never one window task per
source stream).  No joins: the kept-only running sum is a conditional
prefix over the full staged frame, so dropped rows ride along with
NULL pack coordinates instead of being split off and joined back.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crypto_datalake_spark.queries.common import t
from crypto_datalake_spark.queries.curation import norm_text_expr, norm_text_sql
from crypto_datalake_spark.queries.llm import stop_count_expr, stop_count_sql
from crypto_datalake_spark.queries.registry import register

_CP_MIN_TOKENS = 24     # Gopher-style minimum document length (tokens)
_CP_MIN_STOP = 0.02     # minimum stopword ratio (symbol-soup filter)
_CP_BUDGET = 256        # tokens per packed training sequence


def curation_pipeline_frame(
    d,
    min_tokens: int = _CP_MIN_TOKENS,
    min_stop_ratio: float = _CP_MIN_STOP,
    budget: int = _CP_BUDGET,
):
    """Run the composed pipeline over a (doc_id, source, text) frame.

    Returns one row per input doc: disposition ('kept' /
    'dropped_dedup' / 'dropped_quality'), canonical_doc_id (dedup
    drops only), normalized token count, stopword ratio (7dp), and
    pack_id / pack_offset (kept docs only; per-source doc_id-ordered
    concat-and-chunk over kept tokens)."""
    from crypto_datalake_spark.ops.prefix import cum_before

    # the SHARED stage definitions (norm_text_expr / stop_count_expr) —
    # the composition can't drift from text_normalize / the quality tier
    base = d.select("doc_id", "source", norm_text_expr().alias("norm_text"))

    tok = F.split(F.col("norm_text"), " ")
    n_tok = F.size(tok).cast("long")
    n_stop = stop_count_expr(tok).cast("long")
    staged = base.select(
        "doc_id",
        "source",
        F.md5(F.col("norm_text").cast("binary")).alias("h"),
        n_tok.alias("n_tokens"),
        (n_stop.cast("double") / n_tok.cast("double")).alias("stop_ratio"),
    )
    # dedup tier: one window shuffle on the content hash; min doc_id is
    # the canonical copy (the dedup_exact_hash convention)
    staged = staged.withColumn(
        "canon", F.min("doc_id").over(Window.partitionBy("h"))
    )
    disposition = (
        F.when(F.col("doc_id") != F.col("canon"), F.lit("dropped_dedup"))
        .when(
            (F.col("n_tokens") < min_tokens)
            | (F.col("stop_ratio") < min_stop_ratio),
            F.lit("dropped_quality"),
        )
        .otherwise(F.lit("kept"))
    )
    staged = staged.withColumn("disposition", disposition).withColumn(
        "kept_tokens",
        F.when(F.col("disposition") == "kept", F.col("n_tokens")).otherwise(
            F.lit(0)
        ),
    )
    # packing tier: conditional two-phase prefix — dropped rows
    # contribute 0 and keep NULL pack coordinates, no split-and-rejoin.
    # cum_before has TWO consumers of its input (phase-1 local sums and
    # the phase-2 bucket totals), so checkpoint the staged frame once —
    # otherwise the normalize+hash+dedup-window lineage re-executes per
    # consumer (the _lm_exploded doctrine; plan-pinned in tests)
    c = cum_before(staged.localCheckpoint(), ["source"], "doc_id", "kept_tokens")
    is_kept = F.col("disposition") == "kept"
    return c.select(
        "doc_id",
        "source",
        "disposition",
        F.when(
            F.col("disposition") == "dropped_dedup", F.col("canon")
        ).alias("canonical_doc_id"),
        "n_tokens",
        F.round("stop_ratio", 7).alias("stopword_ratio"),
        F.when(is_kept, F.expr(f"cum_before div {budget}")).alias("pack_id"),
        F.when(is_kept, F.col("cum_before") % budget).alias("pack_offset"),
    )


@register(
    "curation_pipeline",
    sql=f"""
    WITH n AS (
      SELECT doc_id, source,
             {norm_text_sql('text')} AS norm_text
      FROM documents
    ),
    s AS (
      SELECT doc_id, source, md5(norm_text) AS h,
             string_split(norm_text, ' ') AS tok
      FROM n
    ),
    st AS (
      SELECT doc_id, source,
             min(doc_id) OVER (PARTITION BY h) AS canon,
             CAST(len(tok) AS BIGINT) AS n_tokens,
             CAST({stop_count_sql('tok')}
                  AS DOUBLE) / CAST(len(tok) AS DOUBLE) AS stop_ratio
      FROM s
    ),
    disp AS (
      SELECT *,
             CASE WHEN doc_id <> canon THEN 'dropped_dedup'
                  WHEN n_tokens < {_CP_MIN_TOKENS}
                       OR stop_ratio < {_CP_MIN_STOP} THEN 'dropped_quality'
                  ELSE 'kept' END AS disposition
      FROM st
    ),
    c AS (
      SELECT *,
             COALESCE(SUM(CASE WHEN disposition = 'kept' THEN n_tokens
                               ELSE 0 END) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM disp
    )
    SELECT doc_id, source, disposition,
           CASE WHEN disposition = 'dropped_dedup' THEN canon
                END AS canonical_doc_id,
           n_tokens,
           round(stop_ratio, 7) AS stopword_ratio,
           CASE WHEN disposition = 'kept'
                THEN CAST(cum_before // {_CP_BUDGET} AS BIGINT)
                END AS pack_id,
           CASE WHEN disposition = 'kept'
                THEN CAST(cum_before % {_CP_BUDGET} AS BIGINT)
                END AS pack_offset
    FROM c
    """,
    doc="The composed curation pipeline as ONE auditable query: "
    "normalize (C4/CCNet canonicalization) → exact dedup on the "
    "normalized hash (min-doc_id canonical, the dedup_exact_hash "
    "convention) → Gopher-style quality gate (min token count + min "
    "stopword ratio on the NORMALIZED text) → per-source fixed-budget "
    "sequence packing of the survivors.  Emits a per-doc disposition "
    "ledger: every input doc appears exactly once with why it was "
    "dropped (dedup wins over quality) or where it landed "
    "(pack_id/pack_offset over kept tokens only — the pack layout of "
    "the post-curation corpus).  Each stage reuses its standalone "
    "operator's exact definitions; packing's running sum is the "
    "two-phase distributed prefix (ops/prefix.py) computed "
    "conditionally over the full staged frame, so there is NO "
    "split-and-rejoin. Full static DuckDB oracle.",
)
def curation_pipeline(spark, sf_dir):
    return curation_pipeline_frame(
        t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
