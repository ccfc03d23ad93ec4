"""Paragraph-granularity dedup: global keep-first span dedup (CCNet)
and Bloom-prefiltered incremental span membership.

CCNet (Wenzek et al., 2020) dedups Common Crawl at PARAGRAPH
granularity — hash each paragraph, keep the first occurrence corpus-wide
— because document-level hashing misses boilerplate shared across
otherwise-distinct pages, and 50-token any-position runs
(dedup_exact_substring) are a heavier tier than most pipelines need.
The synthetic corpus has no newline structure, so "paragraph" here is a
fixed non-overlapping 16-token span (documented knob); the testdata
genuinely contains repeated spans (~8% of 16-token spans at sf0.01 sit
in a duplicate group), so the registered queries exercise both arms.

Two operators:

- ``dedup_paragraphs`` — global keep-first: a span occurrence survives
  iff it is the lexicographically-first (doc_id, span_idx) holding that
  span value.  Per-doc removal accounting plus an md5 over the
  reconstructed kept-only text pins the exact scrub result.  One
  shuffle on the span value (the dedup tier), one per-doc re-group.

- ``dedup_bloom_incremental`` — continuous-ingestion membership: an
  incoming batch's spans are checked against the EXISTING corpus
  through a persisted Bloom sidecar (1 Mbit, 7 hashes — false-positive
  rate ~1e-4 at 5e4 spans) in front of a persisted exact span→owner
  index.  The Bloom is broadcast and rejects novel spans WITHOUT
  touching the index, so a mostly-novel batch (the steady state of a
  crawl) costs O(|batch|·g) map-side work plus an index probe for the
  few candidates only; false positives are removed by the exact verify
  join, false negatives are impossible, so the final semantics are
  EXACTLY the span-membership join and the oracle is static SQL.

Scale posture (100 TB): the Bloom sidecar is m/8 bytes regardless of
corpus layout — size m ~ 10 bits/span and shard by hash prefix when a
single array outgrows broadcast (the word_idx join below is
shard-agnostic: it degrades from broadcast to a shuffle join on
word_idx without a plan rewrite).  The exact index joins only
CANDIDATE hashes (broadcast of the candidate set into the index scan;
a production index is additionally partitioned by hash prefix so the
probe prunes partitions).  ``dedup_paragraphs`` ships span text through
exactly one shuffle because it rebuilds the scrubbed text; a
stats-only variant would shuffle (hash, doc_id, span_idx) at ~32 B/row.

Reference parity: the reference engine has no text tier (SURVEY.md §2
note); this extends the LLM-training-data pipeline alongside
dedup_exact_substring (any-position runs) and dedup_incremental_lsh
(near-dup batch novelty).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crypto_datalake_spark.queries.common import t
from crypto_datalake_spark.queries.registry import register

_PARA_W = 16          # tokens per paragraph-span (no newlines in testdata)
_BLOOM_M = 1 << 20    # Bloom bits (128 KiB as packed longs)
_BLOOM_G = 7          # hash functions
# incoming batch = deterministic 20% doc_id slice (scrub.py convention)
_INC_MOD, _INC_REM = 5, 4


def doc_spans(d: DataFrame, w: int = _PARA_W) -> DataFrame:
    """(doc_id, span_idx, span): non-overlapping ``w``-token spans of
    ``text`` (last span may be shorter).  Pure codegen'd array ops —
    split once, slice per span index."""
    tok = F.split(F.col("text"), " ")
    n_sp = F.ceil(F.size(tok) / F.lit(float(w))).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_sp - F.lit(1)),
        lambda i: F.array_join(F.slice(tok, i * w + 1, w), " "),
    )
    return d.select(
        "doc_id", F.posexplode(spans).alias("span_idx", "span")
    ).withColumn("span_idx", F.col("span_idx").cast("long"))


# DuckDB twin of doc_spans (CTEs ending in sp(doc_id, span_idx, span)) —
# ONE definition consumed by both oracles so the span derivation cannot
# drift between them.
_SPANS_SQL = f"""s AS (
      SELECT doc_id, string_split(text, ' ') AS tok FROM documents
    ),
    sp AS (
      SELECT doc_id, CAST(g.i AS BIGINT) AS span_idx,
             array_to_string(list_slice(tok,
               CAST(g.i * {_PARA_W} + 1 AS BIGINT),
               CAST(g.i * {_PARA_W} + {_PARA_W} AS BIGINT)), ' ') AS span
      FROM s, LATERAL (
        SELECT unnest(range(0,
          CAST(ceil(len(tok) / {_PARA_W}.0) AS BIGINT))) AS i) g
    )"""


def paragraph_dedup_frame(d: DataFrame, w: int = _PARA_W) -> DataFrame:
    """Global keep-first paragraph dedup over a (doc_id, text) frame.

    Returns one row per doc: n_spans, n_removed_spans (occurrences whose
    span value first appears at an earlier (doc_id, span_idx) — within-
    doc repeats count), removal_ratio, and kept_text_hash = md5 of the
    kept-spans-only reconstruction (NULL when every span was removed),
    pinning the exact scrubbed content without shipping it."""
    sp = doc_spans(d, w)
    wk = Window.partitionBy("span").orderBy("doc_id", "span_idx")
    k = sp.withColumn("kept", F.row_number().over(wk) == 1)
    agg = k.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.count(F.when(~F.col("kept"), 1)).alias("n_removed_spans"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("kept"), F.struct("span_idx", "span"))
            )
        ).alias("_kept"),
    )
    kept_text = F.array_join(
        F.transform(F.col("_kept"), lambda x: x.getField("span")), " "
    )
    return agg.select(
        "doc_id",
        "n_spans",
        "n_removed_spans",
        (
            F.col("n_removed_spans").cast("double")
            / F.col("n_spans").cast("double")
        ).alias("removal_ratio"),
        F.when(
            F.size("_kept") > 0, F.md5(kept_text.cast("binary"))
        ).alias("kept_text_hash"),
    )


@register(
    "dedup_paragraphs",
    sql=f"""
    WITH {_SPANS_SQL},
    k AS (
      SELECT doc_id, span_idx, span,
             row_number() OVER (
               PARTITION BY span ORDER BY doc_id, span_idx) = 1 AS kept
      FROM sp
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(count(*) FILTER (WHERE NOT kept) AS BIGINT)
             AS n_removed_spans,
           CAST(count(*) FILTER (WHERE NOT kept) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS removal_ratio,
           md5(string_agg(span, ' ' ORDER BY span_idx)
               FILTER (WHERE kept)) AS kept_text_hash
    FROM k GROUP BY doc_id
    """,
    doc="CCNet-style paragraph dedup: hash each non-overlapping 16-token "
    "span, keep the first occurrence corpus-wide (lexicographic "
    "(doc_id, span_idx)), report per-doc removal accounting plus an md5 "
    "over the kept-only reconstruction. One shuffle on the span value + "
    "one per-doc re-group; at 100 TB the span shuffle is the dedup "
    "tier's inherent cost (the row must move to its value's reducer "
    "exactly once). Full static DuckDB oracle; the testdata genuinely "
    "contains duplicate spans, so both arms run in the driver sweep.",
)
def dedup_paragraphs(spark, sf_dir):
    return paragraph_dedup_frame(
        t(spark, sf_dir, "documents").select("doc_id", "text")
    )


# --------------------------- Bloom-prefiltered incremental membership


def _span_hashes(d: DataFrame, w: int = _PARA_W) -> DataFrame:
    """(doc_id, h): md5 per span occurrence."""
    return doc_spans(d, w).select(
        "doc_id", F.md5(F.col("span").cast("binary")).alias("h")
    )


def _bloom_positions(hcol: str, m: int = _BLOOM_M, g: int = _BLOOM_G):
    """Array column of ``g`` bit positions in ``[0, m)`` for hash column
    ``hcol`` — xxhash64 with the hash-function index as seed."""
    return F.array(
        *[F.pmod(F.xxhash64(F.col(hcol), F.lit(s)), F.lit(m)) for s in range(g)]
    )


def _to_words(pos_df: DataFrame) -> DataFrame:
    """(…, word_idx, mask) from a bit-position column ``p``: pack the
    Bloom into 64-bit words so set/test are integer ops."""
    return pos_df.select(
        "*",
        F.shiftright(F.col("p"), 6).alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias(
            "mask"
        ),
    ).drop("p")


def bloom_build(hashes: DataFrame, m: int = _BLOOM_M, g: int = _BLOOM_G) -> DataFrame:
    """Build the packed Bloom table (word_idx, bits) from a hash frame —
    one explode to (position) rows, one bit_or aggregation.  Sparse:
    only populated words are stored (≤ g·|distinct hashes| rows, ≤ m/64
    ever)."""
    pos = hashes.select(
        F.explode(_bloom_positions("h", m, g)).alias("p")
    )
    return (
        _to_words(pos)
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_candidates(
    uniq: DataFrame, bloom: DataFrame, m: int = _BLOOM_M, g: int = _BLOOM_G
) -> DataFrame:
    """Filter a distinct-hash frame (h) to Bloom candidates: all ``g``
    bits set.  The Bloom side is broadcast (128 KiB); a word with no
    row in the sparse table means bit-not-set (left join + null check).
    May contain false positives — callers MUST verify against the exact
    index; never misses a true member."""
    pos = uniq.select("h", F.explode(_bloom_positions("h", m, g)).alias("p"))
    checked = _to_words(pos).join(F.broadcast(bloom), "word_idx", "left")
    ok = F.col("bits").isNotNull() & (
        F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")
    )
    return (
        checked.select("h", ok.alias("ok"))
        .groupBy("h")
        .agg(F.bool_and("ok").alias("cand"))
        .where(F.col("cand"))
        .select("h")
    )


def bloom_membership(
    inc_occ: DataFrame,
    bloom: DataFrame,
    span_index: DataFrame,
    m: int = _BLOOM_M,
    g: int = _BLOOM_G,
) -> DataFrame:
    """Per-incoming-doc span-membership verdict: occurrences checked
    against the Bloom (broadcast, map-side), candidates exact-verified
    against the span→owner index (candidate set broadcast INTO the
    index scan — the index is the big side at scale), verdicts joined
    back to occurrences.  Result is EXACTLY the exact-membership join:
    the Bloom only prices it."""
    cand = bloom_candidates(inc_occ.select("h").distinct(), bloom, m, g)
    known = span_index.join(F.broadcast(cand), "h").select("h", "owner")
    return (
        inc_occ.join(F.broadcast(known), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.count("owner").alias("n_known_spans"),
            (
                F.count("owner").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("known_ratio"),
            (F.count("owner") == 0).alias("is_novel"),
            F.min("owner").alias("matched_doc_id"),
        )
    )


@register(
    "dedup_bloom_incremental",
    sql=f"""
    WITH {_SPANS_SQL},
    ex AS (
      SELECT span, CAST(min(doc_id) AS BIGINT) AS owner
      FROM sp WHERE doc_id % {_INC_MOD} <> {_INC_REM} GROUP BY 1
    ),
    inc AS (
      SELECT doc_id, span FROM sp WHERE doc_id % {_INC_MOD} = {_INC_REM}
    )
    SELECT i.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(count(e.owner) AS BIGINT) AS n_known_spans,
           CAST(count(e.owner) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS known_ratio,
           count(e.owner) = 0 AS is_novel,
           min(e.owner) AS matched_doc_id
    FROM inc i LEFT JOIN ex e USING (span)
    GROUP BY i.doc_id
    """,
    doc="Bloom-prefiltered incremental span membership: an incoming batch "
    "(deterministic 20% doc_id slice standing in for a new crawl) is "
    "checked span-by-span against the EXISTING corpus through a "
    "persisted 1-Mbit/7-hash Bloom sidecar broadcast in front of a "
    "persisted exact span-to-owner index. Novel spans (the crawl steady "
    "state) are rejected map-side without touching the index; the few "
    "candidates are exact-verified (false positives removed, false "
    "negatives impossible), so the result — and the static oracle — is "
    "exactly the span-membership join. Per-batch cost O(|batch|*g) + "
    "an index probe of candidate hashes only; the corpus is never "
    "rescanned. Both artifacts persist per source fingerprint "
    "(warehouse_cached) like the LSH band index.",
)
def dedup_bloom_incremental(spark, sf_dir):
    from crypto_datalake_spark.queries.llm import _served_model_table

    incoming = F.col("doc_id") % _INC_MOD == _INC_REM
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")

    # both artifact builds consume the existing corpus's span hashes —
    # derive (tokenize + slice + md5) ONCE, checkpointed lazily so the
    # all-artifacts-cached path never pays it
    memo: dict = {}

    def ex_hashes():
        if "ex" not in memo:
            memo["ex"] = _span_hashes(docs.where(~incoming)).localCheckpoint()
        return memo["ex"]

    def build_bloom():
        return bloom_build(ex_hashes().select("h").distinct()).coalesce(1)

    def build_index():
        return (
            ex_hashes()
            .groupBy("h")
            .agg(F.min("doc_id").alias("owner"))
            .coalesce(1)
        )

    suffix = f"w{_PARA_W}_m{_BLOOM_M.bit_length() - 1}_g{_BLOOM_G}"
    bloom = _served_model_table(
        spark, sf_dir, "bloom_spans", suffix, build_bloom,
        source="documents.parquet",
    )
    span_index = _served_model_table(
        spark, sf_dir, "span_index", f"w{_PARA_W}", build_index,
        source="documents.parquet",
    )
    return bloom_membership(
        _span_hashes(docs.where(incoming)), bloom, span_index
    )


def paragraph_scrub_frame(d: DataFrame, w: int = _PARA_W) -> DataFrame:
    """The rewrite twin of :func:`paragraph_dedup_frame` (the
    scrub_exact_substrings convention): emit the reconstructed
    kept-spans-only text for every doc that LOST at least one span —
    docs the dedup left untouched need no rewrite and are omitted, so
    the output is churn-sized, not corpus-sized.  Shares the keep-first
    decision verbatim with the stats op (same window, same tie-break),
    so the pair cannot drift."""
    sp = doc_spans(d, w)
    wk = Window.partitionBy("span").orderBy("doc_id", "span_idx")
    k = sp.withColumn("kept", F.row_number().over(wk) == 1)
    agg = k.groupBy("doc_id").agg(
        F.count(F.when(~F.col("kept"), 1)).alias("n_removed_spans"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("kept"), F.struct("span_idx", "span"))
            )
        ).alias("_kept"),
    )
    return agg.where(F.col("n_removed_spans") > 0).select(
        "doc_id",
        F.array_join(
            F.transform(F.col("_kept"), lambda x: x.getField("span")), " "
        ).alias("new_text"),
        "n_removed_spans",
    )


@register(
    "scrub_paragraphs",
    sql=f"""
    WITH {_SPANS_SQL},
    k AS (
      SELECT doc_id, span_idx, span,
             row_number() OVER (
               PARTITION BY span ORDER BY doc_id, span_idx) = 1 AS kept
      FROM sp
    )
    SELECT doc_id,
           coalesce(string_agg(span, ' ' ORDER BY span_idx)
                    FILTER (WHERE kept), '') AS new_text,
           CAST(count(*) FILTER (WHERE NOT kept) AS BIGINT)
             AS n_removed_spans
    FROM k GROUP BY doc_id
    HAVING count(*) FILTER (WHERE NOT kept) > 0
    """,
    doc="Paragraph-dedup REWRITE (the policy twin of dedup_paragraphs, "
    "mirroring the exact-substring dedup/scrub pair): rebuild each "
    "document from its keep-first-surviving spans only, emitting rows "
    "for CUT documents alone — a doc that lost every span comes back "
    "with empty text (its removal is the caller's retention decision). "
    "Same span window and tie-break as the stats op, shared verbatim. "
    "At 100 TB the output is churn-sized: untouched docs never leave "
    "the reducer. Full static DuckDB oracle.",
)
def scrub_paragraphs(spark, sf_dir):
    return paragraph_scrub_frame(
        t(spark, sf_dir, "documents").select("doc_id", "text")
    )
