"""Ranked full-text retrieval over the documents table.

BM25 (Robertson/Sparck-Jones as shipped in Lucene: idf =
ln((N - df + 0.5)/(df + 0.5) + 1), tf saturation k1 = 1.2, length
normalization b = 0.75) is the lexical half of every retrieval stack the
embedding-ANN family (queries/llm.py) covers the dense half of — corpus
search, RAG candidate generation, and more-like-this dedup triage all
start here.  Reference parity: the reference exposes no text search, so
this extends the LLM-pipeline tier (SURVEY.md §6's training-data block)
rather than mirroring a reference file.

Query model: every ``doc_id % _Q_MOD == 0`` document is a "query" whose
DISTINCT terms form the query bag (more-like-this), scored against every
OTHER document.  Self-matches are excluded; scoring is pure bag-of-words
so the op works unchanged when the query frame comes from user strings
instead of corpus docs.

Determinism discipline (the tfidf/_lm precedent, curation.py:457):
idf and the tf-saturation factor are each round(·, 7) of a GENERIC
double (both contain a multiply by the non-dyadic 1.2 or a correctly-
rounded ln, so neither lands on a decimal half-way case), cast to
DECIMAL(12,7); their product is an EXACT decimal multiply — Spark
DECIMAL(12,7)×DECIMAL(12,7) → DECIMAL(25,14), inside both engines' 38-
digit ceiling — and the per-(query, doc) score is an order-free decimal
sum, so the final double cast is bit-identical across engines and
partitionings.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crypto_datalake_spark.queries.common import t
from crypto_datalake_spark.queries.registry import register

_Q_MOD = 101  # every 101st doc is a query: 5 at sf0.01, ~50 at sf0.1
_K = 10       # hits returned per query
_K1 = 1.2     # BM25 term-frequency saturation
_B = 0.75     # BM25 length normalization (exactly representable)


def _bm25_scored(tf, qterms, k1: float = _K1, b: float = _B):
    """Per-(qid, doc_id) BM25 decimal scores from a term-frequency frame
    ``tf`` (doc_id, n_tok, term, term_count — curation._tfidf_tf_frame
    shape) and a query-bag frame ``qterms`` (qid, term)."""
    # corpus stats off the already-collapsed tf frame: df is a
    # vocab-size agg, N / avgdl come from the one-row-per-doc lengths —
    # never a second corpus scan (the text_tfidf_topk doctrine)
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    stats = (
        tf.groupBy("doc_id")
        .agg(F.first("n_tok").alias("dl"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("sum_dl"),
        )
    )
    idf = F.round(
        F.log(
            (
                F.col("n_docs").cast("double")
                - F.col("df_docs").cast("double")
                + F.lit(0.5)
            )
            / (F.col("df_docs").cast("double") + F.lit(0.5))
            + F.lit(1.0)
        ),
        7,
    ).cast("decimal(12,7)")
    # avgdl = sum_dl / n_docs: exactly-rounded IEEE division of exact
    # integers — bitwise identical across engines
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    tf_d = F.col("term_count").cast("double")
    sat = F.round(
        (tf_d * F.lit(k1 + 1.0))
        / (
            tf_d
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * (F.col("dl").cast("double") / avgdl)
            )
        ),
        7,
    ).cast("decimal(12,7)")
    # ALL arithmetic happens at corpus/vocab size, BEFORE the query-bag
    # join: idf once per vocab term, the saturation factor once per
    # (doc, term) posting, and their exact decimal product w once per
    # posting — the fanned-out |queries|×|postings| stage below is then
    # pure join + decimal sum (measured 1.7x at sf0.1 vs computing
    # ln/round/multiply per fanned row)
    dfc_idf = dfc.crossJoin(F.broadcast(stats)).select(
        "term", idf.alias("idf")
    )
    weights = (
        tf.withColumn("dl", F.col("n_tok"))
        .crossJoin(F.broadcast(stats))
        # NOT force-broadcast: the vocabulary is open-ended at 100 TB;
        # AQE broadcasts it when it measures small (it does at bench SF)
        .join(dfc_idf, "term")
        # DECIMAL × DECIMAL is exact — no re-round, no float sum
        .select("doc_id", "term", (F.col("idf") * sat).alias("w"))
    )
    contrib = weights.join(qterms, "term").where(
        F.col("doc_id") != F.col("qid")
    )
    return contrib.groupBy("qid", "doc_id").agg(
        F.sum("w").alias("score_dec"),
        F.count(F.lit(1)).alias("n_hit_terms"),
    )


def bm25_topk(d, q_mod: int = _Q_MOD, k: int = _K):
    """Top-``k`` BM25 hits for every corpus-derived query over a
    (doc_id, text) frame — the DataFrame op behind ``search_bm25_topk``."""
    from crypto_datalake_spark.queries.curation import _tfidf_tf_frame

    # one tokenize + (doc, term) count pass feeds postings, df, AND the
    # query bags — checkpointed because three consumers would otherwise
    # re-scan and re-shuffle the corpus per consumer (the minhash-
    # signature precedent)
    tf = _tfidf_tf_frame(d).localCheckpoint()
    qterms = (
        tf.where(F.col("doc_id") % q_mod == 0)
        .select(F.col("doc_id").alias("qid"), "term")
    )
    scored = _bm25_scored(tf, qterms)
    w = Window.partitionBy("qid").orderBy(
        F.col("score_dec").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "qid",
            "doc_id",
            F.col("score_dec").cast("double").alias("bm25"),
            F.col("n_hit_terms").cast("long").alias("n_hit_terms"),
            "rank",
        )
    )


_BM25_SQL = f"""
    WITH tk AS (
      SELECT doc_id, string_split(text, ' ') AS tok FROM documents
    ),
    ex AS (
      SELECT doc_id, len(tok) AS n_tok, unnest(tok) AS term FROM tk
    ),
    tf AS (
      SELECT doc_id, n_tok, term, CAST(count(*) AS BIGINT) AS term_count
      FROM ex GROUP BY 1, 2, 3
    ),
    dfc AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df_docs FROM tf GROUP BY 1
    ),
    dl AS (SELECT doc_id, any_value(n_tok) AS dl FROM tf GROUP BY 1),
    stats AS (
      SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl
    ),
    qterms AS (
      SELECT doc_id AS qid, term FROM tf WHERE doc_id % {_Q_MOD} = 0
    ),
    contrib AS (
      SELECT qid, tf.doc_id,
             CAST(round(ln((CAST(n_docs AS DOUBLE) - CAST(df_docs AS DOUBLE)
                             + 0.5) / (CAST(df_docs AS DOUBLE) + 0.5) + 1.0),
                        7) AS DECIMAL(12,7))
             * CAST(round((CAST(term_count AS DOUBLE) * {_K1 + 1.0})
                          / (CAST(term_count AS DOUBLE)
                             + {_K1} * ({1.0 - _B}
                                        + {_B} * (CAST(n_tok AS DOUBLE)
                                                  / (CAST(sum_dl AS DOUBLE)
                                                     / CAST(n_docs AS DOUBLE))))),
                          7) AS DECIMAL(12,7)) AS w
      FROM tf
      JOIN qterms USING (term)
      JOIN dfc USING (term)
      CROSS JOIN stats
      WHERE tf.doc_id <> qid
    ),
    scored AS (
      SELECT qid, doc_id, sum(w) AS score_dec,
             CAST(count(*) AS BIGINT) AS n_hit_terms
      FROM contrib GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY qid ORDER BY score_dec DESC, doc_id) AS rank
      FROM scored
    )
    SELECT qid, doc_id, CAST(score_dec AS DOUBLE) AS bm25, n_hit_terms,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_K}
    """


@register(
    "search_bm25_topk",
    sql=_BM25_SQL,
    doc=f"Lucene-formula BM25 ranked retrieval: every doc_id % {_Q_MOD} "
    "== 0 document's distinct terms form a more-like-this query bag, "
    f"scored against every other document, top-{_K} per query — the "
    "lexical retrieval primitive (corpus search / RAG candidate "
    "generation) complementing the dense ANN family. Plan: ONE tokenize "
    "+ (doc, term) count shuffle (checkpointed, shared by postings, df, "
    "and query bags), df and doc-length stats are vocab-/doc-size aggs "
    "over the collapsed tf frame, N+avgdl broadcast as one row, the "
    "posting-list join touches only the query terms' postings, and the "
    "per-query top-k window partitions by qid. At 100 TB the posting "
    "join shuffles on term with AQE handling stopword skew (or the "
    "query bag broadcasts when the query set is small); scores are "
    "exact DECIMAL(12,7) products decimal-summed, so ranking is "
    "bit-stable across engines and partitionings.",
)
def search_bm25_topk(spark, sf_dir):
    return bm25_topk(t(spark, sf_dir, "documents"))
