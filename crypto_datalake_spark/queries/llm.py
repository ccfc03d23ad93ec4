"""Large-scale training-data pipeline operators over documents/embeddings.

Beyond the reference's surface (BASELINE.json north star): deduplication,
text analysis, similarity search. Scale notes per query; the LSH/MinHash
variants land in the dedup module (round 2) — these are the exact/oracled
baselines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_datalake_spark.queries.common import t
from crypto_datalake_spark.queries.registry import register


@register(
    "dedup_exact_hash",
    sql="""
    SELECT md5(text) AS text_hash,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc_id
    FROM documents
    GROUP BY 1
    """,
    doc="Exact dedup via content hash: group documents by md5(text), keep "
    "the minimum doc_id as canonical. At 100 TB this is one hash shuffle "
    "on a 128-bit key — the cheapest dedup tier before MinHash/SimHash.",
)
def dedup_exact_hash(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("canonical_doc_id"),
    )


@register(
    "text_token_stats",
    sql="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           n_chars,
           CAST(n_chars AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS chars_per_token
    FROM documents
    """,
    doc="Token counting (whitespace tokenizer) + chars-per-token quality "
    "signal. Pure JVM-side expressions — no Python in the hot path.",
)
def text_token_stats(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    return d.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        "n_chars",
        (F.col("n_chars").cast("double") / n_tok.cast("double")).alias("chars_per_token"),
    )


@register(
    "text_quality_score",
    sql="""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS tok
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(tok) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(tok, x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS BIGINT) AS n_stopwords,
           CAST(len(list_filter(tok, x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
             / CAST(len(tok) AS DOUBLE) AS stopword_ratio,
           CAST(len(list_distinct(tok)) AS DOUBLE) / CAST(len(tok) AS DOUBLE) AS ttr
    FROM toks
    """,
    doc="Quality scoring: stopword ratio + type-token ratio per document "
    "(the reference has no text ops; this is the training-data-pipeline "
    "extension). Higher-order array functions, fully codegen'd.",
)
def text_quality_score(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    stop = ("the", "a", "of", "and", "is")
    tok = F.split(F.col("text"), " ")
    n_stop = F.size(F.filter(tok, lambda x: x.isin(*stop)))
    n_tok = F.size(tok)
    return d.select(
        "doc_id",
        "lang",
        n_tok.cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stopwords"),
        (n_stop.cast("double") / n_tok.cast("double")).alias("stopword_ratio"),
        (F.size(F.array_distinct(tok)).cast("double") / n_tok.cast("double")).alias("ttr"),
    )


@register(
    "ann_cosine_topk",
    sql="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, e.label,
        round(
          list_sum(list_transform(list_zip(e.embedding, q.qv),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
        6) AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> 0
    )
    SELECT vec_id, label, cosine
    FROM scored
    ORDER BY cosine DESC, vec_id ASC
    LIMIT 10
    """,
    doc="Brute-force cosine top-k similarity search against a query vector "
    "(vec_id 0): the exact ANN baseline. zip_with + aggregate keep the dot "
    "product JVM-side; TakeOrderedAndProject avoids a full sort. The "
    "LSH-bucketed scale path shares this scoring kernel. Rounded(6): "
    "float-sum association differs across engines at ~1e-15.",
)
def ann_cosine_topk(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda a: F.sqrt(  # noqa: E731
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )
    scored = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(
                dot(F.col("embedding"), F.col("qv"))
                / (norm(F.col("embedding")) * norm(F.col("qv"))),
                6,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(10)
