"""Large-scale training-data pipeline operators over documents/embeddings.

Beyond the reference's surface (BASELINE.json north star): deduplication,
text analysis, similarity search (brute-force baseline + hyperplane-LSH
scale path), multimodal binary plumbing. Scale notes per query.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from crypto_datalake_spark.queries.common import t
from crypto_datalake_spark.queries.registry import register


# One stopword list for every text-quality heuristic (text_quality_score,
# text_profile, the quality classifier, the composed curation pipeline)
# so they cannot drift independently.  The shared fragments below are
# the ONLY spellings of the membership test — every SQL oracle and
# Spark expression composes them.
_STOPWORDS = ("the", "a", "of", "and", "is")
STOP_SQL = ", ".join(repr(w) for w in _STOPWORDS)


def stop_count_expr(tok):
    """Spark: number of stopword tokens in an array column."""
    return F.size(F.filter(tok, lambda x: x.isin(*_STOPWORDS)))


def stop_count_sql(tok_expr: str) -> str:
    """DuckDB twin of :func:`stop_count_expr`."""
    return f"len(list_filter({tok_expr}, x -> x IN ({STOP_SQL})))"


def _dot(a, b):
    """Inner product of two array<float|double> columns, JVM-side fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cosine(a, b):
    """Exact cosine similarity between two array<float> columns, JVM-side."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


_DK_COS = """
    list_sum(list_transform(list_zip({a}, {b}),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
    / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


def _lsh_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 parity — identical constants on
    the Spark and DuckDB sides, so the bucketing is fully oracle-able."""
    return [
        [
            1.0 if int(hashlib.md5(f"{j}:{d}".encode()).hexdigest(), 16) % 2 == 0 else -1.0
            for d in range(dim)
        ]
        for j in range(n_planes)
    ]


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
    # load_table directly, NOT t(): the documents spread() exists for
    # per-row-HEAVY compute, and md5+hash-agg is not it — the round-robin
    # exchange it inserts ships the full text bytes through a shuffle
    # before the hash collapses them to 16 B/row (measured 0.28 -> 0.61 s
    # at sf0.1 when round 5 routed this query through t(); at 100 TB it
    # would be a full-corpus shuffle for nothing).  The map-side partial
    # agg already parallelizes the only real work.
    from crypto_datalake_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
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
    tok = F.split(F.col("text"), " ")
    n_stop = stop_count_expr(tok)
    n_tok = F.size(tok)
    return d.select(
        "doc_id",
        "lang",
        n_tok.cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stopwords"),
        (n_stop.cast("double") / n_tok.cast("double")).alias("stopword_ratio"),
        (F.size(F.array_distinct(tok)).cast("double") / n_tok.cast("double")).alias("ttr"),
    )


def _text_profile_sql() -> str:
    from crypto_datalake_spark.queries.dedup import _MARKERS

    marker_counts = ", ".join(
        f"CAST(len(list_filter(tok, x -> x IN ({', '.join(repr(w) for w in ws)}))) AS BIGINT) AS c_{lg}"
        for lg, ws in _MARKERS.items()
    )
    return f"""
    WITH tk AS (
      SELECT doc_id, lang, n_chars, string_split(text, ' ') AS tok FROM documents
    ),
    sc AS (
      SELECT doc_id, lang, n_chars, tok, {marker_counts}
      FROM tk
    )
    SELECT doc_id, lang,
           CASE WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_de AND c_en > 0 THEN 'en'
                WHEN c_es >= c_fr AND c_es >= c_de AND c_es > 0 THEN 'es'
                WHEN c_fr >= c_de AND c_fr > 0 THEN 'fr'
                WHEN c_de > 0 THEN 'de'
                ELSE 'unknown' END AS pred_lang,
           CAST(len(tok) AS BIGINT) AS n_tokens,
           n_chars,
           CAST(n_chars AS DOUBLE) / CAST(len(tok) AS DOUBLE) AS chars_per_token,
           CAST(len(list_filter(tok, x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS BIGINT) AS n_stopwords,
           CAST(len(list_filter(tok, x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
             / CAST(len(tok) AS DOUBLE) AS stopword_ratio,
           CAST(len(list_distinct(tok)) AS DOUBLE) / CAST(len(tok) AS DOUBLE) AS ttr
    FROM sc
    """


@register(
    "text_profile",
    sql=_text_profile_sql(),
    doc="The full per-document text-analysis profile in ONE scan: language "
    "ID (marker-stopword argmax cascade), token counting (whitespace "
    "tokenizer + chars-per-token), and quality scoring (stopword ratio, "
    "type-token ratio). Text-profiling passes are bandwidth-bound, so a "
    "100 TB pipeline fuses them — one read, one codegen stage, no "
    "shuffle; the standalone lang_id_heuristic / text_token_stats / "
    "text_quality_score entries remain registered for à-la-carte use. "
    "All higher-order array expressions, no Python in the hot path.",
)
def text_profile(spark, sf_dir):
    from crypto_datalake_spark.queries.dedup import _MARKERS

    d = t(spark, sf_dir, "documents")
    tok = F.split("text", " ")

    def marker_count(ws):
        return F.size(F.filter(tok, lambda x: x.isin(*ws))).cast("long")

    counts = {lg: marker_count(ws) for lg, ws in _MARKERS.items()}
    pred = (
        F.when(
            (counts["en"] >= counts["es"])
            & (counts["en"] >= counts["fr"])
            & (counts["en"] >= counts["de"])
            & (counts["en"] > 0),
            "en",
        )
        .when(
            (counts["es"] >= counts["fr"])
            & (counts["es"] >= counts["de"])
            & (counts["es"] > 0),
            "es",
        )
        .when((counts["fr"] >= counts["de"]) & (counts["fr"] > 0), "fr")
        .when(counts["de"] > 0, "de")
        .otherwise("unknown")
    )
    n_stop = stop_count_expr(tok)
    n_tok = F.size(tok)
    return d.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        n_tok.cast("long").alias("n_tokens"),
        "n_chars",
        (F.col("n_chars").cast("double") / n_tok.cast("double")).alias("chars_per_token"),
        n_stop.cast("long").alias("n_stopwords"),
        (n_stop.cast("double") / n_tok.cast("double")).alias("stopword_ratio"),
        (F.size(F.array_distinct(tok)).cast("double") / n_tok.cast("double")).alias("ttr"),
    )


_N_PLANES = 4
_DIM = 64
_PLANES = _lsh_planes(_N_PLANES, _DIM)


def _dk_bucket(col: str) -> str:
    bits = []
    for p in _PLANES:
        arr = "[" + ", ".join(f"{v:.1f}" for v in p) + "]"
        dot = (
            f"list_sum(list_transform(list_zip({col}, {arr}), "
            "p -> CAST(p[1] AS DOUBLE) * p[2]))"
        )
        bits.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)


def _sp_arr(vals) -> str:
    """SQL double-array literal with exact round-trip values.  Built as a
    STRING so the whole expression reaches the JVM in ONE call —
    ``F.lit(list)`` expands to one py4j round trip per element (65 per
    64-dim plane), which made plan CONSTRUCTION, not execution, the
    dominant cost of every LSH/PCA consumer at bench scale (r14)."""
    return "array(" + ",".join(f"CAST('{v!r}' AS DOUBLE)" for v in vals) + ")"


def _sp_plane_dot_sql(col: str, plane) -> str:
    """One plane dot as a SQL aggregate fold — the identical IEEE op
    sequence as the former Column-built ``aggregate(zip_with(...))``
    (and as the DuckDB ``list_sum`` oracle), so values are bit-unchanged."""
    return (
        f"aggregate(zip_with({col}, {_sp_arr(plane)}, "
        "(x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), "
        "(acc, v) -> acc + v)"
    )


def _sp_bucket(col):
    bits = [
        f"CASE WHEN {_sp_plane_dot_sql(col, p)} >= 0 THEN '1' ELSE '0' END"
        for p in _PLANES
    ]
    return F.expr("concat(" + ", ".join(bits) + ")")


# cell-size guard for pairwise scoring: label cells larger than this are
# sub-bucketed by the hyperplane signature BEFORE pairing, so the join key
# itself bounds the pair space (a hot label contributes Σ|sub-bucket|²
# ≈ |cell|²/16 pairs instead of |cell|²). Cells below the cap pair exactly.
_CELL_CAP = 1000


def _norm_expr(col):
    return F.sqrt(
        F.aggregate(
            F.col(col),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def _cell_pair_scorer(threshold: float):
    """Per-cell pairwise cosine scorer for ``applyInPandas`` — the whole
    cell's vectors arrive ONCE as one Arrow batch and the O(n²·d) pair
    arithmetic runs vectorized in numpy instead of as per-pair JVM
    higher-order-function folds (HOF lambdas are interpreted per element,
    never codegen'd — measured ~2.4× on this op at sf0.1, r14).

    BIT-EXACT by construction: every reduction is a dimension-ordered
    left fold of (multiply, add) — ``acc += E[:,d] (*) E[:,d]`` per
    dimension — which performs the identical sequence of IEEE-754 double
    operations as the JVM ``aggregate(zip_with(a, b, *), 0.0, +)`` fold
    and DuckDB's ``list_sum(list_transform(...))``, so the scores (and
    the oracle hash) are unchanged down to the last ulp.  numpy ufuncs
    do not fuse multiply-add, so no FMA can perturb the rounding."""
    import numpy as np
    import pandas as pd

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        out_cols = {"vec_a": "int64", "vec_b": "int64",
                    "label": "object", "cos_raw": "float64"}
        if n < 2:
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in out_cols.items()})
        pdf = pdf.sort_values("vec_id")
        E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        d = E.shape[1]
        dots = np.zeros((n, n), dtype=np.float64)
        sq = np.zeros(n, dtype=np.float64)
        for k in range(d):  # dimension-ordered left fold (see docstring)
            col = E[:, k]
            dots += np.multiply.outer(col, col)
            sq += col * col
        if np.any(sq == 0.0):
            # preserve the JVM path's fail-loud contract: an all-zero
            # vector's norm-0 division was an ANSI error, never a NaN
            raise ValueError("zero-norm embedding in cosine pair cell")
        nrm = np.sqrt(sq)
        cos = dots / np.multiply.outer(nrm, nrm)
        ia, ib = np.triu_indices(n, 1)  # vec_id-sorted → vec_a < vec_b
        c = cos[ia, ib]
        keep = c >= threshold
        ids = pdf["vec_id"].to_numpy()
        return pd.DataFrame({
            "vec_a": ids[ia[keep]],
            "vec_b": ids[ib[keep]],
            "label": pdf["label"].iloc[0],
            "cos_raw": c[keep],
        })

    return score


def embedding_cosine_pairs(e, cap=_CELL_CAP, threshold=0.3):
    """Within-cell cosine pair scoring with a hot-cell guard.

    Cells (label, plus the 4-bit hyperplane signature appended for cells
    above ``cap`` rows, so no single hot label can go quadratic) are
    scored by ``applyInPandas``: each cell's vectors cross to Python ONCE
    (O(rows·d) Arrow bytes — the former self-join materialized both
    arrays per PAIR row, O(pairs·d)), and the pair dots run as one
    vectorized numpy fold per dimension (`_cell_pair_scorer`, bit-exact
    vs the JVM fold).  Per-cell memory is bounded by the cap (≤ cap²
    doubles).  The final round(6) stays JVM-side so rounding semantics
    are byte-identical to every other registered query."""
    from pyspark.sql import Window

    base = e.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("embedding"),
        _sp_bucket("embedding").alias("sub"),
    ).withColumn("cell_n", F.count(F.lit(1)).over(Window.partitionBy("label")))
    keyed = base.select(
        "vec_id",
        "label",
        "embedding",
        F.when(F.col("cell_n") > cap, F.col("sub")).otherwise(F.lit("")).alias("jk"),
    )
    label_t = e.schema["label"].dataType.simpleString()
    paired = keyed.groupBy("label", "jk").applyInPandas(
        _cell_pair_scorer(threshold),
        f"vec_a long, vec_b long, label {label_t}, cos_raw double",
    )
    return paired.select(
        "vec_a", "vec_b", "label", F.round("cos_raw", 6).alias("cosine")
    )


@register(
    "dedup_embedding_cosine",
    sql=f"""
    WITH base AS (
      SELECT vec_id, label, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
             {_dk_bucket("embedding")} AS sub,
             count(*) OVER (PARTITION BY label) AS cell_n
      FROM embeddings
    ),
    k AS (
      SELECT vec_id, label, embedding, nrm,
             CASE WHEN cell_n > {_CELL_CAP} THEN sub ELSE '' END AS jk
      FROM base
    ),
    pr AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
               / (a.nrm * b.nrm) AS cos_raw
      FROM k a JOIN k b
        ON a.label = b.label AND a.jk = b.jk AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, label, round(cos_raw, 6) AS cosine
    FROM pr WHERE cos_raw >= 0.3
    """,
    doc="Embedding-cosine near-duplicate pairs with coarse-cell blocking "
    "AND a hot-cell guard: pairs are scored only within the same label "
    "cell (the IVF-style partition), bounding the pair space to Σ|cell|² "
    f"instead of n²; cells larger than {_CELL_CAP} rows are further "
    "sub-bucketed by the 4-plane hyperplane signature INSIDE the join "
    "key, so no single hot label can go quadratic (VERDICT r01 item 7). "
    "Norms are computed once per row and joined in — per-pair work is "
    "one dot product. Rounded(6) for cross-engine float-sum parity.",
)
def dedup_embedding_cosine(spark, sf_dir):
    return embedding_cosine_pairs(t(spark, sf_dir, "embeddings"))


@register(
    "ann_lsh_bucketed",
    sql=f"""
    WITH bk AS (
      SELECT vec_id, label, embedding, {_dk_bucket("embedding")} AS bucket
      FROM embeddings
    ),
    q AS (SELECT embedding AS qv, bucket AS qb FROM bk WHERE vec_id = 0)
    SELECT vec_id, label,
           round({_DK_COS.format(a="embedding", b="q.qv")}, 6) AS cosine
    FROM bk CROSS JOIN q
    WHERE bk.bucket = q.qb AND vec_id <> 0
    ORDER BY cosine DESC, vec_id ASC
    LIMIT 10
    """,
    doc="LSH-bucketed ANN: sign-of-dot-product against "
    f"{_N_PLANES} deterministic ±1 hyperplanes → {2**_N_PLANES} buckets; "
    "top-k scored only inside the query's bucket (≈1/"
    f"{2**_N_PLANES} of the corpus). The scale path over ann_cosine_topk: "
    "bucketing is one narrow projection, candidates broadcast-joinable. "
    "Recall is tunable via planes/probes (multi-probe = OR over "
    "neighboring buckets).",
)
def ann_lsh_bucketed(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings").withColumn("bucket", _sp_bucket("embedding"))
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"), F.col("bucket").alias("qb")
    )
    return (
        e.join(F.broadcast(q), e.bucket == q.qb)
        .where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            "label",
            F.round(_cosine(F.col("embedding"), F.col("qv")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )


def _dk_plane_dot(col: str, plane: list[float]) -> str:
    arr = "[" + ", ".join(f"{v:.1f}" for v in plane) + "]"
    return (
        f"round(list_sum(list_transform(list_zip({col}, {arr}), "
        "p -> CAST(p[1] AS DOUBLE) * p[2])), 9)"
    )


def _sp_plane_dots(col):
    """Array of per-plane dot products, rounded(9) so cross-engine float
    association can never flip the margin ORDERING (which picks the probe
    planes).  SQL-string build (see ``_sp_arr``) — one py4j call, same
    bit-exact fold."""
    return F.expr(
        "array("
        + ", ".join(f"round({_sp_plane_dot_sql(col, p)}, 9)" for p in _PLANES)
        + ")"
    )


def _flip_sql(bucket_expr: str, pos_expr: str) -> str:
    """Flip one bit of the bucket bit-string (1-based position arithmetic,
    identical syntax in Spark SQL and DuckDB)."""
    return (
        f"concat(substr({bucket_expr}, 1, {pos_expr}), "
        f"CASE WHEN substr({bucket_expr}, {pos_expr} + 1, 1) = '1' "
        f"THEN '0' ELSE '1' END, "
        f"substr({bucket_expr}, {pos_expr} + 2))"
    )


def _mp_probes_sql() -> str:
    """DuckDB CTEs producing the query's multi-probe bucket set: its own
    bucket plus the buckets reached by flipping the 1-2 lowest-|margin|
    hyperplanes (the classic multi-probe sequence)."""
    qp_rows = " UNION ALL ".join(
        f"SELECT qv, qb, {i} AS i, {_dk_plane_dot('qv', p)} AS d FROM qd"
        for i, p in enumerate(_PLANES)
    )
    f1 = _flip_sql("qb", "p1")
    f2 = _flip_sql("qb", "p2")
    f12 = _flip_sql(f"({f1})", "p2")
    return f"""
    qd AS (SELECT embedding AS qv, bucket AS qb FROM bk WHERE vec_id = 0),
    qp AS ({qp_rows}),
    sel AS (
      SELECT qv, qb,
             min(CASE WHEN r = 1 THEN i END) AS p1,
             min(CASE WHEN r = 2 THEN i END) AS p2
      FROM (SELECT *, row_number() OVER (ORDER BY abs(d) ASC, i ASC) AS r FROM qp)
      GROUP BY qv, qb
    ),
    probes AS (
      SELECT DISTINCT qv, pb FROM (
        SELECT qv, qb AS pb FROM sel
        UNION ALL SELECT qv, {f1} FROM sel
        UNION ALL SELECT qv, {f2} FROM sel
        UNION ALL SELECT qv, {f12} FROM sel
      )
    )"""


# the full multiprobe statement, shared with the hybrid-RRF fusion
# oracle (queries/retrieval.py) as a nested-subquery CTE
MULTIPROBE_SQL = f"""
    WITH bk AS (
      SELECT vec_id, label, embedding, {_dk_bucket("embedding")} AS bucket
      FROM embeddings
    ),
    {_mp_probes_sql()}
    SELECT vec_id, label,
           round({_DK_COS.format(a="embedding", b="probes.qv")}, 6) AS cosine
    FROM bk JOIN probes ON bk.bucket = probes.pb
    WHERE vec_id <> 0
    ORDER BY cosine DESC, vec_id ASC
    LIMIT 10
    """


@register(
    "ann_lsh_multiprobe",
    sql=MULTIPROBE_SQL,
    doc="Multi-probe LSH ANN (Lv et al., VLDB'07): the query probes its own "
    "bucket PLUS the buckets reached by flipping the 1-2 hyperplanes with "
    "the smallest |dot| margin — the planes most likely to have mis-binned "
    "true neighbors. 4 probes of 2^4 buckets ≈ 25% of the corpus here "
    "(test-sized; production uses 16+ planes where 4 probes ≈ 4/65536), "
    "recovering most of single-probe's lost recall without more tables or "
    "a bigger index: probe count trades compute for recall at query time. "
    "The probe set is derived declaratively (margin ranking over a "
    "4-row frame) and broadcast; candidate scoring stays an equi-join on "
    "the bucket key, same as single-probe. Margins rounded(9) pre-ranking "
    "for cross-engine determinism. tests/test_ann.py proves "
    "recall(multi) >= recall(single) on every eval query (superset "
    "candidates, identical scoring).",
)
def ann_lsh_multiprobe(spark, sf_dir):
    return lsh_multiprobe_topk(t(spark, sf_dir, "embeddings"))


def lsh_multiprobe_topk(e_raw):
    """Multi-probe LSH top-10 for the vec_id-0 query over a raw
    embeddings frame — the DataFrame op behind ``ann_lsh_multiprobe``,
    shared with the hybrid-RRF fusion (queries/retrieval.py)."""
    from pyspark.sql import Window

    e = e_raw.withColumn("bucket", _sp_bucket("embedding"))
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qb"),
        _sp_plane_dots("embedding").alias("dots"),
    )
    qp = q.select(
        "qv", "qb", F.posexplode("dots").alias("i", "d")
    )
    # margin ranking over a #planes-row frame (bounded, one per query)
    w = Window.partitionBy("qb").orderBy(F.abs(F.col("d")).asc(), F.col("i").asc())
    sel = (
        qp.withColumn("r", F.row_number().over(w))
        .groupBy("qv", "qb")
        .agg(
            F.min(F.when(F.col("r") == 1, F.col("i"))).alias("p1"),
            F.min(F.when(F.col("r") == 2, F.col("i"))).alias("p2"),
        )
    )
    f1 = _flip_sql("qb", "p1")
    f2 = _flip_sql("qb", "p2")
    f12 = _flip_sql(f"({f1})", "p2")
    probes = (
        sel.select(
            "qv",
            F.explode(
                F.array(F.col("qb"), F.expr(f1), F.expr(f2), F.expr(f12))
            ).alias("pb"),
        )
        .distinct()
    )
    return (
        e.join(F.broadcast(probes), e.bucket == probes.pb)
        .where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            "label",
            F.round(_cosine(F.col("embedding"), F.col("qv")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )


# Hard-negative mining knobs: every _HN_MOD-th vector is an "anchor"
# (stands in for a contrastive-training batch's query side), _HN_K
# negatives are mined per anchor, and candidates with cosine >= _HN_MAX_SIM
# are dropped as probable FALSE negatives (a near-identical vector carrying
# a different label is label noise / an unmarked duplicate, not a hard
# negative — the cheap-threshold stand-in for RocketQA-style denoising).
_HN_MOD = 50
_HN_K = 5
_HN_MAX_SIM = 0.995


@register(
    "mine_hard_negatives",
    sql=f"""
    WITH bk AS (
      SELECT vec_id, label, embedding, {_dk_bucket("embedding")} AS bucket
      FROM embeddings
    ),
    anchors AS (
      SELECT vec_id AS anchor_id, label AS a_label,
             embedding AS av, bucket AS ab
      FROM bk WHERE vec_id % {_HN_MOD} = 0
    ),
    cand AS (
      SELECT a.anchor_id, e.vec_id, e.label,
             round({_DK_COS.format(a="e.embedding", b="a.av")}, 9) AS sim
      FROM bk e JOIN anchors a ON e.bucket = a.ab
      WHERE e.vec_id <> a.anchor_id AND e.label <> a.a_label
    ),
    ranked AS (
      SELECT anchor_id, vec_id, label, sim,
             row_number() OVER (
               PARTITION BY anchor_id ORDER BY sim DESC, vec_id ASC
             ) AS rank
      FROM cand WHERE sim < {_HN_MAX_SIM}
    )
    SELECT anchor_id, vec_id, label, round(sim, 6) AS cosine,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_HN_K}
    """,
    doc="Contrastive hard-negative mining (DPR/SimCSE training-data "
    f"prep): for every anchor vector (vec_id % {_HN_MOD} = 0 stands in "
    f"for a training batch's query side), the top-{_HN_K} most-similar "
    "DIFFERENT-label vectors in the anchor's LSH bucket — similar "
    "enough to be confusable, provably not positives. Candidates with "
    f"cosine >= {_HN_MAX_SIM} are dropped as probable false negatives "
    "(near-identical vector, different label = label noise), the cheap-"
    "threshold stand-in for cross-encoder denoising. Plan: the corpus "
    "is bucketed by the shared 4-plane LSH projection (one narrow "
    "map), the bounded anchor batch broadcasts, and the bucket "
    "equi-join caps candidates at ~1/16 of the corpus per anchor — "
    "the corpus never self-joins and never shuffles except the one "
    "per-anchor top-k window exchange. At 100 TB: pass a genuinely "
    "bounded anchor frame (a training batch) via hard_negatives("
    "anchors=...) — the mod carve-out here is corpus-PROPORTIONAL "
    "(1/mod of the corpus, embeddings included) and only broadcast-"
    "safe if mod scales with corpus size (ADVICE r13); recall is "
    "tunable with hard_negatives(probes=N) — see "
    "mine_hard_negatives_probe2. Ranking on round(cos, 9) — the "
    "IVF precedent — so float association can never flip an order "
    "across engines.",
)
def mine_hard_negatives(spark, sf_dir):
    return hard_negatives(t(spark, sf_dir, "embeddings"))


def _hn_probe2_sql() -> str:
    """DuckDB oracle for the probes=2 miner: per-anchor margin ranking
    picks each anchor's lowest-|margin| hyperplane, whose flip is the
    second probed bucket (the ann_lsh_multiprobe sequence restricted to
    probes=2, partitioned by anchor instead of the single query)."""
    ad_rows = " UNION ALL ".join(
        f"SELECT anchor_id, {i} AS i, {_dk_plane_dot('av', p)} AS d FROM anchors"
        for i, p in enumerate(_PLANES)
    )
    return f"""
    WITH bk AS (
      SELECT vec_id, label, embedding, {_dk_bucket("embedding")} AS bucket
      FROM embeddings
    ),
    anchors AS (
      SELECT vec_id AS anchor_id, label AS a_label,
             embedding AS av, bucket AS ab
      FROM bk WHERE vec_id % {_HN_MOD} = 0
    ),
    ad AS ({ad_rows}),
    sel AS (
      SELECT anchor_id, min(CASE WHEN r = 1 THEN i END) AS p1
      FROM (SELECT anchor_id, i,
                   row_number() OVER (
                     PARTITION BY anchor_id ORDER BY abs(d) ASC, i ASC
                   ) AS r
            FROM ad)
      GROUP BY anchor_id
    ),
    probes AS (
      SELECT anchor_id, a_label, av, ab AS pb FROM anchors
      UNION ALL
      SELECT a.anchor_id, a.a_label, a.av, {_flip_sql("ab", "p1")}
      FROM anchors a JOIN sel USING (anchor_id)
    ),
    cand AS (
      SELECT p.anchor_id, e.vec_id, e.label,
             round({_DK_COS.format(a="e.embedding", b="p.av")}, 9) AS sim
      FROM bk e JOIN probes p ON e.bucket = p.pb
      WHERE e.vec_id <> p.anchor_id AND e.label <> p.a_label
    ),
    ranked AS (
      SELECT anchor_id, vec_id, label, sim,
             row_number() OVER (
               PARTITION BY anchor_id ORDER BY sim DESC, vec_id ASC
             ) AS rank
      FROM cand WHERE sim < {_HN_MAX_SIM}
    )
    SELECT anchor_id, vec_id, label, round(sim, 6) AS cosine,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_HN_K}
    """


@register(
    "mine_hard_negatives_probe2",
    sql=_hn_probe2_sql(),
    doc="Multi-probe hard-negative mining (VERDICT r13 item 3): each "
    "anchor probes its own LSH bucket PLUS the bucket reached by "
    "flipping its lowest-|margin| hyperplane — the plane most likely "
    "to have mis-binned a confusable different-label neighbor "
    "(Lv et al. multi-probe, the ann_lsh_multiprobe sequence at "
    "probes=2). Candidates ≈ 2/16 of the corpus per anchor; the probe "
    "frame is anchors × 2 rows (bounded when the anchor frame is — "
    "same mod-scaling caveat as mine_hard_negatives) and stays "
    "broadcast-side, so the corpus still never self-joins and still "
    "pays only the one per-anchor top-k window exchange. Margins "
    "rounded(9) pre-ranking — cross-engine-deterministic probe "
    "choice, the ann_lsh_multiprobe precedent.",
)
def mine_hard_negatives_probe2(spark, sf_dir):
    return hard_negatives(t(spark, sf_dir, "embeddings"), probes=2)


def hard_negatives(
    e_raw,
    mod: int = _HN_MOD,
    k: int = _HN_K,
    max_sim: float = _HN_MAX_SIM,
    anchors=None,
    probes: int = 1,
):
    """Per-anchor top-``k`` different-label LSH-bucket neighbors below the
    ``max_sim`` false-negative cap — the DataFrame op behind
    ``mine_hard_negatives``.

    ``anchors``: the production path. Pass a genuinely BOUNDED
    (vec_id, label, embedding) frame — a contrastive training batch —
    which is what makes the anchor broadcast safe at any corpus size.
    The default ``vec_id % mod == 0`` carve-out is the self-contained
    oracle stand-in and is corpus-PROPORTIONAL (1/mod of the corpus,
    full embeddings included): at 100 TB the default mod=50 would blow
    the broadcast limit, so mod must scale with corpus size whenever
    the carve-out is used beyond test scale (ADVICE r13).

    ``probes`` (1..4): LSH buckets probed per anchor. 1 = the anchor's
    own bucket; 2+ add the buckets reached by flipping the 1-2
    lowest-|margin| hyperplanes (the ``ann_lsh_multiprobe`` sequence:
    own, flip(p1), flip(p2), flip(p1,p2)) — recall is traded for
    compute at mine time without touching the index. The probe frame
    stays anchor-sized × probes (bounded ⇒ broadcast-safe); each
    corpus vector lives in exactly one bucket and probe buckets are
    distinct, so no (anchor, candidate) pair can duplicate."""
    from pyspark.sql import Window

    if not 1 <= probes <= 4:
        raise ValueError(f"probes must be in 1..4, got {probes}")
    e = e_raw.withColumn("bucket", _sp_bucket("embedding"))
    if anchors is None:
        anchors = e.where(F.col("vec_id") % mod == 0).select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("a_label"),
            F.col("embedding").alias("av"),
            F.col("bucket").alias("ab"),
        )
    else:
        anchors = anchors.select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("a_label"),
            F.col("embedding").alias("av"),
            _sp_bucket("embedding").alias("ab"),
        )
    if probes > 1:
        # per-anchor margin ranking over a #planes-row frame (bounded:
        # anchors × 4 rows), exactly the lsh_multiprobe_topk machinery
        # but partitioned by anchor_id instead of the single query
        dots = anchors.select(
            "anchor_id", F.posexplode(_sp_plane_dots("av")).alias("i", "d")
        )
        w_m = Window.partitionBy("anchor_id").orderBy(
            F.abs(F.col("d")).asc(), F.col("i").asc()
        )
        sel = (
            dots.withColumn("r", F.row_number().over(w_m))
            .groupBy("anchor_id")
            .agg(
                F.min(F.when(F.col("r") == 1, F.col("i"))).alias("p1"),
                F.min(F.when(F.col("r") == 2, F.col("i"))).alias("p2"),
            )
        )
        f1 = _flip_sql("ab", "p1")
        f2 = _flip_sql("ab", "p2")
        f12 = _flip_sql(f"({f1})", "p2")
        probe_exprs = [F.col("ab"), F.expr(f1), F.expr(f2), F.expr(f12)]
        anchors = anchors.join(sel, "anchor_id").select(
            "anchor_id",
            "a_label",
            "av",
            F.explode(F.array(*probe_exprs[:probes])).alias("ab"),
        )
    cand = (
        e.join(F.broadcast(anchors), e.bucket == anchors.ab)
        .where(
            (F.col("vec_id") != F.col("anchor_id"))
            & (F.col("label") != F.col("a_label"))
        )
        .select(
            "anchor_id",
            "vec_id",
            "label",
            F.round(_cosine(F.col("embedding"), F.col("av")), 9).alias("sim"),
        )
        .where(F.col("sim") < max_sim)
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "anchor_id",
            "vec_id",
            "label",
            F.round(F.col("sim"), 6).alias("cosine"),
            "rank",
        )
    )


@register(
    "multimodal_feature_extract",
    sql="""
    SELECT doc_id,
           source AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
           CAST(octet_length(encode(text)) % 480 AS BIGINT) AS height
    FROM documents
    """,
    doc="Multimodal column plumbing: opaque binary payload + typed metadata "
    "→ Arrow-batched mapInPandas feature extraction "
    "(functions/multimodal.py). The payload here is the utf-8 encoding of "
    "the text column (deterministic stand-in — no media codecs in this "
    "container); the decode seam is decode_media(), a clearly-marked "
    "NotImplementedError stub. Schema/partitioning/batch shape are real.",
)
def multimodal_feature_extract(spark, sf_dir):
    from crypto_datalake_spark.functions.multimodal import extract_media_features

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.col("source").alias("media_type"),
    )
    return extract_media_features(d)


@register(
    "multimodal_decode_roundtrip",
    sql="""
    SELECT doc_id, 'audio/wav' AS media_type,
           CAST(44 + 160 * (n_chars % 50 + 1) AS BIGINT) AS n_bytes,
           CAST(NULL AS BIGINT) AS width,
           CAST(NULL AS BIGINT) AS height,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(80 * (n_chars % 50 + 1) AS BIGINT) AS n_samples,
           CAST(10 * (n_chars % 50 + 1) AS BIGINT) AS duration_ms,
           CAST(500 AS BIGINT) AS peak_amp,
           CAST(NULL AS BIGINT) AS blue_sum
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'image/bmp',
           CAST(54 + (n_chars % 17 + 1)
                * (((n_chars % 31 + 1) * 3 + 3) // 4 * 4) AS BIGINT),
           CAST(n_chars % 31 + 1 AS BIGINT),
           CAST(n_chars % 17 + 1 AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT),
           CAST(3 * (n_chars % 17 + 1) * (n_chars % 31) * (n_chars % 31 + 1) // 2
                + 5 * (n_chars % 31 + 1) * (n_chars % 17) * (n_chars % 17 + 1) // 2
                AS BIGINT)
    FROM documents WHERE doc_id % 3 = 1
    UNION ALL
    -- PNG: sig 8 + IHDR 25 + IDAT (12 + zlib stored: 2 hdr + 5 block
    -- + raw + 4 adler, raw = h*(1 + 3w)) + IEND 12 = raw + 68
    SELECT doc_id, 'image/png',
           CAST((n_chars % 17 + 1) * (1 + 3 * (n_chars % 31 + 1)) + 68
                AS BIGINT),
           CAST(n_chars % 31 + 1 AS BIGINT),
           CAST(n_chars % 17 + 1 AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT),
           CAST(3 * (n_chars % 17 + 1) * (n_chars % 31) * (n_chars % 31 + 1) // 2
                + 5 * (n_chars % 31 + 1) * (n_chars % 17) * (n_chars % 17 + 1) // 2
                AS BIGINT)
    FROM documents WHERE doc_id % 3 = 2
    """,
    doc="REAL media-codec round-trip, oracle-gated: doc_id % 3 picks the "
    "format — an actual PCM16 WAV (stdlib wave encoder, 8 kHz mono "
    "ramp), an actual uncompressed 24-bit BMP (struct header + "
    "bottom-up padded BGR rows), or an actual 8-bit RGB PNG (chunked "
    "with correct CRCs, stored-block deflate so even the compressed "
    "size is analytic) — parameters derived from n_chars. "
    "functions.multimodal.decode_media then PARSES the bytes back "
    "executor-side (wave reader / BMP pixel view / zlib inflate + full "
    "five-filter PNG inverse) and emits byte size, dimensions, sample "
    "counts, duration, a peak-amplitude content check (sample DATA, "
    "not just headers, must round-trip) and a blue-channel pixel "
    "checksum. The oracle recomputes every property ANALYTICALLY from "
    "the generator parameters, so a row only matches if encoder AND "
    "decoder are both real and mutually consistent. JPEG/MP3/MP4 "
    "remain a loud NotImplementedError — this closes the decode seam "
    "for the formats the stdlib can honestly own. Plan: one Arrow-"
    "batched mapInPandas synth + one decode, embarrassingly parallel, "
    "payloads never touch the driver.",
)
def multimodal_decode_roundtrip(spark, sf_dir):
    from crypto_datalake_spark.functions.multimodal import (
        decode_media_features,
        synth_media_frame,
    )

    d = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return decode_media_features(synth_media_frame(d))


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


_IVF_K = 8  # coarse cells (centroids = vec_id 1..8, see doc)
_IVF_NPROBE = 2


@register(
    "ann_ivf_probe",
    sql=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv
      FROM embeddings WHERE vec_id BETWEEN 1 AND {_IVF_K}
    ),
    assign AS (
      SELECT e.vec_id, e.label, e.embedding, c.cent_id,
             round({_DK_COS.format(a="e.embedding", b="c.cv")}, 9) AS sim
      FROM embeddings e CROSS JOIN cents c
      QUALIFY row_number() OVER (
        PARTITION BY e.vec_id ORDER BY sim DESC, c.cent_id ASC
      ) = 1
    ),
    qcells AS (
      SELECT c.cent_id, e.embedding AS qv
      FROM embeddings e CROSS JOIN cents c
      WHERE e.vec_id = 0
      QUALIFY row_number() OVER (
        ORDER BY round({_DK_COS.format(a="e.embedding", b="c.cv")}, 9) DESC,
                 c.cent_id ASC
      ) <= {_IVF_NPROBE}
    )
    SELECT a.vec_id, a.label, a.cent_id,
           round({_DK_COS.format(a="a.embedding", b="q.qv")}, 6) AS cosine
    FROM assign a JOIN qcells q ON a.cent_id = q.cent_id
    WHERE a.vec_id <> 0
    ORDER BY cosine DESC, vec_id ASC
    LIMIT 10
    """,
    doc=f"IVF-style ANN: corpus coarse-quantized into {_IVF_K} cells "
    "(argmax cosine vs centroid, deterministic tie-break), query probes "
    f"its {_IVF_NPROBE} best cells, top-k scored only inside probed cells "
    f"— ~{_IVF_NPROBE}/{_IVF_K} of the corpus scanned. Centroids here are "
    "vec_id 1..8 (deterministic stand-in so the oracle can mirror the "
    "assignment; production trains them offline with MLlib KMeans and "
    "broadcasts the centroid table — same plan shape). Assignment is the "
    "classic K·N map-side dot-product pass with no shuffle; the cell "
    "table would be written bucketed by cent_id so probes prune files. "
    "Similarity rounded(9) pre-argmax: float-sum association differs "
    "across engines at ~1e-15 and must not flip cell assignment.",
)
def ann_ivf_probe(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    cents = e.where(F.col("vec_id").between(1, _IVF_K)).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv")
    )
    return ivf_topk(e.where(F.col("vec_id") != 0),
                    e.where(F.col("vec_id") == 0), cents, _IVF_NPROBE)


def _cells_sorted(cents):
    """Normalize ``(cent_id, cv)`` (cent_id → LONG so the stand-in
    vec_id:long and trained int centroid tables both line up) and
    collapse it to ONE broadcast row holding the cent_id-sorted centroid
    array — the shape the per-row assignment fold consumes."""
    cents = cents.select(F.col("cent_id").cast("long").alias("cent_id"), "cv")
    cents_arr = cents.agg(
        F.array_sort(F.collect_list(F.struct("cent_id", "cv"))).alias("__cs")
    )
    return cents, cents_arr


def _assign_cells(corpus, cents_arr, keep_sim: bool = False):
    """argmax-cosine cell per corpus row (adds ``cent_id``; with
    ``keep_sim`` also the winning cosine as ``cent_sim`` — the SemDeDup
    keep-policy key, materialized in one projection so the fold runs
    once).

    A PER-ROW fold over the broadcast centroid array — each row computes
    its best cell inline and NO exchange touches the corpus (a crossJoin
    + row_number window would shuffle K·N rows through a sort just to
    pick the max).  The strict > keeps the FIRST (lowest cent_id) on sim
    ties — identical to a (sim desc, cent_id asc) ranking."""

    def _step(acc, c):
        s = F.round(_cosine(F.col("embedding"), c["cv"]), 9)
        return F.when(
            s > acc["sim"],
            F.struct(s.alias("sim"), c["cent_id"].alias("cid")),
        ).otherwise(acc)

    best = F.aggregate(
        F.col("__cs"),
        F.struct(
            F.lit(float("-inf")).alias("sim"), F.lit(None).cast("long").alias("cid")
        ),
        _step,
    )
    out = (
        corpus.crossJoin(F.broadcast(cents_arr))
        .withColumn("__best", best)
        .drop("__cs")
        .withColumn("cent_id", F.col("__best")["cid"])
    )
    if keep_sim:
        out = out.withColumn("cent_sim", F.col("__best")["sim"])
    return out.drop("__best")


def _probe_cells(queries, cents, nprobe: int):
    """Top-``nprobe`` cells per query → (cent_id, qv).  Keeps the window
    form: it needs TOP-nprobe (not argmax) and the frame is |queries|·K
    rows — queries are the small side by definition, so this window never
    sees corpus scale."""
    from pyspark.sql import Window

    sim = F.round(_cosine(F.col("embedding"), F.col("cv")), 9)
    w_q = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("cent_id").asc()
    )
    return (
        queries.crossJoin(F.broadcast(cents))
        .withColumn("sim", sim)
        .withColumn("__rn", F.row_number().over(w_q))
        .where(F.col("__rn") <= nprobe)
        .select("cent_id", F.col("embedding").alias("qv"))
    )


def ivf_topk(corpus, queries, cents, nprobe: int, k: int = 10):
    """IVF probe plan shared by the stand-in-centroid and KMeans-trained
    variants: assign corpus rows to their argmax-cosine cell (K·N map-side
    dot products, no shuffle), probe the query's best ``nprobe`` cells,
    score only inside probed cells.  ``cents``: (cent_id, cv) — broadcast
    (the centroid table is tiny by construction)."""
    cents, cents_arr = _cells_sorted(cents)
    assign = _assign_cells(corpus, cents_arr).select(
        "vec_id", "label", "embedding", "cent_id"
    )
    qcells = _probe_cells(queries, cents, nprobe)
    return (
        assign.join(F.broadcast(qcells), "cent_id")
        .select(
            "vec_id",
            "label",
            "cent_id",
            F.round(_cosine(F.col("embedding"), F.col("qv")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def _det_sample(e, sample_rows: int, id_col: str = "vec_id"):
    """Deterministic training sample: the ``sample_rows`` smallest
    md5(id) rows — reproducible across runs and partitionings, no RNG
    state.  Shared by every offline-trained model tier so they always
    train on the SAME sample."""
    return e.orderBy(F.md5(F.col(id_col).cast("string")), id_col).limit(
        sample_rows
    )


def _fit_centers(
    feats, k: int, seed: int, max_iter: int, persist: bool = True
) -> list[list[float]]:
    """One MLlib KMeans fit (k-means|| init) → plain-Python centers.
    Persists ``feats`` for the fit's many passes unless the caller's
    lineage is already cached (``persist=False`` — re-caching a cheap
    projection of a cached frame buys nothing)."""
    from pyspark.ml.clustering import KMeans

    if persist:
        feats.persist()
    try:
        model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    finally:
        if persist:
            feats.unpersist()
    return [[float(x) for x in c] for c in model.clusterCenters()]


def _model_cache_key(
    sf_dir, prefix: str, suffix: str, source: str
) -> tuple[str, list[str]]:
    """(cache name, source paths) for a served model table — the ONE
    definition both the build side (:func:`_served_model_table`) and the
    path side (:func:`_served_model_path`, feeding the surrogate
    oracles' read_parquet) derive from, so they cannot desynchronize."""
    import os

    name = os.path.basename(os.path.normpath(sf_dir))
    return f"{prefix}_{name}_{suffix}", [os.path.join(sf_dir, source)]


def _served_model_table(
    spark, sf_dir, prefix: str, suffix: str, build,
    source: str = "embeddings.parquet",
):
    """Offline-train / persist / broadcast-at-serve split shared by every
    trained model tier (IVF centroids, PQ codebooks, quality
    classifier): ``build()`` runs once per (source fingerprint, params);
    serving reads the warehouse table.  ``warehouse_cached`` fingerprints
    the source file, so regenerated testdata retrains instead of serving
    stale models (a real lake would key on the source table's txn
    generation, txn.py)."""
    from crypto_datalake_spark.io import warehouse_cached

    name, sources = _model_cache_key(sf_dir, prefix, suffix, source)
    return warehouse_cached(spark, name, sources, build)


def _served_model_path(
    sf_dir, prefix: str, suffix: str, source: str = "embeddings.parquet"
) -> str:
    """The warehouse path :func:`_served_model_table` publishes to, for
    the same (prefix, suffix, source) — computable before the artifact
    exists, so surrogate SQL oracles can embed it."""
    from crypto_datalake_spark.io import warehouse_cache_path

    return warehouse_cache_path(*_model_cache_key(sf_dir, prefix, suffix, source))


def kmeans_centroids(
    e, k: int = _IVF_K, seed: int = 7, max_iter: int = 10,
    sample_rows: int = 4096,
):
    """Train IVF coarse centroids with MLlib KMeans (k-means|| init) and
    return them as a (cent_id, cv) DataFrame ready to broadcast.

    Trains on a deterministic ``sample_rows``-row sample (smallest
    md5(vec_id) — reproducible across runs and partitionings, no RNG
    state), the standard IVF recipe: coarse quantizers only need the
    density shape, not every point, so training cost is O(sample) while
    assignment stays O(corpus).  At the test SFs the sample covers the
    whole corpus, so results are identical to a full fit.  Iterative
    fitting is genuinely non-SQL-expressible, so the KMeans variant
    carries no DuckDB oracle (the driver records the weaker rows-only
    check); determinism comes from the fixed seed + deterministic
    sample."""
    from pyspark.ml.functions import array_to_vector

    feats = _det_sample(e, sample_rows).select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    rows = [(i, c) for i, c in enumerate(_fit_centers(feats, k, seed, max_iter))]
    return e.sparkSession.createDataFrame(rows, "cent_id int, cv array<double>")


def ivf_centroid_table(spark, sf_dir, k: int = _IVF_K, seed: int = 7):
    """Persisted-centroid serving path: read the trained centroid table
    from the warehouse, training + writing it exactly once per
    (source data, k, seed) — the production IVF split (see
    :func:`_served_model_table`)."""

    def build():
        e = t(spark, sf_dir, "embeddings")
        return kmeans_centroids(
            e.where(F.col("vec_id") != 0), k=k, seed=seed
        ).coalesce(1)

    return _served_model_table(
        spark, sf_dir, "ivf_centroids", f"k{k}_s{seed}", build
    )


def ivf_centroid_path(sf_dir, k: int = _IVF_K, seed: int = 7) -> str:
    """Where :func:`ivf_centroid_table` persists its fit."""
    return _served_model_path(sf_dir, "ivf_centroids", f"k{k}_s{seed}")


def _ivf_probe_ctes_sql(path: str) -> str:
    """The shared trained-centroid probe plan as DuckDB CTEs (cents /
    assign / qcells) — ONE definition of the centroid read, round-9
    argmax assignment, and top-nprobe probe set, consumed by BOTH IVF
    surrogate oracles so a tie-break or rounding fix cannot reach one
    and miss the other."""
    return f"""cents AS (
      SELECT CAST(cent_id AS BIGINT) AS cent_id, cv
      FROM read_parquet('{path}/*.parquet')
    ),
    assign AS (
      SELECT e.vec_id, e.label, e.embedding, c.cent_id,
             round({_DK_COS.format(a="e.embedding", b="c.cv")}, 9) AS sim
      FROM embeddings e CROSS JOIN cents c
      WHERE e.vec_id <> 0
      QUALIFY row_number() OVER (
        PARTITION BY e.vec_id ORDER BY sim DESC, c.cent_id ASC
      ) = 1
    ),
    qcells AS (
      SELECT c.cent_id, e.embedding AS qv
      FROM embeddings e CROSS JOIN cents c
      WHERE e.vec_id = 0
      QUALIFY row_number() OVER (
        PARTITION BY e.vec_id
        ORDER BY round({_DK_COS.format(a="e.embedding", b="c.cv")}, 9) DESC,
                 c.cent_id ASC
      ) <= {_IVF_NPROBE}
    )"""


def _ann_ivf_kmeans_sql(sf_dir: str) -> str:
    """Surrogate oracle: the IVF probe POLICY conditional on the
    persisted trained centroids — DuckDB reads the same warehouse
    parquet the serving path broadcasts, then mirrors ann_ivf_probe's
    certified assignment/probe/score plan (round-9 pre-argmax, identical
    tie-breaks).  The KMeans fit itself stays pytest-verified
    (tests/test_ann.py determinism + recall invariants); what this
    certifies is everything downstream of the fit."""
    return f"""
    WITH {_ivf_probe_ctes_sql(ivf_centroid_path(sf_dir))}
    SELECT a.vec_id, a.label, a.cent_id,
           round({_DK_COS.format(a="a.embedding", b="q.qv")}, 6) AS cosine
    FROM assign a JOIN qcells q ON a.cent_id = q.cent_id
    ORDER BY cosine DESC, vec_id ASC
    LIMIT 10
    """


@register(
    "ann_ivf_kmeans",
    sql=_ann_ivf_kmeans_sql,
    doc=f"IVF ANN with TRAINED coarse centroids: MLlib KMeans (k-means|| "
    f"init, fixed seed) fits {_IVF_K} cells on the corpus, then the same "
    "probe plan as ann_ivf_probe (assign = argmax-cosine map pass, query "
    f"probes its best {_IVF_NPROBE} cells, score inside probed cells). "
    "Centroids are trained once per (sf, k, seed) on a deterministic "
    "sample and PERSISTED to a warehouse table (ivf_centroid_table) — "
    "the serving path reads + broadcasts them, never re-fits. "
    "Trained centroids track the data distribution, so cells are "
    "balanced and probing fewer cells loses less recall than with "
    "arbitrary stand-in centroids — tests/test_ann.py measures "
    "recall@10 and its monotonicity in nprobe (probed cell sets are "
    "nested by construction). SURROGATE oracle: the iterative KMeans "
    "fit is non-SQL, but the serving POLICY conditional on it is — "
    "DuckDB reads the same persisted centroid parquet and mirrors the "
    "probe plan, so assignment/probe/score are fully oracle-checked "
    "and only the fit rests on the pytest invariants.",
)
def ann_ivf_kmeans(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    corpus = e.where(F.col("vec_id") != 0)
    cents = ivf_centroid_table(spark, sf_dir)
    return ivf_topk(corpus, e.where(F.col("vec_id") == 0), cents, _IVF_NPROBE)


# Production SemDeDup runs tau ~0.95 on real embeddings; the synthetic
# near-uniform vectors only cross that at identity, so the registered
# query uses the same 0.3 "near-dup" bar as dedup_embedding_cosine to
# actually exercise the drop path (tau stays a parameter).
_SEMDEDUP_TAU = 0.3


def _semantic_clusters_sql(sf_dir: str) -> str:
    """Surrogate oracle: the SemDeDup keep/drop POLICY conditional on
    the persisted trained centroids — assignment argmax (round-9, same
    tie-break as the Spark fold), then a correlated EXISTS for the
    'keepier near-duplicate in my cluster' verdict.  Only the KMeans
    fit itself stays pytest-verified."""
    path = ivf_centroid_path(sf_dir)
    return f"""
    WITH cents AS (
      SELECT CAST(cent_id AS BIGINT) AS cent_id, cv
      FROM read_parquet('{path}/*.parquet')
    ),
    assign AS (
      SELECT e.vec_id, e.embedding, c.cent_id,
             round({_DK_COS.format(a="e.embedding", b="c.cv")}, 9) AS cent_sim
      FROM embeddings e CROSS JOIN cents c
      QUALIFY row_number() OVER (
        PARTITION BY e.vec_id ORDER BY cent_sim DESC, c.cent_id ASC
      ) = 1
    )
    SELECT a.vec_id, a.cent_id, a.cent_sim,
           NOT EXISTS (
             SELECT 1 FROM assign b
             WHERE b.cent_id = a.cent_id AND b.vec_id <> a.vec_id
               AND (b.cent_sim > a.cent_sim
                    OR (b.cent_sim = a.cent_sim AND b.vec_id < a.vec_id))
               AND round({_DK_COS.format(a="a.embedding", b="b.embedding")}, 9)
                   >= {_SEMDEDUP_TAU}
           ) AS kept
    FROM assign a
    """


@register(
    "dedup_semantic_clusters",
    sql=_semantic_clusters_sql,
    doc="SemDeDup-style semantic deduplication (Abbas et al. 2023): "
    "assign every embedding to its TRAINED KMeans cluster (the persisted "
    "ivf_centroid_table — one broadcast fold per row, no shuffle), then "
    "compare pairs ONLY within a cluster and drop a row when a "
    "'keepier' near-duplicate exists there (cosine >= tau; keep-rank = "
    "higher cosine-to-centroid, vec_id ascending as the tie-break, so "
    "the survivor set is deterministic). Differs from "
    "dedup_embedding_cosine in both blocking (learned clusters that "
    "track the data distribution vs fixed hyperplane cells) and policy "
    "(representative-by-centroid-proximity vs pair listing). Scale "
    "shape: the quadratic term is sum of cluster_size^2 — the paper's "
    "own design, kept in check by growing the cluster count with the "
    "corpus (k is a training parameter; a degenerate fit wants a re-fit "
    "with larger k, NOT sub-bucketing — splitting a cluster by hash "
    "would hide a dropped row's keepier witness in another sub-bucket), "
    "everything JVM-side. SURROGATE oracle: the KMeans fit is non-SQL, "
    "but assignment + keep/drop verdicts conditional on the persisted "
    "centroid table are fully oracle-checked in DuckDB; the fit's own "
    "invariants (witness property, tau monotonicity, determinism) stay "
    "pinned in tests/test_ann.py.",
)
def dedup_semantic_clusters(spark, sf_dir, tau: float = _SEMDEDUP_TAU):
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    _, cents_arr = _cells_sorted(ivf_centroid_table(spark, sf_dir))
    # The assignment frame feeds three consumers (both self-join sides +
    # the verdict projection); checkpoint it once so the scan + argmax
    # fold run once, matching the minhash-signature pattern (dedup.py).
    # The vector norm and the float->double cast ride along so the
    # per-PAIR cosine is one bare multiply-add dot product — recomputing
    # norms (3x) or re-casting elements per pair would multiply the
    # dominant interpreted-lambda cost (same hoists as
    # dedup_embedding_cosine).
    assign = (
        _assign_cells(e, cents_arr, keep_sim=True)
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
            "cent_id",
            "cent_sim",
            F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("vnorm"),
        )
        .localCheckpoint()
    )
    a, b = assign.alias("a"), assign.alias("b")
    keepier = (F.col("b.cent_sim") > F.col("a.cent_sim")) | (
        (F.col("b.cent_sim") == F.col("a.cent_sim"))
        & (F.col("b.vec_id") < F.col("a.vec_id"))
    )
    pair_cos = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.vnorm") * F.col("b.vnorm")
    )
    dups = a.join(
        b,
        (F.col("a.cent_id") == F.col("b.cent_id"))
        & (F.col("a.vec_id") != F.col("b.vec_id"))
        & keepier
        & (F.round(pair_cos, 9) >= F.lit(tau)),
        "left_semi",
    ).select("vec_id")
    return (
        assign.join(dups.withColumn("__dup", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cent_id",
            # cent_sim is already rounded to 9 digits by the assignment
            # fold — emit it at that precision so the output key exactly
            # reproduces the keep-rank the verdicts were decided on.
            "cent_sim",
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("kept"),
        )
    )


# ------------------------------------------------------- product quantization

_PQ_M = 8  # subvectors per embedding (64-dim → 8-dim subspaces)
_PQ_K = 16  # codes per subspace (4-bit)
_PQ_RERANK = 50  # exact-rescore candidate depth


def _sqd(a, b):
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_codebooks(
    e, m: int = _PQ_M, k: int = _PQ_K, seed: int = 7, max_iter: int = 10,
    sample_rows: int = 4096,
):
    """Train product-quantization codebooks: ``m`` independent KMeans
    fits, one per d/m-dim subspace, on the same deterministic sample
    recipe as :func:`kmeans_centroids`.  Returns (sub_idx, code_id, cv)
    — m·k tiny rows, ready to broadcast.

    PQ is the storage-side half of FAISS-style IVFPQ: a d-dim float
    vector compresses to ``m`` sub-centroid codes (here 8 codes + one
    stored norm ≈ 12 B vs 256 B raw — ~21×), which is what makes a
    100 TB embedding corpus scannable from memory.  Fitting is
    iterative and non-SQL-expressible, so PQ paths carry no DuckDB
    oracle (rows-only driver check); recall is pinned in
    tests/test_ann.py instead."""
    from pyspark.ml.functions import array_to_vector

    sample = _det_sample(e, sample_rows).select(
        F.col("embedding").cast("array<double>").alias("emb")
    )
    sample.persist()  # m fits re-scan the sample; don't recompute the top-k
    rows = []
    try:
        first = sample.first()
        if first is None:
            raise ValueError("pq_codebooks: empty input")
        dim = len(first["emb"])
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        sub = dim // m
        for j in range(m):
            feats = sample.select(
                array_to_vector(F.slice("emb", j * sub + 1, sub)).alias("features")
            )
            rows += [
                (j, c, cv)
                for c, cv in enumerate(
                    _fit_centers(feats, k, seed + j, max_iter, persist=False)
                )
            ]
    finally:
        sample.unpersist()
    return e.sparkSession.createDataFrame(
        rows, "sub_idx int, code_id int, cv array<double>"
    )


def pq_codebook_table(
    spark, sf_dir, m: int = _PQ_M, k: int = _PQ_K, seed: int = 7
):
    """Persisted PQ codebooks, trained once per (source data, m, k, seed)
    — same offline-train / broadcast-at-serve split as
    :func:`ivf_centroid_table` (see :func:`_served_model_table`)."""

    def build():
        e = t(spark, sf_dir, "embeddings")
        return pq_codebooks(
            e.where(F.col("vec_id") != 0), m=m, k=k, seed=seed
        ).coalesce(1)

    return _served_model_table(
        spark, sf_dir, "pq_codebooks", f"m{m}_k{k}_s{seed}", build
    )


def pq_codebook_path(
    sf_dir, m: int = _PQ_M, k: int = _PQ_K, seed: int = 7
) -> str:
    """Where :func:`pq_codebook_table` persists its fit."""
    return _served_model_path(sf_dir, "pq_codebooks", f"m{m}_k{k}_s{seed}")


def _codebook_array(cb):
    """Collapse (sub_idx, code_id, cv) to ONE broadcast row: ``__cb`` =
    subspace-ordered array of structs, each holding that subspace's
    code_id-sorted sub-centroid array."""
    return (
        cb.groupBy("sub_idx")
        .agg(F.array_sort(F.collect_list(F.struct("code_id", "cv"))).alias("codes"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("sub_idx", "codes"))).alias("__cb"))
    )


def _subw():
    """Subspace width, derived from the broadcast codebook itself."""
    return F.size(F.col("__cb").getItem(0)["codes"].getItem(0)["cv"])


def pq_encode(df, cb_arr, vec_col: str = "embedding"):
    """Attach ``codes`` (array<int>: per-subspace argmin-L2 sub-centroid)
    and ``vnorm`` (exact vector norm).

    A per-row JVM fold over the broadcast codebook — no shuffle, no
    Python.  array_min over (distance, code_id) structs reproduces
    (d asc, code_id asc) ranking, so ties break deterministically.  In
    production (codes, vnorm) are computed ONCE at ingest and stored in
    place of the raw vectors; here encoding runs in-query over the
    probed subset, which is the same plan shape."""
    subw = _subw()

    def best_code(s):
        # distance rounded(9) pre-argmin, same discipline as
        # _assign_cells: float-sum association differs across engines at
        # ~1e-15 and must not flip which code a near-equidistant
        # subvector gets — the surrogate DuckDB oracle mirrors the
        # rounded comparison exactly
        cands = F.transform(
            s["codes"],
            lambda cc: F.struct(
                F.round(
                    _sqd(
                        F.slice(F.col(vec_col), s["sub_idx"] * subw + 1, subw),
                        cc["cv"],
                    ),
                    9,
                ).alias("d"),
                cc["code_id"].alias("c"),
            ),
        )
        return F.array_min(cands)["c"]

    return (
        df.crossJoin(F.broadcast(cb_arr))
        .withColumn("codes", F.transform(F.col("__cb"), best_code))
        .withColumn("vnorm", F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))
        .drop("__cb")
    )


def pq_adc_rescore(encoded, query, cb_arr, k: int = 10, rerank: int = _PQ_RERANK):
    """ADC (asymmetric distance computation) + exact re-rank.

    The query side precomputes its lookup table ONCE — m·k sub-dot-
    products against every sub-centroid, materialized in the broadcast
    row — so the per-corpus-row approx score is m array LOOKUPS + adds,
    independent of d: the classic reason PQ scans beat raw-vector scans
    at memory bandwidth.  The top-``rerank`` ADC candidates are
    re-scored with EXACT cosine, so approximation only affects candidate
    selection, never the reported similarity.  ``query`` must be ONE row
    (qv) — the global top-k has no query id to partition by, so two
    query rows would silently interleave into one mixed top-k;
    multi-query callers loop or join on probed cells.  The guard is
    LAZY (a raise_error branch on the tiny query side), so building or
    EXPLAINing the plan stays side-effect-free; an empty query side
    simply yields an empty result."""
    from pyspark.sql import Window

    # Gate qv ITSELF, not a derived column: the output `cosine` depends
    # on qv, so the guard can never be optimized away (a guard on a
    # derived column like __qnorm gets pruned whenever collapsing limits
    # let Catalyst drop the approx-ordering it feeds).
    qn = F.count(F.lit(1)).over(Window.partitionBy())
    qv_type = query.schema["qv"].dataType.simpleString()
    query = query.withColumn("__qn", qn).withColumn(
        "qv",
        F.when(F.col("__qn") == 1, F.col("qv")).otherwise(
            F.raise_error(
                F.lit("pq_adc_rescore expects exactly one query row")
            ).cast(qv_type)
        ),
    ).drop("__qn")
    subw = _subw()
    lut = F.transform(
        F.col("__cb"),
        lambda s: F.transform(
            s["codes"],
            lambda cc: _dot(
                F.slice(F.col("qv"), s["sub_idx"] * subw + 1, subw), cc["cv"]
            ),
        ),
    )
    q = (
        query.crossJoin(F.broadcast(cb_arr))
        .withColumn("__lut", lut)
        .withColumn("__qnorm", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
        .drop("__cb")
    )
    approx = F.aggregate(
        F.zip_with(
            F.col("codes"), F.col("__lut"), lambda c, l: F.element_at(l, c + 1)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ) / (F.col("vnorm") * F.col("__qnorm"))
    # candidate cut ordered on round-9 approx (tie-break vec_id): the
    # rerank boundary must not move with ~1e-15 cross-engine float-sum
    # association, or the surrogate oracle's candidate set would drift
    cand = (
        encoded.crossJoin(F.broadcast(q))
        .withColumn("__approx", F.round(approx, 9))
        .orderBy(F.col("__approx").desc(), F.col("vec_id").asc())
        .limit(rerank)
    )
    return (
        cand.withColumn(
            "cosine", F.round(_cosine(F.col("embedding"), F.col("qv")), 6)
        )
        .select("vec_id", "label", "cent_id", "cosine")
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )


_DK_SQD = """
    list_sum(list_transform(list_zip({a}, {b}),
             p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))
"""

_DK_DOT = """
    list_sum(list_transform(list_zip({a}, {b}),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
"""


def _ann_ivf_pq_sql(sf_dir: str) -> str:
    """Surrogate oracle: the full IVFADC serving POLICY conditional on
    BOTH persisted fitted artifacts — coarse centroids (probe plan) and
    PQ codebooks (per-subspace argmin encode, ADC candidate ordering,
    exact-cosine re-rank).  Every comparison the Spark side rounds(9)
    pre-argmin/argmax is mirrored, so code assignment and the rerank
    boundary are engine-independent.  Subvector width is derived from
    the codebook rows (len(cv)), same as the Spark fold."""
    pqpath = pq_codebook_path(sf_dir)
    sub = "(cb.sub_idx * len(cb.cv) + 1):(cb.sub_idx * len(cb.cv) + len(cb.cv))"
    return f"""
    WITH {_ivf_probe_ctes_sql(ivf_centroid_path(sf_dir))},
    cb AS (
      SELECT sub_idx, code_id, cv FROM read_parquet('{pqpath}/*.parquet')
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    probed AS (
      SELECT a.vec_id, a.label, a.embedding, a.cent_id
      FROM assign a JOIN qcells USING (cent_id)
    ),
    -- per (row, subspace): the argmin-L2 code's sub-centroid (round-9
    -- distance, code_id tie-break — exactly pq_encode's array_min rank)
    chosen AS (
      SELECT p.vec_id, cb.sub_idx, cb.cv
      FROM probed p CROSS JOIN cb
      QUALIFY row_number() OVER (
        PARTITION BY p.vec_id, cb.sub_idx
        ORDER BY round({_DK_SQD.format(a=f"p.embedding[{sub}]", b="cb.cv")}, 9) ASC,
                 cb.code_id ASC
      ) = 1
    ),
    -- ADC numerator: sum over subspaces (in sub_idx order, like the
    -- Spark fold) of dot(query subvector, chosen sub-centroid)
    adc AS (
      SELECT cb.vec_id,
             list_sum(list(
               {_DK_DOT.format(a=f"q.qv[{sub}]", b="cb.cv")}
               ORDER BY cb.sub_idx)) AS num
      FROM chosen cb CROSS JOIN q
      GROUP BY cb.vec_id
    ),
    cand AS (
      SELECT p.vec_id, p.label, p.cent_id, p.embedding
      FROM probed p JOIN adc USING (vec_id) CROSS JOIN q
      QUALIFY row_number() OVER (
        ORDER BY round(adc.num
                   / (sqrt({_DK_DOT.format(a="p.embedding", b="p.embedding")})
                    * sqrt({_DK_DOT.format(a="q.qv", b="q.qv")})), 9) DESC,
                 p.vec_id ASC
      ) <= {_PQ_RERANK}
    )
    SELECT c.vec_id, c.label, c.cent_id,
           round({_DK_COS.format(a="c.embedding", b="q.qv")}, 6) AS cosine
    FROM cand c CROSS JOIN q
    ORDER BY cosine DESC, vec_id ASC
    LIMIT 10
    """


@register(
    "ann_ivf_pq",
    sql=_ann_ivf_pq_sql,
    doc=f"IVF-PQ ANN (FAISS-style IVFADC shape): coarse-quantize the "
    f"corpus into {_IVF_K} trained cells, probe the query's best "
    f"{_IVF_NPROBE}, PQ-encode the probed subset ({_PQ_M} 4-bit codes + "
    "a stored norm per vector — ~21× smaller than raw float32), score "
    f"by ADC table lookups, exact-cosine re-rank the top {_PQ_RERANK}. "
    "Both codebook tiers (coarse centroids, per-subspace PQ codebooks) "
    "are trained offline on deterministic samples and PERSISTED "
    "(ivf_centroid_table / pq_codebook_table); serving reads + "
    "broadcasts them. Everything after the scan is per-row JVM folds — "
    "no shuffle before the bounded top-k, no Python. SURROGATE oracle: "
    "the KMeans codebook fits are iterative (non-SQL), but the entire "
    "serving policy conditional on the two persisted artifacts — "
    "probe, encode, ADC ordering, exact re-rank — is oracle-checked in "
    "DuckDB; tests/test_ann.py additionally pins recall floors and "
    "monotonicity in rerank depth. "
    "At 100 TB this is the memory-resident scan path: raw "
    "vectors stay on disk for the re-rank fetch, the PQ codes fit in "
    "RAM.",
)
def ann_ivf_pq(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    corpus = e.where(F.col("vec_id") != 0)
    queries = e.where(F.col("vec_id") == 0)
    cents, cents_arr = _cells_sorted(ivf_centroid_table(spark, sf_dir))
    cb_arr = _codebook_array(pq_codebook_table(spark, sf_dir))
    probed_cells = _probe_cells(queries, cents, _IVF_NPROBE).select("cent_id")
    probed = _assign_cells(corpus, cents_arr).join(
        F.broadcast(probed_cells), "cent_id"
    )
    encoded = pq_encode(probed, cb_arr)
    return pq_adc_rescore(
        encoded, queries.select(F.col("embedding").alias("qv")), cb_arr
    )


# Seeded 60-bit md5 hash of doc_id: ONE definition of the cross-engine
# hash bridge for every sampler — dedup.py's _SP_H/_DK_H templates are
# the single source of the width/conv form, so a change there reaches
# both engines and all samplers together.  The SQL side is a pure
# string (usable in register() at import time); the Column side must be
# built inside a query (F.expr needs a live SparkContext).


def _check_seed(seed: str) -> str:
    """Seeds are interpolated into SQL string literals on both engines;
    restrict them so a quote can neither break the parse nor smuggle a
    different expression (public kwargs like shuffle_shard_assign's
    accept arbitrary strings)."""
    import re

    if not re.fullmatch(r"[A-Za-z0-9._:-]+", seed):
        raise ValueError(f"seed must match [A-Za-z0-9._:-]+, got {seed!r}")
    return seed


def _seeded_hash_sql(seed: str) -> str:
    from crypto_datalake_spark.queries.dedup import _DK_H

    return _DK_H.format(x=f"'{_check_seed(seed)}:' || CAST(doc_id AS VARCHAR)")


def _seeded_hash_col(seed: str):
    from crypto_datalake_spark.queries.dedup import _SP_H

    return F.expr(
        _SP_H.format(x=f"concat('{_check_seed(seed)}:', CAST(doc_id AS STRING))")
    )


_STRAT_HV_SQL = _seeded_hash_sql("s1")
_MIX_HV_SQL = _seeded_hash_sql("m1")


@register(
    "sample_stratified",
    sql=f"""
    WITH h AS (
      SELECT doc_id, lang, {_STRAT_HV_SQL} AS hv
      FROM documents
    )
    SELECT doc_id, lang, CAST(rk AS BIGINT) AS sample_rank
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk
      FROM h
    )
    WHERE rk <= 20
    """,
    doc="Deterministic stratified sampling: exactly k=20 docs per language "
    "stratum, chosen as the k smallest seeded-md5 hashes of the doc key — "
    "reproducible across runs, engines, and partitionings (no RNG state), "
    "uniform within each stratum, and re-seedable ('s1:' prefix) for "
    "disjoint resamples. The exact-k form costs one shuffle on the "
    "stratum key (rank over hv); when a FRACTION per stratum is enough, "
    "the same hash thresholded against frac*2^60 is a shuffle-FREE scan "
    "filter — the 100 TB default, with exact-k reserved for small "
    "curated splits (eval/holdout carving).",
)
def sample_stratified(spark, sf_dir):
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    hv = _seeded_hash_col("s1")
    w = Window.partitionBy("lang").orderBy("hv", "doc_id")
    return (
        d.select("doc_id", "lang", hv.alias("hv"))
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= 20)
        .select("doc_id", "lang", "sample_rank")
    )


@register(
    "sample_domain_mixture",
    sql=f"""
    WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
         m AS (SELECT min(cnt) AS mn FROM c),
         h AS (
           SELECT doc_id, lang, {_MIX_HV_SQL} AS hv
           FROM documents
         )
    SELECT h.doc_id, h.lang,
           round(CAST(mn AS DOUBLE) / cnt, 9) AS accept_rate
    FROM h JOIN c USING (lang) CROSS JOIN m
    WHERE CAST(hv AS DOUBLE) / 1152921504606846976.0
          < CAST(mn AS DOUBLE) / cnt
    """,
    doc="Domain-mixture rebalancing (the DoReMi / Pile-style data-mixing "
    "primitive): downsample each language domain at acceptance rate "
    "min_count/count so the surviving corpus is a UNIFORM mixture whose "
    "budget is set by the scarcest domain — the rate generalizes to any "
    "target weight vector as target_share*budget/count. Acceptance is a "
    "seeded-md5 hash threshold ('m1:' prefix), so the sample is "
    "deterministic across runs, engines, and partitionings, and "
    "per-domain subsets are uniform. Scale shape: one tiny per-domain "
    "count agg (|domains| rows, broadcast back), then a shuffle-FREE "
    "map-side filter over the corpus — the only window runs over the "
    "|domains|-row aggregated frame (never the corpus), no rank over "
    "data, cost = one count pass + one "
    "scan at 100 TB.",
)
def sample_domain_mixture(spark, sf_dir):
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    # min(cnt) via an unpartitioned window over the ALREADY-AGGREGATED
    # |domains|-row frame — a separate c.agg(min) branch would re-scan
    # and re-count the corpus (no plan reuse without caching); this way
    # the corpus is counted once and the single-task window only ever
    # sees |domains| rows.
    c = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("mn", F.min("cnt").over(Window.partitionBy()))
    )
    hv = _seeded_hash_col("m1")
    rate = F.col("mn").cast("double") / F.col("cnt")
    return (
        d.join(F.broadcast(c), "lang")
        .where(hv.cast("double") / F.lit(float(1 << 60)) < rate)
        .select("doc_id", "lang", F.round(rate, 9).alias("accept_rate"))
    )


_TEMP_HV_SQL = _seeded_hash_sql("t1")


@register(
    "sample_temperature_mixture",
    sql=f"""
    WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
         m AS (SELECT min(cnt) AS mn FROM c),
         h AS (
           SELECT doc_id, lang, {_TEMP_HV_SQL} AS hv
           FROM documents
         )
    SELECT h.doc_id, h.lang,
           round(sqrt(CAST(mn AS DOUBLE) / cnt), 9) AS accept_rate
    FROM h JOIN c USING (lang) CROSS JOIN m
    WHERE CAST(hv AS DOUBLE) / 1152921504606846976.0
          < sqrt(CAST(mn AS DOUBLE) / cnt)
    """,
    doc="Temperature-based mixture sampling (the XLM-R / mC4 multilingual "
    "recipe, T = 2): target share ∝ p_i^(1/T), realized filter-only "
    "(no upsampling — duplication is the trainer's epoch knob) as "
    "acceptance rate p_i^(1/T−1) normalized so the SCARCEST domain is "
    "kept whole, which at T = 2 is exactly sqrt(cnt_min/cnt_i). "
    "Flatter than uniform rebalancing: head domains keep sqrt-"
    "proportionally more mass than sample_domain_mixture's min/cnt "
    "while the tail is still boosted. sqrt and the count ratio are "
    "both CORRECTLY-ROUNDED IEEE ops, so the acceptance threshold is "
    "bit-identical across engines with no pow() cross-engine hazard "
    "(a general-T variant would need the round-then-compare guard). "
    "Same scale shape as sample_domain_mixture: one |domains|-row "
    "count agg broadcast back, then a shuffle-free seeded-md5 "
    "('t1:' prefix) hash-threshold scan filter.",
)
def sample_temperature_mixture(spark, sf_dir):
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    c = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("mn", F.min("cnt").over(Window.partitionBy()))
    )
    hv = _seeded_hash_col("t1")
    rate = F.sqrt(F.col("mn").cast("double") / F.col("cnt"))
    return (
        d.join(F.broadcast(c), "lang")
        .where(hv.cast("double") / F.lit(float(1 << 60)) < rate)
        .select("doc_id", "lang", F.round(rate, 9).alias("accept_rate"))
    )


@register(
    "corpus_vocab_stats",
    sql="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT token,
           CAST(count(*) AS BIGINT) AS tf,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS df
    FROM tok
    GROUP BY token
    ORDER BY tf DESC, token
    LIMIT 50
    """,
    doc="Corpus vocabulary statistics: term frequency and document "
    "frequency per token, top-50 by tf — the tokenizer-training / "
    "stopword-mining / idf-weighting primitive. Skew-safe shape for "
    "stopword-grade hot tokens: tf is a plain count (map-side partial "
    "aggregation collapses each token to one row per task before the "
    "shuffle — a hot key costs nothing extra), and df first dedups "
    "(token, doc_id) PAIRS (shuffle key includes doc_id, so 'the' "
    "spreads over every partition) and only then counts per token, "
    "again partial-aggregated. A single mixed count+countDistinct agg "
    "would instead Expand the exploded stream and funnel every distinct "
    "(hot-token, doc) pair through one reducer. The final top-k is a "
    "TakeOrdered over the vocab-sized frame, never the token stream.",
)
def corpus_vocab_stats(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    df_ = (
        tok.distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    return (
        tf.join(df_, "token")
        .orderBy(F.col("tf").desc(), "token")
        .limit(50)
    )


def _corpus_curation_sql() -> str:
    from crypto_datalake_spark.queries.dedup import _DK_LSH_CTES, _JACCARD_MIN

    return f"""
    WITH RECURSIVE {_DK_LSH_CTES},
    pairs AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN sh x ON x.doc_id = c.doc_a
      JOIN sh y ON y.doc_id = c.doc_b
      WHERE CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
              / CAST(len(list_distinct(x.shingles || y.shingles)) AS DOUBLE)
            >= {_JACCARD_MIN}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach(doc, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc
    ),
    lab AS (
      SELECT doc AS doc_id, min(label) AS cluster_id FROM reach GROUP BY doc
    ),
    prof AS (
      SELECT doc_id, lang, n_chars, string_split(text, ' ') AS tok
      FROM documents
    ),
    q AS (
      SELECT doc_id, lang,
             CAST(len(tok) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(tok, x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
               / CAST(len(tok) AS DOUBLE) AS stopword_ratio,
             CAST(len(list_distinct(tok)) AS DOUBLE) / CAST(len(tok) AS DOUBLE) AS ttr,
             CAST(n_chars AS DOUBLE) / CAST(len(tok) AS DOUBLE) AS chars_per_token
      FROM prof
    )
    SELECT q.doc_id,
           q.doc_id = lab.cluster_id AS is_canonical,
           q.n_tokens >= 10
             AND q.ttr >= 0.3
             AND q.chars_per_token BETWEEN 2.0 AND 12.0 AS quality_pass,
           (q.doc_id = lab.cluster_id)
             AND q.n_tokens >= 10
             AND q.ttr >= 0.3
             AND q.chars_per_token BETWEEN 2.0 AND 12.0 AS kept
    FROM q JOIN lab ON lab.doc_id = q.doc_id
    """


@register(
    "corpus_curation",
    sql=_corpus_curation_sql(),
    doc="END-TO-END corpus curation — the composition the individual "
    "operators exist for: near-dup clustering picks one canonical doc "
    "per component (dedup_cluster_canonical), quality gates drop "
    "degenerate text (min tokens, type-token ratio, chars-per-token "
    "band), and `kept` is the final selection a training run reads. "
    "One boolean per gate so removal accounting per reason falls out of "
    "a groupBy. The dedup arm is the bucketed LSH + iterative-CC "
    "pipeline (never O(n²)); the quality arm is a single codegen'd "
    "scan; the join is on doc_id (co-partitioned with the cluster "
    "labels it just produced). At 100 TB the kept-flag frame is the "
    "cheap artifact to persist — the corpus rewrite reads it semi-joined "
    "against the raw text.",
)
def corpus_curation(spark, sf_dir):
    from crypto_datalake_spark.queries.dedup import dedup_cluster_canonical

    labels = dedup_cluster_canonical(spark, sf_dir).select("doc_id", "is_canonical")
    d = t(spark, sf_dir, "documents")
    tok = F.split("text", " ")
    n_tok = F.size(tok)
    quality = (
        (n_tok.cast("long") >= 10)
        & ((F.size(F.array_distinct(tok)).cast("double") / n_tok.cast("double")) >= 0.3)
        & (
            (F.col("n_chars").cast("double") / n_tok.cast("double")).between(2.0, 12.0)
        )
    )
    q = d.select("doc_id", quality.alias("quality_pass"))
    return q.join(labels, "doc_id").select(
        "doc_id",
        "is_canonical",
        "quality_pass",
        (F.col("is_canonical") & F.col("quality_pass")).alias("kept"),
    )


# --------------------------------------------------------- quality classifier


def doc_quality_features():
    """Per-document feature vector for the quality classifier, as one
    JVM-evaluated ``array<double>`` — log token count, stopword ratio,
    type-token ratio, chars-per-token.  Unbound column expressions over
    ``text``/``n_chars`` (the same heuristics text_profile emits), so
    feature extraction is a map pass with zero Python at any scale."""
    tok = F.split("text", " ")
    n_tok = F.size(tok).cast("double")
    n_stop = stop_count_expr(tok).cast("double")
    return F.array(
        F.log1p(n_tok),
        n_stop / n_tok,
        F.size(F.array_distinct(tok)).cast("double") / n_tok,
        F.col("n_chars").cast("double") / n_tok,
    )


def _weak_quality_label():
    """Weak supervision stand-in for human quality ratings: a document is
    'quality' when it reads like running prose (carries a meaningful
    stopword share).  Defined as a threshold on feature[1] of
    doc_quality_features, so the class is linearly separable in the
    feature space BY CONSTRUCTION and the fit's correctness is testable.
    In production these labels come from human raters or a teacher
    model; the weak rule keeps the pipeline deterministic and
    self-contained, and what the tests certify is the MACHINERY —
    offline fit, persisted coefficients, broadcast scoring — not the
    label source (same posture as the stubbed multimodal decode)."""
    return (doc_quality_features()[1] > 0.03).cast("double")


def _fit_quality_model(spark, sf_dir, sample_rows: int):
    """Offline LogisticRegression fit on the deterministic document
    sample; returns (weights: list[float], intercept: float).  Separated
    from the cache wrapper so tests can re-run the fit and pin its
    determinism (the cached table alone would never retrain)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    d = t(spark, sf_dir, "documents")
    train = _det_sample(d, sample_rows, id_col="doc_id").select(
        array_to_vector(doc_quality_features()).alias("features"),
        _weak_quality_label().alias("label"),
    )
    train.persist()
    try:
        model = LogisticRegression(
            maxIter=50, regParam=0.01, standardization=True
        ).fit(train)
    finally:
        train.unpersist()
    return [float(x) for x in model.coefficients], float(model.intercept)


def quality_model_table(spark, sf_dir, sample_rows: int = 4096):
    """Persisted logistic quality model: ONE row (weights array<double>,
    intercept) trained by MLlib LogisticRegression on the deterministic
    document sample with weak labels — same offline-train /
    broadcast-at-serve split as the IVF/PQ model tables."""

    def build():
        w, b = _fit_quality_model(spark, sf_dir, sample_rows)
        return spark.createDataFrame(
            [(w, b)], "weights array<double>, intercept double"
        )

    return _served_model_table(
        spark, sf_dir, "quality_logreg", f"n{sample_rows}_v3", build,
        source="documents.parquet",
    )


def quality_model_path(sf_dir, sample_rows: int = 4096) -> str:
    """Where :func:`quality_model_table` persists its fit."""
    return _served_model_path(
        sf_dir, "quality_logreg", f"n{sample_rows}_v3",
        source="documents.parquet",
    )


def _quality_classifier_sql(sf_dir: str) -> str:
    """Surrogate oracle: the SCORING policy conditional on the persisted
    fitted coefficients — DuckDB reads the one-row (weights, intercept)
    table and recomputes feature extraction + dot + sigmoid with the
    same evaluation order as the Spark fold.  Only the iterative
    LogisticRegression fit stays pytest-verified (determinism +
    learns-the-separable-rule in tests/test_ann.py)."""
    path = quality_model_path(sf_dir)
    sw = ", ".join(repr(w) for w in _STOPWORDS)
    return f"""
    WITH model AS (
      SELECT weights, intercept FROM read_parquet('{path}/*.parquet')
    ),
    feat AS (
      SELECT doc_id,
             CAST(len(tok) AS DOUBLE) AS n_tok,
             CAST(len(list_filter(tok, x -> x IN ({sw}))) AS DOUBLE) AS n_stop,
             CAST(len(list_distinct(tok)) AS DOUBLE) AS n_uniq,
             CAST(n_chars AS DOUBLE) AS nc
      FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS tok
            FROM documents)
    ),
    scored AS (
      SELECT doc_id,
             1.0 / (1.0 + exp(-(m.intercept
               + (ln(1.0 + n_tok)   * m.weights[1]
                  + (n_stop / n_tok) * m.weights[2]
                  + (n_uniq / n_tok) * m.weights[3]
                  + (nc / n_tok)     * m.weights[4])))) AS prob
      FROM feat CROSS JOIN model m
    )
    SELECT doc_id,
           round(prob, 6) AS quality_prob,
           round(prob, 9) >= 0.5 AS quality_label
    FROM scored
    """


@register(
    "quality_score_classifier",
    sql=_quality_classifier_sql,
    doc="Supervised quality scoring at lake scale: a logistic classifier "
    "trained OFFLINE (MLlib, deterministic sample, weak prose-heuristic "
    "labels standing in for human ratings) and persisted as a one-row "
    "coefficient table (quality_model_table); serving broadcasts the "
    "coefficients and scores every document with a single JVM-evaluated "
    "dot-product + sigmoid map pass (higher-order array fns — "
    "interpreted-lambda, not whole-stage codegen, but zero Python and "
    "no data shuffle beyond the broadcast) — cost = one "
    "scan regardless of corpus size. The model-quality scorer every "
    "curation pipeline runs (fastText/teacher-model shaped), reduced to "
    "its Spark-side plumbing. SURROGATE oracle: the iterative fit is "
    "non-SQL, but feature extraction + dot + sigmoid conditional on "
    "the persisted coefficient table are oracle-checked in DuckDB; "
    "tests additionally pin fit determinism and that the served scores "
    "reproduce the training labels on the full corpus.",
)
def quality_score_classifier(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    w = quality_model_table(spark, sf_dir)
    z = F.col("intercept") + F.aggregate(
        F.zip_with(
            doc_quality_features(), F.col("weights"), lambda x, wi: x * wi
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # Materialize prob once: higher-order fns are CodegenFallback, so the
    # optimizer would otherwise inline and evaluate the full feature +
    # sigmoid expression twice (once per output column).
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (
        d.crossJoin(F.broadcast(w))
        .select("doc_id", prob.alias("_prob"))
        .select(
            "doc_id",
            F.round("_prob", 6).alias("quality_prob"),
            # threshold on the round-9 prob: JVM and DuckDB exp() may
            # differ in the last ulp, and a document landing within
            # ~1e-16 of 0.5 must not flip labels across engines (same
            # discipline as every round-9 argmin/argmax comparison)
            (F.round("_prob", 9) >= 0.5).alias("quality_label"),
        )
    )


def _model_artifact_specs(sf_dir: str):
    """One ``(paths_fn, build_fn)`` pair per persisted fitted artifact.
    MUST grow with every new served-model oracle: the driver's
    oracle-first pre-build guard (__spark_entry__.oracle_sql) decides
    from this list whether any artifact is missing.

    ``paths_fn`` raises OSError when that artifact's SOURCE files are
    absent (fingerprinting stats them) — callers treat that as
    "unbuildable here, skip just this one", matching the per-query
    degradation in registry.resolved_sql, instead of letting one absent
    source veto the pre-build of every OTHER artifact."""
    from crypto_datalake_spark.queries import (
        curation,
        pca,
        retrieval,
        tokenizer,
        tokenizer_unigram,
    )

    return [
        (lambda: [ivf_centroid_path(sf_dir)],
         lambda spark: ivf_centroid_table(spark, sf_dir)),
        (lambda: [pq_codebook_path(sf_dir)],
         lambda spark: pq_codebook_table(spark, sf_dir)),
        (lambda: [quality_model_path(sf_dir)],
         lambda spark: quality_model_table(spark, sf_dir)),
        # three paths, one ordered build (bigram/ctx feed meta)
        (lambda: curation.lm_model_paths(sf_dir),
         lambda spark: curation.lm_model_tables(spark, sf_dir)),
        (lambda: curation.tfidf_model_paths(sf_dir),
         lambda spark: curation.tfidf_model_tables(spark, sf_dir)),
        # four paths, one ordered build (kept feeds bigram/ctx/meta)
        (lambda: curation.lm_unk_model_paths(sf_dir),
         lambda spark: curation.lm_unk_model_tables(spark, sf_dir)),
        # two paths, one ordered build (vocab + corpus-stats meta)
        (lambda: retrieval.bm25_model_paths(sf_dir),
         lambda spark: retrieval.bm25_model_tables(spark, sf_dir)),
        # three paths, one shared driver-side fit (merges/vocab/words)
        (lambda: tokenizer.bpe_model_paths(sf_dir),
         lambda spark: tokenizer.bpe_model_tables(spark, sf_dir)),
        # two paths, one shared Viterbi-EM fit (vocab + word->pieces)
        (lambda: tokenizer_unigram.unigram_model_paths(sf_dir),
         lambda spark: tokenizer_unigram.unigram_model_tables(spark, sf_dir)),
        # two paths, one shared eigenfit (components + mean)
        (lambda: pca.pca_model_paths(sf_dir),
         lambda spark: pca.pca_model_tables(spark, sf_dir)),
        # KMeans centroids in PCA space (build pulls the eigenfit first)
        (lambda: [pca.ivf_pca_centroid_path(sf_dir)],
         lambda spark: pca.ivf_pca_centroid_table(spark, sf_dir)),
        # two paths, one ordered build (ratio table + totals/cutoff meta)
        (lambda: curation.dsir_model_paths(sf_dir),
         lambda spark: curation.dsir_model_tables(spark, sf_dir)),
    ]


def model_artifact_paths(sf_dir: str) -> list[str]:
    """Every persisted fitted artifact the surrogate oracles read.
    Raises OSError if ANY artifact's sources are absent — use
    :func:`missing_model_builds` for per-artifact tolerance."""
    return [p for paths_fn, _ in _model_artifact_specs(sf_dir)
            for p in paths_fn()]


def missing_model_builds(sf_dir: str) -> list:
    """Build thunks (``spark -> None``) for every artifact that is
    BUILDABLE (sources present) but absent on disk.  Per-artifact: an
    artifact whose sources are missing is skipped — its surrogate
    oracle degrades to the rows-only check in registry.resolved_sql —
    while artifacts whose sources ARE present still pre-build (the
    partially-present-sf_dir case the all-or-nothing guard got wrong)."""
    import os

    out = []
    for paths_fn, build_fn in _model_artifact_specs(sf_dir):
        try:
            paths = paths_fn()
        except OSError:
            continue  # sources absent: unbuildable, oracle degrades
        if not all(os.path.exists(p) for p in paths):
            out.append(build_fn)
    return out


def ensure_model_tables(spark, sf_dir: str) -> None:
    """Build every missing-but-buildable persisted fitted artifact for
    ``sf_dir`` — called before handing surrogate oracle SQL to a
    consumer that may execute it ahead of the Spark queries (the
    artifacts are otherwise built lazily on each query's first run).
    Artifacts whose sources are absent are skipped (see
    :func:`missing_model_builds`)."""
    for build in missing_model_builds(sf_dir):
        build(spark)


_BUDGET_TOKENS = 50_000  # total training-token budget for the plan


@register(
    "sample_token_budget_plan",
    sql=f"""
    WITH a AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT)
               AS avail_tokens
      FROM documents GROUP BY source
    ),
    n AS (SELECT count(*) AS n_domains FROM a)
    SELECT source, n_docs, avail_tokens,
           CAST({_BUDGET_TOKENS} AS DOUBLE) / n_domains AS target_tokens,
           CASE WHEN CAST({_BUDGET_TOKENS} AS DOUBLE) / n_domains
                     <= CAST(avail_tokens AS DOUBLE)
                THEN CAST(1 AS BIGINT)
                ELSE CAST(ceil((CAST({_BUDGET_TOKENS} AS DOUBLE) / n_domains)
                          / CAST(avail_tokens AS DOUBLE)) AS BIGINT)
           END AS epochs,
           round((CAST({_BUDGET_TOKENS} AS DOUBLE) / n_domains)
                 / (CAST(avail_tokens AS DOUBLE)
                    * CASE WHEN CAST({_BUDGET_TOKENS} AS DOUBLE) / n_domains
                                <= CAST(avail_tokens AS DOUBLE)
                           THEN 1
                           ELSE CAST(ceil((CAST({_BUDGET_TOKENS} AS DOUBLE)
                                           / n_domains)
                                     / CAST(avail_tokens AS DOUBLE)) AS BIGINT)
                      END), 9) AS rate
    FROM a CROSS JOIN n
    """,
    doc="Token-budget mixture plan (the data-recipe step ahead of "
    "sample_domain_mixture): per source domain, available tokens, the "
    "uniform-mixture token target for a fixed total budget, the epoch "
    "count (upsampling by repetition when the target exceeds the "
    "domain's supply — the LLaMA-recipe shape), and the per-epoch "
    "acceptance rate sized so expected sampled tokens hit the target "
    "exactly. One per-domain aggregate (domain-count-sized frame "
    "broadcast back); the plan rows then parameterize the shuffle-free "
    "hash-threshold sampler. All double arithmetic, rounded to 9 dp — "
    "full static DuckDB oracle.",
)
def sample_token_budget_plan(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    a = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("avail_tokens"),
    )
    n = a.agg(F.count(F.lit(1)).alias("n_domains"))
    j = a.crossJoin(F.broadcast(n))
    target = F.lit(float(_BUDGET_TOKENS)) / F.col("n_domains")
    avail = F.col("avail_tokens").cast("double")
    epochs = F.when(target <= avail, F.lit(1).cast("long")).otherwise(
        F.ceil(target / avail).cast("long")
    )
    return j.select(
        "source",
        "n_docs",
        "avail_tokens",
        target.alias("target_tokens"),
        epochs.alias("epochs"),
        F.round(target / (avail * epochs.cast("double")), 9).alias("rate"),
    )
