"""Corpus-curation operators: repetition filters, benchmark
decontamination, and ANN recall evaluation.

Training-data-pipeline extensions beyond the reference surface (the
reference is a market-data lake; these are the operators a 100 TB text
corpus pipeline needs on top — BASELINE.json north star). Companions to
queries/dedup.py (near-dup tiers) and queries/llm.py (quality, ANN).

Scale notes:
- Repetition signals use the EXPLODE + groupBy shape, not per-row
  array_distinct-then-count-each loops: an array higher-order form is
  O(distinct x len) PER DOCUMENT, fine for short docs but quadratic for
  book-length ones; the explode form is one shuffle on (doc_id, token)
  and stays linear regardless of document length.
- Decontamination joins the corpus n-gram index against the DISTINCT
  benchmark-gram set. Benchmark suites are tiny (a few thousand docs)
  even when the corpus is 100 TB, so the gram set broadcasts; the
  corpus side is one explode + one broadcast-hash-join, no shuffle of
  the corpus at all.
- Recall evaluation runs the exact (brute-force) arm only over the
  sampled query set — the gold standard costs |Q| x |corpus| dot
  products, which is why |Q| is a sample; the LSH arm is the production
  path being graded.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crypto_datalake_spark.queries.common import t
from crypto_datalake_spark.queries.dedup import (
    _DK_H,
    _JACCARD_MIN,
    _SP_H,
    dk_band_cand_sql,
)
from crypto_datalake_spark.queries.llm import (
    _cosine,
    _seeded_hash_sql,
    _dk_bucket,
    _dk_plane_dot,
    _DK_COS,
    _flip_sql,
    _PLANES,
    _sp_bucket,
    _sp_plane_dots,
)
from crypto_datalake_spark.queries.registry import register


def _mp_qp_rows() -> str:
    """Per-eval-query plane-margin rows for the multi-probe arm (qid
    carried through, unlike llm._mp_probes_sql's single-query form)."""
    return " UNION ALL ".join(
        f"SELECT qid, qb, {i} AS i, {_dk_plane_dot('qv', p)} AS d FROM q"
        for i, p in enumerate(_PLANES)
    )

# Gopher-style repetition thresholds (Rae et al. 2021 use 0.2 for the
# top-token fraction and ~0.2 for duplicate n-gram fractions; the
# synthetic corpus is word-salad so the bigram threshold is looser here
# to keep both flag outcomes populated).
_TOP_TOKEN_MAX = 0.2
_DUP_BIGRAM_MAX = 0.4


@register(
    "quality_repetition_signals",
    sql="""
    WITH tk AS (
      SELECT doc_id, string_split(text, ' ') AS tok FROM documents
    ),
    tc AS (
      SELECT doc_id, w, count(*) AS c
      FROM (SELECT doc_id, unnest(tok) AS w FROM tk)
      GROUP BY doc_id, w
    ),
    pd AS (
      SELECT doc_id, max(c) AS top_cnt, CAST(sum(c) AS BIGINT) AS n_tokens
      FROM tc GROUP BY doc_id
    ),
    bs AS (
      SELECT doc_id, count(*) AS n_bigrams, count(DISTINCT b) AS n_bg_distinct
      FROM (SELECT doc_id, unnest([tok[i] || ' ' || tok[i + 1]
                                   for i in range(1, len(tok))]) AS b
            FROM tk WHERE len(tok) >= 2)
      GROUP BY doc_id
    )
    SELECT pd.doc_id,
           n_tokens,
           CAST(top_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_frac,
           COALESCE(CAST(n_bigrams - n_bg_distinct AS DOUBLE)
                    / CAST(n_bigrams AS DOUBLE), 0.0) AS dup_bigram_frac,
           (CAST(top_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 0.2
            OR COALESCE(CAST(n_bigrams - n_bg_distinct AS DOUBLE)
                        / CAST(n_bigrams AS DOUBLE), 0.0) > 0.4) AS repetitive
    FROM pd LEFT JOIN bs ON pd.doc_id = bs.doc_id
    """,
    doc="Gopher-style repetition signals: most-frequent-token fraction and "
    "duplicate-bigram occurrence fraction per document, with a pass/fail "
    "flag. Uses the explode+groupBy shape (one shuffle on (doc_id, "
    "token)) instead of per-row array loops, so cost stays LINEAR in "
    "document length — an array_distinct-then-count-each expression is "
    "O(distinct x len) per row and dies on book-length docs at 100 TB. "
    "Training-data extension; no reference analogue (market-data lake).",
)
def quality_repetition_signals(spark, sf_dir):
    return repetition_signals(t(spark, sf_dir, "documents"))


def repetition_signals(docs):
    """Repetition signals over a (doc_id, text, ...) frame — the
    DataFrame-level op behind ``quality_repetition_signals``."""
    d = docs.select("doc_id", F.split("text", " ").alias("tok"))
    tc = (
        d.select("doc_id", F.explode("tok").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pd_ = tc.groupBy("doc_id").agg(
        F.max("c").alias("top_cnt"), F.sum("c").alias("n_tokens")
    )
    bs = (
        d.where(F.size("tok") >= 2)
        .select(
            "doc_id",
            # CASE-guarded: the optimizer infers `size(...) > 0` from the
            # explode and pushes the inlined array expr into the scan
            # filter, where codegen subexpression elimination evaluates it
            # BEFORE the size(tok) >= 2 conjunct can short-circuit — on a
            # short doc, sequence(0, size-2) turns descending and tok[i+1]
            # throws under ANSI. The guard makes the expression total.
            F.explode(
                F.expr(
                    "CASE WHEN size(tok) >= 2 THEN transform("
                    "sequence(0, size(tok) - 2), "
                    "i -> concat(tok[i], ' ', tok[i + 1])) "
                    "ELSE CAST(array() AS array<string>) END"
                )
            ).alias("b"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.countDistinct("b").alias("n_bg_distinct"),
        )
    )
    top_frac = F.col("top_cnt").cast("double") / F.col("n_tokens").cast("double")
    dup_frac = F.coalesce(
        (F.col("n_bigrams") - F.col("n_bg_distinct")).cast("double")
        / F.col("n_bigrams").cast("double"),
        F.lit(0.0),
    )
    return pd_.join(bs, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        top_frac.alias("top_token_frac"),
        dup_frac.alias("dup_bigram_frac"),
        ((top_frac > _TOP_TOKEN_MAX) | (dup_frac > _DUP_BIGRAM_MAX)).alias(
            "repetitive"
        ),
    )


# word-trigram 60-bit gram hash (same md5 bridge as queries/dedup.py)
_SP_TRIH = _SP_H.format(x="concat(tok[i], ' ', tok[i + 1], ' ', tok[i + 2])")
_DK_TRIH = _DK_H.format(x="tok[i] || ' ' || tok[i + 1] || ' ' || tok[i + 2]")

# deterministic benchmark holdout: ~1% of docs stand in for an eval
# suite (the thing decontamination protects).
_BENCH_MOD = 97
_CONTAM_MIN = 0.2


@register(
    "decontam_ngram_overlap",
    sql=f"""
    WITH tk AS (
      SELECT doc_id, string_split(text, ' ') AS tok FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_distinct([{_DK_TRIH} for i in range(1, len(tok) - 1)]) AS grams
      FROM tk WHERE len(tok) >= 3
    ),
    bench AS (
      SELECT DISTINCT unnest(grams) AS gh FROM g WHERE doc_id % {_BENCH_MOD} = 0
    ),
    corp AS (SELECT doc_id, grams FROM g WHERE doc_id % {_BENCH_MOD} <> 0),
    hits AS (
      SELECT doc_id, count(*) AS n_hit
      FROM (SELECT doc_id, unnest(grams) AS gh FROM corp) c
      JOIN bench USING (gh)
      GROUP BY doc_id
    )
    SELECT corp.doc_id,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_overlap,
           CAST(COALESCE(n_hit, 0) AS DOUBLE) / CAST(len(grams) AS DOUBLE)
             AS overlap_frac,
           CAST(COALESCE(n_hit, 0) AS DOUBLE) / CAST(len(grams) AS DOUBLE)
             >= {_CONTAM_MIN} AS contaminated
    FROM corp LEFT JOIN hits ON corp.doc_id = hits.doc_id
    """,
    doc="Benchmark decontamination: fraction of each corpus document's "
    "distinct word-trigrams that appear anywhere in the benchmark "
    f"holdout (doc_id % {_BENCH_MOD} = 0 stands in for an eval suite). "
    "Grams are 60-bit md5 ints; the DISTINCT benchmark-gram set is tiny "
    "relative to any corpus, so it BROADCASTS — the corpus side is one "
    "explode + broadcast-hash-join + per-doc count, zero corpus "
    "shuffles besides the final doc_id aggregation. The standard "
    "pre-training hygiene step (GPT-3 Appendix C / PaLM style).",
)
def decontam_ngram_overlap(spark, sf_dir):
    return decontam_overlap(t(spark, sf_dir, "documents"))


def decontam_overlap(docs, bench_mod: int = _BENCH_MOD, threshold: float = _CONTAM_MIN):
    """Benchmark-overlap decontamination over a (doc_id, text, ...) frame —
    the DataFrame-level op behind ``decontam_ngram_overlap``.

    ONE full-corpus gram pass plus a ~1/bench_mod bench pass: the
    distinct-gram arrays are exploded once to (doc_id, gh) grain, the tiny
    benchmark-gram set is broadcast-left-joined as a hit FLAG, and a single
    groupBy(doc_id) produces both n_grams (count of distinct grams) and
    n_overlap (sum of hits).  `ge` is deliberately uncached, so the bench
    branch re-evaluates the md5 gram expression over the doc_id % bench_mod
    slice — a second pass over ~1/bench_mod of the corpus, negligible next
    to the full pass.  The earlier shape evaluated the gram expression
    three times at FULL corpus grain (bench branch, hits explode, final
    doc-spine join) — at 100 TB that is three full corpus hash passes
    instead of ~1.05.
    """
    d = docs.select("doc_id", F.split("text", " ").alias("tok"))
    # CASE-guarded for the same reason as repetition_signals' bigrams: the
    # inferred-from-explode filter inlines this expr next to the size guard
    # and subexpression elimination defeats AND short-circuiting
    ge = d.where(F.size("tok") >= 3).select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(tok) >= 3 THEN array_distinct(transform("
                f"sequence(0, size(tok) - 3), i -> {_SP_TRIH})) "
                "ELSE CAST(array() AS array<bigint>) END"
            )
        ).alias("gh"),
    )
    # doc_id % mod pushes below the Generate to the scan, so the bench
    # branch only hashes ~1/mod of the corpus
    bench = (
        ge.where(F.col("doc_id") % bench_mod == 0)
        .select("gh")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    agg = (
        ge.where(F.col("doc_id") % bench_mod != 0)
        .join(F.broadcast(bench), "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_overlap"),
        )
    )
    frac = F.col("n_overlap").cast("double") / F.col("n_grams").cast("double")
    return agg.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_overlap").cast("long").alias("n_overlap"),
        frac.alias("overlap_frac"),
        (frac >= threshold).alias("contaminated"),
    )


_Q_MOD = 101  # every 101st vec_id is a query → 5 queries at sf0.01, 20 at sf0.1
_K = 10


@register(
    "ann_recall_eval",
    sql=f"""
    WITH bk AS (
      SELECT vec_id, embedding, {_dk_bucket("embedding")} AS bucket
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS qid, embedding AS qv, bucket AS qb
      FROM bk WHERE vec_id % {_Q_MOD} = 0
    ),
    exact AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, bk.vec_id,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY round({_DK_COS.format(a="bk.embedding", b="q.qv")}, 6)
                          DESC, bk.vec_id ASC) AS rn
        FROM bk CROSS JOIN q
        WHERE bk.vec_id <> q.qid
      ) WHERE rn <= {_K}
    ),
    lsh AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, bk.vec_id,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY round({_DK_COS.format(a="bk.embedding", b="q.qv")}, 6)
                          DESC, bk.vec_id ASC) AS rn
        FROM bk JOIN q ON bk.bucket = q.qb AND bk.vec_id <> q.qid
      ) WHERE rn <= {_K}
    ),
    qp AS ({_mp_qp_rows()}),
    selp AS (
      SELECT qid, qb,
             min(CASE WHEN r = 1 THEN i END) AS p1,
             min(CASE WHEN r = 2 THEN i END) AS p2
      FROM (SELECT *, row_number() OVER (
              PARTITION BY qid ORDER BY abs(d) ASC, i ASC) AS r FROM qp)
      GROUP BY qid, qb
    ),
    probes AS (
      SELECT DISTINCT qid, pb FROM (
        SELECT qid, qb AS pb FROM selp
        UNION ALL SELECT qid, {_flip_sql("qb", "p1")} FROM selp
        UNION ALL SELECT qid, {_flip_sql("qb", "p2")} FROM selp
        UNION ALL SELECT qid, {_flip_sql(f"({_flip_sql('qb', 'p1')})", "p2")} FROM selp
      )
    ),
    mp AS (
      SELECT qid, vec_id FROM (
        SELECT p.qid, bk.vec_id,
               row_number() OVER (
                 PARTITION BY p.qid
                 ORDER BY round({_DK_COS.format(a="bk.embedding", b="q.qv")}, 6)
                          DESC, bk.vec_id ASC) AS rn
        FROM bk
        JOIN probes p ON bk.bucket = p.pb
        JOIN q ON q.qid = p.qid AND bk.vec_id <> p.qid
      ) WHERE rn <= {_K}
    ),
    hit AS (
      SELECT exact.qid, count(*) AS n_hit
      FROM exact JOIN lsh ON exact.qid = lsh.qid AND exact.vec_id = lsh.vec_id
      GROUP BY exact.qid
    ),
    hitmp AS (
      SELECT exact.qid, count(*) AS n_hit_mp
      FROM exact JOIN mp ON exact.qid = mp.qid AND exact.vec_id = mp.vec_id
      GROUP BY exact.qid
    )
    SELECT q.qid,
           CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
           CAST(COALESCE(n_hit, 0) AS DOUBLE) / {_K}.0 AS recall_at_{_K},
           CAST(COALESCE(n_hit_mp, 0) AS BIGINT) AS n_hit_mp,
           CAST(COALESCE(n_hit_mp, 0) AS DOUBLE) / {_K}.0 AS recall_mp_at_{_K}
    FROM q LEFT JOIN hit ON q.qid = hit.qid
           LEFT JOIN hitmp ON q.qid = hitmp.qid
    """,
    doc="ANN recall harness: recall@10 of the hyperplane-LSH index "
    "(ann_lsh_bucketed's production path) against the exact brute-force "
    f"top-k, per query vector (every {_Q_MOD}th vec_id — an eval "
    "sample). The exact arm costs |Q| x |corpus| dot products, which is "
    "exactly why it runs on a SAMPLE; the LSH arm touches ~1/16 of the "
    "corpus per query via the bucket equi-join. Both arms broadcast the "
    "query set. Also reports the MULTI-PROBE arm (margin-guided 4-probe "
    "set per query, ann_lsh_multiprobe's plan): recall_mp_at_10 >= "
    "recall_at_10 by superset construction — the measured answer to "
    "'how much recall does each extra probe buy' that tunes "
    "planes/probes before committing an index layout at 100 TB.",
)
def ann_recall_eval(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", _sp_bucket("embedding").alias("bucket")
    )
    q = e.where(F.col("vec_id") % _Q_MOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qb"),
    )
    rn = F.row_number().over(
        Window.partitionBy("qid").orderBy(
            F.col("cosine").desc(), F.col("vec_id").asc()
        )
    )
    scored = lambda df: df.select(  # noqa: E731
        "qid",
        "vec_id",
        F.round(_cosine(F.col("embedding"), F.col("qv")), 6).alias("cosine"),
    )
    exact = (
        scored(
            e.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("qid"))
        )
        .withColumn("rn", rn)
        .where(F.col("rn") <= _K)
    )
    lsh = (
        scored(
            e.join(
                F.broadcast(q),
                (e.bucket == q.qb) & (e.vec_id != q.qid),
            )
        )
        .withColumn("rn", rn)
        .where(F.col("rn") <= _K)
    )

    # multi-probe arm: per-query margin-guided probe set (own bucket + the
    # 1-2 lowest-|margin| plane flips), same scoring — candidates are a
    # superset of the single-probe arm, so recall_mp >= recall always
    qd = q.withColumn("dots", _sp_plane_dots("qv"))
    qp = qd.select("qid", "qb", F.posexplode("dots").alias("i", "d"))
    wm = Window.partitionBy("qid").orderBy(F.abs(F.col("d")).asc(), F.col("i").asc())
    selp = (
        qp.withColumn("r", F.row_number().over(wm))
        .groupBy("qid", "qb")
        .agg(
            F.min(F.when(F.col("r") == 1, F.col("i"))).alias("p1"),
            F.min(F.when(F.col("r") == 2, F.col("i"))).alias("p2"),
        )
    )
    f1 = _flip_sql("qb", "p1")
    f2 = _flip_sql("qb", "p2")
    f12 = _flip_sql(f"({f1})", "p2")
    probes = selp.select(
        "qid",
        F.explode(
            F.array(F.col("qb"), F.expr(f1), F.expr(f2), F.expr(f12))
        ).alias("pb"),
    ).distinct()
    mp = (
        scored(
            e.join(
                F.broadcast(probes),
                (e.bucket == probes.pb) & (e.vec_id != probes.qid),
            ).join(F.broadcast(q.select("qid", "qv")), "qid")
        )
        .withColumn("rn", rn)
        .where(F.col("rn") <= _K)
    )

    hit = (
        exact.select("qid", "vec_id")
        .join(lsh.select("qid", "vec_id"), ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    hitmp = (
        exact.select("qid", "vec_id")
        .join(mp.select("qid", "vec_id"), ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hit_mp"))
    )
    n_hit = F.coalesce(F.col("n_hit"), F.lit(0))
    n_hit_mp = F.coalesce(F.col("n_hit_mp"), F.lit(0))
    return (
        q.select("qid")
        .join(hit, "qid", "left")
        .join(hitmp, "qid", "left")
        .select(
            "qid",
            n_hit.cast("long").alias("n_hit"),
            (n_hit.cast("double") / F.lit(float(_K))).alias(f"recall_at_{_K}"),
            n_hit_mp.cast("long").alias("n_hit_mp"),
            (n_hit_mp.cast("double") / F.lit(float(_K))).alias(f"recall_mp_at_{_K}"),
        )
    )


# ------------------------------------------------------- TF-IDF keywords

_TFIDF_K = 5


def tfidf_topk(d, k: int = _TFIDF_K):
    """Top-``k`` terms per document by smoothed TF-IDF over a
    (doc_id, text) frame — the plan documented on text_tfidf_topk.

    Determinism discipline: idf is round(ln(...) + 1.0, 7) on BOTH
    engines — the +1 INSIDE the round, a different double from
    round(ln(...), 7) + 1 for some inputs — (ln is correctly-rounded to
    ~1 ulp but not bit-identical across
    libm implementations — the w1/w2 precedent), tf = cnt/len is an
    exactly-rounded IEEE division, their product is an exactly-rounded
    IEEE multiply of identical inputs (so it is NOT re-rounded — see
    the inline note), and the rank orders by that bitwise-identical
    score with the term string as a total tie-break.
    """
    # one shared tokenize+count definition across fit/serve/in-query
    # (_tfidf_tf_frame); checkpointed here because tf feeds BOTH the
    # scored output and the document-frequency agg — without it Catalyst
    # re-runs the corpus scan and the (doc, term) shuffle once per
    # consumer (two full corpus passes at 100 TB for one logical agg);
    # the minhash-signature precedent
    tf = _tfidf_tf_frame(d).localCheckpoint()
    # document frequency: tf is already one row per (doc, term); N also
    # comes off the checkpointed tf, and the oracle counts the SAME
    # frame (distinct doc_id of the exploded tokens) so the two engines
    # cannot disagree on N for a NULL-text doc (explode drops it) or a
    # duplicated doc_id — a re-count of d would also re-scan the corpus
    # AND route through spread()'s round-robin exchange for a plain agg,
    # the exact anti-pattern dedup_exact_hash documents
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    n_docs = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    idf = F.round(
        F.log(
            (F.col("n_docs").cast("double") + F.lit(1.0))
            / (F.col("df_docs").cast("double") + F.lit(1.0))
        )
        + F.lit(1.0),
        7,
    )
    scored = (
        tf.join(dfc, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("idf", idf)
        # deliberately NOT rounded: tf is an exactly-rounded IEEE division
        # of exact integers and idf is the same rounded double on both
        # engines, so the product is bitwise identical — whereas rounding
        # a product of "nice" decimals lands on .5e-7 half-way cases that
        # Spark (decimal-string HALF_UP) and DuckDB (binary round) break
        # differently (observed at sf0.01: 0.15792035 -> .1579204/.1579203)
        .withColumn(
            "tfidf",
            (
                F.col("term_count").cast("double")
                / F.col("n_tok").cast("double")
            )
            * F.col("idf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "term_count", "idf", "tfidf", "rank")
    )


@register(
    "text_tfidf_topk",
    sql=f"""
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
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM ex),
    scored AS (
      SELECT doc_id, term, term_count,
             round(ln((n_docs + 1.0) / (df_docs + 1.0)) + 1.0, 7) AS idf,
             (CAST(term_count AS DOUBLE) / CAST(n_tok AS DOUBLE))
               * idf AS tfidf
      FROM tf JOIN dfc USING (term), n
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
      FROM scored
    )
    SELECT doc_id, term, term_count, idf, tfidf, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_TFIDF_K}
    """,
    doc=f"Per-document top-{_TFIDF_K} keywords by smoothed TF-IDF "
    "(sklearn-style idf = ln((N+1)/(df+1)) + 1): the topic-tagging / "
    "keyword-extraction primitive a corpus pipeline uses for domain "
    "labeling and stopword mining. Plan: one explode + (doc, term) "
    "hash-agg (the only corpus-size shuffle), document frequency is a "
    "second agg OVER THE ALREADY-COLLAPSED tf frame (vocab-size, not "
    "corpus-size), N broadcasts as a scalar, and the per-doc top-k "
    "window partitions by doc_id — millions of tiny partitions, fully "
    "parallel. At 100 TB the tf->dfc join shuffles on term with AQE "
    "handling stopword skew; the df-cap escape hatch documented on "
    "dedup_ngram_jaccard applies unchanged.",
)
def text_tfidf_topk(spark, sf_dir):
    return tfidf_topk(t(spark, sf_dir, "documents"))


# -------------------------------------------- LM-perplexity quality tiers

_PPL_ALPHA = 0.5  # add-alpha smoothing mass per bigram context


def lm_perplexity_buckets(d, decimal_costs: bool = True):
    """CCNet-style perplexity tiers over a (doc_id, text) frame — the
    plan documented on quality_lm_perplexity. ``decimal_costs=False``
    is the production scoring knob — see ``_lm_doc_scores`` and the
    registered ``quality_lm_perplexity_fast``.

    Determinism discipline: each per-bigram cost is round(-ln P, 7) on
    both engines (the w1/w2 ln precedent), summed exactly as
    DECIMAL(28,7) (order-free), and log_ppl = double(sum)/n is left
    UNROUNDED — the decimal sum is bit-identical, so the IEEE division
    is too, and re-rounding would only reintroduce the .5-boundary
    hazard text_tfidf_topk documents. Tercile cutoffs are the values at
    nearest-rank ceil(n/3) / ceil(2n/3) of the scored docs, ranked by
    the scale-safe two-phase global_row_number (a bare
    row_number() OVER (ORDER BY ..) would serialize the corpus into one
    task); cutoff values depend only on the sorted multiset, so tie
    order cannot shift them.
    """
    ex = _lm_exploded(d)
    bg = ex.where(F.col("w2").isNotNull())
    # ONE corpus aggregation feeds everything derived from counts: the
    # (w1, w2) type table is aggregated INCLUDING the doc-end (w2 null)
    # rows, so bigram counts, context counts AND the w1 vocabulary all
    # marginalize the |types|-bounded table — the former
    # countDistinct(w1) was a second full read of the corpus-size
    # checkpoint (r15; one fewer corpus pass per LM fit, measured
    # ~0.3 s at sf0.1 and a full pass at 100 TB).  The checkpoint
    # itself (r14) still exists because the table has multiple
    # consumers; it was already being materialized as a join build.
    c12g = ex.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    ).localCheckpoint()
    c12 = c12g.where(F.col("w2").isNotNull())
    # context counts marginalize the BIGRAM table (c1 = sum_w2 c12 —
    # identical values by definition), never a second corpus-size
    # aggregation over bg: at 100 TB that is one full pass saved
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # every token occurrence appears as w1 (the doc-end marker rides a
    # null w2), so distinct w1 over the type table IS the vocabulary
    vocab = c12g.agg(F.countDistinct("w1").alias("vocab"))
    ds = _lm_doc_scores(bg, c12, c1, vocab, decimal_costs=decimal_costs)
    cuts = _lm_tercile_cuts(ds)
    return _lm_classify(d, ds, cuts)


def _lm_exploded(d, checkpoint: bool = True):
    """ONE generate emits every token occurrence as w1 (so the vocab and
    the doc-end token are covered) with its successor as w2 (NULL at
    the last position). Checkpointed when the caller has MULTIPLE
    consumers (the in-query op feeds bigram scoring, context counts,
    bigram counts, and vocab from it); the served path has exactly one
    consumer and passes checkpoint=False to skip the corpus-size
    materialization."""
    base = d.select("doc_id", F.split(F.col("text"), " ").alias("tok"))
    ex = (
        base.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(tok) - 1), "
                    "i -> struct(tok[i] AS w1, "
                    "CASE WHEN i < size(tok) - 1 THEN tok[i + 1] END AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    return ex.localCheckpoint() if checkpoint else ex


def _lm_doc_scores(
    bg, c12, c1, vocab, left: bool = False, checkpoint: bool = True,
    decimal_costs: bool = True,
):
    """Per-doc (log_ppl, n_bigrams) from the count tables. ``left=True``
    is the SERVING form: unseen bigrams/contexts coalesce to 0 before
    smoothing (P = alpha / (alpha * V) at worst), which is exactly what
    add-alpha exists for — the self-trained in-query form uses inner
    joins because every bigram is by construction in its own counts.
    ``checkpoint=False`` skips the materialization when the caller has a
    single consumer (the served path).

    ``decimal_costs=False`` is the production knob (the
    ``search_bm25_topk_fast`` discipline): per-bigram costs stay plain
    doubles (no round-7, no DECIMAL(28,7) cast) and log_ppl gets ONE
    round-7 quantization AFTER the sum/count division — double-sum
    noise is ~1e-14, seven orders inside the quantum, so the quantized
    score (and every downstream tercile cutoff) is still
    engine/partition-order-deterministic."""
    how = "left" if left else "inner"
    c12v = F.coalesce(F.col("c12"), F.lit(0)) if left else F.col("c12")
    c1v = F.coalesce(F.col("c1"), F.lit(0)) if left else F.col("c1")
    p = (c12v + F.lit(_PPL_ALPHA)) / (c1v + F.lit(_PPL_ALPHA) * F.col("vocab"))
    if decimal_costs:
        cost = F.round(-F.log(p), 7).cast("decimal(28,7)")
    else:
        cost = -F.log(p)
    log_ppl = F.sum("c").cast("double") / F.count(F.lit(1)).cast("double")
    if not decimal_costs:
        log_ppl = F.round(log_ppl, 7)
    ds = (
        bg.join(c12, ["w1", "w2"], how)
        .join(c1, "w1", how)
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", cost.alias("c"))
        .groupBy("doc_id")
        .agg(
            log_ppl.alias("log_ppl"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )
    # in-query: three consumers (rank, count, final join); served: one
    return ds.localCheckpoint() if checkpoint else ds


def _lm_tercile_cuts(ds):
    """1-row (c1v, c2v) nearest-rank tercile cutoffs over the scored
    docs, ranked by the scale-safe two-phase global rank."""
    from crypto_datalake_spark.ops.rank import global_row_number

    ranked = global_row_number(
        ds.select("log_ppl", "doc_id"),
        [F.col("log_ppl").asc(), F.col("doc_id").asc()],
        out_col="rk",
    )
    n = ds.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .agg(
            F.max(
                F.when(
                    F.col("rk") == F.ceil(F.col("n") / F.lit(3.0)),
                    F.col("log_ppl"),
                )
            ).alias("c1v"),
            F.max(
                F.when(
                    F.col("rk") == F.ceil((F.lit(2) * F.col("n")) / F.lit(3.0)),
                    F.col("log_ppl"),
                )
            ).alias("c2v"),
        )
    )


def _lm_classify(d, ds, cuts):
    """Join scores + cutoffs back onto every doc and bucket."""
    return (
        d.select("doc_id")
        .join(ds, "doc_id", "left")
        .crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            "log_ppl",
            F.when(F.col("log_ppl").isNull(), F.lit("short"))
            .when(F.col("log_ppl") <= F.col("c1v"), F.lit("head"))
            .when(F.col("log_ppl") <= F.col("c2v"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("ppl_bucket"),
        )
    )


def _lm_tok_ctes() -> str:
    """tk/ex/bg tokenization CTEs — ONE definition consumed by BOTH the
    in-query LM oracle and the served-LM surrogate (the
    _ivf_probe_ctes_sql precedent), so a tokenization fix cannot land
    in one and miss the other."""
    return """tk AS (
      SELECT doc_id, string_split(text, ' ') AS tok FROM documents
    ),
    ex AS (
      SELECT doc_id, tok[i] AS w1,
             CASE WHEN i < len(tok) THEN tok[i + 1] END AS w2
      FROM (SELECT doc_id, tok, unnest(generate_series(1, len(tok))) AS i
            FROM tk)
    ),
    bg AS (SELECT doc_id, w1, w2 FROM ex WHERE w2 IS NOT NULL)"""


def _lm_ds_sql(
    bg_src: str, c12_src: str, c1_src: str, v_src: str, left: bool = False,
    decimal: bool = True,
) -> str:
    """The per-doc decimal-summed NLL scoring block as a ``ds`` CTE body
    — ONE definition consumed by all three LM oracles (in-query, UNK-
    capped, served), so a fix to the scoring discipline cannot land in
    one and miss the others (the _lm_tok_ctes precedent).  ``left``
    is the serving form: unseen bigrams/contexts coalesce to 0 before
    smoothing (mirrors _lm_doc_scores).  ``decimal=False`` mirrors the
    production double-cost knob: plain-double NLL sum with one round-7
    quantization after the division (the _bm25_fast_sql precedent)."""
    j = "LEFT JOIN" if left else "JOIN"
    c12 = "coalesce(c12, 0)" if left else "c12"
    c1 = "coalesce(c1, 0)" if left else "c1"
    if decimal:
        score = f"""CAST(sum(CAST(round(-ln(({c12} + {_PPL_ALPHA})
                                     / ({c1} + {_PPL_ALPHA} * vocab)), 7)
                           AS DECIMAL(28,7))) AS DOUBLE)
               / count(*)"""
    else:
        score = f"""round(sum(-ln(({c12} + {_PPL_ALPHA})
                            / ({c1} + {_PPL_ALPHA} * vocab)))
                     / count(*), 7)"""
    return f"""
      SELECT doc_id,
             {score} AS log_ppl,
             CAST(count(*) AS BIGINT) AS n_bigrams
      FROM {bg_src} {j} {c12_src} USING (w1, w2) {j} {c1_src} USING (w1), {v_src}
      GROUP BY doc_id"""


# nearest-rank tercile cutoffs over ds (in-query + UNK-capped oracles;
# the served oracle reads FROZEN cutoffs from its persisted meta instead)
_LM_CUTS_SQL = """rk AS (
      SELECT log_ppl, row_number() OVER (ORDER BY log_ppl, doc_id) AS rk,
             count(*) OVER () AS n
      FROM ds
    ),
    cuts AS (
      SELECT max(CASE WHEN rk = CAST(ceil(n / 3.0) AS BIGINT)
                 THEN log_ppl END) AS c1v,
             max(CASE WHEN rk = CAST(ceil((2 * n) / 3.0) AS BIGINT)
                 THEN log_ppl END) AS c2v
      FROM rk
    )"""


def _lm_bucket_select_sql(cuts_src: str) -> str:
    """Final head/middle/tail classification SELECT — shared by all
    three LM oracles; ``cuts_src`` supplies c1v/c2v (the cuts CTE for
    self-trained fits, the persisted meta table for the served form)."""
    return f"""
    SELECT d.doc_id, coalesce(ds.n_bigrams, 0) AS n_bigrams, ds.log_ppl,
           CASE WHEN ds.log_ppl IS NULL THEN 'short'
                WHEN ds.log_ppl <= c1v THEN 'head'
                WHEN ds.log_ppl <= c2v THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM documents d LEFT JOIN ds USING (doc_id), {cuts_src}"""


@register(
    "quality_lm_perplexity",
    sql=f"""
    WITH {_lm_tok_ctes()},
    c1t AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
    c12t AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
    v AS (SELECT count(DISTINCT w1) AS vocab FROM ex),
    ds AS ({_lm_ds_sql("bg", "c12t", "c1t", "v")}
    ),
    {_LM_CUTS_SQL}
    {_lm_bucket_select_sql("cuts")}
    """,
    doc="CCNet-style language-model quality tiers (Wenzek et al. 2020): "
    "fit an add-0.5-smoothed bigram LM on the corpus, score every "
    "document by mean negative log-probability (log-perplexity), and "
    "bucket into head/middle/tail terciles — the standard LM-based "
    "quality filter for web-scale training data (CCNet uses a "
    "Wikipedia-trained KenLM; the self-trained bigram twin flags the "
    "same repetitive-boilerplate head and gibberish tail). Plan: ONE "
    "corpus explode (checkpointed) feeds bigram counts, context counts "
    "and vocab; scoring joins the exploded bigrams back to the two "
    "count tables (the corpus-size shuffles — at 100 TB the counts are "
    "persisted tables like the IVF centroids, the join skew on "
    "stop-bigrams is AQE territory, and a df-capped UNK vocab bounds "
    "the count-table size — delivered as quality_lm_perplexity_unk); "
    "tercile cutoffs come from the two-phase "
    "range-partitioned global rank, never a single-task window; docs "
    "with < 2 tokens carry a NULL score in a 'short' bucket.",
)
def quality_lm_perplexity(spark, sf_dir):
    return lm_perplexity_buckets(t(spark, sf_dir, "documents"))


@register(
    "quality_lm_perplexity_fast",
    sql=f"""
    WITH {_lm_tok_ctes()},
    c1t AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
    c12t AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
    v AS (SELECT count(DISTINCT w1) AS vocab FROM ex),
    ds AS ({_lm_ds_sql("bg", "c12t", "c1t", "v", decimal=False)}
    ),
    {_LM_CUTS_SQL}
    {_lm_bucket_select_sql("cuts")}
    """,
    doc="The PRODUCTION scoring plan of quality_lm_perplexity (the "
    "search_bm25_topk_fast discipline, measured 1.33× faster at "
    "sf0.1): per-bigram NLL costs stay plain doubles — no per-cost "
    "round-7, no DECIMAL(28,7) sum — and log_ppl gets ONE round-7 "
    "quantization after the sum/count division, so the score and "
    "every downstream tercile cutoff stay engine/partition-order-"
    "deterministic (double-sum noise ~1e-14 vs the 1e-7 quantum) and "
    "the plain-double DuckDB oracle hash-matches tiers AND quantized "
    "scores. Identical count-table fit, identical plan shape; only "
    "the scoring arithmetic changes.",
)
def quality_lm_perplexity_fast(spark, sf_dir):
    return lm_perplexity_buckets(t(spark, sf_dir, "documents"), decimal_costs=False)


# ------------------------------------------ UNK-capped LM vocabulary

_LM_UNK_K = 24        # top-k tokens kept; the rest map to <unk>
_LM_UNK = "<unk>"     # OOV sentinel (a real "<unk>" token would merge
                      # with OOV mass — the standard, documented blur)


def lm_unk_model(d, k: int = _LM_UNK_K):
    """Top-``k``-vocabulary bigram LM over a (doc_id, text) frame with
    every out-of-vocabulary token mapped to ``<unk>`` BEFORE counting —
    the production seam quality_lm_perplexity's docstring promises: on
    an open-vocabulary corpus the raw bigram/context tables grow with
    the corpus (typos, URLs, hashes), while the UNK-capped tables are
    bounded at (k+1)² / (k+1) rows no matter how many tokens stream in,
    so the persisted serving artifacts stay broadcast-sized forever.

    Vocabulary selection is deterministic: the k highest-DOCUMENT-
    FREQUENCY tokens (df ranking resists boilerplate spam — one page
    repeating a token 10,000 times buys it df=1, where an occurrence
    count would promote it), ties broken by token (binary asc), via
    ``ranked_topk`` — per-partition prune to k, then a final window
    over ≤ k·P survivors, so the open vocabulary is never globally
    ranked or memory-pinned just to pick k rows. The kept set (≤ k
    rows — the bounded-collect tier, the eigenfit precedent) lands on
    the driver once and the mapping runs as plain codegen ``isin``
    expressions, so UNK-mapping adds zero shuffle AND zero join to the
    corpus stream (r14: previously a checkpointed kept frame fed two
    broadcast joins — three extra jobs plus a corpus-size re-
    materialization of the mapped stream; the expression form keeps the
    mapped stream fully pipelined into its consumers).
    Returns (bg, c12, c1, vocab): the mapped bigram stream, both
    bounded count tables, and the 1-row vocab frame (|kept| + 1,
    counting <unk> itself).
    """
    from crypto_datalake_spark.ops.rank import ranked_topk

    ex = _lm_exploded(d)
    cnt = ex.groupBy("w1").agg(F.countDistinct("doc_id").alias("c"))
    toks = sorted(
        r["w1"]
        for r in ranked_topk(
            cnt, [F.col("c").desc(), F.col("w1").asc()], k
        ).select("w1").collect()
    )
    bg = _unk_map_tokens(ex, toks).where(F.col("w2").isNotNull())
    # checkpointed: c12 feeds BOTH the scoring join and the c1
    # marginalization — unmaterialized, the (k+1)²-bounded aggregation
    # (and its corpus-size read of the mapped stream) runs once per
    # consumer (measured −23% on quality_lm_perplexity_unk at sf0.1,
    # bit-identical)
    c12 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    ).localCheckpoint()
    # marginalize c12 for the context counts (identical values, sum of
    # the (k+1)^2-bounded table) instead of re-aggregating the mapped
    # corpus-size bigram stream
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = d.sparkSession.createDataFrame(
        [(len(toks) + 1,)], "vocab long"
    )
    return bg, c12, c1, vocab


def _unk_map_tokens(ex, toks: list):
    """UNK-map an exploded (doc_id, w1, w2) stream against a DRIVER-side
    kept-token list (≤ k entries by the cap's contract): membership is a
    codegen ``isin`` over the literal set — no join, no broadcast, no
    shuffle, and the mapped stream stays pipelined into its consumers.
    Null membership (w1 can't be null from split; a null w2 is the
    doc-end marker) reproduces the former left-join-miss semantics:
    ``isin`` yields null ⇒ the WHEN falls through exactly like a join
    miss did."""
    in1 = F.col("w1").isin(toks) if toks else F.lit(False)
    in2 = F.col("w2").isin(toks) if toks else F.lit(False)
    return ex.select(
        "doc_id",
        F.when(in1, F.col("w1")).otherwise(F.lit(_LM_UNK)).alias("w1"),
        F.when(F.col("w2").isNull(), F.lit(None).cast("string"))
        .when(in2, F.col("w2"))
        .otherwise(F.lit(_LM_UNK))
        .alias("w2"),
    )


def _unk_map(ex, kept):
    """UNK-map an exploded (doc_id, w1, w2) stream against a kept-token
    FRAME (≤ k rows by the cap's contract, e.g. the persisted
    ``lm_unk_kept`` table): bounded collect, then the shared
    expression mapping — ONE mapping definition for the in-query fit
    and the persisted-model serve path (via :func:`_unk_map_tokens`)."""
    return _unk_map_tokens(
        ex, sorted(r["tokk"] for r in kept.select("tokk").collect())
    )


def _lm_unk_map_sql(ex_src: str, kept_src: str) -> str:
    """The UNK-mapping + bigram CTEs (mx, bgm) — ONE definition shared
    by the in-query UNK oracle and the served surrogate, mirroring
    :func:`_unk_map` (the _lm_tok_ctes doctrine)."""
    return f"""mx AS (
      SELECT doc_id,
             CASE WHEN ka.tokk IS NULL THEN '{_LM_UNK}'
                  ELSE {ex_src}.w1 END AS w1,
             CASE WHEN {ex_src}.w2 IS NULL THEN NULL
                  WHEN kb.tokk IS NULL THEN '{_LM_UNK}'
                  ELSE {ex_src}.w2 END AS w2
      FROM {ex_src} LEFT JOIN {kept_src} ka ON {ex_src}.w1 = ka.tokk
              LEFT JOIN {kept_src} kb ON {ex_src}.w2 = kb.tokk
    ),
    bgm AS (SELECT doc_id, w1, w2 FROM mx WHERE w2 IS NOT NULL)"""


def _lm_doc_scores_composed(bg, c12, c1, vocab):
    """Per-doc (log_ppl, n_bigrams) with the per-bigram decimal cost
    composed at TYPE grain: one round(-ln P, 7) per (w1, w2) TYPE
    instead of per occurrence, then ONE broadcast join onto the bigram
    stream.  Summing the identical decimals gives a bit-identical
    result to :func:`_lm_doc_scores`; the saved work is corpus-
    proportional (ln/round/decimal-cast per occurrence → per type).

    ONLY for fits whose count tables are BOUNDED (the UNK cap: ≤ (k+1)²
    rows, broadcast forever) — composing the open-vocabulary fit's
    |types|-sized cost table was measured SLOWER in r14 (it blocked the
    stream), which is why the open fit keeps the per-occurrence form."""
    p = (F.col("c12") + F.lit(_PPL_ALPHA)) / (
        F.col("c1") + F.lit(_PPL_ALPHA) * F.col("vocab")
    )
    cost_tbl = (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1", "w2", F.round(-F.log(p), 7).cast("decimal(28,7)").alias("c")
        )
    )
    ds = (
        bg.join(F.broadcast(cost_tbl), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            (
                F.sum("c").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("log_ppl"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )
    # three consumers downstream (rank, count, final join) — same
    # checkpoint contract as _lm_doc_scores
    return ds.localCheckpoint()


def lm_perplexity_buckets_unk(d, k: int = _LM_UNK_K):
    """quality_lm_perplexity with the UNK-capped vocabulary — same
    decimal-sum scoring and two-phase tercile discipline, bounded count
    tables (see :func:`lm_unk_model`); the per-bigram cost composes at
    the (k+1)²-bounded type grain (:func:`_lm_doc_scores_composed`)."""
    bg, c12, c1, vocab = lm_unk_model(d, k)
    ds = _lm_doc_scores_composed(bg, c12, c1, vocab)
    cuts = _lm_tercile_cuts(ds)
    return _lm_classify(d, ds, cuts)


@register(
    "quality_lm_perplexity_unk",
    sql=f"""
    WITH {_lm_tok_ctes()},
    cnt AS (SELECT w1 AS tokk, count(DISTINCT doc_id) AS c
            FROM ex GROUP BY 1),
    kept AS (
      SELECT tokk FROM (
        SELECT tokk, row_number() OVER (ORDER BY c DESC, tokk) AS rk
        FROM cnt)
      WHERE rk <= {_LM_UNK_K}
    ),
    {_lm_unk_map_sql("ex", "kept")},
    c1t AS (SELECT w1, count(*) AS c1 FROM bgm GROUP BY 1),
    c12t AS (SELECT w1, w2, count(*) AS c12 FROM bgm GROUP BY 1, 2),
    v AS (SELECT count(*) + 1 AS vocab FROM kept),
    ds AS ({_lm_ds_sql("bgm", "c12t", "c1t", "v")}
    ),
    {_LM_CUTS_SQL}
    {_lm_bucket_select_sql("cuts")}
    """,
    doc=f"quality_lm_perplexity with a top-{_LM_UNK_K} df-capped UNK "
    "vocabulary (the production form its docstring promises): every "
    "token outside the k highest-DOCUMENT-FREQUENCY tokens maps to "
    "'<unk>' BEFORE bigram counting, so the bigram/context count tables "
    "are bounded at (k+1)²/(k+1) rows regardless of corpus size — on an "
    "open-vocabulary web corpus the raw tables grow with the data "
    "(typos, URLs, hex ids), while the capped tables stay "
    "broadcast-sized forever, which is what makes the persisted-model "
    "serving seam (quality_lm_perplexity_served) viable at 100 TB. "
    "df ranking (not occurrence count) resists boilerplate spam: a page "
    "repeating a token 10,000 times buys it df=1. Kept-token bigram and "
    "context COUNTS are identical to the uncapped fit (the mapping only "
    "merges OOV mass; pinned in tests) — per-bigram probabilities still "
    "shift everywhere because the smoothing denominator's vocab term "
    "becomes k+1, so capped and uncapped scores are comparable only "
    "within the same fit. Vocabulary selection is exact top-k via "
    "ranked_topk (per-partition prune, then a window over <= k·P "
    "survivors — the open vocabulary is never globally ranked); the "
    "kept set broadcasts into the mapping joins (zero added corpus "
    "shuffle). Same decimal-sum NLL and two-phase tercile discipline "
    "as the uncapped query; FULL static oracle.",
)
def quality_lm_perplexity_unk(spark, sf_dir):
    return lm_perplexity_buckets_unk(t(spark, sf_dir, "documents"))


# ---------------------------------------------- global shuffle → shards

_SHARD_SIZE = 50       # docs per training shard
_SHUFFLE_SEED = "shuf-42"  # salt for the permutation hash


def shuffle_shard_assign(d, shard_size: int = _SHARD_SIZE, seed: str = _SHUFFLE_SEED):
    """Deterministic global shuffle + shard assignment over a
    (doc_id, ...) frame — the plan documented on shuffle_export_shards.

    The permutation key is the 60-bit md5 of (seed, doc_id) — the same
    cross-engine hash bridge as the dedup tiers — with doc_id as the
    total tie-break; the global position comes from the two-phase
    range-partitioned rank, so no single-task sort ever sees the corpus.
    """
    from crypto_datalake_spark.ops.rank import global_row_number
    from crypto_datalake_spark.queries.llm import _seeded_hash_col

    keyed = d.select("doc_id", _seeded_hash_col(seed).alias("shuffle_key"))
    ranked = global_row_number(
        keyed,
        [F.col("shuffle_key").asc(), F.col("doc_id").asc()],
        out_col="rk",
    )
    pos0 = F.col("rk") - F.lit(1)
    return ranked.select(
        "doc_id",
        "shuffle_key",
        F.floor(pos0 / F.lit(shard_size)).cast("long").alias("shard_id"),
        (pos0 % F.lit(shard_size)).cast("long").alias("shard_pos"),
    )


@register(
    "shuffle_export_shards",
    sql=f"""
    WITH keyed AS (
      SELECT doc_id, {_seeded_hash_sql(_SHUFFLE_SEED)} AS shuffle_key
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, shuffle_key,
             row_number() OVER (ORDER BY shuffle_key, doc_id) AS rk
      FROM keyed
    )
    SELECT doc_id, shuffle_key,
           CAST(floor((rk - 1) / {_SHARD_SIZE}) AS BIGINT) AS shard_id,
           CAST((rk - 1) % {_SHARD_SIZE} AS BIGINT) AS shard_pos
    FROM ranked
    """,
    doc=f"Deterministic global shuffle + training-shard assignment: every "
    "document gets a pseudo-random position (seeded 60-bit md5 of its "
    f"id, doc_id tie-break) and a ({_SHARD_SIZE}-doc shard_id, "
    "shard_pos) slot — the export step a training pipeline runs last, "
    "where a biased or irreproducible shuffle silently changes the "
    "model. The naive form is ORDER BY rand(): non-reproducible AND a "
    "single-task global sort at 100 TB. This plan is a seeded-hash "
    "permutation (re-runnable byte-identically, seed bump = fresh "
    "epoch permutation) positioned by the two-phase range-partitioned "
    "global rank — partition-parallel everywhere, the only serial "
    "structure the #partitions-row offset prefix; a writer then groups "
    "by shard_id so each shard lands as one output file "
    "(sinks.write_time_partitioned's partitionBy shape, keyed on "
    "shard_id).",
)
def shuffle_export_shards(spark, sf_dir):
    from crypto_datalake_spark.io import load_table

    # load_table, not t(): hash + rank of (doc_id) only — no per-row-heavy
    # text work, so spread()'s round-robin exchange would ship the full
    # text bytes for nothing (the dedup_exact_hash precedent)
    return shuffle_shard_assign(load_table(spark, sf_dir, "documents"))


# ------------------------------------------- dedup-tier quality evaluation

_WILSON_Z = 1.96         # 95% two-sided normal quantile
_WILSON_Z2 = 3.8416      # z² written out so both engines use one literal

_DEDUP_EVAL_MOD = 2      # deterministic 1/2 doc sample for the exact arm
# (pair survival = 1/MOD^2: duplicate partners are unrelated ids, so a
# sparser sample keeps almost no true pairs to grade — production tunes
# mod so the sampled shingle arrays fit the broadcast ceiling, see
# dedup_recall_eval_frame, and reads the eval's confidence off n_true)


def dedup_recall_eval_frame(docs, mod: int = _DEDUP_EVAL_MOD):
    """Band-stage precision/recall of the MinHash-LSH tier against exact
    all-pairs Jaccard over a (doc_id, text) frame — the plan documented
    on dedup_recall_eval. The verified production output has precision 1
    by construction (candidates are Jaccard-checked); what this grades
    is the CANDIDATE stage: how much of the true-duplicate set the band
    collisions recover (recall) and how much verification work they
    waste (precision)."""
    from crypto_datalake_spark.queries.dedup import (
        band_candidate_pairs,
        lsh_signatures,
        shingle_jaccard,
    )

    sig, bands = lsh_signatures(docs.where(F.col("doc_id") % mod == 0))
    a = sig.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    jacc = shingle_jaccard("sh_a", "sh_b")
    # The exact arm is a BroadcastNestedLoopJoin whose build side is the
    # SAMPLED docs' shingle arrays (projected to the two needed columns)
    # — it must fit Spark's 8 GB broadcast ceiling, which is exactly why
    # the arm runs on a sample: at larger corpora, grow ``mod`` until it
    # does (ann_recall_eval's 1/101 gold-standard posture).
    truth = (
        F.broadcast(a)
        .join(b, F.col("doc_a") < F.col("doc_b"))
        .where(jacc >= F.lit(_JACCARD_MIN))
        .select("doc_a", "doc_b")
    )
    # the production candidate join, not a reimplementation
    cand = band_candidate_pairs(bands)
    hit = truth.join(cand, ["doc_a", "doc_b"])
    n_true = truth.agg(F.count(F.lit(1)).alias("n_true"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_cand"))
    n_hit = hit.agg(F.count(F.lit(1)).alias("n_hit"))
    base = (
        n_true.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_hit))
        .select(
            "n_true",
            "n_cand",
            "n_hit",
            F.when(
                F.col("n_cand") > 0,
                F.col("n_hit").cast("double") / F.col("n_cand").cast("double"),
            ).alias("precision"),
            F.when(
                F.col("n_true") > 0,
                F.col("n_hit").cast("double") / F.col("n_true").cast("double"),
            ).alias("recall"),
        )
    )
    # Wilson 95% interval on recall: the sampled exact arm makes recall
    # a point estimate over n_true Bernoulli trials, and n_true SHRINKS
    # as mod² — the caller tuning the mod knob needs to SEE the
    # confidence they traded away.  sqrt is IEEE correctly-rounded on
    # both engines (unlike ln), so the mirrored formula is bit-exact;
    # the constants are written out (1.96, z²=3.8416) so neither engine
    # re-derives them.
    nt = F.col("n_true").cast("double")
    ph = F.col("recall")
    denom = F.lit(1.0) + F.lit(_WILSON_Z2) / nt
    center = (ph + F.lit(_WILSON_Z2) / (F.lit(2.0) * nt)) / denom
    half = (
        F.lit(_WILSON_Z)
        * F.sqrt(
            ph * (F.lit(1.0) - ph) / nt
            + F.lit(_WILSON_Z2) / (F.lit(4.0) * nt * nt)
        )
    ) / denom
    has = F.col("n_true") > 0
    return base.select(
        "*",
        F.when(has, center - half).alias("recall_lo"),
        F.when(has, center + half).alias("recall_hi"),
    )


def _dedup_eval_sql() -> str:
    from crypto_datalake_spark.queries.dedup import _DK_LSH_BASE, dk_jaccard_sql

    return f"""
    WITH {_DK_LSH_BASE.rstrip()},
    samp AS (SELECT * FROM sig WHERE doc_id % {_DEDUP_EVAL_MOD} = 0),
    sbands AS (SELECT * FROM bands WHERE doc_id % {_DEDUP_EVAL_MOD} = 0),
    truth AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM samp x JOIN samp y ON x.doc_id < y.doc_id
      WHERE {dk_jaccard_sql("x.shingles", "y.shingles")} >= {_JACCARD_MIN}
    ),
    cand AS (
      {dk_band_cand_sql("sbands")}
    ),
    hit AS (SELECT * FROM truth JOIN cand USING (doc_a, doc_b)),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth),
    nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand),
    nh AS (SELECT CAST(count(*) AS BIGINT) AS n_hit FROM hit),
    base AS (
      SELECT n_true, n_cand, n_hit,
             CASE WHEN n_cand > 0
                  THEN CAST(n_hit AS DOUBLE) / CAST(n_cand AS DOUBLE)
             END AS precision,
             CASE WHEN n_true > 0
                  THEN CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE)
             END AS recall,
             CAST(n_true AS DOUBLE) AS ntd
      FROM nt, nc, nh
    )
    -- Wilson 95% interval mirrored op-for-op from the Spark expression
    -- (sqrt is IEEE correctly-rounded on both engines, so bit-exact)
    SELECT n_true, n_cand, n_hit, precision, recall,
           CASE WHEN n_true > 0 THEN
             (recall + {_WILSON_Z2} / (2.0 * ntd)) / (1.0 + {_WILSON_Z2} / ntd)
             - ({_WILSON_Z} * sqrt(recall * (1.0 - recall) / ntd
                                   + {_WILSON_Z2} / (4.0 * ntd * ntd)))
               / (1.0 + {_WILSON_Z2} / ntd)
           END AS recall_lo,
           CASE WHEN n_true > 0 THEN
             (recall + {_WILSON_Z2} / (2.0 * ntd)) / (1.0 + {_WILSON_Z2} / ntd)
             + ({_WILSON_Z} * sqrt(recall * (1.0 - recall) / ntd
                                   + {_WILSON_Z2} / (4.0 * ntd * ntd)))
               / (1.0 + {_WILSON_Z2} / ntd)
           END AS recall_hi
    FROM base
    """


@register(
    "dedup_recall_eval",
    sql=_dedup_eval_sql(),
    doc=f"Dedup-tier quality evaluation (the MinHash twin of "
    "ann_recall_eval): on a deterministic 1/"
    f"{_DEDUP_EVAL_MOD} document sample, compare the LSH band-collision "
    "candidate set against exact all-pairs shingle Jaccard >= "
    f"{_JACCARD_MIN} ground truth and report candidate-stage "
    "precision (verification work wasted) and recall (true duplicates "
    f"the banding can never recover — the quantity a band/size sweep "
    f"tunes; truth threshold = the production _JACCARD_MIN = {_JACCARD_MIN}). The exact arm costs |sample|^2 comparisons, which is why "
    "it runs on the sample (same posture as ann_recall_eval's "
    "brute-force gold standard); the LSH arm reuses lsh_signatures / "
    "the shared band CTEs verbatim, so the eval grades the production "
    "code path, not a reimplementation. recall_lo/recall_hi carry the "
    "Wilson 95% interval over the n_true sampled trials, making the "
    "mod knob's sample-size-vs-confidence tradeoff visible to the "
    "caller (n_true shrinks as mod², so the CI widens — tested).",
)
def dedup_recall_eval(spark, sf_dir):
    return dedup_recall_eval_frame(t(spark, sf_dir, "documents"))


# --------------------------------------------------- text normalization

# Explicit whitespace class instead of \s: Java regex counts vertical
# tab (\x0B) in \s but RE2 does not, so the dialect-neutral class is
# spelled out and shared verbatim by both engines.
_WS_RUN = "[ \t\n\r\f\x0b]+"


def norm_text_expr(col: str = "text"):
    """Spark: the canonicalization expression (lowercase, collapse
    whitespace runs, trim) — the ONE spelling every consumer composes
    (text_normalize, the composed curation pipeline)."""
    return F.trim(F.regexp_replace(F.lower(F.col(col)), _WS_RUN, " "))


def norm_text_sql(expr: str = "text") -> str:
    """DuckDB twin of :func:`norm_text_expr`."""
    return f"trim(regexp_replace(lower({expr}), '{_WS_RUN}', ' ', 'g'))"


def normalize_text_frame(d):
    """(doc_id, norm_text, changed) — the canonicalization pass that runs
    BEFORE hashing/dedup in C4/CCNet-style pipelines, so that
    whitespace and case variants of the same page hash identically:
    lowercase, collapse whitespace runs to one space, trim. Pure
    row-local JVM expressions — whole-stage-codegen'd, no shuffle, the
    cheapest pass in the pipeline. Cross-engine exact for ASCII (the
    corpus); full-Unicode case mapping is engine-specific (JVM
    toLowerCase maps U+0130 to "i"+combining-dot, DuckDB to "i") and
    out of the oracle contract."""
    norm = norm_text_expr()
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        (~norm.eqNullSafe(F.col("text"))).alias("changed"),
    )


@register(
    "text_normalize",
    sql=f"""
    SELECT doc_id,
           {norm_text_sql('text')} AS norm_text,
           {norm_text_sql('text')}
             IS DISTINCT FROM text AS changed
    FROM documents
    """,
    doc="Text normalization (the C4/CCNet canonicalization pass before "
    "any hash tier): lowercase, collapse whitespace runs, trim — case "
    "and spacing variants of the same content then collide in "
    "dedup_exact_hash / MinHash instead of slipping through as "
    "'different' documents. The whitespace class is spelled out "
    "explicitly (Java's \\s includes \\x0B, RE2's does not) so one "
    "pattern string serves both engines; exactness is scoped to ASCII "
    "text — full-Unicode case mapping is engine-specific; "
    "NULL text normalizes to NULL with changed=false (null-safe "
    "comparison on both engines). Row-local, codegen'd, shuffle-free.",
)
def text_normalize(spark, sf_dir):
    return normalize_text_frame(t(spark, sf_dir, "documents"))


# ---------------------------------- LM perplexity: persisted-model serving

_LM_SUFFIX = f"a{_PPL_ALPHA}"  # smoothing param in the cache key


def lm_model_tables(spark, sf_dir):
    """The persisted LM fit as three warehouse tables — bigram counts,
    context counts, and a 1-row meta (vocab + tercile cutoffs frozen
    from the training distribution) — trained exactly once per source
    fingerprint via the shared served-model split (the IVF-centroid
    precedent). This is the production seam quality_lm_perplexity's
    docstring promises: the fit is paid once, serving only joins."""
    from crypto_datalake_spark.queries.llm import _served_model_table

    def mk(prefix, build):
        return _served_model_table(
            spark, sf_dir, prefix, _LM_SUFFIX, build, source="documents.parquet"
        )

    # ORDERED fit: bigram and context counts persist first (each from
    # its own un-checkpointed single-consumer explode); the meta build
    # then consumes those tiny persisted tables plus one checkpointed
    # explode (vocab + scoring), instead of re-running the corpus aggs
    # single-consumer builds skip the checkpoint (the _lm_exploded
    # doctrine); only build_meta has two consumers of one explode
    def corpus_ex(checkpoint: bool = False):
        d = t(spark, sf_dir, "documents")
        return _lm_exploded(d, checkpoint=checkpoint)

    def build_bigram():
        bg = corpus_ex().where(F.col("w2").isNotNull())
        return bg.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).alias("c12")
        ).coalesce(1)

    def build_ctx():
        bg = corpus_ex().where(F.col("w2").isNotNull())
        return bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1")).coalesce(1)

    bigram = mk("lm_bigram", build_bigram)
    ctx = mk("lm_ctx", build_ctx)

    def build_meta():
        ex = corpus_ex(checkpoint=True)  # two consumers: vocab + scoring
        bg = ex.where(F.col("w2").isNotNull())
        vocab = ex.agg(F.countDistinct("w1").alias("vocab"))
        ds = _lm_doc_scores(bg, bigram, ctx, vocab)
        return vocab.crossJoin(_lm_tercile_cuts(ds)).coalesce(1)

    return bigram, ctx, mk("lm_meta", build_meta)


def lm_model_paths(sf_dir: str) -> list[str]:
    """Where :func:`lm_model_tables` persists its three fits — feeds the
    driver's oracle-first pre-build guard (llm.model_artifact_paths)."""
    from crypto_datalake_spark.queries.llm import _served_model_path

    return [
        _served_model_path(sf_dir, pre, _LM_SUFFIX, source="documents.parquet")
        for pre in ("lm_bigram", "lm_ctx", "lm_meta")
    ]


def _lm_served_sql(sf_dir: str) -> str:
    """Surrogate oracle for the served LM: DuckDB recomputes the serving
    policy CONDITIONAL on the persisted fit (the ann_ivf_kmeans
    surrogate precedent) — coalesced OOV smoothing, decimal-exact doc
    scores, the FROZEN persisted cutoffs."""
    bp, cp, mp = lm_model_paths(sf_dir)
    return f"""
    WITH {_lm_tok_ctes()},
    b AS (SELECT w1, w2, c12 FROM read_parquet('{bp}/*.parquet')),
    cx AS (SELECT w1, c1 FROM read_parquet('{cp}/*.parquet')),
    m AS (SELECT vocab, c1v, c2v FROM read_parquet('{mp}/*.parquet')),
    ds AS ({_lm_ds_sql("bg", "b", "cx", "m", left=True)}
    )
    {_lm_bucket_select_sql("m")}
    """


@register(
    "quality_lm_perplexity_served",
    sql=_lm_served_sql,
    doc="The persisted-model serving path of quality_lm_perplexity: the "
    "LM fit (bigram counts, context counts, vocab + FROZEN tercile "
    "cutoffs from the training distribution) is trained once per "
    "source fingerprint and persisted as warehouse tables; serving is "
    "two count-table joins, a decimal-summed map-side agg, and a "
    "broadcast cutoff classification — no refit, no global rank. OOV "
    "handling is real: unseen bigrams/contexts coalesce to 0 before "
    "add-alpha smoothing, so NEW documents (the production case — "
    "CCNet scores crawls against a Wikipedia-trained LM) score with "
    "exactly the persisted distribution's cutoffs. On the training "
    "corpus itself the output equals the in-query op; the surrogate "
    "DuckDB oracle recomputes the serving policy conditional on the "
    "persisted tables (the trained-IVF precedent).",
)
def quality_lm_perplexity_served(spark, sf_dir):
    bigram, ctx, meta = lm_model_tables(spark, sf_dir)
    d = t(spark, sf_dir, "documents")
    # single-consumer chain: no corpus-size checkpoints on the hot path
    bg = _lm_exploded(d, checkpoint=False).where(F.col("w2").isNotNull())
    ds = _lm_doc_scores(
        bg, bigram, ctx, meta.select("vocab"), left=True, checkpoint=False
    )
    return _lm_classify(d, ds, meta.select("c1v", "c2v"))


# ------------------------ LM perplexity: UNK-capped persisted serving


def _lm_unk_suffix(k: int) -> str:
    """Cache-key suffix carrying BOTH fit params: a caller's non-default
    ``k`` gets its own persisted fit instead of silently serving (or
    poisoning) the default-k artifacts — the tfidf/IVF parameterized-
    suffix convention."""
    return f"a{_PPL_ALPHA}_k{k}"


def lm_unk_model_tables(spark, sf_dir, k: int = _LM_UNK_K):
    """The persisted UNK-capped LM fit as four warehouse tables — the
    kept vocabulary (≤ k rows), UNK-mapped bigram/context counts
    (BOUNDED at (k+1)²/(k+1) rows — the whole point: these stay
    broadcast-sized no matter how open the corpus vocabulary is), and a
    1-row meta (vocab = |kept|+1, frozen tercile cutoffs) — trained
    once per source fingerprint via the shared served-model split.
    This is the production composition quality_lm_perplexity_unk's
    docstring motivates: the cap exists precisely so THIS serving
    path's artifacts stay small forever."""
    from crypto_datalake_spark.ops.rank import ranked_topk
    from crypto_datalake_spark.queries.llm import _served_model_table

    def mk(prefix, build):
        return _served_model_table(
            spark, sf_dir, prefix, _lm_unk_suffix(k), build,
            source="documents.parquet",
        )

    def corpus_ex():
        return _lm_exploded(
            t(spark, sf_dir, "documents"), checkpoint=False
        )

    def build_kept():
        cnt = corpus_ex().groupBy("w1").agg(
            F.countDistinct("doc_id").alias("c")
        )
        return (
            ranked_topk(cnt, [F.col("c").desc(), F.col("w1").asc()], k)
            .select(F.col("w1").alias("tokk"))
            .coalesce(1)
        )

    # ORDERED fit (the lm_model_tables precedent): kept persists first;
    # every later build maps through the PERSISTED kept table, so the
    # vocabulary cannot drift between artifacts of one fit
    kept = mk("lm_unk_kept", build_kept)

    def mapped_bg():
        return _unk_map(corpus_ex(), kept).where(F.col("w2").isNotNull())

    bigram = mk(
        "lm_unk_bigram",
        lambda: mapped_bg()
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .coalesce(1),
    )
    ctx = mk(
        "lm_unk_ctx",
        lambda: mapped_bg()
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
        .coalesce(1),
    )

    def build_meta():
        vocab = kept.agg((F.count(F.lit(1)) + F.lit(1)).alias("vocab"))
        ds = _lm_doc_scores(mapped_bg(), bigram, ctx, vocab)
        return vocab.crossJoin(_lm_tercile_cuts(ds)).coalesce(1)

    return kept, bigram, ctx, mk("lm_unk_meta", build_meta)


def lm_unk_model_paths(sf_dir: str, k: int = _LM_UNK_K) -> list[str]:
    """Where :func:`lm_unk_model_tables` persists its four fits — feeds
    the driver's oracle-first pre-build guard (llm.model_artifact_paths)."""
    from crypto_datalake_spark.queries.llm import _served_model_path

    return [
        _served_model_path(
            sf_dir, pre, _lm_unk_suffix(k), source="documents.parquet"
        )
        for pre in ("lm_unk_kept", "lm_unk_bigram", "lm_unk_ctx",
                    "lm_unk_meta")
    ]


def _lm_unk_served_sql(sf_dir: str) -> str:
    """Surrogate oracle for the UNK-capped served LM: DuckDB re-maps the
    corpus through the PERSISTED kept vocabulary and recomputes the
    serving policy conditional on the persisted bounded counts and
    frozen cutoffs (the quality_lm_perplexity_served precedent)."""
    kp, bp, cp, mp = lm_unk_model_paths(sf_dir)
    return f"""
    WITH {_lm_tok_ctes()},
    kept AS (SELECT tokk FROM read_parquet('{kp}/*.parquet')),
    b AS (SELECT w1, w2, c12 FROM read_parquet('{bp}/*.parquet')),
    cx AS (SELECT w1, c1 FROM read_parquet('{cp}/*.parquet')),
    m AS (SELECT vocab, c1v, c2v FROM read_parquet('{mp}/*.parquet')),
    {_lm_unk_map_sql("ex", "kept")},
    ds AS ({_lm_ds_sql("bgm", "b", "cx", "m", left=True)}
    )
    {_lm_bucket_select_sql("m")}
    """


@register(
    "quality_lm_perplexity_unk_served",
    sql=_lm_unk_served_sql,
    doc="The persisted-model serving path over the UNK-capped fit — the "
    "composition the cap exists for: kept vocabulary (≤ k rows), "
    "BOUNDED bigram/context counts ((k+1)²/(k+1) rows regardless of "
    "corpus size) and frozen tercile cutoffs persist once per source "
    "fingerprint; serving UNK-maps new documents through the broadcast "
    "kept set (zero added shuffle), joins the two broadcast-sized count "
    "tables, and classifies against the frozen cutoffs. Handles truly "
    "novel content two ways at once: OOV TOKENS collapse onto <unk> "
    "statistics (real probability mass, not a smoothing fallback), and "
    "unseen kept-token BIGRAM combinations coalesce to 0 before "
    "add-alpha smoothing. On the training corpus the output equals "
    "quality_lm_perplexity_unk (frozen cuts = fresh cuts on the same "
    "data — pinned in tests). SURROGATE oracle conditional on the four "
    "persisted tables through the oracle-first pre-build guard.",
)
def quality_lm_perplexity_unk_served(spark, sf_dir):
    kept, bigram, ctx, meta = lm_unk_model_tables(spark, sf_dir)
    d = t(spark, sf_dir, "documents")
    # single-consumer chain: no corpus-size checkpoints on the hot path
    bg = _unk_map(_lm_exploded(d, checkpoint=False), kept).where(
        F.col("w2").isNotNull()
    )
    ds = _lm_doc_scores(
        bg, bigram, ctx, meta.select("vocab"), left=True, checkpoint=False
    )
    return _lm_classify(d, ds, meta.select("c1v", "c2v"))


# --------------------------------- TF-IDF: persisted-vocabulary serving

_TFIDF_MAXF = 65_536  # fitted-vocabulary cap (sklearn max_features)


def _tfidf_tf_frame(d):
    """(doc_id, n_tok, term, term_count) — the tokenize + per-doc term
    count pass, ONE definition shared by the in-query op, the fit, and
    the serve path so the fit-time vocabulary and the serve-time term
    stream can never tokenize differently (the _lm_tok_ctes doctrine)."""
    return (
        d.select("doc_id", F.split(F.col("text"), " ").alias("tok"))
        .select(
            "doc_id",
            F.size("tok").alias("n_tok"),
            F.explode("tok").alias("term"),
        )
        .groupBy("doc_id", "n_tok", "term")
        .agg(F.count(F.lit(1)).alias("term_count"))
    )


def tfidf_model_tables(spark, sf_dir, max_features: int = _TFIDF_MAXF):
    """The persisted TF-IDF fit: one vocabulary table (term, df_docs,
    idf — the idf precomputed IN SPARK at fit time, so serving never
    calls ln) capped at the ``max_features`` highest-df terms (df desc,
    term asc — deterministic refit; the cap is what keeps the table
    broadcast-sized on an open vocabulary), trained exactly once per
    source fingerprint via the shared served-model split (the
    IVF-centroid / LM precedent).  The cap cut uses the two-phase
    global rank, NOT ranked_topk: with k = 65,536 the ranked_topk final
    window would funnel k·P rows into one task — the large-k regime
    belongs to the range-partitioned rank (the small-k UNK vocabulary
    correctly uses ranked_topk; this is the documented crossover).
    This is the production seam text_tfidf_topk's docstring points at:
    a fitted TfidfVectorizer's ``idf_`` table, Spark-shaped."""
    from crypto_datalake_spark.ops.rank import global_row_number
    from crypto_datalake_spark.queries.llm import _served_model_table

    def build_vocab():
        # one corpus pass: the checkpointed tf feeds df counts AND n_docs
        tf = _tfidf_tf_frame(t(spark, sf_dir, "documents")).localCheckpoint()
        dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
        n_docs = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
        idf = F.round(
            F.log(
                (F.col("n_docs").cast("double") + F.lit(1.0))
                / (F.col("df_docs").cast("double") + F.lit(1.0))
            )
            + F.lit(1.0),
            7,
        )
        ranked = global_row_number(
            dfc.crossJoin(F.broadcast(n_docs)),
            [F.col("df_docs").desc(), F.col("term").asc()],
            out_col="__rk",
        )
        return (
            ranked.where(F.col("__rk") <= max_features)
            .select("term", "df_docs", idf.alias("idf"))
            .coalesce(1)
        )

    return _served_model_table(
        spark, sf_dir, "tfidf_vocab", f"v{max_features}", build_vocab,
        source="documents.parquet",
    )


def tfidf_model_paths(sf_dir: str, max_features: int = _TFIDF_MAXF) -> list[str]:
    """Where :func:`tfidf_model_tables` persists its fit — feeds the
    driver's oracle-first pre-build guard (llm.model_artifact_paths)."""
    from crypto_datalake_spark.queries.llm import _served_model_path

    return [
        _served_model_path(
            sf_dir, "tfidf_vocab", f"v{max_features}",
            source="documents.parquet",
        )
    ]


def tfidf_topk_serve(d, vocab, k: int = _TFIDF_K):
    """Score a (doc_id, text) frame against a persisted (term, df_docs,
    idf) vocabulary: tokenize + per-doc term counts (the only
    corpus-size shuffle), one broadcast vocab join, multiply, per-doc
    top-k window.  Terms OUTSIDE the fitted vocabulary are DROPPED
    (sklearn transform semantics: an unfitted term has no idf column),
    so serving works on NEW documents; n_tok stays the FULL document
    length so tf is comparable across docs regardless of OOV content."""
    tf = _tfidf_tf_frame(d)
    scored = tf.join(F.broadcast(vocab), "term").withColumn(
        "tfidf",
        (F.col("term_count").cast("double") / F.col("n_tok").cast("double"))
        * F.col("idf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "term_count", "idf", "tfidf", "rank")
    )


def _tfidf_served_sql(sf_dir: str) -> str:
    """Surrogate oracle for the served TF-IDF: DuckDB recomputes the
    serving policy CONDITIONAL on the persisted vocabulary — the idf
    values are READ, never re-derived, so no cross-engine ln in play;
    the inner vocab join mirrors the OOV-drop semantics."""
    [vp] = tfidf_model_paths(sf_dir)
    return f"""
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
    voc AS (SELECT term, idf FROM read_parquet('{vp}/*.parquet')),
    scored AS (
      SELECT doc_id, term, term_count, idf,
             (CAST(term_count AS DOUBLE) / CAST(n_tok AS DOUBLE)) * idf
               AS tfidf
      FROM tf JOIN voc USING (term)
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
      FROM scored
    )
    SELECT doc_id, term, term_count, idf, tfidf, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_TFIDF_K}
    """


@register(
    "text_tfidf_topk_served",
    sql=_tfidf_served_sql,
    doc="The persisted-vocabulary serving path of text_tfidf_topk: the "
    "df/idf vocabulary (capped at max_features highest-df terms, idf "
    "precomputed at fit) and a 1-row meta are trained once per source "
    "fingerprint and persisted as warehouse tables; serving is one "
    "tokenize + (doc, term) count shuffle, ONE broadcast vocab join and "
    "a multiply — zero ln calls, no document-frequency recount, no "
    "second corpus pass (the incremental-corpus production shape: new "
    "batches score against the frozen vocabulary, refits are explicit). "
    "Terms outside the fitted vocabulary are dropped (sklearn transform "
    "semantics), so new documents serve correctly. On a training "
    "corpus whose vocabulary fits max_features the output equals "
    "text_tfidf_topk (no OOV, same idf formula, same tie-break — "
    "pinned in tests); past the cap the low-df (high-idf) tail is "
    "deliberately excluded from keywording, a real divergence from the "
    "uncapped op (also pinned in tests). SURROGATE oracle: "
    "DuckDB recomputes the serving policy conditional on the persisted "
    "vocabulary through the oracle-first pre-build guard (the "
    "quality_lm_perplexity_served precedent).",
)
def text_tfidf_topk_served(spark, sf_dir):
    return tfidf_topk_serve(
        t(spark, sf_dir, "documents"), tfidf_model_tables(spark, sf_dir)
    )


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling" — hashed n-gram features,
# bag-of-buckets unigram LMs, Gumbel-top-k resample)

_DSIR_B = 256          # hashed feature buckets (the paper's 10k, SF-scaled)
_DSIR_TARGET = "en"    # target distribution: the English slice
_DSIR_KEEP_DEN = 4     # resample floor(n / 4) documents


def _dsir_gumbel_sql() -> str:
    """DuckDB Gumbel key: logw - ln(-ln(u)) with u a seeded-md5 uniform."""
    hv = _DK_H.format(x="'g1:' || CAST(doc_id AS VARCHAR)")
    return (
        f"round(dsir_logw - ln(-ln((CAST({hv} AS DOUBLE) + 0.5) "
        "/ 1152921504606846976.0)), 7)"
    )


def _dsir_ex(docs, n_buckets: int = _DSIR_B):
    """(doc_id, lang, b): one row per hashed unigram/bigram feature
    occurrence.  CASE-guarded like repetition_signals so the inlined
    sequence() stays total if pushed past the size check.

    Since r15 the queries consume the (doc_id, lang, b, n) COUNT grain
    (:func:`_dsir_doc_bucket_counts`) instead of this occurrence stream;
    this JVM-expression form stays as the independent reference twin the
    parity test aggregates against, so a tokenize/hash drift in the
    Arrow pass cannot land silently."""
    base = docs.select("doc_id", "lang", F.split(F.col("text"), " ").alias("tok"))
    feats = F.expr(
        "concat("
        "transform(tok, t -> concat('u:', t)), "
        "CASE WHEN size(tok) >= 2 THEN transform(sequence(0, size(tok) - 2), "
        "i -> concat('b:', tok[i], ' ', tok[i + 1])) "
        "ELSE CAST(array() AS array<string>) END)"
    )
    return base.select("doc_id", "lang", F.explode(feats).alias("f")).select(
        "doc_id",
        "lang",
        (F.expr(_SP_H.format(x="f")) % n_buckets).alias("b"),
    )


# memo bound for the per-task feature→bucket cache (guide §4.5): the
# synthetic vocabulary is tiny so the cache all but eliminates md5 calls,
# while the cap keeps a 100 TB open-vocabulary task's memory bounded
_DSIR_MEMO_CAP = 1 << 20


def _dsir_doc_bucket_counts(docs, n_buckets: int = _DSIR_B):
    """(doc_id, lang, b, n): per-document hashed-feature bucket COUNTS in
    one Arrow-batched pass — the BM25 map-side precedent (guide §2.3/
    §4.2) applied to the DSIR feature stream: tokenize, build the
    unigram/bigram features, md5-bucket and bincount per document inside
    ``mapInPandas``, so only the (doc, bucket) grain (~0.6× the
    occurrence stream here, ≤ B rows per doc at any scale) is ever
    materialized/checkpointed — the occurrence-grain explode never
    exists.  Exact twin of ``_dsir_ex`` aggregated by (doc_id, lang, b):
    same split-on-space tokens, same 'u:'/'b:' feature strings, and the
    bucket is ``int(md5(feature)[:15 hex], 16) % B`` — precisely the
    ``_SP_H`` bridge — so every downstream count and decimal ratio sum
    is bit-identical (pinned by
    test_dsir_bucket_counts_match_exploded_grain)."""
    n_buckets = int(n_buckets)

    def gen(it):
        import hashlib

        import numpy as np
        import pandas as pd

        memo: dict = {}

        def bucket(f: str) -> int:
            h = memo.get(f)
            if h is None:
                h = (
                    int(hashlib.md5(f.encode("utf-8")).hexdigest()[:15], 16)
                    % n_buckets
                )
                if len(memo) < _DSIR_MEMO_CAP:
                    memo[f] = h
            return h

        for pdf in it:
            if not len(pdf):
                continue
            doc_l: list = []
            lang_l: list = []
            nfeat: list = []
            flat: list = []
            for doc_id, lang, text in zip(
                pdf["doc_id"].tolist(), pdf["lang"].tolist(),
                pdf["text"].tolist(),
            ):
                if text is None:
                    continue  # split(NULL) explodes to zero rows
                tok = text.split(" ")
                fs = ["u:" + t for t in tok]
                if len(tok) >= 2:
                    fs += [
                        "b:" + tok[i] + " " + tok[i + 1]
                        for i in range(len(tok) - 1)
                    ]
                doc_l.append(doc_id)
                lang_l.append(lang)
                nfeat.append(len(fs))
                flat.extend(fs)
            if not doc_l:
                continue
            b = np.fromiter(
                (bucket(f) for f in flat), dtype=np.int64, count=len(flat)
            )
            didx = np.repeat(
                np.arange(len(doc_l), dtype=np.int64),
                np.asarray(nfeat, dtype=np.int64),
            )
            cnt = np.bincount(
                didx * n_buckets + b, minlength=len(doc_l) * n_buckets
            )
            nz = np.nonzero(cnt)[0]
            di = nz // n_buckets
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(doc_l, dtype=np.int64)[di],
                    "lang": np.asarray(lang_l, dtype=object)[di],
                    "b": (nz % n_buckets).astype(np.int64),
                    "n": cnt[nz].astype(np.int64),
                }
            )

    return docs.select("doc_id", "lang", "text").mapInPandas(
        gen, "doc_id long, lang string, b long, n long"
    )


def _dsir_ratio_tot(exc, n_buckets: int = _DSIR_B, target_lang: str = _DSIR_TARGET):
    """(b, r, tr, tt) per fit-seen bucket: the add-one-smoothed log
    probability ratio (decimal-rounded so per-doc sums are engine-exact,
    the _lm discipline) plus the corpus totals — ONE corpus pass fits
    BOTH bucket LMs (raw = count, target = the lang slice).  ``exc`` is
    the (doc_id, lang, b, n) bucket-count grain
    (:func:`_dsir_doc_bucket_counts`); summing its counts equals
    counting the occurrence stream exactly."""
    cnt = exc.groupBy("b").agg(
        F.sum("n").alias("cr"),
        F.sum(
            F.when(F.col("lang") == target_lang, F.col("n")).otherwise(
                F.lit(0)
            )
        ).alias("ct"),
    )
    # totals via a window over the ALREADY-AGGREGATED <=B-row frame
    # (sample_domain_mixture precedent) — the corpus is counted once
    w = Window.partitionBy()
    tot = cnt.withColumn("tr", F.sum("cr").over(w)).withColumn(
        "tt", F.sum("ct").over(w)
    )
    arg = (
        (F.col("ct") + F.lit(1.0)) / (F.col("tt") + F.lit(float(n_buckets)))
    ) * (
        (F.col("tr") + F.lit(float(n_buckets))) / (F.col("cr") + F.lit(1.0))
    )
    return tot.select(
        "b",
        F.round(F.log(arg), 7).cast("decimal(20,7)").alias("r"),
        "tr",
        "tt",
    )


def _dsir_gumbel_col():
    """Spark Gumbel key over a ``dsir_logw`` column: logw − ln(−ln(u))
    with u a seeded-md5 uniform of the doc key (the SQL twin is
    :func:`_dsir_gumbel_sql`)."""
    hv = F.expr(_SP_H.format(x="concat('g1:', CAST(doc_id AS STRING))"))
    u = (hv.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    return F.round(F.col("dsir_logw") - F.log(-F.log(u)), 7)


def dsir_frame(
    docs,
    n_buckets: int = _DSIR_B,
    target_lang: str = _DSIR_TARGET,
    keep_den: int = _DSIR_KEEP_DEN,
):
    """DSIR over a (doc_id, lang, text) frame — the DataFrame op behind
    ``sample_dsir``.  Returns the resampled docs with their importance
    log-weight, Gumbel key, and selection rank."""
    from crypto_datalake_spark.ops.rank import global_row_number

    # consumers: bucket fit + per-doc scoring.  The checkpoint holds the
    # (doc, lang, b, n) count grain, not the occurrence explode (r15):
    # the per-doc decimal sum Σ n·r is the occurrence sum exactly
    # (decimal × integer is exact, decimal adds are order-free).
    exc = _dsir_doc_bucket_counts(docs, n_buckets).localCheckpoint()
    ratio = _dsir_ratio_tot(exc, n_buckets, target_lang).select("b", "r")
    sc = (
        exc.join(F.broadcast(ratio), "b")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("r") * F.col("n").cast("decimal(10,0)")).alias("s"))
        .select("doc_id", "lang", F.col("s").cast("double").alias("dsir_logw"))
    )
    scored = sc.withColumn("gumbel_key", _dsir_gumbel_col())
    ranked = global_row_number(
        scored,
        [F.col("gumbel_key").desc(), F.col("doc_id").asc()],
        out_col="__rk",
    )
    # count over `ranked`, not `scored`: ranked reads global_row_number's
    # materialized range checkpoint, while `scored` would re-evaluate the
    # whole ratio-join + doc aggregation a second time (~0.5 s at sf0.1,
    # a full corpus pass at 100 TB — the LM c12 double-evaluation class)
    n = ranked.agg(F.count(F.lit(1)).alias("__n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .where(F.col("__rk") <= F.floor(F.col("__n") / keep_den))
        .select(
            "doc_id",
            "lang",
            "dsir_logw",
            "gumbel_key",
            F.col("__rk").cast("long").alias("sample_rank"),
        )
    )


@register(
    "sample_dsir",
    sql=f"""
    WITH tokd AS (
      SELECT doc_id, lang, string_split(text, ' ') AS tok FROM documents
    ),
    feats AS (
      SELECT doc_id, lang,
             unnest(list_concat(
               list_transform(tok, tk -> 'u:' || tk),
               CASE WHEN len(tok) >= 2
                 THEN [('b:' || tok[i] || ' ' || tok[i + 1])
                       for i in range(1, len(tok))]
                 ELSE [] END)) AS f
      FROM tokd
    ),
    fb AS (
      SELECT doc_id, lang, ({_DK_H.format(x="f")}) % {_DSIR_B} AS b FROM feats
    ),
    cnt AS (
      SELECT b, count(*) AS cr,
             sum(CASE WHEN lang = '{_DSIR_TARGET}' THEN 1 ELSE 0 END) AS ct
      FROM fb GROUP BY b
    ),
    tot AS (
      SELECT b, cr, ct, sum(cr) OVER () AS tr, sum(ct) OVER () AS tt FROM cnt
    ),
    ratio AS (
      SELECT b,
             CAST(round(ln((ct + 1.0) / (tt + {_DSIR_B}.0)
                           * ((tr + {_DSIR_B}.0) / (cr + 1.0))), 7)
                  AS DECIMAL(20,7)) AS r
      FROM tot
    ),
    sc AS (
      SELECT doc_id, lang, CAST(sum(r) AS DOUBLE) AS dsir_logw
      FROM fb JOIN ratio USING (b) GROUP BY doc_id, lang
    ),
    g AS (
      SELECT doc_id, lang, dsir_logw, {_dsir_gumbel_sql()} AS gumbel_key FROM sc
    ),
    rk AS (
      SELECT *, row_number() OVER (ORDER BY gumbel_key DESC, doc_id) AS rnk,
             count(*) OVER () AS n
      FROM g
    )
    SELECT doc_id, lang, dsir_logw, gumbel_key,
           CAST(rnk AS BIGINT) AS sample_rank
    FROM rk WHERE rnk <= n // {_DSIR_KEEP_DEN}
    """,
    doc="DSIR data selection (Xie et al. 2023): hashed unigram+bigram "
    f"features into {_DSIR_B} md5 buckets, add-one-smoothed bag-of-buckets "
    "unigram LMs for the target distribution (the English slice) vs the "
    "raw corpus, per-document importance log-weight = sum of per-bucket "
    "log probability ratios (decimal-rounded so the sum is engine-exact, "
    "the _lm discipline), then the paper's Gumbel-top-k resample made "
    "deterministic: gumbel_key = logw - ln(-ln(u)) with u a seeded-md5 "
    "uniform of the doc key, keep the global top floor(n/4) by key. "
    "Scale shape (r15): ONE Arrow-batched pass computes per-document "
    "hashed-bucket COUNTS map-side (tokenize→feature→md5 bucket→"
    f"bincount, guide §2.3/§4.2) so only the (doc, bucket, n) grain — "
    f"≤ {_DSIR_B} rows per doc at any corpus size — is checkpointed and "
    f"feeds both the {_DSIR_B}-row bucket fit (totals via a window over "
    "the aggregated frame, never the corpus) and the per-doc score "
    "(broadcast ratio join + one doc_id shuffle; Σ n·r is the exact "
    "decimal occurrence sum, pinned against the JVM explode twin); "
    "selection is the two-phase global rank — no all-pairs, no "
    "corpus-size window, two corpus passes total at 100 TB. The "
    "production seam mirrors tfidf/lm served: persist the B-row ratio "
    "table and new batches score shuffle-free against the frozen fit.",
)
def sample_dsir(spark, sf_dir):
    return dsir_frame(t(spark, sf_dir, "documents"))


_DSIR_SUFFIX = f"b{_DSIR_B}_{_DSIR_TARGET}_d{_DSIR_KEEP_DEN}"


def dsir_model_tables(spark, sf_dir):
    """The persisted DSIR fit — the seam sample_dsir's doc promises —
    as two warehouse tables trained once per source fingerprint:

    - ``dsir_ratio``: the B-row (b, r) bucket log-probability-ratio
      table (broadcast-sized forever: B is a constant of the fit).
    - ``dsir_meta``: 1 row (tr, tt, r_oov, key_cut) — the corpus
      totals, the smoothed ratio an UNSEEN bucket scores at serve time
      (cr = ct = 0 ⇒ ln((tr+B)/(tt+B)); new batches hash features to
      buckets the fit never saw), and the FROZEN acceptance threshold:
      the minimum Gumbel key the training resample kept, so serving is
      a per-doc comparison instead of a global re-rank."""
    from crypto_datalake_spark.queries.llm import _served_model_table

    def mk(prefix, build):
        return _served_model_table(
            spark, sf_dir, prefix, _DSIR_SUFFIX, build,
            source="documents.parquet",
        )

    def build_ratio():
        return (
            _dsir_ratio_tot(_dsir_doc_bucket_counts(t(spark, sf_dir, "documents")))
            .select("b", "r")
            .coalesce(1)
        )

    ratio = mk("dsir_ratio", build_ratio)

    def build_meta():
        docs = t(spark, sf_dir, "documents")
        tots = (
            _dsir_ratio_tot(_dsir_doc_bucket_counts(docs))
            .select("tr", "tt")
            .limit(1)
        )
        r_oov = F.round(
            F.log(
                (F.col("tr").cast("double") + F.lit(float(_DSIR_B)))
                / (F.col("tt").cast("double") + F.lit(float(_DSIR_B)))
            ),
            7,
        ).cast("decimal(20,7)")
        cut = dsir_frame(docs).agg(F.min("gumbel_key").alias("key_cut"))
        return (
            tots.select("tr", "tt", r_oov.alias("r_oov"))
            .crossJoin(cut)
            .coalesce(1)
        )

    return ratio, mk("dsir_meta", build_meta)


def dsir_model_paths(sf_dir: str) -> list[str]:
    """Where :func:`dsir_model_tables` persists its fits — feeds the
    driver's oracle-first pre-build guard (llm.model_artifact_paths)."""
    from crypto_datalake_spark.queries.llm import _served_model_path

    return [
        _served_model_path(sf_dir, pre, _DSIR_SUFFIX, source="documents.parquet")
        for pre in ("dsir_ratio", "dsir_meta")
    ]


def dsir_serve(docs, ratio, meta):
    """Score a (doc_id, lang, text) batch against the FROZEN DSIR fit:
    per-doc importance log-weight from the persisted bucket ratios
    (unseen buckets coalesce to the persisted r_oov — real OOV
    handling, the lm-served precedent), Gumbel key from the doc id, and
    ``keep`` = key ≥ the persisted training cutoff.  Shuffle shape: one
    Arrow-batched bucket-count pass + one doc_id aggregation; both fit
    tables broadcast — no refit, no corpus recount, no global rank."""
    exc = _dsir_doc_bucket_counts(docs)
    sc = (
        exc.join(F.broadcast(ratio), "b", "left")
        .crossJoin(F.broadcast(meta.select("r_oov")))
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(
                F.coalesce("r", "r_oov") * F.col("n").cast("decimal(10,0)")
            ).alias("s")
        )
        .select("doc_id", "lang", F.col("s").cast("double").alias("dsir_logw"))
    )
    return (
        sc.withColumn("gumbel_key", _dsir_gumbel_col())
        .crossJoin(F.broadcast(meta.select("key_cut")))
        .select(
            "doc_id",
            "lang",
            "dsir_logw",
            "gumbel_key",
            # NULL cut = the training resample kept nothing (corpus
            # smaller than keep_den): serve keeps nothing, a definite
            # False — not a NULL verdict (oracle mirrors the coalesce)
            F.coalesce(
                F.col("gumbel_key") >= F.col("key_cut"), F.lit(False)
            ).alias("keep"),
        )
    )


def _dsir_served_sql(sf_dir: str) -> str:
    """Surrogate oracle: DuckDB recomputes the serving policy
    CONDITIONAL on the persisted fit (ratios, OOV ratio, frozen cutoff)
    — the quality_lm_perplexity_served precedent."""
    rp, mp = dsir_model_paths(sf_dir)
    return f"""
    WITH tokd AS (
      SELECT doc_id, lang, string_split(text, ' ') AS tok FROM documents
    ),
    feats AS (
      SELECT doc_id, lang,
             unnest(list_concat(
               list_transform(tok, tk -> 'u:' || tk),
               CASE WHEN len(tok) >= 2
                 THEN [('b:' || tok[i] || ' ' || tok[i + 1])
                       for i in range(1, len(tok))]
                 ELSE [] END)) AS f
      FROM tokd
    ),
    fb AS (
      SELECT doc_id, lang, ({_DK_H.format(x="f")}) % {_DSIR_B} AS b FROM feats
    ),
    ratio AS (SELECT b, r FROM read_parquet('{rp}/*.parquet')),
    m AS (SELECT r_oov, key_cut FROM read_parquet('{mp}/*.parquet')),
    sc AS (
      SELECT doc_id, lang,
             CAST(sum(coalesce(ratio.r, m.r_oov)) AS DOUBLE) AS dsir_logw
      FROM fb LEFT JOIN ratio USING (b) CROSS JOIN m
      GROUP BY doc_id, lang
    ),
    g AS (
      SELECT doc_id, lang, dsir_logw, {_dsir_gumbel_sql()} AS gumbel_key
      FROM sc
    )
    SELECT doc_id, lang, dsir_logw, gumbel_key,
           coalesce(gumbel_key >= m.key_cut, FALSE) AS keep
    FROM g CROSS JOIN m
    """


@register(
    "sample_dsir_served",
    sql=_dsir_served_sql,
    doc="The persisted-fit serving path of sample_dsir: the B-row "
    "bucket-ratio table and a 1-row meta (corpus totals, the smoothed "
    "OOV-bucket ratio, and the FROZEN acceptance threshold = the "
    "minimum Gumbel key the training resample kept) are trained once "
    "per source fingerprint; serving a new batch is one feature "
    "explode, a broadcast ratio join with OOV coalesce, one doc_id "
    "aggregation, and a broadcast threshold comparison — no refit, no "
    "corpus recount, no global rank (the production shape: score "
    "incoming crawls against the frozen target/raw importance model). "
    "On the training corpus the kept set equals sample_dsir's resample "
    "exactly (pinned in tests, modulo Gumbel-key ties at the cut — "
    "none exist at 7-dp keys here). SURROGATE oracle: DuckDB "
    "recomputes the serving policy conditional on the persisted fit.",
)
def sample_dsir_served(spark, sf_dir):
    ratio, meta = dsir_model_tables(spark, sf_dir)
    return dsir_serve(t(spark, sf_dir, "documents"), ratio, meta)
