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
# Stop-term policy: a term in more than this percentage of documents is
# cut from the postings before the query fan-out (df*100 <= N*pct,
# exact integers). 90 cuts natural-language stopwords (df ~ 0.95N)
# whose idf is near zero anyway, while leaving mid-frequency vocabulary
# — and therefore this corpus's 31-term synthetic vocabulary (max df
# 0.8N) — fully scored.
_BM25_STOP_DF_PCT = 90


def _bm25_weights(
    tf, k1: float = _K1, b: float = _B,
    stop_df_pct: int = _BM25_STOP_DF_PCT,
    decimal_scores: bool = True,
    unscaled: bool = False,
):
    """Per-posting BM25 weights (doc_id, term, w) from a term-frequency
    frame ``tf`` (doc_id, n_tok, term, term_count —
    curation._tfidf_tf_frame shape): the pre-fan-out stage shared by the
    join and numpy scorers so their arithmetic cannot drift.
    ``unscaled=True`` (decimal path only) emits ``w_u`` = the exact
    unscaled long of the DECIMAL(25,14) product (idf_u·sat_u with each
    factor's ×10⁷ unscaled long — long×long ≤ ~1e15, far inside int64),
    so integer sums downstream equal the decimal sum bit-for-bit."""
    assert not (unscaled and not decimal_scores)
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
    idf = F.log(
        (
            F.col("n_docs").cast("double")
            - F.col("df_docs").cast("double")
            + F.lit(0.5)
        )
        / (F.col("df_docs").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    if decimal_scores:
        idf = F.round(idf, 7).cast("decimal(12,7)")
    # avgdl = sum_dl / n_docs: exactly-rounded IEEE division of exact
    # integers — bitwise identical across engines
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    tf_d = F.col("term_count").cast("double")
    sat = (tf_d * F.lit(k1 + 1.0)) / (
        tf_d
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * (F.col("dl").cast("double") / avgdl)
        )
    )
    if decimal_scores:
        sat = F.round(sat, 7).cast("decimal(12,7)")
    # ALL arithmetic happens at corpus/vocab size, BEFORE the query-bag
    # fan-out: idf once per vocab term, the saturation factor once per
    # (doc, term) posting, and their exact decimal product w once per
    # posting — the fanned-out |queries|×|postings| stage downstream is
    # then pure join + decimal sum (measured 1.7x at sf0.1 vs computing
    # ln/round/multiply per fanned row).
    # STOP-TERM CAP (the dedup_exact_substring posting-cap policy, df-
    # RELATIVE because BM25's vocabulary is open-ended): a term in more
    # than stop_df_pct% of the corpus scores near-zero idf yet fans out
    # |postings| x |queries| rows — the single biggest join input at
    # 100 TB. Cut it from the postings entirely; exact-integer
    # comparison, mirrored verbatim by every oracle and applied at FIT
    # time for the served twin (so OOV-drop serve semantics inherit it).
    stopped = dfc.crossJoin(F.broadcast(stats)).where(
        F.col("df_docs") * 100 <= F.col("n_docs") * F.lit(stop_df_pct)
    )
    if unscaled:
        dfc_idf = stopped.select(
            "term", (idf * F.lit(10**7)).cast("long").alias("idf_u")
        )
        w = (F.col("idf_u") * (sat * F.lit(10**7)).cast("long")).alias("w_u")
    else:
        dfc_idf = stopped.select("term", idf.alias("idf"))
        # DECIMAL × DECIMAL is exact — no re-round, no float sum
        w = (F.col("idf") * sat).alias("w")
    return (
        tf.withColumn("dl", F.col("n_tok"))
        .crossJoin(F.broadcast(stats))
        # NOT force-broadcast: the vocabulary is open-ended at 100 TB;
        # AQE broadcasts it when it measures small (it does at bench SF)
        .join(dfc_idf, "term")
        .select("doc_id", "term", w)
    ), stats


def _bm25_scored(
    tf, qterms, k1: float = _K1, b: float = _B,
    stop_df_pct: int = _BM25_STOP_DF_PCT,
    decimal_scores: bool = True,
):
    """Per-(qid, doc_id) BM25 decimal scores via the query-bag JOIN —
    the open-ended fan-out plan (weights ⋈ qterms on term, decimal sum).
    ``stop_df_pct``: terms in more than this percentage of documents are
    stop terms and score nothing (exact integer predicate
    df*100 <= N*pct).

    ``decimal_scores=False`` is the production knob (VERDICT r12 item 3):
    plain-double idf x saturation products double-summed — same ranking in
    practice, but the score sum becomes partition-order-dependent in the
    last ulps, so the ORACLE-FACING registered queries keep the exact
    DECIMAL(12,7) path (bit-stable across engines and partitionings).
    Measured tax of the decimal path: see SCALE.md's BM25 note.

    The registered decimal queries normally take the numpy scatter-add
    scorer (:func:`_bm25_scored_np`) instead — bit-identical output, the
    fan-out aggregated map-side — and fall back to this join when the
    query bag exceeds the broadcast cap."""
    weights, _ = _bm25_weights(
        tf, k1, b, stop_df_pct, decimal_scores=decimal_scores
    )
    contrib = weights.join(qterms, "term").where(
        F.col("doc_id") != F.col("qid")
    )
    return contrib.groupBy("qid", "doc_id").agg(
        F.sum("w").alias("score_dec"),
        F.count(F.lit(1)).alias("n_hit_terms"),
    )


# Collected-query-bag cap for the numpy scorer: above this the bag is no
# longer "a bounded query workload" and the open-ended join plan takes
# over (the hard_negatives anchor-bound doctrine — never broadcast a
# corpus-proportional frame).
_QBAG_NP_MAX = 2_000_000
# Byte companion to the row cap (ADVICE r14): rows alone let a bag of
# long terms build a multi-GB pickled broadcast; the estimate is term
# bytes + per-row index overhead, checked during the bounded collect.
_QBAG_NP_MAX_BYTES = 256 * 1024 * 1024
# Per-batch memory bounds for the scorer itself (guide §5; VERDICT r14
# item 1 — the guards above cap bag ROWS, not |q|, so a high-|q| bag of
# tiny per-term lists could pass them and still ask for a
# (batch-docs × |q|) dense scatter buffer):
#  - the dense int64 scatter/bincount buffers are capped at
#    _NP_SCATTER_MAX_CELLS cells (≈64 MB each); a bigger (docs × |q|)
#    grid takes the sparse sort+segment-sum path instead, whose memory
#    is O(chunk contributions), never O(docs × |q|);
#  - the expanded contribution arrays are bounded by chunking the
#    batch's posting rows at _NP_CHUNK_CONTRIBS expanded (row, qid)
#    pairs.  A single row expands to ≤ bag rows ≤ _QBAG_NP_MAX, below
#    the chunk bound, so every chunk makes progress.  Chunk partials
#    are exact int64 sums — order-free — so the downstream
#    groupBy(qid, doc_id) sum is bit-identical however the batch is cut.
_NP_SCATTER_MAX_CELLS = 1 << 23
_NP_CHUNK_CONTRIBS = 1 << 23


def _np_qbag(qterms, cap: int | None = None):
    """Driver-side query-bag index for the numpy scorer: term →
    contiguous slice of query positions, plus the qid catalog. Returns
    None when the bag exceeds ``cap`` rows (caller falls back to the
    join plan). The collect is bounded by cap+1 by construction."""
    import numpy as np

    cap = _QBAG_NP_MAX if cap is None else cap
    rows = qterms.limit(cap + 1).collect()
    if len(rows) > cap:
        return None
    # byte-estimate companion bound (ADVICE r14): long terms can blow
    # the broadcast/driver budget long before the row cap does
    if rows and (
        sum(len(r["term"]) for r in rows) + 24 * len(rows)
        > _QBAG_NP_MAX_BYTES
    ):
        return None
    qid_list = sorted({r["qid"] for r in rows})
    qpos = {q: i for i, q in enumerate(qid_list)}
    per_term: dict = {}
    bag_sizes: dict = {}
    for r in rows:
        per_term.setdefault(r["term"], []).append(qpos[r["qid"]])
        bag_sizes[r["qid"]] = bag_sizes.get(r["qid"], 0) + 1
    terms = list(per_term)
    codedict = {t: i for i, t in enumerate(terms)}
    flat = (
        np.concatenate(
            [np.asarray(sorted(per_term[t]), dtype=np.int64) for t in terms]
        )
        if terms
        else np.zeros(0, np.int64)
    )
    cnts = np.asarray([len(per_term[t]) for t in terms], dtype=np.int64)
    starts = (
        np.concatenate([[0], np.cumsum(cnts)[:-1]]).astype(np.int64)
        if terms
        else np.zeros(0, np.int64)
    )
    qid_arr = np.asarray(qid_list, dtype=np.int64)
    max_bag = max(bag_sizes.values()) if bag_sizes else 0
    return codedict, flat, cnts, starts, qid_arr, len(qid_list), max_bag


def _np_fanout_scorer(bc, max_cells=None, chunk_contribs=None):
    """Arrow-batched scatter-add scorer over (doc_id, term, w_u): each
    batch expands its postings against the broadcast query-bag index and
    emits per-batch partial (qid, doc_id, s, c) — the |q|×|postings|
    fan-out aggregated MAP-SIDE as vectorized int64 (exact: every value
    is an unscaled decimal, sums are order-free integers), so only
    |docs-in-batch|×|q| partials ever reach the shuffle instead of one
    row per (q, doc, term) contribution.

    Memory is analytically bounded (VERDICT r14 item 1): posting rows
    are processed in chunks of ≤ ``chunk_contribs`` expanded (row, qid)
    pairs, and a chunk whose (docs × |q|) grid exceeds ``max_cells``
    aggregates sparsely (sort + segment-sum, O(chunk contributions))
    instead of allocating the dense scatter buffer — both paths are
    order-free int64 sums, so the emitted partials aggregate
    bit-identically downstream.  The bounds are baked into the closure
    at plan time (executors re-import the module, so module globals
    would not see a driver-side override)."""
    max_cells = _NP_SCATTER_MAX_CELLS if max_cells is None else max_cells
    chunk_contribs = (
        _NP_CHUNK_CONTRIBS if chunk_contribs is None else chunk_contribs
    )

    def score(it):
        import numpy as np
        import pandas as pd

        codedict, flat, cnts, starts, qid_arr, nq, _ = bc.value
        for batch in it:
            if len(batch) == 0 or nq == 0:
                continue
            codes = batch["term"].map(codedict).to_numpy(dtype="float64")
            keep = ~np.isnan(codes)
            codes = codes[keep].astype(np.int64)
            if len(codes) == 0:
                continue
            docs = batch["doc_id"].to_numpy()[keep]
            wv = batch["w_u"].to_numpy()[keep]
            c = cnts[codes]
            ccum = np.cumsum(c)
            if not int(ccum[-1]):
                continue
            i0 = 0
            while i0 < len(codes):
                base = int(ccum[i0 - 1]) if i0 else 0
                i1 = int(
                    np.searchsorted(ccum, base + chunk_contribs, side="right")
                )
                i1 = max(i1, i0 + 1)
                cc = c[i0:i1]
                total = int(cc.sum())
                if total == 0:
                    i0 = i1
                    continue
                row_rep = np.repeat(np.arange(i0, i1), cc)
                cum = np.cumsum(cc)
                pos = np.arange(total) - np.repeat(cum - cc, cc)
                q_exp = flat[starts[codes[row_rep]] + pos]
                w_exp = wv[row_rep]
                udoc, dcode = np.unique(docs[row_rep], return_inverse=True)
                key = dcode.astype(np.int64) * nq + q_exp
                size = len(udoc) * nq
                if size <= max_cells:
                    s = np.zeros(size, dtype=np.int64)
                    np.add.at(s, key, w_exp)
                    cct = np.bincount(key, minlength=size)
                    nz = np.nonzero(cct)[0]
                    qi = qid_arr[nz % nq]
                    di = udoc[nz // nq]
                    sv = s[nz]
                    cv = cct[nz].astype(np.int64)
                else:
                    # sparse exact aggregation: sort the (doc, qid) keys
                    # and segment-sum — same order-free int64 adds, no
                    # (docs × |q|) allocation
                    order = np.argsort(key, kind="stable")
                    ks = key[order]
                    ws = w_exp[order]
                    bnd = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
                    uk = ks[bnd]
                    sv = np.add.reduceat(ws, bnd)
                    cv = np.diff(np.r_[bnd, len(ks)]).astype(np.int64)
                    qi = qid_arr[uk % nq]
                    di = udoc[uk // nq]
                yield pd.DataFrame(
                    {"qid": qi, "doc_id": di, "s": sv, "c": cv}
                )
                i0 = i1

    return score


def _bm25_scored_np(
    tf, qterms, k1: float = _K1, b: float = _B,
    stop_df_pct: int = _BM25_STOP_DF_PCT,
    weights_unscaled=None, meta=None,
):
    """Per-(qid, doc_id) BM25 scores via the numpy scatter-add scorer:
    (qid, doc_id, s, n_hit_terms) with ``s`` the exact unscaled (×10¹⁴)
    long of the decimal score sum — bit-identical to
    ``_bm25_scored(...).score_dec`` by construction (integer sums are
    order-free; every w_u is the exact unscaled DECIMAL(25,14) product).
    Returns None when the query bag exceeds the broadcast cap or the
    analytic int64 bound fails — the caller falls back to the join plan,
    so the open-ended 100 TB shape is unchanged.

    ``weights_unscaled``/``meta`` let the serve path inject its
    frozen-idf weights frame and 1-row fit meta (n_docs); the fit path
    derives both from ``tf``.  The query bag is collected FIRST
    (ADVICE r14): it is the cheaper bail-out, so a fallback never pays
    the corpus-stats job."""
    bag = _np_qbag(qterms)
    if bag is None:
        return None
    if weights_unscaled is None:
        weights_unscaled, stats = _bm25_weights(
            tf, k1, b, stop_df_pct, unscaled=True
        )
        n_docs = stats.collect()[0]["n_docs"]  # 1-row agg: bounded
    else:
        n_docs = meta.collect()[0]["n_docs"]  # frozen 1-row fit meta
    max_bag = bag[6]
    # loud analytic int64 bound (data-independent w ceiling): every
    # per-(q,d) sum is ≤ max_bag terms × w_u ceiling; partial sums of
    # positives never exceed the total, so ONE plan-time check covers
    # the Python partials AND the JVM long sum of partials.
    import math

    w_ceil = int(
        (round(math.log(2 * max(n_docs, 1) + 1), 7) * 10**7 + 1)
        * ((k1 + 1.0) * 10**7 + 1)
    )
    if max_bag * w_ceil >= 2**62:
        return None
    spark = tf.sparkSession
    bc = spark.sparkContext.broadcast(bag)
    part = weights_unscaled.mapInPandas(
        _np_fanout_scorer(bc), "qid long, doc_id long, s long, c long"
    )
    return (
        part.groupBy("qid", "doc_id")
        .agg(F.sum("s").alias("s"), F.sum("c").alias("n_hit_terms"))
        .where(F.col("doc_id") != F.col("qid"))
    )


def _np_topk_select(scored_np, k: int):
    """Top-k + output columns over the numpy scorer's (qid, doc_id, s,
    n_hit_terms): rank on the unscaled long (a monotone bijection of the
    exact decimal sum, so the order is identical), then
    round-half-up(s/10¹⁴, 7) as pure integer arithmetic and ONE exact
    IEEE division — the same correctly-rounded rational the decimal
    round+double-cast produces, so the emitted double is bit-identical
    (s ≥ 0: idf and saturation are strictly positive)."""
    w = Window.partitionBy("qid").orderBy(
        F.col("s").desc(), F.col("doc_id").asc()
    )
    return (
        scored_np.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "qid",
            "doc_id",
            (
                F.expr("(s + 5000000) DIV 10000000").cast("double")
                / F.lit(1e7)
            ).alias("bm25"),
            F.col("n_hit_terms").cast("long").alias("n_hit_terms"),
            "rank",
        )
    )


def bm25_topk(
    d, q_mod: int = _Q_MOD, k: int = _K, only_qid: int | None = None,
    decimal_scores: bool = True, rank_rounded: bool = False,
):
    """Top-``k`` BM25 hits for every corpus-derived query over a
    (doc_id, text) frame — the DataFrame op behind ``search_bm25_topk``.
    ``only_qid`` restricts the query set to one document (the hybrid-RRF
    fusion's single-query shape) without changing corpus statistics.
    ``decimal_scores=False``: production double-scoring knob — see
    ``_bm25_scored``; registered queries keep the default except
    ``search_bm25_topk_fast``. ``rank_rounded=True`` quantizes the score
    to 7 decimals BEFORE the top-k ranking: with double scoring the raw
    sum is associativity-noisy in the last ulps (partition-order- and
    engine-dependent), so ranking on the quantized score is what makes
    the fast path's ORDER deterministic and oracle-able — double sums
    agree with the oracle's to ~1e-14, far inside the 1e-7 quantum."""
    from crypto_datalake_spark.queries.curation import _tfidf_tf_frame

    # one tokenize + (doc, term) count pass feeds postings, df, AND the
    # query bags — checkpointed because three consumers would otherwise
    # re-scan and re-shuffle the corpus per consumer (the minhash-
    # signature precedent)
    tf = _tfidf_tf_frame(d).localCheckpoint()
    qpred = F.col("doc_id") % q_mod == 0
    if only_qid is not None:
        qpred = qpred & (F.col("doc_id") == only_qid)
    qterms = tf.where(qpred).select(F.col("doc_id").alias("qid"), "term")
    if decimal_scores and not rank_rounded and only_qid is None:
        # preferred plan: the numpy scatter-add scorer aggregates the
        # |q|×|postings| fan-out map-side on exact unscaled longs —
        # bit-identical output, no per-contribution join row, no decimal
        # in flight (r14 §15; measured 3.1→1.3 s at sf0.1). None means
        # the query bag is beyond the broadcast cap → open-ended join.
        # (rank_rounded is the fast path's pre-rank quantization knob —
        # it ranks a DIFFERENT key, so it stays on the join plan; the
        # only_qid single-query shape keeps the join too — its fan-out
        # is one bag's postings, smaller than the scorer's two bounded
        # plan-time driver jobs are worth, measured a wash at sf0.1.)
        scored_np = _bm25_scored_np(tf, qterms)
        if scored_np is not None:
            return _np_topk_select(scored_np, k)
    scored = _bm25_scored(tf, qterms, decimal_scores=decimal_scores)
    if rank_rounded:
        scored = scored.withColumn("score_dec", F.round("score_dec", 7))
    w = Window.partitionBy("qid").orderBy(
        F.col("score_dec").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "qid",
            "doc_id",
            # exact-decimal round to scale 7 BEFORE the double cast: the
            # scale-14 sum can exceed 15 significant digits, where the
            # engines' decimal->double conversions differ in the last
            # ulp (observed at sf1: 731/24800 cells); an 11-sig-digit
            # decimal casts bit-identically (the _lm scale-7 precedent).
            # Ranking stays on the UNROUNDED exact sum.
            F.round(F.col("score_dec"), 7).cast("double").alias("bm25"),
            F.col("n_hit_terms").cast("long").alias("n_hit_terms"),
            "rank",
        )
    )


def _bm25_sql(qid_pred: str = "") -> str:
    """The full BM25 statement; ``qid_pred`` (an extra AND-conjunct on
    the qterms CTE, e.g. "AND doc_id = 0") restricts the query set for
    the hybrid-RRF fusion oracle without touching corpus statistics."""
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
    dfc AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df_docs FROM tf GROUP BY 1
    ),
    dl AS (SELECT doc_id, any_value(n_tok) AS dl FROM tf GROUP BY 1),
    stats AS (
      SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl
    ),
    qterms AS (
      SELECT doc_id AS qid, term FROM tf
      WHERE doc_id % {_Q_MOD} = 0 {qid_pred}
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
      WHERE tf.doc_id <> qid AND df_docs * 100 <= n_docs * {_BM25_STOP_DF_PCT}
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
    SELECT qid, doc_id, CAST(round(score_dec, 7) AS DOUBLE) AS bm25,
           n_hit_terms, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_K}
    """


@register(
    "search_bm25_topk",
    sql=_bm25_sql(),
    doc=f"Lucene-formula BM25 ranked retrieval: every doc_id % {_Q_MOD} "
    "== 0 document's distinct terms form a more-like-this query bag, "
    f"scored against every other document, top-{_K} per query — the "
    "lexical retrieval primitive (corpus search / RAG candidate "
    "generation) complementing the dense ANN family. Plan: ONE tokenize "
    "+ (doc, term) count shuffle (checkpointed, shared by postings, df, "
    "and query bags), df and doc-length stats are vocab-/doc-size aggs "
    "over the collapsed tf frame, N+avgdl broadcast as one row, and the "
    "per-query top-k window partitions by qid. The |q|x|postings| "
    "fan-out is aggregated MAP-SIDE by the numpy scatter-add scorer "
    "(r14: exact unscaled int64 weights, broadcast query-bag index, "
    "per-batch partial (qid, doc) sums — bit-identical to the decimal "
    "join sum because integer addition is order-free), falling back to "
    "the open-ended weights-join plan when the query bag exceeds the "
    f"broadcast cap. At 100 TB terms in more than {_BM25_STOP_DF_PCT}% "
    "of documents are stop terms cut from the postings BEFORE the "
    "fan-out (near-zero idf, mirrored exactly by the oracle and applied "
    "at fit time for the served twin), with AQE splitting any residual "
    "skew on the fallback join; scores are "
    "exact DECIMAL(12,7) products decimal-summed, so ranking is "
    "bit-stable across engines and partitionings.",
)
def search_bm25_topk(spark, sf_dir):
    return bm25_topk(t(spark, sf_dir, "documents"))


def _bm25_fast_sql() -> str:
    """Oracle for the production double-scoring path: identical statement
    shape to ``_bm25_sql`` but idf × saturation stay PLAIN DOUBLES (no
    per-factor round, no decimal cast) and the ranking key is the
    double sum quantized to 7 decimals — the only quantization in the
    plan, mirroring ``bm25_topk(decimal_scores=False,
    rank_rounded=True)``. Engine double-sums differ by ~1e-14
    (association order + last-ulp ln), seven orders of magnitude inside
    the 1e-7 ranking quantum."""
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
    dfc AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df_docs FROM tf GROUP BY 1
    ),
    dl AS (SELECT doc_id, any_value(n_tok) AS dl FROM tf GROUP BY 1),
    stats AS (
      SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl
    ),
    qterms AS (
      SELECT doc_id AS qid, term FROM tf
      WHERE doc_id % {_Q_MOD} = 0
    ),
    contrib AS (
      SELECT qid, tf.doc_id,
             ln((CAST(n_docs AS DOUBLE) - CAST(df_docs AS DOUBLE) + 0.5)
                / (CAST(df_docs AS DOUBLE) + 0.5) + 1.0)
             * ((CAST(term_count AS DOUBLE) * {_K1 + 1.0})
                / (CAST(term_count AS DOUBLE)
                   + {_K1} * ({1.0 - _B}
                              + {_B} * (CAST(n_tok AS DOUBLE)
                                        / (CAST(sum_dl AS DOUBLE)
                                           / CAST(n_docs AS DOUBLE)))))) AS w
      FROM tf
      JOIN qterms USING (term)
      JOIN dfc USING (term)
      CROSS JOIN stats
      WHERE tf.doc_id <> qid AND df_docs * 100 <= n_docs * {_BM25_STOP_DF_PCT}
    ),
    scored AS (
      SELECT qid, doc_id, round(sum(w), 7) AS score,
             CAST(count(*) AS BIGINT) AS n_hit_terms
      FROM contrib GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
      FROM scored
    )
    SELECT qid, doc_id, CAST(score AS DOUBLE) AS bm25,
           n_hit_terms, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_K}
    """


@register(
    "search_bm25_topk_fast",
    sql=_bm25_fast_sql(),
    doc="The PRODUCTION BM25 plan (VERDICT r13 item 2): same statement "
    "as search_bm25_topk but scores are plain-double idf × saturation "
    "products double-summed — no per-posting decimal rounds, no "
    "decimal aggregation — which the r13 A/B measured at ~1.8-2.0× "
    "faster than the bit-stable decimal path "
    "(tools/measure_bm25_decimal_tax.py; SCALE.md). Determinism comes "
    "from ONE quantization at the end: the sum is rounded to 7 "
    "decimals BEFORE the per-query top-k ranking, so ordering cannot "
    "depend on partition/association order (double-sum noise ~1e-14 "
    "vs the 1e-7 quantum) and the DuckDB oracle hash-matches rank, "
    "top-k membership, AND the quantized score. Plan shape is "
    "identical to search_bm25_topk: one checkpointed tf pass, stats "
    "at posting grain before the query fan-out, stop-term df cut, "
    "WindowGroupLimit top-k.",
)
def search_bm25_topk_fast(spark, sf_dir):
    return bm25_topk(
        t(spark, sf_dir, "documents"), decimal_scores=False, rank_rounded=True
    )


# ------------------------------------------------- hybrid RRF fusion

_RRF_K = 60  # the standard RRF dampening constant (Cormack et al. 2009)


def _rrf_contrib(rank_col):
    """round(1/(60+rank), 7) as DECIMAL(12,7): each arm's contribution
    is an exact decimal, so the fused score is an exact decimal add —
    bit-identical across engines regardless of join/agg order."""
    return F.round(
        F.lit(1.0) / (F.lit(float(_RRF_K)) + rank_col.cast("double")), 7
    ).cast("decimal(12,7)")


def rrf_fuse(sparse, dense, k: int = _K):
    """Reciprocal-rank-fuse two (doc_id, rank) arms into a top-``k``
    ranking: score = Σ 1/(60+rank) over the arms a doc appears in.
    Arms are each ≤ top-k result sets, so every frame here is tiny —
    the corpus-scale work already happened inside the arms."""
    s = sparse.select("doc_id", F.col("rank").alias("bm25_rank"))
    d = dense.select("doc_id", F.col("rank").alias("cosine_rank"))
    fused = (
        s.join(d, "doc_id", "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(_rrf_contrib(F.col("bm25_rank")), F.lit(0).cast("decimal(12,7)"))
            + F.coalesce(_rrf_contrib(F.col("cosine_rank")), F.lit(0).cast("decimal(12,7)")),
        )
    )
    w = Window.orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .where(F.col("fused_rank") <= k)
        .select(
            "doc_id",
            F.col("rrf").cast("double").alias("rrf"),
            F.col("bm25_rank").cast("long").alias("bm25_rank"),
            F.col("cosine_rank").cast("long").alias("cosine_rank"),
            "fused_rank",
        )
    )


def _hybrid_sql() -> str:
    from crypto_datalake_spark.queries.llm import MULTIPROBE_SQL

    contrib = (
        "CAST(round(1.0 / (60.0 + CAST({r} AS DOUBLE)), 7) AS DECIMAL(12,7))"
    )
    return f"""
    WITH sparse AS (
      SELECT doc_id, rank FROM ({_bm25_sql("AND doc_id = 0")})
    ),
    dense AS (
      SELECT vec_id AS doc_id,
             row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank
      FROM ({MULTIPROBE_SQL})
    ),
    fused AS (
      SELECT coalesce(sparse.doc_id, dense.doc_id) AS doc_id,
             coalesce({contrib.format(r="sparse.rank")},
                      CAST(0 AS DECIMAL(12,7)))
             + coalesce({contrib.format(r="dense.rank")},
                        CAST(0 AS DECIMAL(12,7))) AS rrf_dec,
             sparse.rank AS bm25_rank, dense.rank AS cosine_rank
      FROM sparse FULL OUTER JOIN dense ON sparse.doc_id = dense.doc_id
    )
    SELECT doc_id, CAST(rrf_dec AS DOUBLE) AS rrf,
           CAST(bm25_rank AS BIGINT) AS bm25_rank,
           CAST(cosine_rank AS BIGINT) AS cosine_rank,
           CAST(row_number() OVER (ORDER BY rrf_dec DESC, doc_id)
                AS BIGINT) AS fused_rank
    FROM fused
    QUALIFY fused_rank <= {_K}
    """


@register(
    "search_hybrid_rrf",
    # static oracle (no persisted artifacts): resolve at registration
    sql=_hybrid_sql(),
    doc=f"Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. "
    "2009, the Elasticsearch/Vespa hybrid-search default): the sparse "
    "arm is BM25 restricted to the doc-0 query bag, the dense arm is "
    "multi-probe LSH ANN for the vec-0 query (doc_id ≡ vec_id in the "
    f"testdata), fused by score = Σ 1/({_RRF_K}+rank) over the arms a "
    f"doc appears in, top-{_K}. Each 1/({_RRF_K}+r) term is a 7dp "
    "decimal so the fused score is an exact decimal add — rank-stable "
    "across engines. Scale shape: both arms end at top-k, so the fusion "
    "join/window touches ≤ 2k rows per query — all corpus-scale work "
    "stays inside the arms (one tokenize+count shuffle for BM25, "
    "bucket-pruned candidate scoring for the ANN); the single-partition "
    "fusion window is bounded by k·|queries|, never corpus size. "
    "SURROGATE-free: full static oracle composing the two arms' own "
    "oracle statements as subqueries.",
)
def search_hybrid_rrf(spark, sf_dir):
    from crypto_datalake_spark.queries.llm import lsh_multiprobe_topk

    d = t(spark, sf_dir, "documents")
    e = t(spark, sf_dir, "embeddings")
    sparse = bm25_topk(d, only_qid=0)
    dw = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    dense = (
        lsh_multiprobe_topk(e)
        .withColumn("rank", F.row_number().over(dw))
        .select(F.col("vec_id").alias("doc_id"), "rank")
    )
    return rrf_fuse(sparse, dense)


# ------------------------------------- persisted-corpus-stats serving

_BM25_MAXF = 65_536  # fitted-vocabulary cap (the tfidf seam's knob)


def bm25_model_tables(spark, sf_dir, max_features: int = _BM25_MAXF):
    """The persisted BM25 fit: a (term, df_docs, idf) vocabulary — the
    BM25 idf precomputed IN SPARK at fit time and stored as the SAME
    DECIMAL(12,7) the in-query op multiplies with, so serve-time
    products are bit-identical to in-query ones — capped at the
    ``max_features`` highest-df terms, plus a 1-row (n_docs, sum_dl)
    corpus-stats meta table (frozen N and avgdl, the production shape:
    new batches score against the fit corpus's statistics).  Trained
    once per source fingerprint via the shared served-model split; the
    cap cut uses the two-phase global rank (large-k regime — the
    tfidf_model_tables crossover note)."""
    from crypto_datalake_spark.ops.rank import global_row_number
    from crypto_datalake_spark.queries.curation import _tfidf_tf_frame
    from crypto_datalake_spark.queries.llm import _served_model_table

    def tf_stats():
        tf = _tfidf_tf_frame(t(spark, sf_dir, "documents")).localCheckpoint()
        stats = (
            tf.groupBy("doc_id")
            .agg(F.first("n_tok").alias("dl"))
            .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl"))
        )
        return tf, stats

    def build_vocab():
        tf, stats = tf_stats()
        dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
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
        ranked = global_row_number(
            # stop-term cut at FIT time (df*100 <= N*pct, the
            # _bm25_scored policy): serve-time OOV-drop then inherits
            # it for free, and the persisted postings-side vocabulary
            # never carries a term that would fan out the whole corpus
            dfc.crossJoin(F.broadcast(stats)).where(
                F.col("df_docs") * 100
                <= F.col("n_docs") * F.lit(_BM25_STOP_DF_PCT)
            ),
            [F.col("df_docs").desc(), F.col("term").asc()],
            out_col="__rk",
        )
        return (
            ranked.where(F.col("__rk") <= max_features)
            .select("term", "df_docs", idf.alias("idf"))
            .coalesce(1)
        )

    def build_meta():
        _, stats = tf_stats()
        return stats.coalesce(1)

    vocab = _served_model_table(
        spark, sf_dir, "bm25_vocab", f"v{max_features}_sw90", build_vocab,
        source="documents.parquet",
    )
    meta = _served_model_table(
        spark, sf_dir, "bm25_meta", "v1", build_meta,
        source="documents.parquet",
    )
    return vocab, meta


def bm25_model_paths(sf_dir: str, max_features: int = _BM25_MAXF) -> list[str]:
    """Where :func:`bm25_model_tables` persists its fit — feeds the
    driver's oracle-first pre-build guard (llm.model_artifact_paths)."""
    from crypto_datalake_spark.queries.llm import _served_model_path

    return [
        _served_model_path(
            sf_dir, "bm25_vocab", f"v{max_features}_sw90", source="documents.parquet"
        ),
        _served_model_path(
            sf_dir, "bm25_meta", "v1", source="documents.parquet"
        ),
    ]


def _bm25_serve_weights(tf, vocab, meta, unscaled: bool):
    """Frozen-idf per-posting serve weights (doc_id, term, w|w_u) —
    ONE saturation/product expression for the numpy (unscaled long) and
    join (decimal) serve plans, mirroring ``_bm25_weights``' role on the
    fit path so the two plans' arithmetic cannot drift (ADVICE r14)."""
    tf_d = F.col("term_count").cast("double")
    sat = F.round(
        (tf_d * F.lit(_K1 + 1.0))
        / (
            tf_d
            + F.lit(_K1)
            * (
                F.lit(1.0 - _B)
                + F.lit(_B)
                * (
                    F.col("n_tok").cast("double")
                    / (
                        F.col("sum_dl").cast("double")
                        / F.col("n_docs").cast("double")
                    )
                )
            )
        ),
        7,
    ).cast("decimal(12,7)")
    if unscaled:
        w = (
            (F.col("idf") * F.lit(10**7)).cast("long")
            * (sat * F.lit(10**7)).cast("long")
        ).alias("w_u")
    else:
        w = (F.col("idf") * sat).alias("w")
    return (
        tf.crossJoin(F.broadcast(meta))
        .join(F.broadcast(vocab.select("term", "idf")), "term")
        .select("doc_id", "term", w)
    )


def bm25_topk_serve(
    d, vocab, meta, q_mod: int = _Q_MOD, k: int = _K,
    only_qid: int | None = None,
):
    """Score a (doc_id, text) frame against the persisted BM25 fit:
    idf, N, and avgdl are READ from the frozen vocabulary/meta tables
    (never re-derived — no ln, no df recount, no second corpus pass);
    only each incoming doc's own length dl comes from the batch.  Terms
    outside the fitted vocabulary are DROPPED (the sklearn-transform /
    tfidf-serve semantics), so serving works on new documents."""
    tf = _tfidf_tf_frame_cached(d)
    qpred = F.col("doc_id") % q_mod == 0
    if only_qid is not None:
        qpred = qpred & (F.col("doc_id") == only_qid)
    qterms = tf.where(qpred).select(F.col("doc_id").alias("qid"), "term")
    # preferred plan (the bm25_topk discipline): the numpy scatter-add
    # scorer over the same frozen-idf weights, exact unscaled longs —
    # bit-identical scores, fan-out aggregated map-side; falls back to
    # the open-ended join when the query bag exceeds the broadcast cap.
    scored_np = _bm25_scored_np(
        tf, qterms,
        weights_unscaled=_bm25_serve_weights(tf, vocab, meta, unscaled=True),
        meta=meta,
    )
    if scored_np is not None:
        return _np_topk_select(scored_np, k)
    weights = _bm25_serve_weights(tf, vocab, meta, unscaled=False)
    scored = (
        weights.join(qterms, "term")
        .where(F.col("doc_id") != F.col("qid"))
        .groupBy("qid", "doc_id")
        .agg(
            F.sum("w").alias("score_dec"),
            F.count(F.lit(1)).alias("n_hit_terms"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score_dec").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "qid",
            "doc_id",
            F.round(F.col("score_dec"), 7).cast("double").alias("bm25"),
            F.col("n_hit_terms").cast("long").alias("n_hit_terms"),
            "rank",
        )
    )


def _tfidf_tf_frame_cached(d):
    from crypto_datalake_spark.queries.curation import _tfidf_tf_frame

    return _tfidf_tf_frame(d).localCheckpoint()


def _bm25_served_sql(sf_dir: str) -> str:
    """Surrogate oracle: DuckDB recomputes the serving policy
    CONDITIONAL on the persisted vocabulary/meta — idf, N, avgdl are
    READ (no cross-engine ln in play); the inner vocab join mirrors the
    OOV-drop semantics."""
    vp, mp = bm25_model_paths(sf_dir)
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
    meta AS (SELECT n_docs, sum_dl FROM read_parquet('{mp}/*.parquet')),
    qterms AS (
      SELECT doc_id AS qid, term FROM tf WHERE doc_id % {_Q_MOD} = 0
    ),
    contrib AS (
      SELECT qid, tf.doc_id,
             idf
             * CAST(round((CAST(term_count AS DOUBLE) * {_K1 + 1.0})
                          / (CAST(term_count AS DOUBLE)
                             + {_K1} * ({1.0 - _B}
                                        + {_B} * (CAST(n_tok AS DOUBLE)
                                                  / (CAST(sum_dl AS DOUBLE)
                                                     / CAST(n_docs AS DOUBLE))))),
                          7) AS DECIMAL(12,7)) AS w
      FROM tf
      JOIN voc USING (term)
      JOIN qterms USING (term)
      CROSS JOIN meta
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
    SELECT qid, doc_id, CAST(round(score_dec, 7) AS DOUBLE) AS bm25,
           n_hit_terms, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_K}
    """


@register(
    "search_bm25_topk_served",
    sql=_bm25_served_sql,
    doc="The persisted-corpus-stats serving path of search_bm25_topk: "
    "the df/idf vocabulary (max_features-capped, BM25 idf precomputed "
    "at fit as the same DECIMAL(12,7) the query multiplies with) and a "
    "1-row (n_docs, sum_dl) corpus-stats meta are trained once per "
    "source fingerprint; serving is one tokenize + (doc, term) count "
    "shuffle, one broadcast vocab join and a multiply — zero ln calls, "
    "no df recount, frozen N/avgdl (the incremental-corpus production "
    "shape: new batches rank against the fit corpus's statistics; "
    "refits are explicit); the query fan-out runs through the same "
    "numpy scatter-add scorer as search_bm25_topk (exact unscaled "
    "int64 of the frozen-idf decimal products, bit-identical scores, "
    "join fallback above the bag cap). OOV terms drop, so new "
    "documents serve correctly. On the fit corpus with an uncapped vocabulary the "
    "output equals search_bm25_topk (pinned in tests). SURROGATE "
    "oracle: DuckDB recomputes the serving policy conditional on the "
    "persisted tables through the oracle-first pre-build guard.",
)
def search_bm25_topk_served(spark, sf_dir):
    vocab, meta = bm25_model_tables(spark, sf_dir)
    return bm25_topk_serve(t(spark, sf_dir, "documents"), vocab, meta)
