"""Property-based tests (hypothesis) for the custom-semantics operators.

The reference ships no property tests (SURVEY.md §5); these guard the
semantics that are easiest to silently break in a distributed rewrite
(SURVEY.md §7.3c): as-of matching at tolerance boundaries, row-limited
forward-fill, and the 0-vs-NULL live-coverage gate. Each property runs a
brute-force Python reference against the distributed implementation on
adversarial small inputs (duplicate timestamps, empty sides,
exact-boundary ages).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from crypto_datalake_spark.ops.asof import asof_join
from crypto_datalake_spark.ops.fill import ffill

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)

# Timestamps as small epoch-second integers → cast to timestamp in Spark.
_ts = st.integers(min_value=0, max_value=120)
# nullable values: the as-of contract is "the latest right ROW", so a
# NULL-valued row must be a valid match — a generator without Nones
# could never catch per-column-fill desync (the round-5 asof bug)
_val = st.one_of(
    st.none(), st.integers(min_value=-5, max_value=5).map(float)
)


def _mk(spark, rows, fields):
    schema = StructType(
        [
            StructField(n, LongType() if t is int else DoubleType(), True)
            for n, t in fields
        ]
    )
    return spark.createDataFrame(rows, schema)


@given(
    left_ts=st.lists(_ts, min_size=0, max_size=12, unique=True),
    right=st.lists(st.tuples(_ts, _val), min_size=0, max_size=12),
    tol=st.integers(min_value=1, max_value=40),
)
@settings(**_SETTINGS)
def test_asof_backward_tolerance_matches_bruteforce(spark, left_ts, right, tol):
    left = _mk(spark, [(t,) for t in left_ts], [("k", int)]).withColumn(
        "ts", F.timestamp_seconds(F.col("k")).cast("timestamp_ntz")
    )
    rdf = _mk(spark, list(right), [("rts_s", int), ("v", float)]).withColumn(
        "rts", F.timestamp_seconds(F.col("rts_s")).cast("timestamp_ntz")
    ).drop("rts_s")
    out = asof_join(
        left,
        rdf,
        on="ts",
        right_on="rts",
        value_cols=["v"],
        tolerance_seconds=tol,
    )
    got = {r["k"]: r["v"] for r in out.collect()}
    assert set(got) == set(left_ts)

    for lt in left_ts:
        cands = [(rt, v) for rt, v in right if rt <= lt and lt - rt <= tol]
        if not cands:
            assert got[lt] is None
        else:
            best_rt = max(rt for rt, _ in cands)
            # duplicate right timestamps tie: any of the tied values is a
            # valid "last known" — the implementation picks one of them
            assert got[lt] in [v for rt, v in cands if rt == best_rt]


@given(
    series=st.lists(st.one_of(st.none(), _val), min_size=1, max_size=20),
    limit=st.integers(min_value=1, max_value=5),
)
@settings(**_SETTINGS)
def test_ffill_limit_matches_reference_semantics(spark, series, limit):
    rows = [(i, v) for i, v in enumerate(series)]
    df = _mk(spark, rows, [("i", int), ("v", float)])
    out = ffill(df, ["v"], ["i"], limit=limit)
    got = {r["i"]: r["v"] for r in out.collect()}

    last_val, last_idx = None, None
    for i, v in enumerate(series):
        if v is not None:
            last_val, last_idx = v, i
        expect = (
            last_val if last_idx is not None and (i - last_idx) <= limit else None
        )
        assert got[i] == expect


@given(
    data=st.lists(
        st.tuples(st.booleans(), st.one_of(st.none(), _val)),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_zero_vs_null_gate(spark, data):
    # LIVE_ONLY discipline (SURVEY §1.3): when a collector observed the
    # minute (has_flag), missing measures collapse to 0; with no coverage
    # they must stay NULL — never the reverse.
    rows = [(i, has, v) for i, (has, v) in enumerate(data)]
    schema = StructType(
        [
            StructField("i", LongType(), True),
            StructField("has_flag", BooleanType(), True),
            StructField("v", DoubleType(), True),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = df.select(
        "i",
        F.when(F.col("has_flag"), F.coalesce("v", F.lit(0.0)))
        .otherwise(F.lit(None))
        .alias("gated"),
    )
    got = {r["i"]: r["gated"] for r in out.collect()}
    for i, (has, v) in enumerate(data):
        assert got[i] == ((v if v is not None else 0.0) if has else None)


_word = st.sampled_from(["a", "b", "c", "dd", "eee"])
_doc = st.lists(_word, min_size=0, max_size=12)


@given(docs=st.lists(_doc, min_size=1, max_size=8))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_repetition_signals_match_bruteforce(spark, docs):
    from collections import Counter

    from crypto_datalake_spark.queries.curation import repetition_signals

    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    for i, d in enumerate(docs):
        # split(" ") on an empty string yields one empty token — mirror it
        toks = " ".join(d).split(" ")
        top = Counter(toks).most_common(1)[0][1]
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        dup = (
            (len(bigrams) - len(set(bigrams))) / len(bigrams) if bigrams else 0.0
        )
        r = got[i]
        assert r["n_tokens"] == len(toks)
        assert abs(r["top_token_frac"] - top / len(toks)) < 1e-12
        assert abs(r["dup_bigram_frac"] - dup) < 1e-12
        assert r["repetitive"] == (top / len(toks) > 0.2 or dup > 0.4)


@given(docs=st.lists(_doc, min_size=1, max_size=8))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_decontam_overlap_matches_set_math(spark, docs):
    import hashlib

    from crypto_datalake_spark.queries.curation import decontam_overlap

    def grams(toks):
        return {
            int(
                hashlib.md5(
                    " ".join(toks[i : i + 3]).encode()
                ).hexdigest()[:15],
                16,
            )
            for i in range(len(toks) - 2)
        }

    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in decontam_overlap(df, bench_mod=3).collect()}
    bench = set()
    for i, d in enumerate(docs):
        toks = " ".join(d).split(" ")
        if i % 3 == 0:
            bench |= grams(toks)
    for i, d in enumerate(docs):
        toks = " ".join(d).split(" ")
        g = grams(toks)
        if i % 3 == 0 or not g:
            assert i not in out  # bench docs and <3-token docs are excluded
            continue
        r = out[i]
        assert r["n_grams"] == len(g)
        assert r["n_overlap"] == len(g & bench)
        assert abs(r["overlap_frac"] - len(g & bench) / len(g)) < 1e-12
        assert r["contaminated"] == (len(g & bench) / len(g) >= 0.2)


# --- two-phase scan operators (ops.prefix / ops.rank / ops.gaps) ----------
# Property: the distributed two-phase forms are EXACTLY the naive
# single-window forms, for arbitrary sparse key sets and tiny bucket
# widths (so every random case crosses bucket boundaries).


@given(
    slots=st.lists(st.integers(min_value=-40, max_value=60), min_size=1,
                   max_size=40, unique=True),
    bucket=st.integers(min_value=1, max_value=9),
)
@settings(**_SETTINGS)
def test_islands_two_phase_matches_naive(spark, slots, bucket):
    from pyspark.sql import Window

    from crypto_datalake_spark.ops.gaps import islands

    df = _mk(spark, [(s,) for s in slots], [("m", int)]).withColumn(
        "ts", F.timestamp_seconds(F.col("m") * 60).cast("timestamp_ntz")
    )
    got = {
        (r["window_start"], r["window_end"], r["n_slots"])
        for r in islands(df, "ts", 1, bucket_slots=bucket).collect()
    }
    w = Window.orderBy("ts")
    grp = (F.col("m") - F.row_number().over(w)).alias("g")
    want = {
        (r["window_start"], r["window_end"], r["n_slots"])
        for r in df.select("ts", "m", grp)
        .groupBy("g")
        .agg(F.min("ts").alias("window_start"), F.max("ts").alias("window_end"),
             F.count(F.lit(1)).alias("n_slots"))
        .collect()
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2),     # stream
                  st.integers(min_value=-50, max_value=100),  # order key
                  st.integers(min_value=0, max_value=9)),    # value
        min_size=1, max_size=40,
        unique_by=lambda r: (r[0], r[1]),
    ),
    bucket=st.integers(min_value=1, max_value=7),
)
@settings(**_SETTINGS)
def test_prefix_cum_before_matches_naive(spark, rows, bucket):
    from pyspark.sql import Window

    from crypto_datalake_spark.ops.prefix import cum_before

    df = _mk(spark, list(rows), [("s", int), ("k", int), ("v", int)])
    got = {
        (r["s"], r["k"]): r["cum_before"]
        for r in cum_before(df, ["s"], "k", "v", bucket_width=bucket).collect()
    }
    w = (
        Window.partitionBy("s").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        (r["s"], r["k"]): r["c"]
        for r in df.withColumn(
            "c", F.coalesce(F.sum("v").over(w), F.lit(0))
        ).collect()
    }
    assert got == want


@given(
    vals=st.lists(st.tuples(st.integers(min_value=0, max_value=1000),
                            st.integers(min_value=0, max_value=20)),
                  min_size=1, max_size=40,
                  unique_by=lambda r: r[0]),
    nparts=st.integers(min_value=1, max_value=6),
)
@settings(**_SETTINGS)
def test_global_row_number_matches_naive(spark, vals, nparts):
    from pyspark.sql import Window

    from crypto_datalake_spark.ops.rank import global_row_number

    df = _mk(spark, list(vals), [("id", int), ("v", int)])
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {
        r["id"]: r["rk"]
        for r in global_row_number(df, order, num_partitions=nparts).collect()
    }
    want = {
        r["id"]: r["rk"]
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_bucket_floor_floors_negative_epochs(spark):
    """bucket_floor must FLOOR pre-1970 timestamps, not truncate toward
    zero (Spark's % keeps the dividend sign) — parity with DuckDB's
    floor(epoch/s)*s."""
    import datetime as dt

    from pyspark.sql import functions as F

    from crypto_datalake_spark.ops.time import bucket_floor

    rows = [
        (dt.datetime(1969, 12, 31, 23, 58, 30),),
        (dt.datetime(1970, 1, 1, 0, 1, 30),),
    ]
    df = spark.createDataFrame(rows, "ts timestamp_ntz")
    got = [r[0] for r in df.select(bucket_floor("ts", 1)).collect()]
    assert got == [
        dt.datetime(1969, 12, 31, 23, 58, 0),  # floored DOWN, not up
        dt.datetime(1970, 1, 1, 0, 1, 0),
    ]


def test_asof_null_valued_row_is_the_match(spark):
    """The as-of contract is "the latest right ROW": a NULL-valued right
    row inside tolerance must yield a NULL value (it IS the match), not
    resurrect an older row's value past the freshness gate — per-column
    last-non-null fill desyncs value from matched-ts."""
    import datetime as dt

    from crypto_datalake_spark.ops.asof import asof_join

    t0 = dt.datetime(2024, 1, 1, 1, 0)
    t1 = dt.datetime(2024, 1, 1, 2, 0)
    left = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 2, 30),)], "ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(t0, 5.0), (t1, None)], "rts timestamp_ntz, v double"
    )
    got = asof_join(
        left, right, on="ts", right_on="rts",
        value_cols=["v"], tolerance_seconds=1800,
        matched_ts_col="m_ts",
    ).collect()[0]
    assert got["m_ts"] == t1      # the 02:00 row IS the as-of match
    assert got["v"] is None       # and its value is NULL — not the stale 5.0


@given(
    data=st.data(),
    n_events=st.integers(min_value=0, max_value=14),
    snap_levels=st.integers(min_value=0, max_value=3),
)
@settings(**_SETTINGS)
def test_orderbook_fold_matches_declarative_on_random_books(
    spark, data, n_events, snap_levels
):
    """Random continuous depth streams (snapshot first, pu-chained deltas,
    random writes and qty=0 deletes over a small price grid) must replay
    identically through the stateful fold and the declarative
    window/agg plan — the two independent implementations of ST3."""
    import datetime as _dt
    import json as _json

    from crypto_datalake_spark.streaming import DEPTH_EVENT_SCHEMA, book_state_stream
    from crypto_datalake_spark.streaming.orderbook import replay_book_batch

    prices_bid = [99.0, 98.5, 98.0]
    prices_ask = [101.0, 101.5, 102.0]
    qty = st.sampled_from([0.0, 1.0, 2.5, 700.0])

    def levels(side_prices, max_n):
        n = data.draw(st.integers(min_value=0, max_value=max_n))
        return [
            [data.draw(st.sampled_from(side_prices)), data.draw(qty)]
            for _ in range(n)
        ]

    t0 = _dt.datetime(2024, 1, 1)
    base = 100
    rows = [(
        "SYM", t0, "snapshot", None, base, None,
        _json.dumps(levels(prices_bid, snap_levels)),
        _json.dumps(levels(prices_ask, snap_levels)),
    )]
    sec = 0
    for i in range(n_events):
        u = base + i + 1
        # event time advances WITH the update-id chain (a validated store
        # is time-ordered; 0-step keeps same-second same-minute ties)
        sec += data.draw(st.integers(0, 90))
        rows.append((
            "SYM",
            t0 + _dt.timedelta(seconds=sec),
            "delta", u, u, u - 1,
            _json.dumps(levels(prices_bid, 2)),
            _json.dumps(levels(prices_ask, 2)),
        ))
    depth = spark.createDataFrame(rows, DEPTH_EVENT_SCHEMA)

    def canon(df):
        rounded = [
            "best_bid", "best_ask", "mid", "spread_pct", "impact_pct",
            "avg_bid_qty_top10", "avg_ask_qty_top10",
        ]
        cols = [
            F.round(c, 6).alias(c) if c in rounded else F.col(c)
            for c in df.columns
        ]
        return sorted(map(tuple, df.select(*cols).collect()))

    assert canon(replay_book_batch(depth)) == canon(book_state_stream(depth))


@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-4, max_value=4).map(float),
            min_size=8, max_size=8,
        ),
        min_size=3, max_size=14,
    ),
    q=st.lists(
        st.integers(min_value=-4, max_value=4).map(float),
        min_size=8, max_size=8,
    ),
)
@settings(**_SETTINGS)
def test_pq_full_depth_rescore_is_bruteforce(spark, vecs, q):
    """IVF-PQ's exactness contract on arbitrary vectors: when the re-rank
    depth covers every candidate, the PQ pipeline (codebooks -> encode ->
    ADC -> exact re-rank) must return exactly the brute-force cosine
    top-k — approximation may only ever shrink the CANDIDATE set."""
    import math

    from crypto_datalake_spark.queries.llm import (
        _codebook_array,
        pq_adc_rescore,
        pq_codebooks,
        pq_encode,
    )

    def norm(v):
        return math.sqrt(sum(x * x for x in v))

    # zero vectors make cosine undefined on both paths; keep inputs lawful
    vecs = [v for v in vecs if norm(v) > 0]
    if len(vecs) < 3 or norm(q) == 0:
        return

    corpus = spark.createDataFrame(
        [(i + 1, v, 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    ).localCheckpoint()
    cb_arr = _codebook_array(pq_codebooks(corpus, m=4, k=4, seed=3))
    encoded = pq_encode(corpus.withColumn("cent_id", F.lit(0)), cb_arr)
    got = pq_adc_rescore(
        encoded,
        spark.createDataFrame([(q,)], "qv array<float>"),
        cb_arr,
        k=3,
        rerank=len(vecs),
    ).collect()

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b)) / (norm(a) * norm(b))

    def round_half_up(x, nd=6):  # F.round is HALF_UP; python round is not
        from decimal import ROUND_HALF_UP, Decimal

        return float(Decimal(repr(x)).quantize(Decimal("1e-%d" % nd), ROUND_HALF_UP))

    brute = sorted(
        ((round_half_up(cos(v, q)), i + 1) for i, v in enumerate(vecs)),
        key=lambda t: (-t[0], t[1]),
    )[:3]
    assert [(r["cosine"], r["vec_id"]) for r in got] == [
        (c, i) for c, i in brute
    ]


# --- TF-IDF / LM-perplexity vs naive reimplementations ---------------------

_doc_text = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=8
).map(" ".join)
_corpus = st.lists(_doc_text, min_size=1, max_size=6)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@given(texts=_corpus, k=st.integers(min_value=1, max_value=4))
@settings(**_SETTINGS)
def test_tfidf_topk_matches_naive(spark, texts, k):
    """Scores match a naive Python TF-IDF; ranks are dense, score-sorted
    with term tie-break; the selected set matches naive top-k whenever
    the naive boundary is strict (exact ties at the boundary are
    order-policy, checked separately by the witness test)."""
    import math

    from crypto_datalake_spark.queries.curation import tfidf_topk

    rows = tfidf_topk(_docs_df(spark, texts), k=k).collect()
    n_docs = len(texts)
    df_count: dict[str, int] = {}
    per_doc: dict[int, dict[str, int]] = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        cnt: dict[str, int] = {}
        for w in toks:
            cnt[w] = cnt.get(w, 0) + 1
        per_doc[i + 1] = cnt
        for w in cnt:
            df_count[w] = df_count.get(w, 0) + 1
    naive: dict[int, list[tuple[float, str]]] = {}
    for did, cnt in per_doc.items():
        n_tok = sum(cnt.values())
        scored = []
        for w, c in cnt.items():
            idf = round(math.log((n_docs + 1.0) / (df_count[w] + 1.0)) + 1.0, 7)
            scored.append(((c / n_tok) * idf, w))
        scored.sort(key=lambda s: (-s[0], s[1]))
        naive[did] = scored
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(per_doc)
    for did, rs in by_doc.items():
        rs.sort(key=lambda r: r["rank"])
        want = naive[did][: k]
        assert [r["rank"] for r in rs] == list(range(1, len(want) + 1))
        # scores: per-rank match against naive (both sides sorted by
        # (-score, term), so position i compares like with like)
        for r, (ws, wt) in zip(rs, want):
            assert r["tfidf"] == pytest.approx(ws, rel=1e-9, abs=1e-12)
        # selected set: only assert when the naive boundary is strict
        if len(naive[did]) > k and abs(naive[did][k - 1][0] - naive[did][k][0]) > 1e-9:
            assert {r["term"] for r in rs} == {w for _, w in want}
        # ordering policy on the returned rows themselves
        for a, b in zip(rs, rs[1:]):
            assert a["tfidf"] > b["tfidf"] or (
                a["tfidf"] == b["tfidf"] and a["term"] < b["term"]
            )


@given(texts=_corpus)
@settings(**_SETTINGS)
def test_lm_perplexity_matches_naive(spark, texts):
    """log_ppl matches a naive bigram-LM reimplementation and the
    bucketing is exactly the nearest-rank tercile policy applied to the
    RETURNED scores (policy checked independently of ln ulp drift)."""
    import math

    from crypto_datalake_spark.queries.curation import lm_perplexity_buckets

    rows = {r["doc_id"]: r for r in lm_perplexity_buckets(_docs_df(spark, texts)).collect()}
    assert set(rows) == set(range(1, len(texts) + 1))
    # naive LM
    c1: dict[str, int] = {}
    c12: dict[tuple[str, str], int] = {}
    vocab: set[str] = set()
    toks = {i + 1: t.split(" ") for i, t in enumerate(texts)}
    for tk in toks.values():
        vocab.update(tk)
        for a, b in zip(tk, tk[1:]):
            c1[a] = c1.get(a, 0) + 1
            c12[(a, b)] = c12.get((a, b), 0) + 1
    v = len(vocab)
    for did, tk in toks.items():
        r = rows[did]
        if len(tk) < 2:
            assert r["log_ppl"] is None and r["ppl_bucket"] == "short"
            assert r["n_bigrams"] == 0
            continue
        costs = [
            round(-math.log((c12[(a, b)] + 0.5) / (c1[a] + 0.5 * v)), 7)
            for a, b in zip(tk, tk[1:])
        ]
        assert r["n_bigrams"] == len(costs)
        assert r["log_ppl"] == pytest.approx(sum(costs) / len(costs), rel=1e-9)
    # bucket policy from the returned scores themselves (exact)
    scored = sorted(
        (r["log_ppl"], did) for did, r in rows.items() if r["log_ppl"] is not None
    )
    n = len(scored)
    if n:
        c1v = scored[math.ceil(n / 3.0) - 1][0]
        c2v = scored[math.ceil(2 * n / 3.0) - 1][0]
        for did, r in rows.items():
            if r["log_ppl"] is None:
                continue
            want = (
                "head" if r["log_ppl"] <= c1v
                else "middle" if r["log_ppl"] <= c2v
                else "tail"
            )
            assert r["ppl_bucket"] == want, (did, r, c1v, c2v)


# ---- Karp-Rabin rolling window fingerprints (pure numpy, no Spark) ----

@settings(max_examples=60, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    lens=st.lists(st.integers(min_value=0, max_value=40), min_size=1,
                  max_size=8),
    n=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_rollinghash_equals_horner_recompute(lens, n, seed):
    """For ANY batch of documents and window size, the vectorized prefix
    evaluation equals the textbook per-window Horner recompute in every
    field, windows are emitted exactly for positions 1..L-n+1 of docs
    with L >= n, and equal token windows hash equal across documents
    (offset cancellation) — the invariant the exact-substring tier's
    correctness rests on."""
    import numpy as np

    from crypto_datalake_spark.functions.rollinghash import (
        _FIELDS, window_grams_flat,
    )

    rng = np.random.default_rng(seed)
    th = rng.integers(0, 2**63, size=sum(lens), dtype=np.int64).view(
        np.uint64
    )
    offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    doc_idx, pos, h1, h2 = window_grams_flat(th, offsets, n)
    assert len(h1) == sum(max(L - n + 1, 0) for L in lens)

    def direct(ws):
        h = [0] * len(_FIELDS)
        for t in ws:
            for j, (m, (pb, _pg), _inv) in enumerate(_FIELDS):
                b = int(pb[1])  # base = b^1 from the power table
                h[j] = (h[j] * b + int(t) % m) % m
        return ((h[0] << 31) | h[1], (h[2] << 31) | h[3])

    for k in range(len(h1)):
        s = offsets[doc_idx[k]] + pos[k] - 1
        assert direct(th[s : s + n]) == (int(h1[k]), int(h2[k]))


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]),
            min_size=2, max_size=8,
        ),
        min_size=2, max_size=10,
    ),
    cap=st.integers(min_value=1, max_value=12),
)
@settings(**_SETTINGS)
def test_ngram_jaccard_cap_semantics_match_setmath(spark, docs, cap):
    """Capped blocked-bigram Jaccard against brute-force set math on a
    tiny 5-token vocabulary (dense enough that the df-cap genuinely
    binds): every emitted pair carries the EXACT true Jaccard of the
    full bigram sets, and the emitted pair set is exactly {true-jaccard
    >= 0.3 pairs that share at least one gram with per-block df <= cap}
    — the documented recall contract of the stop-gram policy."""
    from crypto_datalake_spark.queries.dedup import ngram_jaccard_pairs

    rows = [(i, "en", 50, " ".join(toks)) for i, toks in enumerate(docs)]
    d = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(d, cap=cap).collect()
    }

    grams = {
        i: {(toks[j], toks[j + 1]) for j in range(len(toks) - 1)}
        for i, toks in enumerate(docs)
    }
    from collections import Counter

    df_count = Counter(g for gs in grams.values() for g in gs)
    want = {}
    for a in grams:
        for b in grams:
            if a >= b:
                continue
            inter = grams[a] & grams[b]
            if not inter:
                continue
            if all(df_count[g] > cap for g in inter):
                continue  # candidate-stage recall loss, by contract
            j = len(inter) / len(grams[a] | grams[b])
            if j >= 0.3:
                want[(a, b)] = j
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12, (k, got[k], v)

