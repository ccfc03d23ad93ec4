"""Scale-path operators: bucketed co-located joins, salted aggregation."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from crypto_datalake_spark.ops.agg import dsum
from tests.test_scale_plans import plan_text


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # Pre-bucketing both sides on the join key co-locates matching rows:
    # the join plan has NO hashpartitioning exchange — the shuffle was
    # paid once at write time and amortized over every subsequent join.
    spark.sql("DROP TABLE IF EXISTS b_fact")
    spark.sql("DROP TABLE IF EXISTS b_dim")
    fact = spark.range(0, 10_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    # external tables under tmp_path (warehouse dir is a static conf)
    fact.write.bucketBy(8, "k").sortBy("k").option(
        "path", str(tmp_path / "b_fact")
    ).saveAsTable("b_fact")
    dim.write.bucketBy(8, "k").sortBy("k").option(
        "path", str(tmp_path / "b_dim")
    ).saveAsTable("b_dim")
    joined = (
        spark.table("b_fact")
        .join(spark.table("b_dim"), "k")
        .groupBy("k")
        .agg(F.sum("v").alias("sv"), F.max("w").alias("mw"))
    )
    p = plan_text(joined, "simple")
    assert not re.search(r"Exchange hashpartitioning\([kw#0-9L, ]*\bk#", p), p
    assert joined.count() == 500
    spark.sql("DROP TABLE IF EXISTS b_fact")
    spark.sql("DROP TABLE IF EXISTS b_dim")


def test_vocab_df_dedups_pairs_before_token_shuffle(spark, sf_dir):
    # Aggregation-skew posture: algebraic aggregates (sum/count/min/max)
    # are skew-immune via map-side partial aggregation, so no salting
    # layer exists; the one non-combinable shape we use, per-token
    # document frequency, must dedup (token, doc_id) PAIRS first so the
    # hot-token shuffle key includes doc_id.  Plan contract: the vocab
    # query contains a pair-level HashAggregate (keys token+doc_id) and
    # no Expand (the mixed count+countDistinct plan fingerprint).
    from crypto_datalake_spark.queries import REGISTRY

    p = plan_text(REGISTRY["corpus_vocab_stats"].fn(spark, sf_dir), "simple")
    assert "Expand" not in p, p
    assert re.search(r"HashAggregate\(keys=\[(token[^\]]*doc_id|doc_id[^\]]*token)", p), p


def test_embedding_cosine_hot_cell_guard(spark):
    """A label cell over the cap is sub-bucketed INSIDE the join key, so the
    join itself bounds the pair space (VERDICT r01 item 7). Below the cap the
    guard is a no-op and results equal exact within-cell pairing."""
    import math

    from crypto_datalake_spark.queries.llm import embedding_cosine_pairs

    # 40 deterministic nonzero vectors in ONE label cell (i=0 would be the
    # all-zero vector, whose norm-0 division is an ANSI error by design)
    rows = [
        (i, "hot", [math.sin(0.1 * i * (d + 1)) for d in range(64)])
        for i in range(1, 41)
    ]
    e = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")

    exact = embedding_cosine_pairs(e, cap=1000, threshold=-2.0)  # no guard, keep all
    guarded = embedding_cosine_pairs(e, cap=10, threshold=-2.0)  # cell of 40 > cap
    n_exact, n_guarded = exact.count(), guarded.count()
    assert n_exact == 40 * 39 // 2  # every within-cell pair
    assert 0 < n_guarded < n_exact  # bounded: only same-sub-bucket pairs survive

    # guarded output is a subset of the exact pairs with identical scores
    assert guarded.join(exact, ["vec_a", "vec_b", "label", "cosine"]).count() == n_guarded

    # the bound comes from the JOIN KEY, not a post-filter: the physical plan
    # joins on (label, jk), so a hot cell shrinks to sub-bucket cross-products
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "jk" in plan


def test_connected_components_long_chain(spark):
    """Pointer-jumping must converge a chain far longer than the round cap
    would allow under plain neighbor propagation (O(log d), not O(d))."""
    from pyspark.sql import functions as F

    from crypto_datalake_spark.queries.dedup import connected_components

    n = 120  # plain min-label propagation would need ~n rounds
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    labels = connected_components(docs, pairs, max_rounds=25).collect()
    assert all(r["label"] == 0 for r in labels)
    assert len(labels) == n

    # two components + a singleton keep distinct minima
    pairs2 = spark.createDataFrame([(10, 11), (11, 12), (20, 21)], "doc_a long, doc_b long")
    docs2 = spark.createDataFrame([(i,) for i in (10, 11, 12, 20, 21, 99)], "doc_id long")
    got = {r["doc_id"]: r["label"] for r in connected_components(docs2, pairs2).collect()}
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 99: 99}


def test_star_contraction_matches_label_propagation(spark, sf_dir):
    """connected_components_star (the 100-TB large-star/small-star path)
    must produce EXACTLY the labels of the propagation loop on every
    graph shape: chain, hub, cliques, singletons, random, and the real
    LSH pair graph — the two are interchangeable by contract."""
    import random

    from pyspark.sql import functions as F

    from crypto_datalake_spark.queries.dedup import (
        connected_components,
        connected_components_star,
        minhash_lsh_pairs,
    )

    def labels_of(fn, docs, pairs):
        return {r["doc_id"]: r["label"] for r in fn(docs, pairs).collect()}

    def both_equal(doc_ids, edge_list):
        docs = spark.createDataFrame([(i,) for i in doc_ids], "doc_id long")
        pairs = spark.createDataFrame(
            edge_list or [(doc_ids[0], doc_ids[0])], "doc_a long, doc_b long"
        )
        a = labels_of(connected_components, docs, pairs)
        b = labels_of(connected_components_star, docs, pairs)
        assert a == b, f"star != propagation on {edge_list[:8]}..."
        return a

    # chain (deep), hub (wide), two cliques + singleton
    n = 64
    both_equal(list(range(n)), [(i, i + 1) for i in range(n - 1)])
    both_equal(list(range(n)), [(0, i) for i in range(1, n)])
    clique = [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    clique += [(a, b) for a in range(20, 24) for b in range(a + 1, 24)]
    got = both_equal(list(range(5, 10)) + list(range(20, 24)) + [99], clique)
    assert got[99] == 99 and got[23] == 20 and got[9] == 5

    # seeded random graphs (duplicate edges, both orientations, self-loops)
    rng = random.Random(7)
    for _ in range(3):
        ids = list(range(40))
        edges = [
            (rng.randrange(40), rng.randrange(40)) for _ in range(45)
        ]
        both_equal(ids, edges)

    # the real graph the registered query clusters
    from crypto_datalake_spark.queries.common import t as _t

    corpus_docs = _t(spark, sf_dir, "documents").select("doc_id")
    pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    a = labels_of(connected_components, corpus_docs, pairs)
    b = labels_of(connected_components_star, corpus_docs, pairs)
    assert a == b


def test_spread_is_identity_when_scan_already_parallel(spark, sf_dir):
    """spread()'s 100 TB guarantee: it repartitions ONLY an under-parallel
    scan. A frame that already has >= defaultParallelism partitions (a
    production table's thousands of row-group splits) must pass through
    untouched — no round-robin exchange is ever inserted at scale."""
    from crypto_datalake_spark.queries.common import spread, t

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000, 1, target + 4)
    assert spread(wide) is wide  # identity, not even a new plan node

    narrow = t(spark, sf_dir, "documents")  # loader applies spread already
    assert narrow.rdd.getNumPartitions() >= min(
        target, 2
    )  # under-parallel single-file scan got spread to the cores
    plan = spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    assert "roundrobin" in plan._jdf.queryExecution().toString().lower()


def test_sketch_profile_bounds_and_mergeability(spark, sf_dir):
    """HLL estimates must land within the sketch's error envelope of the
    exact distinct count, and daily partial sketches must union to the
    SAME estimate as one global sketch — the property that lets a lake
    store per-partition sketch columns and roll them up to any grain
    without rescanning data."""
    import pytest

    from crypto_datalake_spark.queries import REGISTRY
    from crypto_datalake_spark.queries.common import events

    got = {
        r["event_type"]: r
        for r in REGISTRY["sketch_profile"].fn(spark, sf_dir).collect()
    }
    ev = events(spark, sf_dir)
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, r in got.items():
        ex = exact[et]
        assert r["n_events"] == ex["n_events"]  # exact col stays exact
        # lgK=12 → rsd ~1.6%; 10% is a generous deterministic envelope
        assert abs(r["approx_users"] - ex["n_users"]) <= max(
            0.10 * ex["n_users"], 2
        )
        # percentile_approx at accuracy 10k over ~10k rows is near-exact
        if ex["p50"] is not None:
            assert r["p50_value"] == pytest.approx(ex["p50"], rel=0.05)

    # mergeability: per-day sketches union to the global estimate exactly
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    )
    merged = {
        r["event_type"]: r["est"]
        for r in daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    assert merged == {et: r["approx_users"] for et, r in got.items()}


# --- exact-substring dedup (Lee et al. 2022 tier) --------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_substring_witness_and_maximality(spark):
    """A known K-token verbatim overlap must surface as ONE maximal run
    of exactly K tokens at the right positions — not a pile of window
    fragments — and sub-N overlaps must not surface at all."""
    from crypto_datalake_spark.queries.dedup import exact_substring_runs

    shared = " ".join(f"s{i}" for i in range(12))  # 12-token verbatim run
    d = _docs(spark, [
        (1, "a1 a2 a3 " + shared + " z1 z2"),
        (2, "b1 " + shared + " y1 y2 y3"),
        (3, "c1 c2 " + " ".join(f"s{i}" for i in range(7)) + " c3"),  # 7 < N
    ])
    got = {tuple(r) for r in exact_substring_runs(d, n=8).collect()}
    # doc1 tokens: a1 a2 a3 (pos 1-3), s0..s11 (pos 4-15); doc2: b1, s0.. (pos 2-13)
    assert got == {(1, 2, 4, 2, 12)}


def test_exact_substring_df_cap_drops_boilerplate(spark):
    """A window shared by more than ``cap`` documents is boilerplate and
    must not expand into pairs (the Σ|posting|² guard)."""
    from crypto_datalake_spark.queries.dedup import exact_substring_runs

    boiler = " ".join(f"w{i}" for i in range(8))
    d = _docs(
        spark,
        [(i, f"u{i} " + boiler) for i in range(1, 5)],  # 4 docs share it
    )
    assert exact_substring_runs(d, n=8, cap=3).count() == 0
    got = exact_substring_runs(d, n=8, cap=4)
    assert got.count() == 6  # all C(4,2) pairs, one run each


def test_exact_substring_repeated_run_within_doc(spark):
    """A run repeated at two alignments lands on two diagonals — two
    separate maximal runs, neither merged nor double-counted."""
    from crypto_datalake_spark.queries.dedup import exact_substring_runs

    run = " ".join(f"r{i}" for i in range(8))
    d = _docs(spark, [
        (1, run),                       # pos 1-8
        (2, run + " mid " + run),       # pos 1-8 and pos 10-17
    ])
    got = {tuple(r) for r in exact_substring_runs(d, n=8).collect()}
    assert got == {(1, 2, 1, 1, 8), (1, 2, 1, 10, 8)}


def test_exact_substring_pos_cap_drops_degenerate_repetition(spark):
    """A window whose TOTAL occurrences exceed pos_cap must be dropped
    before pair expansion even when its document frequency passes the df
    cap — one spammy doc repeating a window T times would otherwise
    build T^2 structs inside a single array value."""
    from crypto_datalake_spark.queries.dedup import exact_substring_runs

    run = " ".join(f"p{i}" for i in range(8))
    spam = " x ".join([run] * 6)  # the run at 6 alignments in one doc
    d = _docs(spark, [(1, spam), (2, run)])
    assert exact_substring_runs(d, n=8, pos_cap=4).count() == 0
    assert exact_substring_runs(d, n=8, pos_cap=256).count() > 0


def test_singleton_posting_skip_preserves_pair_semantics(spark):
    """The size >= 2 short-circuit on posting lists (the interpreted
    pair-expansion skip) must be output-neutral: all-unique corpora and
    a window repeated only WITHIN one doc still yield zero pairs (the
    skipped expansion emitted none), while a genuine 2-doc share still
    pairs (guards against the conjunct being inverted or > 2)."""
    from crypto_datalake_spark.queries.dedup import (
        exact_substring_runs,
        ngram_jaccard_pairs,
    )

    def _jd(rows):  # ngram_jaccard_pairs wants the lang/n_chars columns
        return spark.createDataFrame(
            [(i, "en", 50, t) for i, t in rows],
            "doc_id long, lang string, n_chars long, text string",
        )

    uniq = [
        (1, " ".join(f"a{i}" for i in range(12))),
        (2, " ".join(f"b{i}" for i in range(12))),
    ]
    assert exact_substring_runs(_docs(spark, uniq), n=8).count() == 0
    assert ngram_jaccard_pairs(_jd(uniq)).count() == 0

    run = " ".join(f"r{i}" for i in range(8))
    same_doc_only = _docs(spark, [(1, run + " mid " + run)])
    assert exact_substring_runs(same_doc_only, n=8).count() == 0

    shared = [(1, run), (2, run)]
    assert exact_substring_runs(_docs(spark, shared), n=8).count() == 1
    assert ngram_jaccard_pairs(_jd(shared), threshold=0.9).count() == 1


def test_exact_substring_gram_tiers_agree(spark):
    """The rolling Karp-Rabin tier and the pure-JVM slice tier must
    produce IDENTICAL runs — same equivalence classes, same downstream
    plan — on a corpus mixing maximal runs, repeated alignments, and
    sub-N overlaps (every shape the witness tests pin individually)."""
    from crypto_datalake_spark.queries.dedup import exact_substring_runs

    shared = " ".join(f"s{i}" for i in range(12))
    run = " ".join(f"r{i}" for i in range(8))
    d = _docs(spark, [
        (1, "a1 a2 a3 " + shared + " z1 z2"),
        (2, "b1 " + shared + " y1 y2 y3"),
        (3, run),
        (4, run + " mid " + run),
        (5, "c1 c2 " + " ".join(f"s{i}" for i in range(7)) + " c3"),
        (6, "too short"),
    ])
    rolling = {tuple(r) for r in
               exact_substring_runs(d, n=8, grams="rolling").collect()}
    sliced = {tuple(r) for r in
              exact_substring_runs(d, n=8, grams="slice").collect()}
    assert rolling == sliced and len(rolling) == 3


def test_rollinghash_matches_direct_recompute():
    """The vectorized prefix evaluation must equal the textbook
    per-window Horner recompute in all four modular fields, and stay
    equal for identical windows at DIFFERENT offsets/documents (the
    offset terms must cancel)."""
    import numpy as np

    from crypto_datalake_spark.functions.rollinghash import (
        B1, B2, B3, B4, M1, M2, M3, M4, window_grams_flat,
    )

    def direct(ws):
        h = [0, 0, 0, 0]
        for t in ws:
            for j, (b, m) in enumerate(
                ((B1, M1), (B2, M2), (B3, M3), (B4, M4))
            ):
                h[j] = (h[j] * b + int(t) % m) % m
        return ((h[0] << 31) | h[1], (h[2] << 31) | h[3])

    rng = np.random.default_rng(7)
    n = 8
    lens = [12, n, 20]
    th = rng.integers(0, 2**63, size=sum(lens), dtype=np.int64).view(
        np.uint64
    )
    th[20 : 20 + n] = th[:n]  # doc2 head == doc0 head, different offset
    offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    doc_idx, pos, h1, h2 = window_grams_flat(th, offsets, n)
    assert len(h1) == sum(L - n + 1 for L in lens)
    assert h1.dtype == np.int64 and h2.dtype == np.int64  # no float promo
    for k in range(len(h1)):
        s = offsets[doc_idx[k]] + pos[k] - 1
        assert direct(th[s : s + n]) == (h1[k], h2[k])
    # offset cancellation: doc0 window 1 == doc2 window 1
    g = {(int(d), int(p)): (int(a), int(b))
         for d, p, a, b in zip(doc_idx, pos, h1, h2)}
    assert g[(0, 1)] == g[(2, 1)]
    assert g[(0, 2)] != g[(2, 2)]

    # a million-token document stays exact (indices into the giant-step
    # power table well past the baby table)
    big = rng.integers(0, 2**63, size=1_000_000, dtype=np.int64).view(
        np.uint64
    )
    _, _, g1, g2 = window_grams_flat(
        big, np.array([0, len(big)], dtype=np.int64), n
    )
    for k in (0, 123_457, len(g1) - 1):
        assert direct(big[k : k + n]) == (g1[k], g2[k])


def test_rollinghash_wrap_recovery_and_range_guard():
    """The wrap-safety property the prefix evaluation leans on — a
    uint64 difference of a WRAPPED cumsum recovers the true window sum
    while the true sum < 2^64 — asserted directly (a real wrap needs
    ~2^33 tokens, unreachable in a test), plus the explicit range guard
    for flat inputs past the power-table coverage."""
    import numpy as np
    import pytest

    from crypto_datalake_spark.functions.rollinghash import (
        window_grams_flat,
    )

    # cumsum prefix a sits just below 2^64; adding delta wraps; the
    # uint64 difference must still be exactly delta (int64 would raise
    # or give negative garbage here — this pins the dtype discipline)
    a = np.array([2**64 - 5], dtype=np.uint64)
    delta = np.array([123_456], dtype=np.uint64)
    wrapped = a + delta  # wraps mod 2^64 (numpy arrays wrap silently)
    assert wrapped[0] < a[0]
    assert (wrapped - a)[0] == delta[0]

    # flat inputs >= 2^32 tokens exceed the pow tables: explicit error,
    # not a silent IndexError mid-task (zero-stride view: no 32 GiB alloc)
    fake = np.broadcast_to(np.uint64(1), (2**32,))
    with pytest.raises(ValueError, match="pow-table range"):
        window_grams_flat(
            fake, np.array([0, 2**32], dtype=np.int64), 8
        )


def test_rollinghash_chunked_batches_agree(spark):
    """Chunking an Arrow batch at document granularity (the pow-table
    range guard) must not change a single fingerprint: doc-boundary
    terms cancel, so a tiny forced flat_cap gives byte-identical output
    to the unchunked evaluation."""
    from crypto_datalake_spark.functions.rollinghash import (
        rolling_window_grams,
    )

    d = _docs(spark, [
        (i, " ".join(f"t{i}_{j}" for j in range(12))) for i in range(6)
    ] + [(99, " ".join(f"t0_{j}" for j in range(12)))])  # dup of doc 0
    th = d.select(
        "doc_id",
        F.transform(F.split("text", " "), lambda t: F.xxhash64(t)).alias("th"),
    )
    base = {tuple(r) for r in rolling_window_grams(th, 8).collect()}
    chunked = {
        tuple(r) for r in rolling_window_grams(th, 8, flat_cap=13).collect()
    }
    assert base == chunked and len(base) == 7 * 5


def test_exact_substring_tier_plans(spark):
    """Plan pins: the slice tier keeps the whole gram stage JVM-side (no
    Python evaluation anywhere); the rolling tier's ONLY Python is the
    one designed mapInPandas fingerprint stage — and both keep the
    single posting-list shuffle (no extra exchange for the recurrence)."""
    from crypto_datalake_spark.queries.dedup import exact_substring_runs

    d = _docs(spark, [(1, " ".join(f"t{i}" for i in range(20)))])
    ps = plan_text(exact_substring_runs(d, n=8, grams="slice"), "simple")
    assert "Python" not in ps and "ArrowEval" not in ps
    pr = plan_text(exact_substring_runs(d, n=8, grams="rolling"), "simple")
    assert pr.count("MapInPandas") == 1
    assert "BatchEvalPython" not in pr


def test_remove_duplicate_spans_policy(spark):
    """Span removal: the higher-doc_id doc loses its copy, overlapping
    cuts from different partners merge, untouched docs round-trip
    byte-identical, and a fully-duplicated doc comes out empty."""
    from crypto_datalake_spark.queries.scrub import remove_duplicate_spans

    run = " ".join(f"s{i}" for i in range(10))
    d = _docs(spark, [
        (1, "a1 " + run + " a2"),   # keeper (lowest doc_id)
        (2, "b1 b2 " + run),        # loses the 10-token span
        (3, run),                   # fully duplicated -> empty
        (4, "lone wolf text here untouched by anything at all ok"),
    ])
    got = {r["doc_id"]: (r["text"], r["n_tokens_removed"])
           for r in remove_duplicate_spans(d, n=8).collect()}
    assert got[1] == ("a1 " + run + " a2", 0)   # keeper untouched
    assert got[2] == ("b1 b2", 10)
    assert got[3] == ("", 10)
    assert got[4][1] == 0 and got[4][0].startswith("lone wolf")


def test_remove_duplicate_spans_merges_overlaps(spark):
    """Two runs hitting overlapping regions of the same victim doc must
    merge into one cut, not double-count removed tokens."""
    from crypto_datalake_spark.queries.scrub import remove_duplicate_spans

    t12 = " ".join(f"s{i}" for i in range(12))     # tokens s0..s11
    left8 = " ".join(f"s{i}" for i in range(8))    # s0..s7
    right8 = " ".join(f"s{i}" for i in range(4, 12))  # s4..s11
    d = _docs(spark, [
        (1, "x1 " + left8),        # matches victim's s0..s7
        (2, "y1 y2 " + right8),    # matches victim's s4..s11 (overlap s4-s7)
        (3, t12 + " tail1 tail2"), # victim: loses s0..s11 as ONE merged cut
    ])
    got = {r["doc_id"]: (r["text"], r["n_tokens_removed"])
           for r in remove_duplicate_spans(d, n=8).collect()}
    assert got[3] == ("tail1 tail2", 12)  # merged, not 8+8


def test_remove_duplicate_spans_identical_cut_ties(spark):
    """Two partners cutting the IDENTICAL interval on one victim must
    not perturb the interval merge (tied (s, e) rows were the one
    nondeterministic sort in the oracle — review r6)."""
    from crypto_datalake_spark.queries.scrub import remove_duplicate_spans

    span_a = " ".join(f"a{i}" for i in range(8))
    span_b = " ".join(f"b{i}" for i in range(8))
    d = _docs(spark, [
        (1, "x " + span_b),
        (2, "y z " + span_b),          # 1 and 2 cut the SAME (s, e) on 9
        (3, "q " + span_a),
        (9, span_a + " g1 g2 g3 g4 g5 " + span_b),
    ])
    got = {r["doc_id"]: (r["text"], r["n_tokens_removed"])
           for r in remove_duplicate_spans(d, n=8).collect()}
    assert got[9] == ("g1 g2 g3 g4 g5", 16)  # gap survives, no double count


def test_chunk_documents_overlap_and_reconstruction(spark):
    """Consecutive chunks overlap by exactly _CHUNK_OVERLAP tokens, and
    stitching each chunk's novel suffix onto the first reconstructs the
    document."""
    from crypto_datalake_spark.queries.scrub import _CHUNK_OVERLAP, chunk_frame

    toks = [f"t{i}" for i in range(75)]  # 75 tokens -> 3 chunks at stride 24
    d = _docs(spark, [(1, " ".join(toks))])
    out = sorted(
        (r["chunk_id"], r["begin_pos"], r["n_tokens"], r["text"])
        for r in chunk_frame(d).collect()
    )
    # no start past n - overlap: a 4th chunk at 73 would be fully
    # contained in the chunk at 49 (pure duplication)
    assert [c[1] for c in out] == [1, 25, 49]
    assert [c[2] for c in out] == [32, 32, 27]
    # a doc that fits one chunk emits exactly one chunk
    one = chunk_frame(_docs(spark, [(9, " ".join(toks[:30]))])).collect()
    assert len(one) == 1 and one[0]["n_tokens"] == 30
    # overlap: each chunk's head re-states the previous chunk's tokens
    for (ci, bp, n, tx), (pi, pb, pn, ptx) in zip(out[1:], out):
        assert tx.split(" ")[:_CHUNK_OVERLAP] == ptx.split(" ")[
            bp - pb : bp - pb + _CHUNK_OVERLAP
        ]
    # reconstruction: first chunk + each later chunk's novel suffix
    rebuilt = out[0][3].split(" ")
    for ci, bp, n, tx in out[1:]:
        rebuilt += tx.split(" ")[len(rebuilt) - (bp - 1):]
    assert rebuilt == toks


# --- TF-IDF keyword extraction ---------------------------------------------

def test_tfidf_topk_witness(spark):
    """A term concentrated in one doc must outrank corpus-wide terms
    there; ranks are dense from 1; ties break by term string."""
    from crypto_datalake_spark.queries.curation import tfidf_topk

    d = _docs(spark, [
        (1, "apple apple apple common common"),
        (2, "banana banana banana common common"),
        (3, "common common common common common"),
    ])
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["term_count"])
        for r in tfidf_topk(d, k=2).collect()
    }
    # 'apple' df=1 idf high; 'common' df=3 idf = ln(4/4)+1 = 1.0
    assert got[(1, 1)] == ("apple", 3)
    assert got[(2, 1)] == ("banana", 3)
    assert got[(3, 1)] == ("common", 5)
    assert got[(1, 2)] == ("common", 2)


def test_tfidf_topk_tie_breaks_by_term(spark):
    """Equal tf and equal df => identical scores; rank must order by the
    term string so both engines agree."""
    from crypto_datalake_spark.queries.curation import tfidf_topk

    d = _docs(spark, [(1, "zeta alpha"), (2, "zeta alpha")])
    rows = {(r["doc_id"], r["rank"]): r["term"] for r in tfidf_topk(d, k=2).collect()}
    assert rows == {(1, 1): "alpha", (1, 2): "zeta",
                    (2, 1): "alpha", (2, 2): "zeta"}


# --- LM-perplexity quality tiers -------------------------------------------

def test_lm_perplexity_buckets_witness(spark):
    """A doc made of the corpus's dominant bigram must score lowest
    (head); a doc of one-off bigrams scores highest (tail); a 1-token
    doc lands in 'short' with NULL score and 0 bigrams."""
    from crypto_datalake_spark.queries.curation import lm_perplexity_buckets

    common = "x y " * 20
    d = _docs(spark, [
        (1, common.strip()),              # dominant bigrams -> lowest nll
        (2, "a b c d e f g h i j"),       # one-off bigrams
        # rare continuations of the FREQUENT context 'x' — strictly worse
        # than doc 2's one-off-context bigrams (doc 2 and a structurally
        # symmetric twin would tie exactly and share a bucket, which is
        # correct tercile-with-ties behavior, so the witness avoids it)
        (3, "x a x b x c x d x e"),
        (4, "solo"),                      # no bigram -> short
    ])
    rows = {r["doc_id"]: r for r in lm_perplexity_buckets(d).collect()}
    assert rows[4]["ppl_bucket"] == "short"
    assert rows[4]["log_ppl"] is None and rows[4]["n_bigrams"] == 0
    assert rows[1]["ppl_bucket"] == "head"
    assert rows[1]["log_ppl"] < rows[2]["log_ppl"]
    # 3 scored docs: terciles put exactly one doc per bucket
    assert sorted(rows[i]["ppl_bucket"] for i in (1, 2, 3)) == [
        "head", "middle", "tail"]
    assert rows[1]["n_bigrams"] == 39


def test_tfidf_served_matches_inquery_on_training_corpus(spark, sf_dir):
    """On the corpus it was fitted on (no OOV), the persisted-vocabulary
    serving path must reproduce text_tfidf_topk bit-for-bit — same idf
    formula at fit, same tie-break at serve."""
    from crypto_datalake_spark.queries import REGISTRY

    base = {
        tuple(r)
        for r in REGISTRY["text_tfidf_topk"].fn(spark, sf_dir).collect()
    }
    served = {
        tuple(r)
        for r in REGISTRY["text_tfidf_topk_served"].fn(spark, sf_dir).collect()
    }
    assert base == served and len(base) > 0


def test_tfidf_serve_drops_oov_terms(spark, sf_dir):
    """Serving NEW documents against the frozen vocabulary: terms the
    fit never saw must be dropped (sklearn transform semantics), while
    in-vocab terms score with the PERSISTED idf — and n_tok counts the
    full document including the dropped terms."""
    from crypto_datalake_spark.queries.curation import (
        tfidf_model_tables,
        tfidf_topk_serve,
    )

    vocab = tfidf_model_tables(spark, sf_dir)
    known = [
        r["term"]
        for r in vocab.orderBy(F.col("df_docs").desc(), "term").limit(2).collect()
    ]
    idf = {r["term"]: r["idf"] for r in vocab.collect()}
    new_docs = spark.createDataFrame(
        [(9001, f"{known[0]} NEVERSEEN1 {known[1]} NEVERSEEN2")],
        "doc_id long, text string",
    )
    out = tfidf_topk_serve(new_docs, vocab).collect()
    terms = {r["term"] for r in out}
    assert terms == set(known)  # OOV dropped, nothing invented
    for r in out:
        assert r["idf"] == idf[r["term"]]  # persisted idf, not refit
        # tf divides by the FULL 4-token length, OOV included
        assert r["tfidf"] == (1 / 4) * idf[r["term"]]


def test_tfidf_vocab_cap_drops_low_df_tail(spark):
    """The max_features branch (uncovered by the sf corpora, whose 31
    terms never hit the 65,536 default): the fitted vocabulary keeps
    exactly the k highest-df terms (ties by term asc), and serving then
    DIVERGES from the uncapped op by excluding the low-df high-idf tail
    — the documented, deliberate cap semantics."""
    from crypto_datalake_spark.queries.curation import (
        tfidf_topk,
        tfidf_topk_serve,
    )

    d = _docs(spark, [
        (i, f"common1 common2 rare{i}") for i in range(6)
    ])
    # fit inline (the warehouse split needs an sf_dir; the cap logic is
    # what's under test) — mirror build_vocab with max_features=2
    from crypto_datalake_spark.ops.rank import global_row_number

    from crypto_datalake_spark.queries.curation import _tfidf_tf_frame

    tf = _tfidf_tf_frame(d)
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    n_docs = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    idf = F.round(
        F.log((F.col("n_docs").cast("double") + F.lit(1.0))
              / (F.col("df_docs").cast("double") + F.lit(1.0))) + F.lit(1.0),
        7,
    )
    vocab = (
        global_row_number(
            dfc.crossJoin(F.broadcast(n_docs)),
            [F.col("df_docs").desc(), F.col("term").asc()], out_col="__rk")
        .where(F.col("__rk") <= 2)
        .select("term", "df_docs", idf.alias("idf"))
    )
    assert {r["term"] for r in vocab.collect()} == {"common1", "common2"}
    served = tfidf_topk_serve(d, vocab).collect()
    assert {r["term"] for r in served} == {"common1", "common2"}
    # the uncapped op ranks each doc's rare term FIRST (highest idf):
    # the cap genuinely changes top-k output past max_features
    base_top1 = {
        r["doc_id"]: r["term"]
        for r in tfidf_topk(d).collect() if r["rank"] == 1
    }
    assert all(v.startswith("rare") for v in base_top1.values())


def test_lm_unk_collapses_tail_tokens_only(spark):
    """The UNK cap must (a) collapse out-of-vocabulary docs onto shared
    <unk> statistics — two rare-token docs whose UNCAPPED models score
    them differently become IDENTICAL under the cap — and (b) leave
    kept-token bigram counts untouched (the mapping only merges OOV
    mass), so common-token docs keep their uncapped counts."""
    from crypto_datalake_spark.queries.curation import (
        lm_perplexity_buckets,
        lm_perplexity_buckets_unk,
        lm_unk_model,
    )

    common = ("x y " * 10).strip()
    d = _docs(spark, [
        (1, common),
        (2, common),
        (3, "r1 r2"),   # singleton tokens: c1(r1)=1
        (4, "r3 r3 r4"),  # repeated rare: c1(r3)=2 — differs uncapped
        (5, "r5 r6"),
    ])
    raw = {r["doc_id"]: r for r in lm_perplexity_buckets(d).collect()}
    # uncapped: doc 4's first bigram sits in a c1=2 context, doc 3's in
    # c1=1 — different scores
    assert raw[3]["log_ppl"] != raw[4]["log_ppl"]

    capped = {
        r["doc_id"]: r
        for r in lm_perplexity_buckets_unk(d, k=2).collect()  # keep x,y
    }
    # (a) every rare doc is now pure <unk>-<unk>: identical scores
    assert capped[3]["log_ppl"] == capped[5]["log_ppl"]
    # (b) kept-token bigram counts unchanged by the mapping
    bg, c12, c1, vocab = lm_unk_model(d, k=2)
    cm = {(r["w1"], r["w2"]): r["c12"] for r in c12.collect()}
    assert cm[("x", "y")] == 20  # 10 per doc × 2 docs, exactly uncapped
    assert ("<unk>", "<unk>") in cm
    assert vocab.collect()[0]["vocab"] == 3  # x, y, <unk>


def test_lm_unk_served_matches_inquery_on_training_corpus(spark, sf_dir):
    """On the corpus it was fitted on, the UNK-capped persisted-model
    serving path must reproduce quality_lm_perplexity_unk bit-for-bit
    (same kept set, same bounded counts, frozen cuts = fresh cuts on
    the same data)."""
    from crypto_datalake_spark.queries import REGISTRY

    base = {
        tuple(r)
        for r in REGISTRY["quality_lm_perplexity_unk"].fn(spark, sf_dir).collect()
    }
    served = {
        tuple(r)
        for r in REGISTRY["quality_lm_perplexity_unk_served"].fn(
            spark, sf_dir).collect()
    }
    assert base == served and len(base) > 0


def test_lm_unk_served_scores_novel_documents(spark, sf_dir):
    """Serving NEW documents against the frozen UNK fit: fully-OOV text
    collapses onto <unk> statistics (non-null score, a real bucket from
    the FROZEN cutoffs), and count tables are never refit."""
    from crypto_datalake_spark.queries.curation import (
        _lm_exploded,
        _lm_classify,
        _lm_doc_scores,
        _unk_map,
        lm_unk_model_tables,
    )

    kept, bigram, ctx, meta = lm_unk_model_tables(spark, sf_dir)
    new_docs = spark.createDataFrame(
        [(9001, "zz1 zz2 zz3 zz4 zz5"),  # fully OOV → pure <unk> bigrams
         (9002, "x")],                    # 1 token → short
        "doc_id long, text string",
    )
    bg = _unk_map(_lm_exploded(new_docs, checkpoint=False), kept).where(
        F.col("w2").isNotNull()
    )
    ds = _lm_doc_scores(
        bg, bigram, ctx, meta.select("vocab"), left=True, checkpoint=False
    )
    out = {r["doc_id"]: r for r in
           _lm_classify(new_docs, ds, meta.select("c1v", "c2v")).collect()}
    assert out[9001]["log_ppl"] is not None
    assert out[9001]["ppl_bucket"] in ("head", "middle", "tail")
    assert out[9001]["n_bigrams"] == 4
    assert out[9002]["ppl_bucket"] == "short"


def test_lm_unk_count_tables_bounded(spark):
    """The whole point of the cap: with k=3 and 40 distinct rare
    tokens, the bigram table must stay within (k+1)² rows and the
    context table within k+1 — the persisted-serving bound."""
    from crypto_datalake_spark.queries.curation import lm_unk_model

    rows = [(i, f"a b r{i} r{i + 100} c") for i in range(40)]
    d = _docs(spark, rows)
    bg, c12, c1, vocab = lm_unk_model(d, k=3)
    assert c12.count() <= 16
    assert c1.count() <= 4
    assert vocab.collect()[0]["vocab"] == 4


def test_lm_perplexity_all_short_corpus(spark):
    """Every doc under 2 tokens: no scored docs, cutoffs are NULL, and
    every row still comes back bucketed 'short' (no crash, no drops)."""
    from crypto_datalake_spark.queries.curation import lm_perplexity_buckets

    d = _docs(spark, [(1, "a"), (2, "b")])
    rows = {r["doc_id"]: r["ppl_bucket"] for r in lm_perplexity_buckets(d).collect()}
    assert rows == {1: "short", 2: "short"}


# --- global shuffle → training shards --------------------------------------

def test_shuffle_shard_assign_partitions_exactly(spark):
    """Every shard except the last holds exactly shard_size docs with
    dense positions 0..S-1; the assignment is a permutation (each doc
    exactly once); re-running is byte-identical; a different seed gives
    a different permutation of the same shard structure."""
    from crypto_datalake_spark.queries.curation import shuffle_shard_assign

    d = _docs(spark, [(i, f"t{i}") for i in range(1, 24)])  # 23 docs
    a = sorted(
        (r["shard_id"], r["shard_pos"], r["doc_id"])
        for r in shuffle_shard_assign(d, shard_size=5).collect()
    )
    assert len(a) == 23
    assert len({r[2] for r in a}) == 23                      # permutation
    slots = [(s, p) for s, p, _ in a]
    assert slots == [(s, p) for s in range(5) for p in range(5)][:23]  # dense
    b = sorted(
        (r["shard_id"], r["shard_pos"], r["doc_id"])
        for r in shuffle_shard_assign(d, shard_size=5).collect()
    )
    assert a == b                                            # deterministic
    c = {
        r["doc_id"]: (r["shard_id"], r["shard_pos"])
        for r in shuffle_shard_assign(d, shard_size=5, seed="other").collect()
    }
    assert {d_ for _, _, d_ in a} == set(c)
    assert any((s, p) != c[d_] for s, p, d_ in a)            # seed reshuffles


# --- dedup-tier precision/recall evaluation --------------------------------

def test_dedup_recall_eval_witness(spark):
    """A verbatim duplicate pair inside the sample must be found by both
    arms (hit); unrelated docs produce no truth; counts and ratios are
    consistent. doc_ids are even so the mod-2 sample keeps every doc."""
    from crypto_datalake_spark.queries.curation import dedup_recall_eval_frame

    dup = " ".join(f"d{i}" for i in range(12))
    d = _docs(spark, [
        (2, dup),
        (4, dup + " tail1"),            # near-verbatim partner
        (6, " ".join(f"u{i}" for i in range(12))),
        (8, " ".join(f"v{i}" for i in range(12))),
    ])
    r = dedup_recall_eval_frame(d).collect()[0]
    assert r["n_true"] == 1 and r["n_hit"] == 1
    assert r["n_cand"] >= 1
    assert r["recall"] == 1.0
    assert r["precision"] == 1.0 / r["n_cand"]


def test_dedup_recall_eval_empty_sample(spark):
    """Odd doc_ids only: the mod-2 sample is empty, every count is 0 and
    the ratios are NULL — no crash, no division error."""
    from crypto_datalake_spark.queries.curation import dedup_recall_eval_frame

    d = _docs(spark, [(1, "a b c d"), (3, "e f g h")])
    r = dedup_recall_eval_frame(d).collect()[0]
    assert (r["n_true"], r["n_cand"], r["n_hit"]) == (0, 0, 0)
    assert r["precision"] is None and r["recall"] is None
    assert r["recall_lo"] is None and r["recall_hi"] is None


def test_dedup_recall_eval_ci_widens_with_mod(spark):
    """The Wilson interval makes the mod knob's confidence tradeoff
    visible: a sparser sample (larger mod) keeps fewer true pairs, so
    the CI around the same point recall must WIDEN — and it always
    brackets the point estimate within [0, 1]."""
    from crypto_datalake_spark.queries.curation import dedup_recall_eval_frame

    def dup_pair(i, base):
        txt = " ".join(f"{base}{j}" for j in range(12))
        return [(i, txt), (i + 60, txt + " tail")]

    # four pairs with both ids ≡ 0 (mod 4) — survive mod=2 AND mod=4;
    # four more with ids ≡ 2 (mod 4) — survive only mod=2
    rows = []
    for k in range(4):
        rows += dup_pair(8 * k + 4, f"p{k}_")
        rows += dup_pair(8 * k + 6, f"q{k}_")
    d = _docs(spark, rows)
    r2 = dedup_recall_eval_frame(d, mod=2).collect()[0]
    r4 = dedup_recall_eval_frame(d, mod=4).collect()[0]
    assert r2["n_true"] > r4["n_true"] > 0
    for r in (r2, r4):
        assert 0.0 <= r["recall_lo"] <= r["recall"] <= r["recall_hi"] <= 1.0
    width2 = r2["recall_hi"] - r2["recall_lo"]
    width4 = r4["recall_hi"] - r4["recall_lo"]
    assert width4 > width2


# --- text normalization ----------------------------------------------------

def test_text_normalize_cross_engine_witness(spark):
    """The sf corpora are already normalized (the registered oracle is
    an identity map there), so the real logic — case folding, run
    collapsing incl. \\x0B and CRLF, trim, NULL passthrough, the
    changed flag — is pinned on crafted rows compared across BOTH
    engines (the oracle SQL runs on a DuckDB view of the same rows)."""
    import duckdb

    from crypto_datalake_spark.queries import REGISTRY
    from crypto_datalake_spark.queries.curation import normalize_text_frame
    from tests.oracle import compare

    rows = [(1, "  Hello\t WORLD  "), (2, None), (3, "already clean"),
            (4, "a\x0bb"), (5, "A\nB\r\nC")]
    sp = normalize_text_frame(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    got = {r["doc_id"]: (r["norm_text"], r["changed"]) for r in sp.collect()}
    assert got == {
        1: ("hello world", True),
        2: (None, False),
        3: ("already clean", False),
        4: ("a b", True),          # \x0B: Java \s would eat it, RE2 not —
        5: ("a b c", True),        # the explicit class makes both agree
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, '  Hello' || chr(9) || ' WORLD  '), (2, NULL), "
        "(3, 'already clean'), (4, 'a' || chr(11) || 'b'), "
        "(5, 'A' || chr(10) || 'B' || chr(13) || chr(10) || 'C')"
        ") t(doc_id, text)"
    )
    ok, msg = compare(sp, con, REGISTRY["text_normalize"].resolved_sql())
    assert ok, msg


def test_lm_served_scores_oov_documents(spark):
    """The serving form must score documents whose bigrams/contexts the
    persisted fit never saw: unseen counts coalesce to 0 and add-alpha
    gives P = a/(aV) for a fully-unseen bigram — the production case of
    scoring a new crawl against a frozen LM."""
    import math

    from pyspark.sql import functions as F

    from crypto_datalake_spark.queries.curation import _lm_doc_scores

    # fit: contexts/bigrams from a tiny 'training corpus', vocab V=4
    c12 = spark.createDataFrame([("a", "b", 3)], "w1 string, w2 string, c12 long")
    c1 = spark.createDataFrame([("a", 3)], "w1 string, c1 long")
    vocab = spark.createDataFrame([(4,)], "vocab long")
    # serve: doc 1 has the SEEN bigram, doc 2 a fully-unseen one
    bg = spark.createDataFrame(
        [(1, "a", "b"), (2, "q", "z")], "doc_id long, w1 string, w2 string"
    )
    got = {
        r["doc_id"]: r["log_ppl"]
        for r in _lm_doc_scores(bg, c12, c1, vocab, left=True).collect()
    }
    assert got[1] == round(-math.log((3 + 0.5) / (3 + 0.5 * 4)), 7)
    assert got[2] == round(-math.log(0.5 / (0.5 * 4)), 7)  # = ln(4)


def test_bm25_served_matches_inquery_on_training_corpus(spark, sf_dir):
    """On the fit corpus (vocabulary uncapped at these SFs), the
    persisted-corpus-stats serving path must reproduce search_bm25_topk
    bit-for-bit — same idf decimals at fit, same frozen N/avgdl the
    in-query op derives live, same tie-break."""
    from crypto_datalake_spark.queries import REGISTRY

    base = {
        tuple(r)
        for r in REGISTRY["search_bm25_topk"].fn(spark, sf_dir).collect()
    }
    served = {
        tuple(r)
        for r in REGISTRY["search_bm25_topk_served"].fn(spark, sf_dir).collect()
    }
    assert base == served and len(base) > 0


def test_bm25_np_scorer_bit_equals_join_and_falls_back(spark, sf_dir, monkeypatch):
    """The numpy scatter-add scorer (the registered decimal plan) must be
    bit-identical to the decimal join plan on the same tf/qterms — scores,
    n_hit_terms, ranks, tie-breaks — and above the query-bag broadcast cap
    the query must FALL BACK to the open-ended join with identical output
    (the 100 TB shape is the join; numpy is the bounded-bag accelerator)."""
    from pyspark.sql import Window

    from crypto_datalake_spark.queries import retrieval as R
    from crypto_datalake_spark.queries.common import t
    from crypto_datalake_spark.queries.curation import _tfidf_tf_frame

    d = t(spark, sf_dir, "documents")
    tf = _tfidf_tf_frame(d).localCheckpoint()
    qterms = tf.where(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("qid"), "term"
    )
    np_scored = R._bm25_scored_np(tf, qterms)
    assert np_scored is not None
    got_np = {tuple(r) for r in R._np_topk_select(np_scored, 10).collect()}

    scored = R._bm25_scored(tf, qterms)
    w = Window.partitionBy("qid").orderBy(
        F.col("score_dec").desc(), F.col("doc_id").asc()
    )
    got_join = {
        tuple(r)
        for r in scored.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .where(F.col("rank") <= 10)
        .select(
            "qid",
            "doc_id",
            F.round(F.col("score_dec"), 7).cast("double").alias("bm25"),
            F.col("n_hit_terms").cast("long").alias("n_hit_terms"),
            "rank",
        )
        .collect()
    }
    assert got_np == got_join and len(got_np) > 0

    # registered plan carries the numpy tier; above the cap it must not
    base = {tuple(r) for r in R.bm25_topk(d).collect()}
    assert base == got_np
    p = R.bm25_topk(d)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "MapInPandas" in p
    monkeypatch.setattr(R, "_QBAG_NP_MAX", 0)
    fb = R.bm25_topk(d)
    pfb = fb._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "MapInPandas" not in pfb
    assert {tuple(r) for r in fb.collect()} == base


def test_bm25_np_scorer_bounded_paths_bit_equal(spark, sf_dir, monkeypatch):
    """VERDICT r15 item 1: the dense scatter buffer is (batch-docs × |q|)
    int64 cells, so a high-|q| bag under the row cap must never allocate
    it unbounded — the scorer chunks the batch's posting rows and
    switches to the sparse sort+segment-sum aggregation above the cell
    bound.  Forcing pathological bounds (1-cell dense cap, 7-contribution
    chunks) must leave the scorer's aggregated output — and the
    registered query — bit-identical: every path is an order-free int64
    sum."""
    import pandas as pd

    from crypto_datalake_spark.queries import retrieval as R
    from crypto_datalake_spark.queries.common import t
    from crypto_datalake_spark.queries.curation import _tfidf_tf_frame

    d = t(spark, sf_dir, "documents")
    tf = _tfidf_tf_frame(d).localCheckpoint()
    qterms = tf.where(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("qid"), "term"
    )
    bag = R._np_qbag(qterms)
    assert bag is not None and bag[5] > 1  # nq > 1: the grid is real

    class _BC:
        value = bag

    pdf = (
        R._bm25_weights(tf, unscaled=True)[0]
        .toPandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    assert len(pdf) > 20  # enough rows that 7-contribution chunks matter

    def agg(frames):
        out = pd.concat(list(frames), ignore_index=True)
        return (
            out.groupby(["qid", "doc_id"], as_index=False)[["s", "c"]]
            .sum()
            .sort_values(["qid", "doc_id"])
            .reset_index(drop=True)
        )

    dense = agg(R._np_fanout_scorer(_BC())(iter([pdf])))
    chunked = agg(
        R._np_fanout_scorer(_BC(), max_cells=1, chunk_contribs=7)(
            iter([pdf])
        )
    )
    pd.testing.assert_frame_equal(dense, chunked)
    assert len(dense) > 0

    # end-to-end: the registered plan under the pathological bounds
    # (baked into the closure at plan time) returns the same rows
    base = {tuple(r) for r in R.bm25_topk(d).collect()}
    monkeypatch.setattr(R, "_NP_SCATTER_MAX_CELLS", 1)
    monkeypatch.setattr(R, "_NP_CHUNK_CONTRIBS", 7)
    bounded = {tuple(r) for r in R.bm25_topk(d).collect()}
    assert bounded == base and len(base) > 0

    # the byte companion of the row cap forces the join fallback
    monkeypatch.setattr(R, "_QBAG_NP_MAX_BYTES", 1)
    fb = R.bm25_topk(d)
    pfb = fb._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "MapInPandas" not in pfb
    assert {tuple(r) for r in fb.collect()} == base


def test_dsir_bucket_counts_match_exploded_grain(spark, sf_dir):
    """r15: the Arrow-batched per-doc bucket-count pass must equal the
    JVM occurrence explode (_dsir_ex) aggregated to the (doc_id, lang,
    b) grain — same split-on-space tokens, same 'u:'/'b:' features, same
    md5 bucket — on the real corpus AND on the edge cases the explode
    semantics define (null text → no rows, null lang passes through,
    empty text → one 'u:' feature, single token → no bigrams)."""
    from crypto_datalake_spark.queries import curation as C
    from crypto_datalake_spark.queries.common import t

    def grain(df):
        return {
            (r["doc_id"], r["lang"], r["b"]): r["n"]
            for r in df.collect()
        }

    def ref(docs):
        return (
            C._dsir_ex(docs)
            .groupBy("doc_id", "lang", "b")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    docs = t(spark, sf_dir, "documents")
    got = grain(C._dsir_doc_bucket_counts(docs))
    want = grain(ref(docs))
    assert got == want and len(got) > 0

    edge = spark.createDataFrame(
        [
            (1, "en", None),            # null text: explodes to nothing
            (2, None, "a b a"),         # null lang passes through
            (3, "de", ""),              # empty text: one 'u:' feature
            (4, "en", "solo"),          # single token: no bigrams
            (5, "en", "x  y"),          # double space: empty middle token
        ],
        "doc_id long, lang string, text string",
    )
    got_e = grain(C._dsir_doc_bucket_counts(edge))
    want_e = grain(ref(edge))
    assert got_e == want_e
    assert not any(d == 1 for d, _, _ in got_e)  # null text dropped
    assert any(d == 2 and lang is None for d, lang, _ in got_e)


def test_bm25_double_scoring_knob_same_ranking(spark, sf_dir):
    """VERDICT r12 item 3: the production `decimal_scores=False` knob
    (plain-double products, double sum) must return the SAME (qid,
    doc_id, rank, n_hit_terms) top-k as the shipped exact-decimal path
    on this corpus, with scores equal to 7 decimals — the decimal path
    buys bit-stable cross-engine ordering, not different answers."""
    from crypto_datalake_spark.queries.common import t
    from crypto_datalake_spark.queries.retrieval import bm25_topk

    docs = t(spark, sf_dir, "documents")
    dec = {
        (r["qid"], r["doc_id"]): (r["rank"], r["n_hit_terms"], r["bm25"])
        for r in bm25_topk(docs).collect()
    }
    dbl = {
        (r["qid"], r["doc_id"]): (r["rank"], r["n_hit_terms"], r["bm25"])
        for r in bm25_topk(docs, decimal_scores=False).collect()
    }
    assert set(dec) == set(dbl) and len(dec) > 0
    for key, (rank, nh, score) in dec.items():
        d_rank, d_nh, d_score = dbl[key]
        assert (rank, nh) == (d_rank, d_nh), (key, dec[key], dbl[key])
        assert abs(score - d_score) < 1e-6, (key, score, d_score)


def test_lm_fast_registered_same_tiers_as_decimal(spark, sf_dir):
    """quality_lm_perplexity_fast (double NLL costs, one round-7
    quantization after the sum/count division) must assign every doc
    the same ppl_bucket and n_bigrams as the decimal entry, with
    log_ppl within the quantum — the production scoring knob changes
    arithmetic cost, never the filter verdicts."""
    from crypto_datalake_spark.queries import REGISTRY

    dec = {
        r["doc_id"]: (r["ppl_bucket"], r["n_bigrams"], r["log_ppl"])
        for r in REGISTRY["quality_lm_perplexity"].fn(spark, sf_dir).collect()
    }
    fast = {
        r["doc_id"]: (r["ppl_bucket"], r["n_bigrams"], r["log_ppl"])
        for r in REGISTRY["quality_lm_perplexity_fast"].fn(spark, sf_dir).collect()
    }
    assert set(dec) == set(fast) and len(dec) > 0
    for doc, (bucket, nb, lp) in dec.items():
        f_bucket, f_nb, f_lp = fast[doc]
        assert (bucket, nb) == (f_bucket, f_nb), (doc, dec[doc], fast[doc])
        if lp is None:
            assert f_lp is None
        else:
            assert abs(lp - f_lp) < 1e-6, (doc, lp, f_lp)


def test_bm25_fast_registered_same_topk_as_decimal(spark, sf_dir):
    """VERDICT r13 item 2: the REGISTERED production entry
    (search_bm25_topk_fast: double scoring, score quantized to 7
    decimals before ranking) must return the same (qid, doc_id, rank,
    n_hit_terms) top-k as the bit-stable decimal entry, with scores
    within the quantum — the fast path changes the arithmetic cost,
    never the retrieval answer."""
    from crypto_datalake_spark.queries import REGISTRY

    dec = {
        (r["qid"], r["doc_id"]): (r["rank"], r["n_hit_terms"], r["bm25"])
        for r in REGISTRY["search_bm25_topk"].fn(spark, sf_dir).collect()
    }
    fast = {
        (r["qid"], r["doc_id"]): (r["rank"], r["n_hit_terms"], r["bm25"])
        for r in REGISTRY["search_bm25_topk_fast"].fn(spark, sf_dir).collect()
    }
    assert set(dec) == set(fast) and len(dec) > 0
    for key, (rank, nh, score) in dec.items():
        f_rank, f_nh, f_score = fast[key]
        assert (rank, nh) == (f_rank, f_nh), (key, dec[key], fast[key])
        assert abs(score - f_score) < 1e-6, (key, score, f_score)


def test_bm25_serve_drops_oov_and_length_normalizes(spark, sf_dir):
    """Serving NEW documents against the frozen fit: OOV terms score
    nothing (vocab-join drop) but still count toward the doc's length
    dl, so between two docs matching the same query terms the one
    padded with OOV ranks LOWER; an all-OOV doc never appears."""
    from crypto_datalake_spark.queries.retrieval import (
        bm25_model_tables,
        bm25_topk_serve,
    )

    vocab, meta = bm25_model_tables(spark, sf_dir)
    known = [
        r["term"]
        for r in vocab.orderBy(F.col("df_docs").desc(), "term").limit(2).collect()
    ]
    new_docs = spark.createDataFrame(
        [
            (0, f"{known[0]} {known[1]}"),              # the query bag
            (1, f"{known[0]} {known[1]}"),              # clean match
            (2, f"{known[0]} {known[1]} OOVX OOVY OOVZ"),  # OOV-padded
            (3, "OOVA OOVB OOVC"),                      # all OOV
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bm25_topk_serve(new_docs, vocab, meta).collect()}
    assert 3 not in out                       # nothing in vocab -> no score
    assert out[1]["n_hit_terms"] == 2 and out[2]["n_hit_terms"] == 2
    assert out[1]["bm25"] > out[2]["bm25"]    # OOV padding dilutes via dl
    assert out[1]["rank"] == 1 and out[2]["rank"] == 2


def test_bm25_served_plan_no_ln_broadcast_vocab(spark, sf_dir):
    """The serve path's point: idf/N/avgdl are READ (no ln anywhere in
    the plan), the frozen vocabulary broadcasts into the term join, and
    nothing degenerates to a cartesian or corpus-vs-corpus shuffle
    join."""
    from crypto_datalake_spark.queries import REGISTRY

    p = plan_text(
        REGISTRY["search_bm25_topk_served"].fn(spark, sf_dir), "simple"
    )
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "LOG(" not in p.upper().replace("CATALOG", "")


def _jdocs(spark, rows):
    return spark.createDataFrame(
        [(i, "en", 50, t) for i, t in rows],
        "doc_id long, lang string, n_chars long, text string",
    )


def test_ngram_jaccard_df_cap_bounds_stop_grams(spark):
    """A bigram shared by a whole block is a stop-gram: it must generate
    NO candidate pairs (the C(df,2) fan-out guard), yet surviving pairs
    must still score TRUE Jaccard with the capped gram counted back in
    via the per-doc capped-gram side array."""
    from crypto_datalake_spark.queries.dedup import ngram_jaccard_pairs

    near_a = "the of s1 s2 s3 s4 s5 s6 s7 s8 x1"  # 10 bigrams
    near_b = "the of s1 s2 s3 s4 s5 s6 s7 s8 x2"  # shares 9 of them
    rows = [(1, near_a), (2, near_b)] + [
        (i, f"the of u{i}a u{i}b") for i in range(3, 203)
    ]  # 200 filler docs whose ONLY shared gram is the stop-gram "the of"
    d = _jdocs(spark, rows)

    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(d, cap=8).collect()}
    # TRUE jaccard 9/11 — inter counts the capped "the of" too (8 rare
    # shared grams via the index + 1 from the capped side array)
    assert set(got) == {(1, 2)}
    assert abs(got[(1, 2)] - 9 / 11) < 1e-12

    # identical result set without the cap: every filler co-occurrence
    # scores 1/(3+3-1) = 0.2 < 0.3, so the cap only removed fan-out
    # (202 posting docs -> C(202,2) = 20301 pair rows), not results
    unc = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(d, cap=10**9).collect()}
    assert unc == got


def test_ngram_jaccard_df_cap_recall_effect(spark):
    """The documented recall loss, exactly: a pair whose ONLY shared
    gram is capped is missed under the cap and found without it."""
    from crypto_datalake_spark.queries.dedup import ngram_jaccard_pairs

    # 2-gram docs sharing just "the of": true jaccard 1/3 >= 0.3
    rows = [(i, f"the of q{i}") for i in range(1, 13)]
    d = _jdocs(spark, rows)
    assert ngram_jaccard_pairs(d, cap=4).count() == 0       # capped: missed
    unc = ngram_jaccard_pairs(d, cap=10**9)
    assert unc.count() == 66                                # C(12,2) found
    assert all(abs(r["jaccard"] - 1 / 3) < 1e-12 for r in unc.collect())


def test_bm25_stop_term_cut_witness(spark):
    """A term in more than _BM25_STOP_DF_PCT% of documents must be cut
    from the postings BEFORE the query fan-out (it scores nothing and
    generates no join rows); below the threshold it scores normally."""
    from crypto_datalake_spark.queries.curation import _tfidf_tf_frame
    from crypto_datalake_spark.queries.retrieval import _bm25_scored

    # doc 0 is the query bag; "zz" sits in 19/20 docs = 95% > 90%
    rows = [(i, "zz " + f"u{i}") for i in range(19)] + [(19, "u19 v19")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    tf = _tfidf_tf_frame(d).localCheckpoint()
    qterms = tf.where(F.col("doc_id") == 0).select(
        F.col("doc_id").alias("qid"), "term"
    )
    # default policy: zz is a stop term, u0 is unique to the query ->
    # nothing scores at all
    assert _bm25_scored(tf, qterms).count() == 0
    # policy disabled: zz scores against the 18 other docs containing it
    got = _bm25_scored(tf, qterms, stop_df_pct=100)
    assert got.count() == 18
    assert all(r["n_hit_terms"] == 1 for r in got.collect())


def test_bm25_stop_term_cut_fires_in_band(spark):
    """The 90%-df stop-term cut on a corpus whose true stopword df is IN
    the 85-95% band (the sf-testdata vocabulary maxes at 0.8N, so the
    driver parity rows never exercise the cut): a term in 92% of
    documents must be cut from scoring — docs sharing ONLY it vanish,
    shared-real-term hits lose one n_hit_term — the DuckDB oracle still
    matches bit-for-bit with the cut firing, and the knob is honest:
    every pct value below the df keeps identical output, every value at
    or above it readmits the stop term."""
    import duckdb

    from crypto_datalake_spark.queries.curation import _tfidf_tf_frame
    from crypto_datalake_spark.queries.retrieval import (
        _bm25_scored,
        _bm25_sql,
        bm25_topk,
    )
    from tests.oracle import compare

    # 25 docs; "the" appears in 23 of them (df = 92%, inside 85-95)
    rows = [
        (0, "the alpha beta"),       # the query bag (0 % 101 == 0)
        (1, "the alpha gamma"),      # shares alpha -> real hit
        (2, "the delta epsilon"),    # shares ONLY the stop term
        (3, "beta zeta the"),        # shares beta -> real hit
    ]
    rows += [(i, f"the filler{i}a filler{i}b") for i in range(4, 23)]
    rows += [(23, "omega psi chi"), (24, "rho sigma tau")]  # no "the"
    d = spark.createDataFrame(rows, "doc_id long, text string")

    got = {r["doc_id"]: r for r in bm25_topk(d).collect()}
    # cut FIRED: only the real-term sharers remain, each with the stop
    # term excluded from its hit count
    assert set(got) == {1, 3}
    assert got[1]["n_hit_terms"] == 1 and got[3]["n_hit_terms"] == 1

    # oracle parity ON the firing corpus (same cut in the SQL)
    con = duckdb.connect()
    con.register(
        "documents", d.toPandas()
    )
    ok, msg = compare(bm25_topk(d), con, _bm25_sql())
    assert ok, msg

    # knob honesty: the cut depends only on (df, pct) — identical output
    # for every pct below the 92% df, stop term readmitted at/above it
    tf = _tfidf_tf_frame(d).localCheckpoint()
    qterms = tf.where(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("qid"), "term"
    )

    def hits(pct):
        return {
            (r["qid"], r["doc_id"]): r["n_hit_terms"]
            for r in _bm25_scored(tf, qterms, stop_df_pct=pct).collect()
        }

    firing = hits(85)
    assert hits(90) == firing and hits(91) == firing
    assert set(firing) == {(0, 1), (0, 3)}
    readmitted = hits(92)
    assert hits(100) == readmitted
    # stop term back in: every "the"-sharing doc scores, counts grow by 1
    assert readmitted[(0, 1)] == 2 and readmitted[(0, 3)] == 2
    assert (0, 2) in readmitted and readmitted[(0, 2)] == 1
    assert len(readmitted) == 22  # docs 1..22 (23/24 share nothing)
