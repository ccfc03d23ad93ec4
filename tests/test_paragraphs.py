"""Paragraph dedup + Bloom incremental membership: keep-first
semantics, reconstruction hashes, Bloom FP-safety/equivalence, and the
broadcast/no-Python plan shape.

Oracle parity for both registered queries is swept by
tests/test_oracle_parity.py; these tests pin semantics the corpus-level
oracle can't isolate (exact span layouts, all-removed docs, forced
Bloom false positives).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from crypto_datalake_spark.queries.paragraphs import (
    bloom_build,
    bloom_candidates,
    bloom_membership,
    doc_spans,
    paragraph_dedup_frame,
    _span_hashes,
)

# 4-token spans keep the fixtures readable
_W = 4


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_spans_last_span_short(spark):
    d = _docs(spark, [(1, "a b c d e f g h i j")])  # 10 tokens, w=4
    sp = {r["span_idx"]: r["span"] for r in doc_spans(d, _W).collect()}
    assert sp == {0: "a b c d", 1: "e f g h", 2: "i j"}


def test_keep_first_within_and_across_docs(spark):
    # doc1 = A B ; doc2 = B C ; doc3 = D D (within-doc repeat)
    a, b, c, dd = "a a a a", "b b b b", "c c c c", "d d d d"
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup_frame(
            _docs(spark, [(1, f"{a} {b}"), (2, f"{b} {c}"), (3, f"{dd} {dd}")]),
            _W,
        ).collect()
    }
    assert out[1]["n_removed_spans"] == 0
    assert out[1]["kept_text_hash"] == _md5(f"{a} {b}")
    assert out[2]["n_removed_spans"] == 1  # B first seen in doc1
    assert out[2]["kept_text_hash"] == _md5(c)
    assert out[3]["n_removed_spans"] == 1  # second D removed, first kept
    assert out[3]["kept_text_hash"] == _md5(dd)
    assert out[2]["removal_ratio"] == 0.5


def test_all_spans_removed_yields_null_hash(spark):
    a = "a a a a"
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup_frame(
            _docs(spark, [(1, a), (2, a)]), _W
        ).collect()
    }
    assert out[1]["kept_text_hash"] == _md5(a)
    assert out[2]["n_removed_spans"] == 1
    assert out[2]["kept_text_hash"] is None


def _membership(spark, existing_rows, incoming_rows):
    ex = _span_hashes(_docs(spark, existing_rows), _W)
    inc = _span_hashes(_docs(spark, incoming_rows), _W)
    bloom = bloom_build(ex.select("h").distinct())
    index = ex.groupBy("h").agg(F.min("doc_id").alias("owner"))
    return {
        r["doc_id"]: r
        for r in bloom_membership(inc, bloom, index).collect()
    }


def test_bloom_membership_equals_exact_join(spark):
    a, b, c = "a a a a", "b b b b", "c c c c"
    out = _membership(
        spark,
        [(1, f"{a} {b}"), (2, b)],
        [(10, f"{a} {c}"), (11, c), (12, b)],
    )
    assert out[10]["n_spans"] == 2 and out[10]["n_known_spans"] == 1
    assert out[10]["matched_doc_id"] == 1 and not out[10]["is_novel"]
    assert out[11]["is_novel"] and out[11]["matched_doc_id"] is None
    assert out[12]["n_known_spans"] == 1 and out[12]["matched_doc_id"] == 1
    assert out[10]["known_ratio"] == 0.5


def test_bloom_false_positive_removed_by_verify(spark):
    # Force guaranteed FPs with a tiny Bloom (m=64: every position lands
    # in one word; with enough existing spans all bits saturate), then
    # assert candidates over-approximate but the verdict stays exact.
    ex_rows = [(i, f"w{i} x y z") for i in range(64)]
    ex = _span_hashes(_docs(spark, ex_rows), _W)
    bloom = bloom_build(ex.select("h").distinct(), m=64, g=2)
    inc = _span_hashes(_docs(spark, [(100, "novel tokens only here")]), _W)
    cand = bloom_candidates(inc.select("h").distinct(), bloom, m=64, g=2)
    assert cand.count() == 1  # saturated Bloom: the novel span IS a FP
    index = ex.groupBy("h").agg(F.min("doc_id").alias("owner"))
    out = bloom_membership(inc, bloom, index, m=64, g=2).collect()
    assert len(out) == 1 and out[0]["is_novel"]  # verify killed the FP


def test_bloom_never_misses_a_member(spark):
    # every existing span queried back must be found (no false negatives)
    ex_rows = [(i, f"t{i} u{i} v w " * 3) for i in range(50)]
    ex = _span_hashes(_docs(spark, ex_rows), _W)
    bloom = bloom_build(ex.select("h").distinct())
    cand = bloom_candidates(ex.select("h").distinct(), bloom)
    assert cand.count() == ex.select("h").distinct().count()


def test_bloom_actually_rejects_on_corpus(spark, sf_dir):
    # the production point: novel spans never reach the index — at the
    # registered params (1 Mbit, g=7, ~1.5k existing spans) the
    # candidate set must be essentially the true-member set
    from crypto_datalake_spark.queries import REGISTRY

    out = REGISTRY["dedup_bloom_incremental"].fn(spark, sf_dir)
    rows = out.collect()
    known = sum(r["n_known_spans"] for r in rows)
    total = sum(r["n_spans"] for r in rows)
    assert known > 0, "testdata must exercise the member arm"
    assert known < total, "testdata must exercise the novel arm"


def test_plan_broadcast_bloom_no_python(spark, sf_dir):
    from crypto_datalake_spark.queries import REGISTRY
    from tests.test_scale_plans import plan_text

    p = plan_text(REGISTRY["dedup_bloom_incremental"].fn(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in p            # bloom + candidates + known
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    p2 = plan_text(REGISTRY["dedup_paragraphs"].fn(spark, sf_dir), "simple")
    assert "BatchEvalPython" not in p2 and "ArrowEvalPython" not in p2
    # one span-value shuffle (window) + one per-doc re-group; spread()
    # may add a round-robin exchange on the single-row-group test file
    assert p2.count("Exchange hashpartitioning") <= 2


def test_scrub_rebuilds_only_cut_docs_and_agrees_with_dedup(spark, sf_dir):
    from crypto_datalake_spark.queries import REGISTRY
    from crypto_datalake_spark.queries.paragraphs import paragraph_scrub_frame

    # synthetic: doc2 loses B, doc3 loses everything, doc1 untouched
    a, b = "a a a a", "b b b b"
    d = _docs(spark, [(1, f"{a} {b}"), (2, f"{b} c c c c"), (3, a)])
    out = {r["doc_id"]: r for r in paragraph_scrub_frame(d, _W).collect()}
    assert 1 not in out, "untouched docs must not be rewritten"
    assert out[2]["new_text"] == "c c c c" and out[2]["n_removed_spans"] == 1
    assert out[3]["new_text"] == "" and out[3]["n_removed_spans"] == 1

    # pair coherence on the corpus: the scrub's rebuilt text hashes to
    # exactly the dedup op's kept_text_hash for every cut doc
    dedup = {
        r["doc_id"]: r
        for r in REGISTRY["dedup_paragraphs"].fn(spark, sf_dir).collect()
    }
    scrub = REGISTRY["scrub_paragraphs"].fn(spark, sf_dir).collect()
    assert scrub, "testdata must contain cut docs"
    for r in scrub:
        want = dedup[r["doc_id"]]
        assert want["n_removed_spans"] == r["n_removed_spans"] > 0
        got_hash = _md5(r["new_text"]) if r["new_text"] else None
        assert got_hash == want["kept_text_hash"]
    cut_ids = {r["doc_id"] for r in scrub}
    assert cut_ids == {
        d for d, r in dedup.items() if r["n_removed_spans"] > 0
    }
