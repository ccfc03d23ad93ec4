"""Composed curation pipeline: disposition semantics, dedup-vs-quality
precedence, kept-only packing, and the no-join plan shape.

Oracle parity for the registered query is swept by
tests/test_oracle_parity.py; these tests pin the composition rules the
oracle alone can't isolate (the synthetic corpus has no duplicates, so
the dedup arm is exercised here with injected variants).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_datalake_spark.queries.pipeline_q import (
    _CP_BUDGET,
    curation_pipeline_frame,
)

# a kept-quality body: >= 24 tokens, >= 2% stopwords
_GOOD = "the quick value of a table scan and the hash join is " * 3
_BAD_SHORT = "tiny doc"
_BAD_SOUP = "xx yy zz " * 12  # long enough, zero stopwords


def _run(spark, rows):
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    return {r["doc_id"]: r for r in curation_pipeline_frame(d).collect()}


def test_dedup_catches_normalized_variants_and_wins_precedence(spark):
    out = _run(
        spark,
        [
            (1, "a", _GOOD),
            (2, "a", _GOOD.upper()),          # case variant -> same hash
            (3, "a", "  " + _GOOD + "  "),    # whitespace variant
            (4, "a", _BAD_SOUP),
            (5, "a", _BAD_SOUP + " "),        # dup of a QUALITY-dropped doc
        ],
    )
    assert out[1]["disposition"] == "kept"
    for dup in (2, 3):
        assert out[dup]["disposition"] == "dropped_dedup"
        assert out[dup]["canonical_doc_id"] == 1
        assert out[dup]["pack_id"] is None and out[dup]["pack_offset"] is None
    # the canonical copy of a low-quality group still quality-drops,
    # but its duplicate is dedup-dropped (dedup wins precedence)
    assert out[4]["disposition"] == "dropped_quality"
    assert out[4]["canonical_doc_id"] is None
    assert out[5]["disposition"] == "dropped_dedup"
    assert out[5]["canonical_doc_id"] == 4


def test_packing_counts_only_kept_docs(spark):
    out = _run(
        spark,
        [
            (10, "a", _GOOD),
            (11, "a", _BAD_SHORT),   # dropped: must not advance the pack
            (12, "a", _GOOD + " extra"),
            # separate source stream; distinct body (content dedup is
            # GLOBAL across sources, so reusing _GOOD would dedup-drop)
            (20, "b", "a " + _GOOD),
        ],
    )
    assert out[10]["pack_id"] == 0 and out[10]["pack_offset"] == 0
    assert out[11]["pack_id"] is None
    # doc 12 starts exactly where doc 10's tokens end (11 skipped)
    n10 = out[10]["n_tokens"]
    assert out[12]["pack_id"] == n10 // _CP_BUDGET
    assert out[12]["pack_offset"] == n10 % _CP_BUDGET
    # streams pack independently
    assert out[20]["pack_id"] == 0 and out[20]["pack_offset"] == 0


def test_corpus_ledger_invariants(spark, sf_dir):
    from crypto_datalake_spark.queries import REGISTRY

    df = REGISTRY["curation_pipeline"].fn(spark, sf_dir)
    rows = df.collect()
    docs = {r["doc_id"] for r in rows}
    assert len(rows) == len(docs), "one ledger row per input doc"
    kept = [r for r in rows if r["disposition"] == "kept"]
    assert kept, "gate must keep something"
    assert any(r["disposition"] != "kept" for r in rows), "gate must drop something"
    for r in rows:
        if r["disposition"] == "kept":
            assert 0 <= r["pack_offset"] < _CP_BUDGET
            assert r["pack_id"] >= 0 and r["canonical_doc_id"] is None
        else:
            assert r["pack_id"] is None and r["pack_offset"] is None
    # per-source: pack positions strictly increase with doc_id over kept
    bysrc: dict = {}
    for r in sorted(kept, key=lambda r: (r["source"], r["doc_id"])):
        pos = r["pack_id"] * _CP_BUDGET + r["pack_offset"]
        prev = bysrc.get(r["source"])
        if prev is not None:
            prev_pos, prev_ntok = prev
            assert pos == prev_pos + prev_ntok
        else:
            assert pos == 0
        bysrc[r["source"]] = (pos, r["n_tokens"])


def test_pipeline_plan_no_join_no_python(spark, sf_dir):
    from crypto_datalake_spark.queries import REGISTRY
    from tests.test_scale_plans import plan_text

    p = plan_text(REGISTRY["curation_pipeline"].fn(spark, sf_dir), "simple")
    # composition is window + conditional prefix: no split-and-rejoin
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # hash-dedup window shuffle + two-phase prefix machinery; a higher
    # count means a stage re-derived something it should have reused
    assert p.count("Exchange hashpartitioning") <= 4
