"""Registry-wide plan audit, enforced.

SCALE.md's "Registry plan audit" section was a manually-swept claim;
this test makes it a gate: EVERY registered query's physical plan is
built at the driver SF and checked for the two anti-patterns that
silently kill a 100-TB run — Python evaluation outside the designed
pandas-UDF tier, and Cartesian products.  A new query that reaches for
a row-at-a-time UDF or an accidental cross join fails here by name.
"""

from __future__ import annotations

from crypto_datalake_spark.queries import REGISTRY

# The designed Python tier: sequential recurrences and opaque binary
# decode, each justified in SCALE.md and implemented as Arrow-batched
# mapInPandas (never row-at-a-time).  Growing this list is a deliberate
# design decision, not a fix for a red test.
DESIGNED_PYTHON = {
    "u1_ema",                    # EMA recurrence (functions/ema.py)
    "multimodal_feature_extract",  # binary decode (functions/multimodal.py)
    "multimodal_decode_roundtrip",  # REAL wav/bmp codecs (same module)
    "dedup_exact_substring",     # Karp-Rabin grams (functions/rollinghash.py)
    "scrub_exact_substrings",    # same run finder under the scrub policy
    "dedup_embedding_cosine",    # per-cell pairwise numpy scorer (r14):
    # O(rows·d) Arrow bytes per cell instead of O(pairs·d) JVM HOF folds;
    # bit-exact left-fold emulation pinned in test_ann.py
    # BM25 numpy scatter-add scorer (r14 §15): the |q|×|postings|
    # fan-out aggregated map-side on exact unscaled longs — bit-exact
    # vs the decimal join plan (test_scale_ops), join fallback above
    # the query-bag broadcast cap (search_hybrid_rrf's single-query
    # sparse arm deliberately stays on the join — see bm25_topk)
    "search_bm25_topk",
    "search_bm25_topk_served",
    # DSIR bucket counting (r15): per-doc hashed-feature bucket counts
    # computed map-side in one Arrow pass (the BM25 precedent) — the
    # occurrence-grain explode never materializes; md5/tokenize parity
    # vs the JVM expression twin pinned in test_scale_ops
    "sample_dsir",
    "sample_dsir_served",
}
# Designed-Python members whose Arrow stage sits BEHIND an eager
# localCheckpoint, so the registered plan shows Scan ExistingRDD rather
# than the Python node — the "actually IS Python-backed" back-check
# below cannot see them; their Python tier is pinned by dedicated tests
# instead (sample_dsir: test_dsir_bucket_counts_match_exploded_grain).
_PYTHON_BEHIND_CHECKPOINT = {"sample_dsir"}
# orderbook_segmented_replay is ALSO designed-Python (the stateful fold
# under applyInPandas, segment-parallel) but runs its phases eagerly
# inside the registry fn and returns a driver-built frame, so this plan
# check cannot see it; its Python tier is pinned by the segmented test
# family in test_streaming.py instead.

_PY_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "PythonMapInArrow",
)


def test_registry_plans_python_and_cartesian(spark, sf_dir):
    offenders, cartesian, failures = {}, [], []
    for name, q in REGISTRY.items():
        try:
            df = q.fn(spark, sf_dir)
            p = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("simple")
            )
        except Exception as e:  # noqa: BLE001 — collect, report by name
            failures.append((name, repr(e)[:120]))
            continue
        hits = [n for n in _PY_NODES if n in p]
        if hits and name not in DESIGNED_PYTHON:
            offenders[name] = hits
        if "CartesianProduct" in p:
            cartesian.append(name)
    assert not failures, failures
    assert not offenders, f"undesigned Python in plans: {offenders}"
    assert not cartesian, f"CartesianProduct in plans: {cartesian}"
    # the designed tier actually IS Python-backed (a silent rewrite to a
    # broken JVM path would otherwise pass the checks above)
    for name in DESIGNED_PYTHON - _PYTHON_BEHIND_CHECKPOINT:
        p = REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution(
        ).explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("simple")
        )
        assert any(n in p for n in _PY_NODES), name
