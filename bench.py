#!/usr/bin/env python
"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is fully evaluated through the ``noop`` write sink — every
partition is computed and materialised executor-side, nothing is shipped
to the driver, so timings measure the engine (scan/shuffle/agg), not
driver-collect serialization of wide results.
A warmup run of the smallest query amortises JVM/session startup out of
the per-query numbers; total excludes warmup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crypto_datalake_spark.queries import REGISTRY  # noqa: E402
from crypto_datalake_spark.session import get_spark  # noqa: E402

# Benched queries are verified before they are timed — a benchmark on an
# unverified query proves nothing. Most sit inside the driver's 50-query
# correctness window (queries/__init__.py _WINDOW) and carry an
# oracle-green CORRECTNESS row; the exceptions (ann_lsh_bucketed — whose
# machinery the windowed multiprobe variant supersets — and the
# trained-codebook ann_ivf_kmeans / ann_ivf_pq, whose KMeans fits are
# non-SQL-expressible, and quality_score_classifier /
# dedup_semantic_clusters, whose MLlib fits likewise are) are
# pytest-verified instead: oracle-parity sweep plus recall/monotonicity/
# determinism/witness bounds in tests/test_ann.py. text_tfidf_topk and
# quality_lm_perplexity (round-6 additions, window already full) carry
# full DuckDB oracles swept bit-exact by the same parity suite plus
# witness tests in tests/test_scale_ops.py. The TPC-H shapes
# benched in r01 (q1/q17/q19/q21/...) rotated out with the window
# curation; they remain registered and pytest-oracle-checked, runnable
# via REGISTRY[name].
BENCH_QUERIES = [
    # headline mix: scan-agg, joins, as-of, windows, dedup, similarity
    "s1_scan_project_filter",
    "a1_minute_trade_rollup",
    "a2_mean_last_rollup",
    "a4_htf_bucket_agg",
    "a7_ratio_of_sums",
    "a8_p95_nearest_rank",
    "a9_ohlc_complete_only",
    "j1_spine_left_join",
    "j2_asof_backward_tolerance",
    "j6_exact_asof_fallback",
    "j8_overlay_coalesce",
    "j9_union_dedup_priority",
    "j10_dedup_keep_last",
    "w1_log_return",
    "w2_realized_vol",
    "w4_cumsum",
    "w5_ffill_limited",
    "w6_topk_recent",
    "o3_gaps_islands",
    "u1_ema",
    "d1_derived_fields",
    "dedup_exact_hash",
    "dedup_exact_substring",
    "scrub_exact_substrings",
    "dedup_minhash_lsh",
    "dedup_paragraphs",              # CCNet span keep-first (full oracle)
    "scrub_paragraphs",              # rewrite twin, churn-sized output
    "dedup_bloom_incremental",       # persisted Bloom + span index serve
    "layout_zorder_key",             # Morton key, no shuffle (full oracle)
    "sample_domain_mixture",
    "sample_dsir",                   # DSIR importance resample (full oracle)
    "sample_dsir_served",            # frozen-fit scoring, broadcast-only
    "sample_temperature_mixture",    # XLM-R T=2 temperature sampling
    "sample_token_budget_plan",      # token-budget data recipe (full oracle)
    "dedup_ngram_jaccard",
    "decontam_ngram_overlap",  # benchmark decontamination (bcast probe)
    "doc_fingerprints",
    "text_profile",
    "text_tfidf_topk",
    "search_bm25_topk",              # lexical retrieval (full oracle)
    "search_bm25_topk_fast",         # production double-scoring plan (full oracle)
    "quality_lm_perplexity_fast",    # production LM scoring plan (full oracle)
    "search_bm25_topk_served",       # persisted-corpus-stats serve
    "search_hybrid_rrf",             # BM25 + LSH-ANN fusion (full oracle)
    "text_tfidf_topk_served",        # persisted-vocab serve
    "tokenize_bpe",                  # persisted-BPE-fit serve (surrogate oracle)
    "tokenize_unigram",              # persisted Viterbi-EM fit serve + exact LL
    "curation_pipeline",             # normalize→dedup→quality→pack (full oracle)
    "quality_lm_perplexity",
    "quality_lm_perplexity_served",  # persisted-fit serve: 2.7 -> 0.7 s
    "quality_lm_perplexity_unk",     # bounded-vocab fit (full oracle)
    "quality_lm_perplexity_unk_served",  # bounded persisted-fit serve
    "shuffle_export_shards",
    "quality_score_classifier",
    "embedding_pca_project",         # codegen'd projection, persisted eigenfit
    "dedup_embedding_cosine",
    "dedup_semantic_clusters",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "ann_lsh_multiprobe",
    "ann_ivf_probe",
    "ann_ivf_kmeans",
    "ann_ivf_pq",
    "ann_ivf_pca",                   # probe in PCA space, full-dim re-rank
    "mine_hard_negatives",           # contrastive hard-negative mining (full oracle)
    "mine_hard_negatives_probe2",    # multi-probe recall variant (full oracle)
    "dq_expectations",               # one-scan declarative DQ rule gate
    "feature_quantile_bins",         # exact nearest-rank discretization
    "feature_target_encode",         # leave-one-out categorical encoding
    "funnel_conversion",             # one-shuffle ordered-funnel walk
    "retention_cohorts",             # signup-cohort weekly retention
    "multimodal_decode_roundtrip",  # REAL wav/bmp codec round-trip
    "st2_streaming_minute_agg",
    "st3_orderbook_replay",
    "orderbook_segmented_replay",
    "st11_session_windows",  # ST11 stateful sessionization (SQL oracle)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    spark = get_spark("cds-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM codegen + file-listing/footer caches for every table
    from crypto_datalake_spark.io import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).collect()
    REGISTRY["s3_minmax_scan"].fn(spark, sf_dir).collect()
    # spawn the Python worker pool (pandas import per worker) so the first
    # Arrow-batched query doesn't absorb the one-time pool startup — the
    # same fixed-overhead class as the JVM/codegen warmup above
    spark.range(0, int(cpus), 1, int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    # best-of-N (default 3): a single timing conflates steady-state engine
    # cost with one-shot codegen and transient host contention; the min is
    # the standard steady-state estimator (JMH-style) and keeps round-to-
    # round comparisons meaningful on shared hardware.  N=3 (was 2)
    # because Spark 4's per-query first run pays noticeably more codegen/
    # AQE warmup than 3.5 did — measured on the window-heavy queries:
    # run1 is 1.5-3x the converged time and run2 still carries tail
    # effects, so min-of-2 over-reported several queries by 1.2-1.6x
    # while an ANSI on/off A/B showed zero plan or expression-cost
    # difference.  min-of-3 converges on the number the engine actually
    # sustains.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        q = REGISTRY[name]
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    total = round(sum(timings.values()), 4)

    payload = {
        "metric": "headline-query wall time (%d queries, local[%s])"
        % (len(BENCH_QUERIES), cpus),
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # methodology: per-query min of N full evaluations (noop
        # sink). The min is the steady-state estimator — single
        # runs alias codegen/AQE warmup and host contention as
        # regressions (r6 showed +25-31% single-run noise on
        # sub-second queries whose plans were unchanged).
        "runs_per_query": runs,
        "timing": "min",
    }
    # Full-fidelity sidecar: the capture downstream of stdout keeps only
    # a bounded tail, so the authoritative record lives in a file the
    # line can never outgrow (r7's 64-query line exceeded the tail and
    # arrived truncated).
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    # Printed line: required keys only (metric/value/unit/queries/sf),
    # compact separators, per-query precision degraded just enough to
    # fit a 1980-char budget — the capture downstream keeps a 2000-char
    # stdout tail and stage-noise may precede the line. Methodology
    # keys ride in the sidecar.
    line = ""
    for nd in (4, 3, 2, 1):
        compact = {
            "metric": "wall time (%dq, local[%s], min-of-%d)"
            % (len(BENCH_QUERIES), cpus, runs),
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, nd) for k, v in timings.items()},
            "sf": sf,
        }
        line = json.dumps(compact, separators=(",", ":"))
        if len(line) <= 1980:
            break
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
