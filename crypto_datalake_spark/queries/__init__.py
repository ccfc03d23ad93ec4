"""Driver-facing query catalog.

Importing this package populates the registry from every query module,
then re-orders it so the driver's correctness sweep lands on the right
queries: the driver oracle-checks the FIRST 50 registered queries, so
the window below is curated to cover every SURVEY.md §2 operator family
(S/P/J/A/W/O/U/ST/derived) plus every LLM-training-data-pipeline
operator — one canonical oracle-checked query per operator row, as
mapped in COVERAGE.md.

Queries after the window remain fully registered and callable (the
TPC-H-shape suite, the à-la-carte variants of fused scans, extras);
they are pytest-verified against the same DuckDB oracles in
tests/test_oracle_parity.py, which sweeps ALL registry entries.
"""

from crypto_datalake_spark.queries import (  # noqa: F401  (registration side-effects)
    aggs,
    core,
    curation,
    dedup,
    derived,
    features_q,
    joins,
    layout_q,
    llm,
    paragraphs,
    pca,
    pipeline_q,
    product_analytics,
    retrieval,
    scrub,
    streaming_q,
    tokenizer,
    tokenizer_unigram,
    tpch,
    windows,
)
from crypto_datalake_spark.queries.registry import (  # noqa: F401
    REGISTRY,
    oracle_sql,
    queries,
)

# The driver's 50-query correctness window, one entry per SURVEY.md §2 /
# LLM-pipeline operator row (see COVERAGE.md for the op -> query map).
#
# Round-7 membership decisions: TWO swaps from the round-4 curation.
# Swap 1 — ann_lsh_multiprobe out, quality_lm_perplexity in.  The round-6
# net-zero analysis (every swap demotes one driver-green row to
# pytest-only) predated perplexity's FULL static oracle; with it, the
# swap promotes the heaviest LLM-pipeline operator (CCNet quality
# tiers: corpus-trained bigram LM, decimal-summed NLL, two-phase
# tercile rank) into the driver's own sweep while ann_lsh_multiprobe —
# whose full oracle is unchanged — stays bit-swept by
# tests/test_oracle_parity.py and benched (its machinery also supersets
# ann_lsh_bucketed's, and the ANN family keeps two driver rows via
# ann_cosine_topk / ann_ivf_probe).  All other round-5/6/7 additions
# remain outside: full-oracle ones are pytest-swept (sample_domain_
# mixture, text_tfidf_topk[_served], quality_lm_perplexity_unk/_served,
# exact-substring pair, shards, recall evals, text_normalize), and the
# iterative ML fits are surrogate-oracled plus invariant-tested in
# tests/test_ann.py (ann_ivf_kmeans, ann_ivf_pq, dedup_semantic_
# clusters, quality_score_classifier).
# Late-r7 additions (curation_pipeline, dedup_paragraphs,
# dedup_bloom_incremental) stay OUTSIDE the window by decision: each
# swap demotes a driver-green row to pytest-only, and all three are
# compositions/servings of stages whose canonical operators already
# hold driver rows (normalize/exact-dedup/quality/packing for the
# pipeline; span hashing + membership join for the paragraph pair) —
# their full static oracles are bit-swept by tests/test_oracle_parity.py
# and benched — the same evidence tier as the other served/composed
# variants outside the window.
# Swap 2 (r7 session 3) — ann_cosine_topk out, search_bm25_topk in:
# promotes the new lexical-retrieval family (full static oracle, the
# sparse half of the hybrid-RRF stack) into the driver sweep; the ANN
# family keeps a driver row via ann_ivf_probe, and ann_cosine_topk —
# oracle unchanged — stays bit-swept by tests/test_oracle_parity.py
# and benched.  search_bm25_topk_served / search_hybrid_rrf follow the
# served/composition convention and stay pytest-swept.
_WINDOW = [
    # §2.1 scans / §2.2 projections-predicates
    "s1_scan_project_filter",   # S1 + P1/P2 (pushdown-proven)
    "s3_minmax_scan",           # S3
    "s13_sql_view",             # S13
    "p3_conditional_class",     # P3
    "p7_dq_duplicate_keys",     # P7
    "p8_partition_audit",       # P8
    # §2.3 joins
    "j1_spine_left_join",       # J1 + P4
    "j2_asof_backward_tolerance",  # J2
    "j4_asof_at_close",         # J4
    "j5_asof_max_age",          # J5
    "j6_exact_asof_fallback",   # J6
    "j7_anti_join_gaps",        # J7
    "j8_overlay_coalesce",      # J8 + S6 + ST12
    "j9_union_dedup_priority",  # J9
    "j10_dedup_keep_last",      # J10 + A3
    # §2.4 aggregations
    "a1_minute_trade_rollup",   # A1
    "a2_mean_last_rollup",      # A2
    "a4_htf_bucket_agg",        # A4 (flagship)
    "a6_weighted_avg_fallback", # A5 (wavg_value) + A6 (wavg_or_mean)
    "a7_ratio_of_sums",         # A7
    "a8_p95_nearest_rank",      # A8 + W7
    "a9_ohlc_complete_only",    # A9 + P5
    "a10_bucket_completeness",  # A10
    # §2.5 windows
    "w1_log_return",            # W1
    "w2_realized_vol",          # W2
    "w3_lag_delta",             # W3
    "w5_ffill_limited",         # W5
    "w6_topk_recent",           # W6
    # §2.6 ordering / set ops / §2.7+§2.9+§2.10
    "o1_sort_rank_nulls_last",  # O1
    "o2_union_relaxed",         # O2
    "o3_gaps_islands",          # O3
    "u1_ema",                   # U1/U3
    "u2_traditional_pivots",    # U2
    "u6_calendar_buckets",      # U6 + §2.7 scalars
    "d1_derived_fields",        # §2.10 derived-field block
    # §2.8 streaming
    "st2_streaming_minute_agg", # ST1/ST2/ST6/ST7 (real streaming query)
    "st3_orderbook_replay",     # ST3/ST4/ST5 (stateful fold, SQL oracle)
    # LLM training-data pipeline (BASELINE.json north star)
    "dedup_exact_hash",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "doc_fingerprints",         # SimHash + rolling hash, one scan
    "dedup_embedding_cosine",
    "search_bm25_topk",         # lexical retrieval (full static oracle)
    "quality_lm_perplexity",    # CCNet LM tiers (full static oracle)
    "ann_ivf_probe",
    "text_profile",             # lang-ID + token stats + quality, one scan
    "multimodal_feature_extract",
    # round-10 window rotation (COVERAGE.md): three r7-r9 operators with
    # full-strength oracles replace in-window machinery duplicates
    # (j3 = J2's degenerate case, a11 = P7's shape, w4 = the w1/w2/w3
    # window machinery); the rotated-out entries stay registered after
    # the window and bit-swept by test_oracle_parity.py
    "dedup_paragraphs",         # CCNet paragraph dedup (static oracle)
    "curation_pipeline",        # composed curation + ledger (static oracle)
    "tokenize_bpe",             # fitted-BPE serving (surrogate oracle)
]

_missing = [n for n in _WINDOW if n not in REGISTRY]
assert not _missing, f"window names not registered: {_missing}"
assert len(_WINDOW) == len(set(_WINDOW)) == 50, len(_WINDOW)

_tail = [n for n in REGISTRY if n not in set(_WINDOW)]
_ordered = {n: REGISTRY[n] for n in [*_WINDOW, *_tail]}
REGISTRY.clear()
REGISTRY.update(_ordered)
