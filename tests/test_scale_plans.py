"""Physical-plan shape assertions — the scale contract.

Correctness tests prove the operators right at small SF; these prove the
*plans* are the ones that survive 100 TB: filters reach the parquet scan,
unused columns never leave it, partition pruning fires on partitioned
lakes, dimension joins broadcast instead of shuffling the fact table, and
the as-of join stays a single sort-shuffle rather than a nested-loop
range join.  A regression here is invisible at sf0.001 and fatal at scale.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from crypto_datalake_spark.queries import REGISTRY


def plan_text(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_scan_pushdown_and_column_pruning(spark, sf_dir):
    p = plan_text(REGISTRY["s1_scan_project_filter"].fn(spark, sf_dir))
    pushed = next(l for l in p.splitlines() if "PushedFilters" in l)
    assert "GreaterThan(l_discount,0.05)" in pushed
    assert "l_shipdate" in pushed  # range predicate reaches the footer stats
    schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    # projection pruning: untouched money columns never leave the scan
    assert "l_tax" not in schema and "l_quantity" not in schema


def test_partition_pruning_on_partitioned_lake(spark, tmp_path):
    lake = str(tmp_path / "lake")
    df = spark.range(0, 1000).select(
        (F.col("id") % 10).alias("day"), F.col("id").alias("v")
    )
    df.write.partitionBy("day").parquet(lake)
    rd = spark.read.parquet(lake).where(F.col("day") == 3)
    p = plan_text(rd)
    pf = next(l for l in p.splitlines() if "PartitionFilters" in l)
    assert "(day" in pf and "3)" in pf  # pruning predicate on the partition col
    assert rd.count() == 100  # 1 of 10 hive partitions survives


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    p = plan_text(REGISTRY["q5_region_revenue"].fn(spark, sf_dir), "simple")
    assert p.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_asof_join_is_single_sort_shuffle(spark, sf_dir):
    # The rejected plan for as-of is a range join (BroadcastNestedLoop /
    # CartesianProduct blowup).  The union+window plan shuffles each union
    # branch once on the by-key and nothing else.
    p = plan_text(REGISTRY["j2_asof_backward_tolerance"].fn(spark, sf_dir), "simple")
    hash_exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+)", p)
    assert len(hash_exchanges) <= 2  # one per union branch, same key
    assert all("user_id" in k for k in hash_exchanges)
    assert "SortMergeJoin" not in p


def test_fact_fact_join_and_agg_codegen(spark, sf_dir):
    p = plan_text(REGISTRY["q1_pricing_summary"].fn(spark, sf_dir), "simple")
    # partial aggregation happens map-side before the single shuffle;
    # keyed-set pin (ADVICE r13 family): reprints of the same exchange
    # must not flip the count, and no non-groupBy-key exchange may appear
    assert p.count("HashAggregate") >= 2
    ex_keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", p))
    assert ex_keys == {"l_returnflag"}, (ex_keys, p)
    # agg pipeline stays inside whole-stage codegen (JVM, no Python boundary)
    pc = plan_text(REGISTRY["q1_pricing_summary"].fn(spark, sf_dir), "codegen")
    assert "WholeStageCodegen subtrees" in pc


def test_q18_preaggregates_before_dimension_join(spark, sf_dir):
    # The HAVING filter must run on the lineitem pre-agg, upstream of the
    # orders/customer joins — at scale it removes ~99% of groups.
    # In simple-mode tree text, parents print before their inputs: the
    # orderkey join must appear BEFORE the HAVING filter and the agg —
    # i.e. filter+agg run upstream (below) the join.
    p = plan_text(REGISTRY["q18_large_volume_orders"].fn(spark, sf_dir), "simple")
    join_pos = p.find("Join [l_orderkey")
    filt = re.search(r"Filter .*total_qty\S* > 300", p)
    agg_pos = p.find("HashAggregate")
    assert join_pos != -1 and filt and agg_pos != -1
    assert join_pos < filt.start() < agg_pos


def test_vocab_topk_is_take_ordered(spark, sf_dir):
    # top-50 over the aggregated vocab must be a TakeOrdered, never a
    # global sort of the exploded token stream
    p = plan_text(REGISTRY["corpus_vocab_stats"].fn(spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in p
    # partial aggregation fires before the token shuffle (map-side combine)
    assert "partial" in p.lower()


def test_declarative_replay_has_no_python(spark, sf_dir):
    # the batch book replay is the declarative path: pure window/agg plan,
    # no Python UDF evaluation anywhere
    p = plan_text(REGISTRY["st3_orderbook_replay"].fn(spark, sf_dir), "simple")
    assert "BatchEvalPython" not in p and "FlatMapGroupsInPandas" not in p
    assert "CartesianProduct" not in p


def test_stratified_sample_single_stratum_shuffle(spark, sf_dir):
    # exact-k per stratum = one hash exchange on the stratum key (plus AQE
    # reads); no join, no extra aggregation exchanges
    p = plan_text(REGISTRY["sample_stratified"].fn(spark, sf_dir), "simple")
    # keyed-set pin (ADVICE r13 family): robust to exchange reprints
    ex_keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", p))
    assert ex_keys == {"lang"}, (ex_keys, p)
    assert "Join" not in p


def test_decontam_benchmark_set_broadcasts(spark, sf_dir):
    # the benchmark gram set is tiny regardless of corpus size: it must
    # broadcast, and the corpus must never co-shuffle with itself
    p = plan_text(REGISTRY["decontam_ngram_overlap"].fn(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # r12 single-pass shape: the hit flag rides the ONE broadcast join
    # into the final groupBy(doc_id) — no shuffled doc-spine join may
    # reappear (the r11 shape paid one, plus two extra md5 gram passes).
    # Pin exactly one broadcast join ON THE GRAM KEY rather than the raw
    # occurrence count — an optimizer/AQE reprint of the same exchange
    # must not flip the test (ADVICE r12)
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    gh_joins = re.findall(r"BroadcastHashJoin \[gh#\d+L?\]", p)
    assert len(gh_joins) == 1, (gh_joins, p)


def test_hard_negatives_plan_broadcast_anchors_no_self_shuffle(spark, sf_dir):
    # the anchor batch (bounded in production: a training batch) must
    # broadcast into the bucket equi-join; the corpus may never
    # self-join, co-shuffle, or cartesian — its only exchange is the
    # per-anchor top-k window, with the rank limit pushed map-side
    p = plan_text(REGISTRY["mine_hard_negatives"].fn(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "WindowGroupLimit" in p
    # keyed pin, not a raw occurrence count (ADVICE r13): optimizer/AQE
    # reprints of the SAME exchange must not flip the test. The set of
    # hash-exchange keys collapses reprints; corpus co-shuffle would
    # surface as a bucket/vec_id key here.
    ex_keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", p))
    assert ex_keys == {"anchor_id"}, (ex_keys, p)


def test_hard_negatives_probe2_union_stays_broadcast_side(spark, sf_dir):
    # the probes=2 variant expands each anchor to (own bucket, flipped
    # lowest-margin bucket) — the expansion (margin window, p1 join,
    # explode) must stay entirely on the bounded anchor side, inside the
    # BroadcastExchange: the corpus still joins ONE BroadcastHashJoin on
    # the bucket key and still never self-joins or co-shuffles; every
    # hash exchange (margin window + top-k) keys on anchor_id only
    p = plan_text(REGISTRY["mine_hard_negatives_probe2"].fn(spark, sf_dir), "simple")
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "WindowGroupLimit" in p
    # the probe union is the explode feeding the broadcast build side
    bx = p.find("BroadcastExchange")
    assert bx != -1 and "Generate explode" in p[bx:], p
    ex_keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", p))
    assert ex_keys == {"anchor_id"}, (ex_keys, p)


def test_repetition_signals_no_pairwise_blowup(spark, sf_dir):
    # explode + groupBy shape: linear in document length, no cross joins,
    # no Python in the plan
    p = plan_text(REGISTRY["quality_repetition_signals"].fn(spark, sf_dir), "simple")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "FlatMapGroupsInPandas" not in p
    assert "partial_count" in p or "partial" in p.lower()  # map-side combine


def test_ann_recall_exact_arm_broadcasts_queries(spark, sf_dir):
    # exact arm = broadcast nested loop of the SAMPLED query set over the
    # corpus scan; lsh arm = broadcast hash join on bucket id. The corpus
    # is never shuffled against itself.
    p = plan_text(REGISTRY["ann_recall_eval"].fn(spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" in p  # cross join with broadcast q
    assert "BroadcastHashJoin" in p       # bucket equi-join, q broadcast
    assert "CartesianProduct" not in p


def test_ivf_pq_plan_no_corpus_shuffle(spark, sf_dir):
    """IVF-PQ's 100 TB contract: the corpus is scanned once, assigned /
    encoded / ADC-scored via per-row folds over broadcast codebooks, and
    reduced by TakeOrdered — it is never hash-repartitioned and never
    sort-merge-joined."""
    from crypto_datalake_spark.queries import REGISTRY

    df = REGISTRY["ann_ivf_pq"].fn(spark, sf_dir)
    plan = plan_text(df, "extended")
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # bounded top-k, no global Sort
    # every hashpartitioning exchange sits on a tiny model-side frame
    # (codebook collect_list, |queries|*K probe window) — none on the
    # corpus columns
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "embedding" not in m.group(1) and "codes" not in m.group(1)


def test_domain_mixture_counts_corpus_once(spark, sf_dir):
    """The mixture sampler's 100 TB contract: exactly two corpus scans
    (the filtered base + one lang-only count), the min-count derived by
    a window over the tiny aggregated frame (never a second count of
    the corpus), and the per-domain rate table broadcast — the corpus
    itself is never hash-shuffled."""
    df = REGISTRY["sample_domain_mixture"].fn(spark, sf_dir)
    plan = plan_text(df, "simple")
    assert plan.count("FileScan parquet") == 2
    assert "BroadcastHashJoin" in plan       # rate table broadcast
    assert "SortMergeJoin" not in plan
    # the one SinglePartition exchange feeds the |domains|-row window,
    # never corpus columns
    assert plan.count("Exchange SinglePartition") == 1
    # count scan reads ONLY the stratum column
    m = re.findall(r"ReadSchema: struct<([^>]*)>", plan_text(df, "formatted"))
    assert any(s == "lang:string" for s in m)


def test_semantic_dedup_join_is_cluster_keyed(spark, sf_dir):
    """SemDeDup's scale contract: the within-cluster pair join is keyed
    on cent_id (broadcast at test SF; a hash join on cent_id at scale),
    never a CartesianProduct, and the checkpointed assignment frame is
    scanned — the argmax fold does not recompute per consumer."""
    df = REGISTRY["dedup_semantic_clusters"].fn(spark, sf_dir)
    plan = plan_text(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Scan ExistingRDD") == 3  # checkpoint reused 3x


def test_chunk_documents_is_shuffle_free_map_pass(spark, sf_dir):
    """chunk_documents claims a pure row-expanding map pass: no Exchange
    beyond the under-parallel-scan spread, no Python evaluation."""
    p = plan_text(REGISTRY["chunk_documents"].fn(spark, sf_dir))
    # the only allowed exchange is spread()'s round-robin repartition of
    # the tiny single-row-group test file; no hash/range exchange ever
    assert "Exchange hashpartitioning" not in p
    assert "Exchange rangepartitioning" not in p
    assert "Python" not in p and "ArrowEval" not in p


def test_tfidf_served_broadcasts_vocab_no_second_pass(spark, sf_dir):
    # the serve path's whole point: the frozen vocabulary BROADCASTS into
    # the term join (never a shuffle join against the corpus stream) and
    # there is no document-frequency recount — the only corpus-size
    # exchanges are the (doc, term) count agg and the per-doc top-k
    # window; no ln() anywhere (idf is read from the persisted fit)
    p = plan_text(REGISTRY["text_tfidf_topk_served"].fn(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert p.count("Exchange hashpartitioning") <= 2
    assert "LOG(" not in p.upper().replace("CATALOG", "")


def test_bm25_plan_topk_pushdown_and_bounded_exchanges(spark, sf_dir):
    # the retrieval plan's load-bearing shapes: the per-query top-k is
    # group-limited BEFORE the window shuffle (WindowGroupLimit partial),
    # every join is hash/broadcast (no sort-merge of the fanned-out
    # posting stream at this SF, no cartesian), and the exchange budget
    # stays at 5 (df agg, per-doc + global stats, score agg, topk window)
    # — a 6th exchange means someone re-derived corpus stats per consumer
    p = plan_text(REGISTRY["search_bm25_topk"].fn(spark, sf_dir), "simple")
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p
    assert p.count("Exchange hashpartitioning") <= 5


def test_bm25_fast_plan_no_decimal_same_shape(spark, sf_dir):
    # the production path (VERDICT r13 item 2) must keep the exact plan
    # shape of search_bm25_topk — same exchange budget, group-limited
    # top-k, no cartesian — while carrying ZERO decimal arithmetic
    # anywhere (the measured ~2x tax is entirely the decimal ops; a
    # decimal reappearing here silently re-pays it)
    p = plan_text(REGISTRY["search_bm25_topk_fast"].fn(spark, sf_dir), "simple")
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p
    assert p.count("Exchange hashpartitioning") <= 5
    assert "decimal" not in p.lower(), p
    # the bit-stable sibling DOES pay decimals — the knob is real
    pb = plan_text(REGISTRY["search_bm25_topk"].fn(spark, sf_dir), "simple")
    assert "decimal" in pb.lower()


def test_lm_fast_plan_no_decimal(spark, sf_dir):
    # the LM production twin must carry zero decimal arithmetic while
    # the bit-stable sibling pays it (same knob discipline as BM25).
    # The registered queries localCheckpoint the scoring frame (the
    # final plan prints only "Scan ExistingRDD"), so the pin targets
    # the scoring stage itself, un-checkpointed.
    from crypto_datalake_spark.queries import curation as C
    from crypto_datalake_spark.queries.common import t as load

    d = load(spark, sf_dir, "documents")
    ex = C._lm_exploded(d, checkpoint=False)
    bg = ex.where(F.col("w2").isNotNull())
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = ex.agg(F.countDistinct("w1").alias("vocab"))
    p_fast = plan_text(
        C._lm_doc_scores(bg, c12, c1, vocab, checkpoint=False, decimal_costs=False),
        "simple",
    )
    assert "decimal" not in p_fast.lower(), p_fast
    assert "CartesianProduct" not in p_fast and "BatchEvalPython" not in p_fast
    p_dec = plan_text(
        C._lm_doc_scores(bg, c12, c1, vocab, checkpoint=False), "simple"
    )
    assert "decimal" in p_dec.lower()


def test_aqe_splits_hot_key_join(spark):
    """SCALE.md leans on 'AQE skew territory' for hot-key joins; this
    MEASURES it under the session's own knobs (adaptive + skewJoin
    enabled in session.get_spark): a 90%-hot-key fact joined to a
    per-key dim as a forced sort-merge join gets its hot partition
    SPLIT — the final adaptive plan marks SortMergeJoin(skew=true).

    Two real-world conditions are pinned because each silently disables
    the split: (a) the dim must not broadcast (skew handling only
    applies to shuffled joins — broadcast is AQE's own better answer
    when the dim fits), and (b) the join output must not feed an
    aggregation on the SAME key — splitting a partition breaks that
    downstream distribution requirement, so AQE refuses (the negative
    arm below). At 100 TB that means: let hot aggregations re-shuffle
    after a skewed join rather than pinning them to the join key."""
    conf = spark.conf
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
    ]
    saved = {k: conf.get(k, None) for k in keys}
    try:
        conf.set(keys[0], "-1")       # force SMJ: the skewed-join regime
        conf.set(keys[1], "-1")
        conf.set(keys[2], "65536")    # test-sized thresholds (defaults
        conf.set(keys[3], "262144")   # need a 256 MB hot partition)
        n_hot, n_cold, n_keys = 300_000, 30_000, 300
        # md5 payload defeats shuffle compression so partition bytes
        # track rows; 90% of rows land on key 0
        fact = spark.range(n_hot + n_cold).select(
            F.when(F.col("id") < n_hot, F.lit(0))
            .otherwise(F.col("id") % n_keys)
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        dim = spark.range(n_keys).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        j = fact.join(dim, "k").agg(
            F.sum(F.length("payload") + F.col("w")).alias("s")
        )
        (total,) = j.collect()[0]
        assert total > 0
        p = plan_text(j)
        assert "isFinalPlan=true" in p
        assert "SortMergeJoin(skew=true)" in p, p[:2000]

        # negative arm: a same-key aggregate downstream reuses the join
        # partitioning, so AQE must NOT split (splitting would violate
        # the aggregate's required distribution) — correct, and the
        # reason skew-sensitive pipelines re-shuffle after the join
        g = fact.join(dim, "k").groupBy("k").agg(F.count(F.lit(1)).alias("c"))
        g.collect()
        pg = plan_text(g)
        assert "isFinalPlan=true" in pg
        assert "SortMergeJoin(skew=true)" not in pg
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_ann_ivf_pca_plan_is_broadcast_fold(spark, sf_dir):
    """The PCA-space IVF composition must keep the ANN family's plan
    contract: projection + cell assignment are per-row folds over
    broadcast literals/centroids (the corpus NEVER hash-shuffles), the
    probe and re-rank sides broadcast, and no Python reaches the plan —
    at 100 TB the whole query is one map pass over the corpus plus a
    top-k."""
    p = plan_text(REGISTRY["ann_ivf_pca"].fn(spark, sf_dir))
    assert "SortMergeJoin" not in p
    assert "Exchange hashpartitioning" not in p   # no corpus shuffle
    assert "BatchEvalPython" not in p             # no Python in the plan
    assert "BroadcastExchange" in p               # centroids/query broadcast


def test_segment_tagging_is_broadcast_map_side(spark, sf_dir):
    # the segmented replay's phase-1 input: seg ids must come from a
    # broadcast of the tiny per-symbol snapshot-key table evaluated
    # map-side over the event scan -- NEVER a per-symbol Window running
    # sum, which would sort each symbol's whole history in one task
    # (few hot symbols = the whole store on a handful of cores).
    # Since round 11 the lookup is a vectorized searchsorted inside
    # mapInPandas (the interpreted higher-order-function filter was
    # O(events x snapshots) and 60% of the query's sf1 wall-clock); the
    # contract stays: the event side is never hash-shuffled and never
    # windowed -- the tag is one map pass.
    from crypto_datalake_spark.queries.streaming_q import synth_depth_events
    from crypto_datalake_spark.streaming.orderbook import _tag_segments

    tagged = _tag_segments(synth_depth_events(spark, sf_dir))
    p = plan_text(tagged, "simple")
    assert "Window" not in p
    assert "MapInPandas" in p
    # the event side must reach the tag unshuffled (the snapshot-key
    # table is a separate column-pruned collect, not a join)
    assert "Exchange hashpartitioning" not in p
