"""BPE tokenizer family: fit semantics, encode/training consistency,
roundtrip invariants, OOV serving, and the serve-plan shape.

Oracle parity for the registered ``tokenize_bpe`` query is swept by
tests/test_oracle_parity.py like every other registry entry; these
tests pin the algorithm itself.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from crypto_datalake_spark.queries.tokenizer import (
    bpe_model_tables,
    encode_word,
    learn_bpe,
    tokenize_bpe_frame,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_learn_bpe_sennrich_example():
    """The canonical corpus from Sennrich et al. 2016 (no end-of-word
    marker): 'es' (9) wins the first merge over the 'st' tie by the
    lexicographic tie-break, 'est' follows, then the 7-count 'lo'."""
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges, final = learn_bpe(wc, n_merges=3)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o")]
    assert final[("lo", "w")] == 5
    assert final[("n", "e", "w", "est")] == 6


def test_learn_bpe_stops_below_count_two():
    # every pair unique -> memorizing it would be noise; no merges
    merges, final = learn_bpe([("abc", 1), ("def", 1)], n_merges=10)
    assert merges == []
    assert set(final) == {("a", "b", "c"), ("d", "e", "f")}


def test_encode_matches_training_state_on_corpus(spark, sf_dir):
    """The greedy min-rank encoder must reproduce the training
    segmentation for every training word — corpus-wide, small merge
    budget so words genuinely stay multi-token."""
    from crypto_datalake_spark.queries.tokenizer import _bpe_word_count_rows

    rows = _bpe_word_count_rows(spark, SF_SMALL, 65536)
    merges, final = learn_bpe(rows, n_merges=12)
    assert merges, "corpus should yield merges"
    ranks = {p: i for i, p in enumerate(merges)}
    multi = 0
    for sym in final:
        word = "".join(sym)  # roundtrip: tokens concat to the word
        assert tuple(encode_word(word, ranks)) == sym
        multi += len(sym) > 1
    assert multi > 0, "merge budget left no multi-token words to check"


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.text("ab", min_size=1, max_size=8), st.integers(1, 9)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    st.integers(0, 16),
)
def test_bpe_properties_random(wc, n_merges):
    """On adversarial two-letter corpora (overlap-heavy): roundtrip,
    encode/training consistency, merge-table determinism, and fused
    tokens concatenating their parts."""
    merges, final = learn_bpe(wc, n_merges)
    merges2, final2 = learn_bpe(wc, n_merges)
    assert merges == merges2 and final == final2
    ranks = {p: i for i, p in enumerate(merges)}
    words = {w for w, _ in wc if w}
    got = {"".join(sym) for sym in final}
    assert got == words
    for sym in final:
        assert tuple(encode_word("".join(sym), ranks)) == sym


def test_serve_oov_fallback_and_checksums(spark, sf_dir):
    _, _, word_tokens = bpe_model_tables(spark, sf_dir)
    fitted = word_tokens.limit(1).collect()[0]
    d = spark.createDataFrame(
        [
            (1, f"{fitted['word']} {fitted['word']} zzqqxx"),
            (2, "zzqqxx"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tokenize_bpe_frame(d, word_tokens).collect()}
    r1, r2 = out[1], out[2]
    assert r1["n_words"] == 3 and r1["n_oov_words"] == 1
    # OOV word falls back to its character count; fitted words use the map
    assert r1["n_tokens"] == 2 * fitted["n_tokens"] + len("zzqqxx")
    assert r1["token_id_sum"] == 2 * fitted["id_possum"]
    assert r2["n_oov_words"] == 1 and r2["n_tokens"] == len("zzqqxx")
    assert r2["token_id_sum"] == 0


def test_vocab_ids_dense_and_words_reconstruct(spark, sf_dir):
    merges, vocab, word_tokens = bpe_model_tables(spark, sf_dir)
    ids = [r["token_id"] for r in vocab.orderBy("token_id").collect()]
    assert ids == list(range(1, len(ids) + 1))
    for r in word_tokens.collect():
        toks = r["tokens_str"].split(" ")
        assert "".join(toks) == r["word"]
        assert len(toks) == r["n_tokens"]
    # merge table ranks are dense from 0
    mr = [r["rank"] for r in merges.orderBy("rank").collect()]
    assert mr == list(range(len(mr)))


def test_serve_plan_one_broadcast_join_no_python(spark, sf_dir):
    from crypto_datalake_spark.queries import REGISTRY
    from tests.test_scale_plans import plan_text

    df = REGISTRY["tokenize_bpe"].fn(spark, sf_dir)
    p = plan_text(df, "simple")
    # pin the ONE broadcast join ON THE WORD KEY, not a raw occurrence
    # count — an optimizer reprint of the same exchange must not flip
    # the test (the decontam plan-pin precedent, ADVICE r12)
    import re

    assert len(re.findall(r"BroadcastHashJoin \[word#\d+\]", p)) == 1, p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert p.count("Exchange hashpartitioning") <= 2
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
