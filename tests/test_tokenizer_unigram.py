"""Unigram-LM tokenizer: Viterbi semantics, EM monotonicity, fit/serve
parity, OOV fallback, and the broadcast serve plan.

Surrogate-oracle parity for the registered query is swept by
tests/test_oracle_parity.py (conditional on the persisted fit).
"""

from __future__ import annotations

import math

from crypto_datalake_spark.queries.tokenizer_unigram import (
    learn_unigram,
    tokenize_unigram_frame,
    unigram_model_tables,
    viterbi_segment,
)


def test_viterbi_prefers_higher_likelihood():
    logp = {"a": -1.0, "b": -1.0, "ab": -1.5}
    pieces, ll = viterbi_segment("ab", logp)
    assert pieces == ("ab",) and ll == -1.5
    # flip: make the two singles cheaper than the fused piece
    logp2 = {"a": -0.5, "b": -0.5, "ab": -1.5}
    pieces2, ll2 = viterbi_segment("ab", logp2)
    assert pieces2 == ("a", "b") and ll2 == -1.0


def test_viterbi_tie_breaks_deterministically():
    # equal scores: "abc" as ab+c or a+bc, both -2.0 with 2 pieces each
    logp = {"a": -1.0, "b": -1.0, "c": -1.0, "ab": -1.0, "bc": -1.0}
    pieces, _ = viterbi_segment("abc", logp)
    assert pieces == ("a", "bc")  # lexicographically smaller tuple


_WC = [
    ("tablescan", 30),
    ("tablesort", 20),
    ("tablejoin", 20),
    ("scan", 15),
    ("sort", 10),
    ("join", 10),
    ("x", 1),
]


def _corpus_ll(logp, seg, wc):
    return sum(c * seg[w][1] for w, c in wc)


def test_fit_roundtrip_and_self_consistency():
    logp, seg = learn_unigram(_WC, vocab_size=24, seed_size=64)
    assert len(logp) <= max(24, len({ch for w, _ in _WC for ch in w}))
    for w, _ in _WC:
        pieces, ll = seg[w]
        assert "".join(pieces) == w                      # roundtrip
        vp, vll = viterbi_segment(w, logp)
        assert pieces == vp and ll == vll                # stored = Viterbi
        assert math.isclose(ll, sum(logp[p] for p in pieces))
    # the shared "table" prefix should be worth a multi-char piece
    assert any(len(p) > 1 for w, _ in _WC[:3] for p in seg[w][0])


def test_em_rounds_monotone_likelihood():
    # vocab large enough that no pruning runs: hard EM alone must never
    # decrease the corpus Viterbi log-likelihood
    lls = []
    for rounds in (1, 2, 4):
        logp, seg = learn_unigram(
            _WC, vocab_size=10_000, seed_size=64, em_rounds=rounds
        )
        lls.append(_corpus_ll(logp, seg, _WC))
    assert lls[0] <= lls[1] + 1e-9 and lls[1] <= lls[2] + 1e-9, lls


def test_pruning_reaches_target_and_keeps_chars():
    logp, seg = learn_unigram(_WC, vocab_size=12, seed_size=256)
    chars = {ch for w, _ in _WC for ch in w}
    assert chars <= set(logp), "single chars must survive every prune"
    assert len(logp) <= max(12, len(chars))
    for w, _ in _WC:  # still segmentable after aggressive pruning
        assert "".join(seg[w][0]) == w


def test_serve_matches_fit_and_oov_fallback(spark, sf_dir):
    _, word_tokens = unigram_model_tables(spark, sf_dir)
    wt = {r["word"]: r for r in word_tokens.collect()}
    some_word = next(iter(sorted(wt)))
    d = spark.createDataFrame(
        [(1, f"{some_word} {some_word}"), (2, "zzzqqqxx")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tokenize_unigram_frame(d, word_tokens).collect()}
    r1 = out[1]
    assert r1["n_words"] == 2 and r1["n_oov_words"] == 0
    assert r1["n_tokens"] == 2 * wt[some_word]["n_tokens"]
    assert r1["token_id_sum"] == 2 * wt[some_word]["id_possum"]
    assert math.isclose(
        r1["log_likelihood"], 2 * wt[some_word]["ll_e7"] / 1e7
    )
    r2 = out[2]  # OOV: char-count fallback, zero checksum, zero LL
    assert r2["n_oov_words"] == 1 and r2["n_tokens"] == len("zzzqqqxx")
    assert r2["token_id_sum"] == 0 and r2["log_likelihood"] == 0.0


def test_serve_plan_single_broadcast_no_python(spark, sf_dir):
    from crypto_datalake_spark.queries import REGISTRY
    from tests.test_scale_plans import plan_text

    p = plan_text(REGISTRY["tokenize_unigram"].fn(spark, sf_dir), "simple")
    # keyed pin, not a raw occurrence count (the decontam plan-pin
    # precedent, ADVICE r12)
    import re

    assert len(re.findall(r"BroadcastHashJoin \[word#\d+\]", p)) == 1, p
    assert "SortMergeJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
