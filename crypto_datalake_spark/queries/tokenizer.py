"""BPE subword tokenizer: offline fit, persisted artifacts, join serving.

The reference pipeline stops at raw text (no tokenizer anywhere in
``src/``); this module is part of the training-data-pipeline tier the
build mandates — the real subword path behind the regex token-count
heuristic in :mod:`crypto_datalake_spark.queries.llm`
(``text_token_stats``).  Algorithm: Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units" — learn
merge rules by repeatedly fusing the most frequent adjacent symbol
pair.  No end-of-word marker (GPT-2-style word-internal merges), so a
word's tokens concatenate back to exactly the word — the roundtrip
invariant the tests pin.

Scale split (the IVF-centroid / LM / TF-IDF / BM25 precedent):

- **Fit** touches the corpus exactly once: one ``explode + groupBy
  word`` shuffle produces the distinct-word frequency table, capped at
  the ``max_words`` most frequent words (``ranked_topk`` — Heaps' law
  keeps the true table ~O(sqrt(corpus tokens)), the cap makes the
  bound unconditional).  The merge loop itself runs driver-side over
  that capped aggregate — O(max_words * n_merges) work independent of
  corpus size, the same "learn on a vocabulary-sized aggregate"
  doctrine as the LM fit (pair counting needs word *types* + counts,
  never word occurrences).
- **Serve** is corpus-shaped but join-only: tokenize + one
  (doc, word) count shuffle, ONE broadcast join against the persisted
  word→tokens table, one per-doc aggregate.  The per-word BPE
  encoding is paid once per word TYPE at fit time, never per
  occurrence — on a Zipfian corpus that is the difference between
  O(distinct words) and O(corpus tokens) encoder invocations.
- **OOV**: serving a word outside the fitted vocabulary falls back to
  character count (the byte-fallback convention) and is counted in
  ``n_oov_words``, so the serve path works on NEW documents against a
  frozen tokenizer — the production shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_datalake_spark.queries.common import t
from crypto_datalake_spark.queries.registry import register

_BPE_MERGES = 512     # merge-table size (vocab = chars + n_merges fused)
_BPE_MAXW = 65536     # fit-vocabulary cap: top-max_words by frequency


# ---------------------------------------------------------------------------
# pure-Python fit core (driver-side, vocabulary-sized input)

def _merge_word(sym: tuple, a: str, b: str, fused: str) -> tuple:
    """Replace left-to-right non-overlapping (a, b) occurrences."""
    out, i, n = [], 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(fused)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def learn_bpe(word_counts, n_merges: int = _BPE_MERGES):
    """Classic BPE training over a (word, count) aggregate.

    Returns ``(merges, final)``: the ordered merge list and the final
    symbol state of every training word.  Deterministic: the best pair
    is (count desc, pair lexicographic asc); training stops early when
    no pair occurs twice (merging a count-1 pair memorizes noise).
    Pair counts include overlapping occurrences (the Sennrich counting
    convention); replacement is left-to-right non-overlapping."""
    vocab = {tuple(w): int(c) for w, c in word_counts if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for p in zip(sym, sym[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((a, b))
        fused = a + b
        vocab = {
            _merge_word(sym, a, b, fused): cnt for sym, cnt in vocab.items()
        }
    return merges, vocab


def encode_word(word: str, ranks: dict) -> list[str]:
    """Encode one word with a fitted ``{(left, right): rank}`` table:
    repeatedly apply the lowest-rank applicable merge (the standard BPE
    encoder — reproduces the training segmentation on training words,
    pinned corpus-wide in tests)."""
    sym = tuple(word)
    while len(sym) > 1:
        best, best_rank = None, None
        for p in zip(sym, sym[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = p, r
        if best is None:
            break
        sym = _merge_word(sym, best[0], best[1], best[0] + best[1])
    return list(sym)


# ---------------------------------------------------------------------------
# persisted fit (warehouse tables, built once per source fingerprint)

def _bpe_suffix(n_merges: int, max_words: int) -> str:
    return f"m{n_merges}_w{max_words}"


def _bpe_word_count_rows(spark, sf_dir, max_words: int):
    """ONE corpus pass: explode + groupBy word, capped at the
    ``max_words`` most frequent (count desc, word asc — deterministic
    refit) via the partition-pruned global top-k."""
    from crypto_datalake_spark.ops.rank import ranked_topk

    wc = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )
    capped = ranked_topk(
        wc, [F.col("wcount").desc(), F.col("word").asc()], max_words
    )
    return [(r["word"], r["wcount"]) for r in capped.select("word", "wcount").collect()]


def bpe_model_tables(
    spark, sf_dir, n_merges: int = _BPE_MERGES, max_words: int = _BPE_MAXW
):
    """The persisted BPE fit as three warehouse tables — the merge list
    (rank, left, right), the token vocabulary (token, token_id; ids
    dense by token asc), and the word→tokens map (word, n_tokens,
    tokens_str, id_sum, id_possum — ``id_possum`` is the
    position-weighted id checksum sum((pos+1)*token_id), so two
    segmentations of the same length still differ) — trained exactly
    once per source fingerprint via the shared served-model split."""
    from crypto_datalake_spark.queries.llm import _served_model_table

    suffix = _bpe_suffix(n_merges, max_words)
    memo: dict = {}

    def fit():
        if "fit" not in memo:
            rows = _bpe_word_count_rows(spark, sf_dir, max_words)
            merges, final = learn_bpe(rows, n_merges)
            toks = sorted({tk for sym in final for tk in sym})
            memo["fit"] = (merges, final, {t_: i + 1 for i, t_ in enumerate(toks)})
        return memo["fit"]

    def mk(prefix, build):
        return _served_model_table(
            spark, sf_dir, prefix, suffix, build, source="documents.parquet"
        )

    def build_merges():
        merges, _, _ = fit()
        return spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(merges)],
            "rank bigint, left string, right string",
        ).coalesce(1)

    def build_vocab():
        _, _, tid = fit()
        return spark.createDataFrame(
            sorted(tid.items(), key=lambda kv: kv[1]),
            "token string, token_id bigint",
        ).coalesce(1)

    def build_word_tokens():
        _, final, tid = fit()
        rows = []
        for sym in final:
            ids = [tid[s] for s in sym]
            rows.append(
                (
                    "".join(sym),
                    len(sym),
                    " ".join(sym),
                    sum(ids),
                    sum((p + 1) * v for p, v in enumerate(ids)),
                )
            )
        return spark.createDataFrame(
            rows,
            "word string, n_tokens bigint, tokens_str string, "
            "id_sum bigint, id_possum bigint",
        ).coalesce(1)

    return (
        mk("bpe_merges", build_merges),
        mk("bpe_vocab", build_vocab),
        mk("bpe_word_tokens", build_word_tokens),
    )


def bpe_model_paths(
    sf_dir: str, n_merges: int = _BPE_MERGES, max_words: int = _BPE_MAXW
) -> list[str]:
    """Where :func:`bpe_model_tables` persists its three fits — feeds
    the driver's oracle-first pre-build guard
    (llm.model_artifact_paths)."""
    from crypto_datalake_spark.queries.llm import _served_model_path

    suffix = _bpe_suffix(n_merges, max_words)
    return [
        _served_model_path(sf_dir, pre, suffix, source="documents.parquet")
        for pre in ("bpe_merges", "bpe_vocab", "bpe_word_tokens")
    ]


# ---------------------------------------------------------------------------
# serving

def tokenize_bpe_frame(d, word_tokens):
    """Tokenize a (doc_id, text) frame against a persisted word→tokens
    map: split + one (doc, word) count shuffle, ONE broadcast join, one
    per-doc aggregate.  Out-of-vocabulary words fall back to character
    count (and a zero id checksum) and are tallied in ``n_oov_words``."""
    wc = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )
    j = wc.join(
        F.broadcast(word_tokens.select("word", "n_tokens", "id_possum")),
        "word",
        "left",
    )
    wlen = F.length("word").cast("long")
    eff_tokens = F.coalesce(F.col("n_tokens"), wlen)
    return j.groupBy("doc_id").agg(
        F.sum("wcount").alias("n_words"),
        F.sum(F.col("wcount") * eff_tokens).alias("n_tokens"),
        F.sum(
            F.when(F.col("n_tokens").isNull(), F.col("wcount")).otherwise(F.lit(0))
        ).alias("n_oov_words"),
        F.sum(F.col("wcount") * F.coalesce(F.col("id_possum"), F.lit(0))).alias(
            "token_id_sum"
        ),
        F.round(
            F.sum(F.col("wcount") * wlen).cast("double")
            / F.sum(F.col("wcount") * eff_tokens).cast("double"),
            7,
        ).alias("chars_per_token"),
    )


def _bpe_served_sql(sf_dir: str) -> str:
    """Surrogate oracle: DuckDB recomputes the serving policy
    CONDITIONAL on the persisted word→tokens fit — segmentations are
    READ, never re-derived (the BPE merge loop is genuinely
    non-SQL-expressible), mirroring the OOV char-count fallback."""
    wp = bpe_model_paths(sf_dir)[2]
    return f"""
    WITH ex AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (
      SELECT doc_id, word, CAST(count(*) AS BIGINT) AS wcount
      FROM ex WHERE word <> '' GROUP BY 1, 2
    ),
    vt AS (
      SELECT word, n_tokens, id_possum FROM read_parquet('{wp}/*.parquet')
    ),
    j AS (
      SELECT doc_id, wcount, length(word) AS wlen, n_tokens, id_possum
      FROM wc LEFT JOIN vt USING (word)
    )
    SELECT doc_id,
           CAST(sum(wcount) AS BIGINT) AS n_words,
           CAST(sum(wcount * coalesce(n_tokens, wlen)) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN n_tokens IS NULL THEN wcount ELSE 0 END)
                AS BIGINT) AS n_oov_words,
           CAST(sum(wcount * coalesce(id_possum, 0)) AS BIGINT)
             AS token_id_sum,
           round(CAST(sum(wcount * wlen) AS DOUBLE)
                 / CAST(sum(wcount * coalesce(n_tokens, wlen)) AS DOUBLE), 7)
             AS chars_per_token
    FROM j GROUP BY doc_id
    """


@register(
    "tokenize_bpe",
    sql=_bpe_served_sql,
    doc="BPE-tokenize the documents table against a persisted fitted "
    "tokenizer (Sennrich et al. 2016): the merge table, token "
    "vocabulary, and word-segmentation map are trained once per source "
    "fingerprint — the merge loop runs driver-side over the capped "
    "distinct-word frequency aggregate (vocabulary-sized, one corpus "
    "shuffle to produce), the kmeans/LM/TF-IDF offline-fit precedent — "
    "and serving is tokenize + one (doc, word) count shuffle + ONE "
    "broadcast join + a per-doc aggregate: per-word encoding is paid "
    "per word TYPE at fit, never per occurrence.  Emits per-doc word/"
    "token/OOV counts, a position-weighted token-id checksum (pins the "
    "exact segmentation, not just its length), and chars-per-token "
    "(the compression ratio a tokenizer is judged by).  OOV words "
    "fall back to character count, so the frozen tokenizer serves new "
    "documents.  SURROGATE oracle: DuckDB recomputes the serving "
    "policy conditional on the persisted segmentation map through the "
    "oracle-first pre-build guard.",
)
def tokenize_bpe(spark, sf_dir):
    _, _, word_tokens = bpe_model_tables(spark, sf_dir)
    return tokenize_bpe_frame(t(spark, sf_dir, "documents"), word_tokens)
