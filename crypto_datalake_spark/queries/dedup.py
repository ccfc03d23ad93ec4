"""Near-duplicate detection + document fingerprinting over ``documents``.

Training-data-pipeline operators (BASELINE.json north star). The
cross-engine hash bridge is md5: Spark ``conv(substr(md5(x),1,15),16,10)``
and DuckDB ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)`` yield the same
60-bit integer, so MinHash/SimHash/rolling hashes are bit-identical and
fully oracle-able.

Scale notes:
- MinHash-LSH: the shingle explode is the big fan-out (|docs|·|shingles|);
  band buckets bound the candidate join, so the full O(n²) pair space is
  never materialised. At 100 TB you'd additionally salt hot band keys and
  let AQE split skewed buckets.
- SimHash/rolling fingerprints are embarrassingly parallel scans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_datalake_spark.queries.common import t
from crypto_datalake_spark.queries.registry import register

_N_HASH = 8
_BAND_SIZE = 4  # 2 bands of 4 → candidate iff J^4-level band collision
_JACCARD_MIN = 0.5

# Spark-side 60-bit md5 hash of a string expression
_SP_H = "CAST(conv(substr(md5({x}), 1, 15), 16, 10) AS BIGINT)"
# DuckDB-side
_DK_H = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"

# CASE-guarded to stay total on sub-3-token docs: a filter inferred from
# a downstream explode can inline this expr into the scan filter where
# codegen subexpression elimination evaluates it before the size guard
# short-circuits — sequence(0, size-3) turns descending and tok[i+2]
# throws under ANSI (caught by a hypothesis property test).
_SP_SHINGLES = (
    "CASE WHEN size(tok) >= 3 THEN "
    "array_distinct(transform(sequence(0, size(tok) - 3), "
    "i -> concat(tok[i], ' ', tok[i+1], ' ', tok[i+2]))) "
    "ELSE CAST(array() AS array<string>) END"
)
_DK_SHINGLES = (
    "list_distinct([tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] "
    "for i in range(1, len(tok) - 1)])"
)


# Affine minhash family over ONE base hash per shingle: h_i = (a_i·h + b_i)
# mod p, p = 2^31−1 (Mersenne).  One md5 per shingle instead of N_HASH —
# the md5 is the dominant cost at scale; the affine family is integer-only
# and equally uniform.  h is pre-reduced mod p so a_i·h stays < 2^62 (no
# int64 overflow in either engine).
_MH_P = 2_147_483_647
_MH_AB = [(2 * i + 1, 7919 * (i + 1)) for i in range(_N_HASH)]  # odd a_i


def _sp_minhash(i: int) -> str:
    a, b = _MH_AB[i]
    return f"array_min(transform(hs, h -> ({a} * h + {b}) % {_MH_P}))"


def _dk_minhash(i: int) -> str:
    a, b = _MH_AB[i]
    return f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {_MH_P}))"


def _band_cols(n_hash: int, band_size: int):
    return [
        [f"h{j}" for j in range(b, b + band_size)]
        for b in range(0, n_hash, band_size)
    ]


# the LSH pipeline as reusable CTE text: shingles → minhash signature →
# band keys (shared by the pair query, the clustering oracle, and the
# incremental batch-vs-corpus dedup in queries/scrub.py)
_DK_LSH_BASE = f"""
    tk AS (
      SELECT doc_id, string_split(text, ' ') AS tok FROM documents
    ),
    sh AS (
      SELECT doc_id, {_DK_SHINGLES} AS shingles
      FROM tk WHERE len(tok) >= 3
    ),
    hb AS (
      SELECT doc_id, shingles,
             list_transform(shingles, s -> {_DK_H.format(x="s")} % {_MH_P}) AS hs
      FROM sh
    ),
    sig AS (
      SELECT doc_id, shingles,
             {", ".join(f"{_dk_minhash(i)} AS h{i}" for i in range(_N_HASH))}
      FROM hb
    ),
    bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, "
        f"concat_ws(',', {', '.join(f'CAST(h{j} AS VARCHAR)' for j in cols)}) AS band_key "
        f"FROM sig"
        for b, cols in enumerate(
            [list(range(b, b + _BAND_SIZE)) for b in range(0, _N_HASH, _BAND_SIZE)]
        )
      )}
    )
"""

def dk_band_cand_sql(src: str = "bands") -> str:
    """The candidate stage as DuckDB SQL over a band CTE — ONE definition
    shared by the pair/cluster/incremental oracles and the
    dedup_recall_eval oracle, so the eval always grades the production
    join (mirror of ``band_candidate_pairs``)."""
    return (
        f"SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b\n"
        f"      FROM {src} a JOIN {src} b\n"
        f"        ON a.band_id = b.band_id AND a.band_key = b.band_key "
        f"AND a.doc_id < b.doc_id"
    )


# base + within-corpus candidate pairs (doc_a < doc_b)
_DK_LSH_CTES = (
    _DK_LSH_BASE.rstrip()
    + f""",
    cand AS (
      {dk_band_cand_sql()}
    )
"""
)


@register(
    "dedup_minhash_lsh",
    sql=f"""
    WITH {_DK_LSH_CTES}
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
             / CAST(len(list_distinct(x.shingles || y.shingles)) AS DOUBLE) AS jaccard
    FROM cand c
    JOIN sh x ON x.doc_id = c.doc_a
    JOIN sh y ON y.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
            / CAST(len(list_distinct(x.shingles || y.shingles)) AS DOUBLE) >= {_JACCARD_MIN}
    """,
    doc="MinHash+LSH near-duplicate detection: 3-gram word shingles → "
    f"{_N_HASH} md5-salted minhashes → {_N_HASH // _BAND_SIZE} bands of "
    f"{_BAND_SIZE} → bucket-join candidates → exact shingle-set Jaccard "
    f"≥ {_JACCARD_MIN} verification. Candidate join touches only "
    "band-bucket collisions, never the O(n²) pair space.",
)
def dedup_minhash_lsh(spark, sf_dir):
    return minhash_lsh_pairs(spark, sf_dir)


def lsh_signatures(docs):
    """(sig, bands) for a (doc_id, text, ...) frame: ``sig`` carries the
    distinct-shingle array + minhash signature per doc (checkpointed —
    it feeds the band join AND the Jaccard verification lookups, and
    without the checkpoint the shingle+minhash pipeline re-runs per
    consumer); ``bands`` is the exploded (doc_id, band_id, band_key)
    bucket index. Shared by the pair query, clustering, and the
    incremental batch-vs-corpus dedup (queries/scrub.py)."""
    sh = (
        docs.select("doc_id", F.split("text", " ").alias("tok"))
        .where(F.size("tok") >= 3)
        .select("doc_id", F.expr(_SP_SHINGLES).alias("shingles"))
    )
    hb = sh.select(
        "doc_id",
        "shingles",
        F.expr(
            f"transform(shingles, s -> {_SP_H.format(x='s')} % {_MH_P})"
        ).alias("hs"),
    )
    sig = hb.select(
        "doc_id",
        "shingles",
        *[F.expr(_sp_minhash(i)).alias(f"h{i}") for i in range(_N_HASH)],
    ).localCheckpoint()
    # One explode instead of a UNION of per-band projections: a union would
    # re-evaluate the whole shingle+minhash pipeline once per band (Spark
    # does not share subplans across union branches), explode evaluates it
    # once per join side.
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.concat_ws(",", *[F.col(c).cast("string") for c in cols]).alias(
                "band_key"
            ),
        )
        for b, cols in enumerate(_band_cols(_N_HASH, _BAND_SIZE))
    ]
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", "bk.band_id", "bk.band_key")
    return sig, bands


def band_candidate_pairs(bands):
    """Distinct cross-document band-bucket collisions (doc_a < doc_b) —
    THE candidate stage of the MinHash tier, shared by the pair query
    and dedup_recall_eval so the eval always grades the production join
    (mirror of ``dk_band_cand_sql``)."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def shingle_jaccard(left: str, right: str):
    """Exact Jaccard of two distinct-shingle array columns — ONE Spark
    definition for the verify stage, the recall-eval truth arm, and the
    incremental-dedup core (mirror of ``dk_jaccard_sql``)."""
    return (
        F.size(F.array_intersect(left, right)).cast("double")
        / F.size(F.array_union(left, right)).cast("double")
    )


def dk_jaccard_sql(x: str, y: str) -> str:
    """The same exact-Jaccard as DuckDB SQL text over two shingle-list
    expressions (mirror of ``shingle_jaccard``). ``list_distinct(x||y)``
    is the union — both inputs are already distinct lists."""
    return (
        f"CAST(len(list_intersect({x}, {y})) AS DOUBLE)"
        f" / CAST(len(list_distinct({x} || {y})) AS DOUBLE)"
    )


def verified_pairs(sig, cand, threshold: float = _JACCARD_MIN):
    """Exact-Jaccard verification of candidate (doc_a, doc_b) pairs
    against the signature frame's distinct-shingle arrays — the verify
    stage of the MinHash tier as ONE definition, shared by the pair
    query and the corpus-ingest pipeline's intra-batch pass."""
    x = sig.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa"))
    y = sig.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb"))
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select("doc_a", "doc_b", shingle_jaccard("sa", "sb").alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(spark, sf_dir):
    """Verified near-dup pairs (doc_a, doc_b, jaccard) — the LSH pipeline
    shared by the pair query and connected-component clustering."""
    sig, bands = lsh_signatures(t(spark, sf_dir, "documents"))
    return verified_pairs(sig, band_candidate_pairs(bands))


_SP_GRAMH = _SP_H.format(x="concat(tok[i], ' ', tok[i+1])")
_DK_GRAMH = _DK_H.format(x="(tok[i] || ' ' || tok[i+1])")


_NGJ_DF_CAP = 64  # grams in more docs per block are stop-grams: no pairing


@register(
    "dedup_ngram_jaccard",
    sql=f"""
    WITH g AS (
      SELECT doc_id, lang, n_chars // 64 AS len_bucket,
             list_distinct([{_DK_GRAMH}
                            for i in range(1, len(tok))]) AS grams
      FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS tok
            FROM documents)
      WHERE len(tok) >= 2
    ),
    ex AS (
      SELECT doc_id, lang, len_bucket, unnest(grams) AS gh FROM g
    ),
    df AS (
      SELECT lang, len_bucket, gh, count(*) AS df FROM ex GROUP BY ALL
    ),
    i0 AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter0
      FROM ex a
      JOIN ex b ON a.lang = b.lang AND a.len_bucket = b.len_bucket
               AND a.gh = b.gh AND a.doc_id < b.doc_id
      JOIN df ON df.lang = a.lang AND df.len_bucket = a.len_bucket
             AND df.gh = a.gh
      WHERE df.df <= {_NGJ_DF_CAP}
      GROUP BY ALL
    ),
    cg AS (
      SELECT e.doc_id, list(e.gh) AS cg
      FROM ex e
      JOIN df ON df.lang = e.lang AND df.len_bucket = e.len_bucket
             AND df.gh = e.gh
      WHERE df.df > {_NGJ_DF_CAP}
      GROUP BY e.doc_id
    ),
    p AS (
      SELECT doc_a, doc_b,
             i0.inter0 + len(list_intersect(coalesce(ca.cg, []),
                                            coalesce(cb.cg, []))) AS inter,
             len(sa.grams) + len(sb.grams) AS tot
      FROM i0
      JOIN g sa ON sa.doc_id = i0.doc_a
      JOIN g sb ON sb.doc_id = i0.doc_b
      LEFT JOIN cg ca ON ca.doc_id = i0.doc_a
      LEFT JOIN cg cb ON cb.doc_id = i0.doc_b
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / CAST(tot - inter AS DOUBLE) AS jaccard
    FROM p
    WHERE CAST(inter AS DOUBLE) / CAST(tot - inter AS DOUBLE) >= 0.3
    """,
    doc="N-gram Jaccard near-dup with blocking: word-bigram sets compared "
    "only within (lang, length-bucket) blocks — the pair space is bounded "
    "by the largest block, never O(n²) over the corpus. The mid tier "
    "between exact-hash and MinHash-LSH: exact Jaccard, cheaper candidate "
    "generation. Grams are pre-hashed to 60-bit ints (one md5 per gram, "
    "linear in corpus size), so the per-PAIR work is integer counting "
    "only, and the union size is derived as |A|+|B|-|∩| instead of a "
    f"second array pass. Stop-gram policy: a gram in > {_NGJ_DF_CAP} "
    "docs of one block generates NO candidate pairs (df-cap mirrored "
    "exactly by the oracle, same policy as dedup_exact_substring's "
    "posting caps), so one boilerplate bigram can never go quadratic in "
    "the block; scores stay TRUE Jaccard because capped grams are "
    "re-counted per surviving pair from a per-doc capped-gram side "
    "array (block-bounded small). Recall effect: only a pair sharing "
    "EXCLUSIVELY capped grams is missed. One shuffle builds the posting "
    "lists; pairs expand in-place (<= C(cap,2) structs per gram row).",
)
def dedup_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(t(spark, sf_dir, "documents"))


def ngram_jaccard_pairs(d, cap: int = _NGJ_DF_CAP, threshold: float = 0.3):
    """Blocked word-bigram TRUE-Jaccard pairs over a (doc_id, lang,
    n_chars, text) frame — the plan documented on dedup_ngram_jaccard.
    ``cap`` bounds a gram's per-block document frequency: hotter grams
    are stop-grams that generate no candidates (but still count toward
    surviving pairs' scores via the capped-gram side array)."""
    g = (
        d.select(
            "doc_id",
            "lang",
            (F.col("n_chars") / F.lit(64)).cast("long").alias("len_bucket"),
            F.split("text", " ").alias("tok"),
        )
        .where(F.size("tok") >= 2)
        .select(
            "doc_id",
            "lang",
            "len_bucket",
            # CASE-guarded for the same explode-inferred-filter hazard as
            # _SP_SHINGLES (see comment there)
            F.expr(
                "CASE WHEN size(tok) >= 2 THEN "
                "array_distinct(transform(sequence(0, size(tok) - 2), "
                f"i -> {_SP_GRAMH})) "
                "ELSE CAST(array() AS array<bigint>) END"
            ).alias("grams"),
        )
    # hash grams once; the posting lists and the size lookup both read
    # the checkpointed frame
    ).localCheckpoint()
    # INVERTED-INDEX pairing via posting lists (same ONE-shuffle shape as
    # exact_substring_runs): group the exploded grams by gram, then
    # expand cross-document pairs IN-PLACE — a pair materializes once per
    # SHARED gram and the intersection size is a count aggregate. The
    # per-block all-pairs form costs Σ|block|² rows regardless of
    # similarity; this form costs Σ co-occurrences, and the df-cap
    # bounds any one gram's contribution at C(cap,2): a stop-gram shared
    # by a whole block generates NO pairs instead of |block|² of them.
    gexp = g.select(
        "lang", "len_bucket", "doc_id", F.explode("grams").alias("gh")
    )
    # checkpointed: the pairing arm and the capped-gram arm both read
    # the posting lists, and Catalyst does NOT recognize them as a
    # reusable exchange (measured) — without the checkpoint the gram
    # shuffle runs twice (1.77 -> 1.97 s at sf0.1, fresh process).
    # Priced against the pre-cap r7 join plan under identical
    # conditions this whole form is 1.19x (1.49 -> 1.77 s) — the cost
    # of the df computation + true-jaccard restoration, bought against
    # the quadratic stop-gram bound.
    pl = gexp.groupBy("lang", "len_bucket", "gh").agg(
        F.collect_list("doc_id").alias("dl")
    ).localCheckpoint()
    pairs = F.filter(
        F.flatten(
            F.transform(
                F.col("dl"),
                lambda a: F.transform(
                    F.col("dl"),
                    lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
                ),
            )
        ),
        lambda x: x["doc_a"] < x["doc_b"],
    )
    inter0 = (
        # size >= 2 first (same reasoning as exact_substring_runs): a
        # singleton posting list yields no doc_a < doc_b pair, so the
        # interpreted pair expansion is skipped for the dominant
        # unique-gram population — identical output.
        pl.where((F.size("dl") >= 2) & (F.size("dl") <= cap))
        .select(F.explode(pairs).alias("m"))
        .groupBy(F.col("m.doc_a").alias("doc_a"), F.col("m.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter0"))
    )
    # capped grams per doc: the stop-gram set is tiny by construction
    # (few grams exceed the cap), so this arm is a small frame — it
    # exists so surviving pairs still score TRUE Jaccard, cap or no cap
    cgrams = (
        pl.where(F.size("dl") > cap)
        .select("gh", F.explode("dl").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.collect_list("gh").alias("cg"))
    )
    # no broadcast hint: sizes is per-doc (not broadcastable at scale) —
    # locally AQE broadcasts it anyway, on a cluster it hash-joins on the
    # already-small verified-pair frame
    sizes = g.select("doc_id", F.size("grams").alias("n"))
    empty = F.array().cast("array<bigint>")
    paired = (
        inter0.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .join(
            cgrams.select(F.col("doc_id").alias("doc_a"), F.col("cg").alias("ca")),
            "doc_a", "left",
        )
        .join(
            cgrams.select(F.col("doc_id").alias("doc_b"), F.col("cg").alias("cb")),
            "doc_b", "left",
        )
        .withColumn(
            "inter",
            F.col("inter0")
            + F.size(
                F.array_intersect(
                    F.coalesce("ca", empty), F.coalesce("cb", empty)
                )
            ),
        )
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    ).cast("double")
    return paired.select("doc_a", "doc_b", jac.alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )


_SP_TOKH = _SP_H.format(x="tk")
_DK_TOKH = _DK_H.format(x="tk")

# simhash bit-vote over a pre-materialized hash-array column ``uh``
_SP_SIMHASH_OVER_UH = (
    "aggregate(transform(sequence(0, 59), j -> "
    "CASE WHEN 2 * aggregate(uh, CAST(0 AS BIGINT), (acc, h) -> acc + (shiftright(h, CAST(j AS INT)) % 2)) > size(uh) "
    "THEN shiftleft(CAST(1 AS BIGINT), CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END), "
    "CAST(0 AS BIGINT), (a, x) -> a + x)"
)


@register(
    "simhash_fingerprint",
    sql=f"""
    WITH tk AS (
      SELECT doc_id,
             list_transform(list_distinct(string_split(text, ' ')),
                            tk -> {_DK_TOKH}) AS hs
      FROM documents
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 60), j ->
             CASE WHEN 2 * CAST(list_sum(list_transform(hs, h -> (h >> j) & 1)) AS BIGINT) > len(hs)
                  THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END
           )) AS BIGINT) AS simhash
    FROM tk
    """,
    doc="SimHash document fingerprint: 60-bit majority vote over md5 token "
    "hashes — near-dup docs land at small Hamming distance. Integer-only "
    "higher-order expressions, no UDF, embarrassingly parallel.",
)
def simhash_fingerprint(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # materialize the token-hash array in its own projection: inlining it
    # into the bit loop would recompute every md5 120× (2 refs × 60 bits)
    hashed = d.select(
        "doc_id",
        F.expr(f"transform(array_distinct(split(text, ' ')), tk -> {_SP_TOKH})").alias("uh"),
    )
    return hashed.select("doc_id", F.expr(_SP_SIMHASH_OVER_UH).alias("simhash"))


@register(
    "doc_rolling_fingerprint",
    sql=f"""
    WITH tk AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '),
                            tk -> {_DK_TOKH} % 2147483647) AS hs
      FROM documents
    )
    SELECT doc_id,
           CAST(list_reduce(hs, (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT) AS fingerprint
    FROM tk
    """,
    doc="Order-sensitive polynomial rolling-hash fingerprint over the token "
    "sequence (doc identity up to exact token order) — the document "
    "fingerprinting tier between exact-hash and MinHash.",
)
def doc_rolling_fingerprint(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # per-token pre-mod keeps every fold step < 2^36 (no overflow) and makes
    # Spark's 0-seeded fold equal DuckDB's first-element-seeded reduce
    fp = (
        f"aggregate(transform(split(text, ' '), tk -> {_SP_TOKH} % 2147483647), "
        "CAST(0 AS BIGINT), (a, b) -> (a * 31 + b) % 2147483647)"
    )
    return d.select("doc_id", F.expr(fp).alias("fingerprint"))


@register(
    "doc_fingerprints",
    sql=f"""
    WITH tk AS (
      SELECT doc_id,
             list_transform(list_distinct(string_split(text, ' ')),
                            tk -> {_DK_TOKH}) AS uh,
             list_transform(string_split(text, ' '),
                            tk -> {_DK_TOKH} % 2147483647) AS sh
      FROM documents
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 60), j ->
             CASE WHEN 2 * CAST(list_sum(list_transform(uh, h -> (h >> j) & 1)) AS BIGINT) > len(uh)
                  THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END
           )) AS BIGINT) AS simhash,
           CAST(list_reduce(sh, (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT) AS fingerprint
    FROM tk
    """,
    doc="Both document-fingerprint tiers in ONE scan: the 60-bit SimHash "
    "majority vote over the distinct-token hash set (order-insensitive "
    "near-dup key — small Hamming distance for near-dups) and the "
    "order-SENSITIVE polynomial rolling hash over the token sequence "
    "(doc identity up to exact token order). One pass over text, two "
    "fingerprints — this is the production shape (fingerprinting scans "
    "are bandwidth-bound, so fusing them halves the read); the "
    "standalone simhash_fingerprint / doc_rolling_fingerprint entries "
    "remain registered for per-tier use. Integer-only higher-order "
    "expressions, no UDF, embarrassingly parallel.",
)
def doc_fingerprints(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # one projection materializes both token-hash arrays (one md5 pass per
    # token); the bit-vote references the column, never re-inlines the md5
    hashed = d.select(
        "doc_id",
        F.expr(f"transform(array_distinct(split(text, ' ')), tk -> {_SP_TOKH})").alias("uh"),
        F.expr(f"transform(split(text, ' '), tk -> {_SP_TOKH} % 2147483647)").alias("sh"),
    )
    fp = "aggregate(sh, CAST(0 AS BIGINT), (a, b) -> (a * 31 + b) % 2147483647)"
    return hashed.select(
        "doc_id",
        F.expr(_SP_SIMHASH_OVER_UH).alias("simhash"),
        F.expr(fp).alias("fingerprint"),
    )


_MARKERS = {
    "en": ("the", "a", "is", "and", "of"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
    "de": ("der", "die", "das", "und", "ist"),
}


@register(
    "lang_id_heuristic",
    sql=f"""
    WITH tk AS (SELECT doc_id, lang, string_split(text, ' ') AS tok FROM documents),
    sc AS (
      SELECT doc_id, lang,
        {", ".join(
            f"CAST(len(list_filter(tok, x -> x IN ({', '.join(repr(w) for w in ws)}))) AS BIGINT) AS c_{lg}"
            for lg, ws in _MARKERS.items()
        )}
      FROM tk
    )
    SELECT doc_id, lang,
           CASE WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_de AND c_en > 0 THEN 'en'
                WHEN c_es >= c_fr AND c_es >= c_de AND c_es > 0 THEN 'es'
                WHEN c_fr >= c_de AND c_fr > 0 THEN 'fr'
                WHEN c_de > 0 THEN 'de'
                ELSE 'unknown' END AS pred_lang,
           c_en, c_es, c_fr, c_de
    FROM sc
    """,
    doc="Language-ID heuristic: marker-stopword counts per language with a "
    "deterministic argmax cascade — the n-gram language-ID tier of a "
    "training-data pipeline (scaffold; marker tables are pluggable).",
)
def lang_id_heuristic(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tok = F.split("text", " ")
    def marker_count(ws):
        # factory closure: F.filter treats a 2-arg lambda as (element, index)
        return F.size(F.filter(tok, lambda x: x.isin(*ws))).cast("long")

    counts = {lg: marker_count(ws) for lg, ws in _MARKERS.items()}
    pred = (
        F.when(
            (counts["en"] >= counts["es"])
            & (counts["en"] >= counts["fr"])
            & (counts["en"] >= counts["de"])
            & (counts["en"] > 0),
            "en",
        )
        .when((counts["es"] >= counts["fr"]) & (counts["es"] >= counts["de"]) & (counts["es"] > 0), "es")
        .when((counts["fr"] >= counts["de"]) & (counts["fr"] > 0), "fr")
        .when(counts["de"] > 0, "de")
        .otherwise("unknown")
    )
    return d.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        *[counts[lg].alias(f"c_{lg}") for lg in _MARKERS],
    )


@register(
    "dedup_cluster_canonical",
    sql=f"""
    WITH RECURSIVE {_DK_LSH_CTES},
    pairs AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN sh x ON x.doc_id = c.doc_a
      JOIN sh y ON y.doc_id = c.doc_b
      WHERE CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
              / CAST(len(list_distinct(x.shingles || y.shingles)) AS DOUBLE)
            >= {_JACCARD_MIN}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(doc, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc
    ),
    lab AS (
      SELECT doc AS doc_id, min(label) AS cluster_id FROM reach GROUP BY doc
    )
    SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
           doc_id = cluster_id AS is_canonical,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
    FROM lab
    """,
    doc="Near-duplicate CLUSTERING: the verified MinHash-LSH pairs are an "
    "edge list; connected components assign every document a cluster id "
    "(= the component's minimum doc_id), the canonical keep-doc is the "
    "minimum, and cluster_size drives removal accounting — the step a "
    "production dedup pipeline actually ships (pairs alone can't answer "
    "'which docs do I drop' when near-dup relations chain A~B~C). Spark "
    "side: iterative min-label propagation over the edge list with "
    "localCheckpoint per round — O(diameter) rounds, and near-dup "
    "components are shallow (chains longer than a few hops are rare); "
    "each round is one shuffle join on the label frame. The 100-TB "
    "path — alternating large-star/small-star contraction (no label "
    "frame, edge count never grows, provably O(log^2 n) rounds) — is "
    "implemented as connected_components_star with a tested identical "
    "contract. Oracle: recursive-CTE transitive closure. "
    "Singletons cluster with themselves, so the output covers the whole "
    "corpus and 'keep' = is_canonical.",
)
def dedup_cluster_canonical(spark, sf_dir):
    from pyspark.sql import Window

    pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    docs = t(spark, sf_dir, "documents").select("doc_id")
    labels = connected_components(docs, pairs)
    w = Window.partitionBy("cluster_id")
    return labels.select(
        "doc_id", F.col("label").alias("cluster_id")
    ).select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


def connected_components(docs, pairs, max_rounds: int = 25):
    """Min-label propagation with pointer-jumping over an undirected edge
    list; returns (doc_id, label) with label = component minimum."""
    edges = pairs.unionAll(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint(eager=True)  # pairs are reused every round — cut lineage once

    labels = docs.select("doc_id", F.col("doc_id").alias("label"))
    converged = False
    for _ in range(max_rounds):
        prop = (
            edges.join(labels, edges.doc_a == labels.doc_id)
            .groupBy(F.col("doc_b").alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new = (
            labels.join(prop, "doc_id", "left")
            .select(
                "doc_id",
                F.least("label", F.coalesce("nbr_label", "label")).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("__chg"),
            )
        )
        # pointer-jump (path compression): label ← label's label, so a chain
        # halves every round — convergence in O(log diameter), not
        # O(diameter); a 25-round cap covers any component a lake can hold
        parent = new.select(
            F.col("doc_id").alias("label"), F.col("label").alias("grand")
        )
        new = new.join(parent, "label", "left").select(
            "doc_id",
            F.least("label", F.coalesce("grand", "label")).alias("label"),
            "__chg",
        )
        new = new.localCheckpoint(eager=True)  # stop iterative lineage growth
        changed = not new.where(F.col("__chg")).isEmpty()
        labels = new.drop("__chg")
        if not changed:
            converged = True
            break
    if not converged:
        # a silent wrong clustering is worse than a loud failure
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds"
        )
    return labels


def connected_components_star(docs, pairs, max_rounds: int = 30):
    """Alternating large-star/small-star connected components (Kiveris
    et al. 2014, "Connected Components in MapReduce and Beyond") — the
    100-TB path :func:`connected_components`'s docstring points to.
    Same contract: (doc_id, label) with label = component minimum.

    Why it scales past min-label propagation: each round is ONE
    per-node min aggregation + ONE join back to the edge list — no
    per-node neighbor lists are ever materialized, so a hub with 10^8
    neighbors costs a partial-aggregated min, not a collect.  Edge
    count never grows above the input (large-star strictly reorients
    edges toward smaller ids; small-star contracts stars), and the
    paper proves O(log^2 n) rounds (O(log n) observed).  Per round the
    frame is localCheckpointed to cut iterative lineage, exactly like
    the propagation loop.

    Convergence: alternate until neither phase changes the edge set;
    at the fixed point every edge is (child, root).  Labels then read
    straight off the final edge set; isolated docs label themselves.
    """
    # undirected edge set, kept canonical as (hi=u > lo=v); self-loops drop
    e = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def large_star(edges):
        # for each node x: m(x) = min(neighbors ∪ {x}); every neighbor
        # STRICTLY LARGER than x re-points to m(x)
        und = edges.unionAll(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = und.groupBy("u").agg(F.min("v").alias("mv"))
        out = (
            und.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("u"),
                F.least("u", "mv").alias("v"),
            )
        )
        return out.where(F.col("u") != F.col("v")).distinct()

    def small_star(edges):
        # for each node x over its SMALLER neighbors N≤: m = min(N≤);
        # x and every v ∈ N≤ re-point to m (edges arrive canonical u>v)
        mins = edges.groupBy("u").agg(F.min("v").alias("m"))
        j = edges.join(mins, "u")
        out = j.select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).unionAll(j.select("u", F.col("m").alias("v")))
        return out.where(F.col("u") != F.col("v")).distinct()

    def changed(old, new) -> bool:
        return (
            not new.exceptAll(old).isEmpty()
            or not old.exceptAll(new).isEmpty()
        )

    converged = False
    for _ in range(max_rounds):
        after_large = large_star(e).localCheckpoint(eager=True)
        after_small = small_star(after_large).localCheckpoint(eager=True)
        if not changed(e, after_small):
            converged = True
            e = after_small
            break
        e = after_small
    if not converged:
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds"
        )
    # fixed point: every edge is (member, root); roots and isolated docs
    # label themselves
    parent = e.groupBy("u").agg(F.min("v").alias("p"))
    return docs.join(
        parent, docs.doc_id == parent.u, "left"
    ).select("doc_id", F.coalesce("p", "doc_id").alias("label"))


# ------------------------------------------------- exact-substring dedup

_ESS_N = 8       # minimum verbatim run (tokens); production ~50 BPE tokens
_ESS_DF_CAP = 16  # windows seen in more docs are boilerplate: skip pairing
# windows with more total OCCURRENCES are degenerate repetition (spam,
# separator runs): one doc repeating a window T times inside a df-passing
# posting list would otherwise expand T² structs in a single array value
_ESS_POS_CAP = 256


def ess_runs_ctes() -> str:
    """The exact-substring run-finding plan as DuckDB CTEs ending in
    ``runs(doc_a, doc_b, a_start, b_start, match_tokens)`` — ONE
    definition shared by the dedup_exact_substring oracle and the
    scrub_exact_substrings policy oracle so they cannot drift."""
    return f"""tok AS (
      SELECT doc_id, string_split(text, ' ') AS tok FROM documents
    ),
    grams AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos,
             md5(array_to_string(tok[pos:pos+{_ESS_N - 1}], ' ')) AS gram
      FROM (SELECT doc_id, tok,
                   unnest(generate_series(1, len(tok) - {_ESS_N} + 1)) AS pos
            FROM tok WHERE len(tok) >= {_ESS_N})
    ),
    keep AS (
      SELECT gram FROM grams
      GROUP BY gram HAVING count(DISTINCT doc_id) <= {_ESS_DF_CAP}
                       AND count(*) <= {_ESS_POS_CAP}
    ),
    m AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS diag
      FROM grams a JOIN grams b USING (gram)
      WHERE a.doc_id < b.doc_id AND gram IN (SELECT gram FROM keep)
    ),
    isl AS (
      SELECT doc_a, doc_b, diag, pos_a, pos_b,
             pos_a - row_number() OVER (
               PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
      FROM m
    ),
    runs AS (
      SELECT doc_a, doc_b,
             min(pos_a) AS a_start,
             min(pos_b) AS b_start,
             count(*) + {_ESS_N} - 1 AS match_tokens
      FROM isl
      GROUP BY doc_a, doc_b, diag, grp
    )"""


@register(
    "dedup_exact_substring",
    sql=f"""
    WITH {ess_runs_ctes()}
    SELECT doc_a, doc_b, a_start, b_start, match_tokens FROM runs
    """,
    doc=f"Exact-substring deduplication (Lee et al. 2022, 'Deduplicating "
    "Training Data Makes Language Models Better'): find every MAXIMAL "
    f"verbatim run of >= {_ESS_N} tokens shared across two documents — "
    "the overlap tier MinHash misses (high-similarity pairs get caught "
    "by Jaccard, but a 60-token verbatim quote inside two otherwise "
    "unrelated documents does not move their global similarity). "
    "Suffix arrays are the single-machine tool; the Spark shape is: "
    f"every {_ESS_N}-token window fingerprinted by a Karp-Rabin ROLLING "
    "hash — O(1) amortized per position via a vectorized-numpy prefix "
    "evaluation over JVM-computed per-token xxhash64 (the designed "
    "pandas-UDF recurrence tier, functions/rollinghash.py; a pure-JVM "
    "O(n)-per-position slice tier is one flag away) — (any run of "
    f"length L >= {_ESS_N} is exactly L-{_ESS_N}+1 consecutive window "
    "matches), ONE groupBy-gram shuffle builds posting lists whose "
    "cross-document pairs are expanded in-place (cost = co-occurrences, "
    "like dedup_ngram_jaccard's inverted index), then a gaps-and-islands "
    "stitch per (pair, alignment diagonal) merges consecutive window "
    "matches into maximal runs: match_tokens = N + islands_size - 1. "
    f"Windows appearing in > {_ESS_DF_CAP} documents are boilerplate "
    "(licenses, headers) and windows with > "
    f"{_ESS_POS_CAP} total occurrences are degenerate repetition (spam, "
    "separator runs) — both capped out BEFORE pair expansion, so the "
    f"in-place expansion builds at most {_ESS_POS_CAP}^2 structs per "
    "gram: the documented stop-gram policy at 100 TB (both caps "
    "mirrored exactly by the oracle). The "
    "stitch windows partition by (doc_a, doc_b, diag): millions of "
    "tiny partitions, fully parallel, never a per-corpus serial window.",
)
def dedup_exact_substring(spark, sf_dir):
    return exact_substring_runs(t(spark, sf_dir, "documents"))


def exact_substring_runs(
    d, n: int = _ESS_N, cap: int = _ESS_DF_CAP, pos_cap: int = _ESS_POS_CAP,
    grams: str = "rolling",
):
    """Maximal cross-document verbatim runs of >= ``n`` tokens over a
    (doc_id, text) frame — the plan documented on dedup_exact_substring.
    ``cap`` bounds a window's document frequency (boilerplate guard),
    ``pos_cap`` its total occurrences (degenerate-repetition guard: the
    in-place pair expansion builds at most pos_cap² structs per gram).

    ``grams`` picks the window-fingerprint tier; both emit identical
    equivalence classes (equal token windows → equal gram), so the runs
    output is the same either way, and everything downstream of the
    gram frame is shared:

    - ``"rolling"`` (default): Karp-Rabin O(1)-amortized recurrence —
      per-token xxhash64 JVM-side, then a fully-vectorized numpy prefix
      evaluation per Arrow batch (functions/rollinghash.py).  Cost per
      position is constant regardless of ``n`` — the tier that matters
      at production window sizes (~50 BPE tokens, Lee et al. 2022).
    - ``"slice"``: pure-JVM xxhash64 over each n-token slice — O(n) per
      position but zero Python in the plan; the right tier when a
      deployment forbids Python workers.
    """
    from pyspark.sql import Window

    toks = (
        d.select("doc_id", F.split("text", " ").alias("tok"))
        .where(F.size("tok") >= n)
    )
    if grams == "rolling":
        from crypto_datalake_spark.functions.rollinghash import (
            rolling_window_grams,
        )

        th = toks.select(
            "doc_id",
            F.transform("tok", lambda tk: F.xxhash64(tk)).alias("th"),
        )
        grams_df = rolling_window_grams(th, n)
    elif grams == "slice":
        # two salt-seeded xxhash64 per (doc, position) over the raw token
        # slice — a 128-bit composite (matching the rolling tier's width:
        # a gram collision manufactures a false verbatim run that the
        # scrub policy would DELETE, so 64 bits is not enough at 10^13
        # windows) that still shuffles as a 16-byte struct vs the r6
        # 32-char md5 string; CASE-guarded for the same
        # explode-inferred-filter hazard as _SP_SHINGLES (sequence turns
        # descending on short docs and slice throws under ANSI)
        def _slice_gram(p):
            w = F.slice("tok", p, n)
            return F.struct(
                F.xxhash64(F.lit(1), w).alias("h1"),
                F.xxhash64(F.lit(2), w).alias("h2"),
            )

        win_hashes = F.when(
            F.size("tok") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("tok") - n + 1), _slice_gram
            ),
        ).otherwise(
            F.array().cast("array<struct<h1:bigint,h2:bigint>>")
        )
        grams_df = toks.select(
            "doc_id", F.posexplode(win_hashes).alias("__i", "gram")
        ).select(
            "doc_id", (F.col("__i") + 1).cast("long").alias("pos"), "gram"
        )
    else:
        raise ValueError(f"grams must be 'rolling' or 'slice': {grams!r}")
    # ONE shuffle: posting list per window hash; df-cap on DISTINCT docs,
    # then expand cross-document position pairs in-place (a second join
    # leg would shuffle the gram frame again for nothing)
    pl = grams_df.groupBy("gram").agg(
        F.collect_list(F.struct("doc_id", "pos")).alias("pl")
    )
    pairs = F.filter(
        F.flatten(
            F.transform(
                F.col("pl"),
                lambda a: F.transform(
                    F.col("pl"),
                    lambda b: F.struct(
                        a["doc_id"].alias("doc_a"),
                        b["doc_id"].alias("doc_b"),
                        a["pos"].alias("pos_a"),
                        b["pos"].alias("pos_b"),
                    ),
                ),
            )
        ),
        lambda x: x["doc_a"] < x["doc_b"],
    )
    m = (
        # size >= 2 first: a singleton posting list can never produce a
        # cross-document pair (explode of its empty pairs array emits no
        # rows), and most windows are unique, so short-circuiting here
        # skips the INTERPRETED pair expansion + distinct-doc cap check
        # (higher-order transforms never enter codegen) on the dominant
        # gram population — same output, pair arithmetic only runs where
        # a pair is possible.
        pl.where(
            (F.size("pl") >= 2)
            & (F.size("pl") <= pos_cap)
            & (
                F.size(
                    F.array_distinct(
                        F.transform(F.col("pl"), lambda x: x["doc_id"])
                    )
                )
                <= cap
            )
        )
        .select(F.explode(pairs).alias("m"))
        .select("m.doc_a", "m.doc_b", "m.pos_a", "m.pos_b")
        .withColumn("diag", F.col("pos_a") - F.col("pos_b"))
    )
    # gaps-and-islands on the alignment diagonal: consecutive pos_a
    # values = consecutive window matches = one maximal verbatim run
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    return (
        m.withColumn("__grp", F.col("pos_a") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "diag", "__grp")
        .agg(
            F.min("pos_a").alias("a_start"),
            F.min("pos_b").alias("b_start"),
            (F.count(F.lit(1)) + F.lit(n - 1)).alias("match_tokens"),
        )
        .select("doc_a", "doc_b", "a_start", "b_start", "match_tokens")
    )
