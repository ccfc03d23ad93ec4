"""Corpus scrubbing and assembly: PII redaction, sequence packing, and
incremental batch-vs-corpus dedup.

Training-data-pipeline operators beyond the reference surface (the
reference is a market-data lake; these are what a 100 TB text pipeline
runs between crawl and tokenizer). Companions to queries/dedup.py
(near-dup tiers) and queries/curation.py (repetition, decontamination).

Scale notes:
- PII redaction is an embarrassingly parallel scan — pure JVM regex
  expressions, whole-stage codegen, zero shuffles. The cross-engine
  proof is the md5 bridge over the REDACTED text: if Spark and DuckDB
  disagree on a single byte of any replacement, the hash row mismatches.
- Sequence packing (concat-and-chunk) is ONE window pass per stream
  (partitionBy source): the running token count assigns every document
  its pack id and offset without materialising the packed sequences.
  At 100 TB the stream key keeps window state per-executor-partition;
  no global ordering is ever required.
- Incremental dedup reuses the MinHash-LSH band index from
  queries/dedup.py but joins INCOMING x EXISTING only — the production
  shape for continuous ingestion, where the existing corpus's band
  index is precomputed and persisted (signature rows are ~100 bytes/doc,
  a tiny fraction of corpus bytes) and each incoming batch is small
  enough to broadcast against it. Per-batch cost is O(|batch| + hits),
  never a corpus self-join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_datalake_spark.queries.common import t
from crypto_datalake_spark.queries.dedup import (
    _DK_LSH_BASE,
    _JACCARD_MIN,
    ess_runs_ctes,
    lsh_signatures,
)
from crypto_datalake_spark.queries.registry import register

# Patterns restricted to syntax Java regex and RE2 interpret identically:
# character classes, bounded repeats, \b word boundaries, alternation —
# no lookaround, no backrefs (RE2 has neither).
_PAT_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PAT_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
_PAT_PHONE = r"\+?[0-9][0-9 ()-]{6,}[0-9]"
# custom sensitive-term scrub (canary strings / internal codenames);
# these terms occur in the synthetic corpus so both outcomes populate.
_PAT_TERMS = r"\b(customer|vector|hash)\b"

_REDACTIONS = [
    ("n_email", _PAT_EMAIL, "<EMAIL>"),
    ("n_ipv4", _PAT_IPV4, "<IP>"),
    ("n_phone", _PAT_PHONE, "<PHONE>"),
    ("n_terms", _PAT_TERMS, "<TERM>"),
]

# 60-bit md5 bridge, DuckDB side (same as queries/dedup.py)
_DK_H = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"


def _dk_redacted(col: str) -> str:
    out = col
    for _, pat, repl in _REDACTIONS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


@register(
    "pii_redaction",
    sql=f"""
    SELECT doc_id,
           {", ".join(
               f"CAST(len(regexp_extract_all(text, '{pat}')) AS INTEGER) AS {name}"
               for name, pat, _ in _REDACTIONS
           )},
           {_DK_H.format(x=_dk_redacted("text"))} AS clean_hash,
           ({" + ".join(f"len(regexp_extract_all(text, '{pat}'))"
                        for _, pat, _ in _REDACTIONS)}) > 0 AS changed
    FROM documents
    """,
    doc="PII / sensitive-term redaction scan: count and replace emails, "
    "IPv4 addresses, phone-shaped digit runs, and a custom term "
    "blocklist. Counts are per-pattern over the original text; "
    "replacements apply sequentially; `clean_hash` is the 60-bit md5 "
    "of the fully redacted text, so the oracle proves BYTE-IDENTICAL "
    "redaction across engines, not just matching counts. Pure "
    "whole-stage-codegen regex scan: zero shuffles, trivially "
    "partition-parallel at 100 TB. Patterns use the Java-regex ∩ RE2 "
    "common subset (no lookaround/backrefs).",
)
def pii_redaction(spark, sf_dir):
    # Column-API only: the patterns contain \b, which a Spark SQL string
    # literal would escape-process into a backspace char — F.regexp_*
    # with Python strings bypasses the SQL parser entirely.
    d = t(spark, sf_dir, "documents")
    counts = [
        F.regexp_count("text", F.lit(pat)).cast("int").alias(name)
        for name, pat, _ in _REDACTIONS
    ]
    clean = F.col("text")
    for _, pat, repl in _REDACTIONS:
        clean = F.regexp_replace(clean, pat, repl)
    clean_hash = F.conv(F.substring(F.md5(clean), 1, 15), 16, 10).cast("long")
    total = None
    for name, _, _ in _REDACTIONS:
        c = F.col(name)
        total = c if total is None else total + c
    return d.select(
        "doc_id", *counts, clean_hash.alias("clean_hash")
    ).withColumn("changed", total > F.lit(0))


_PACK_BUDGET = 256  # tokens per packed training sequence


@register(
    "sequence_packing",
    sql=f"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM d
    )
    SELECT doc_id, source, n_tokens,
           cum_before // {_PACK_BUDGET} AS pack_id,
           cum_before % {_PACK_BUDGET} AS pack_offset,
           ((cum_before + n_tokens - 1) // {_PACK_BUDGET})
             - (cum_before // {_PACK_BUDGET}) + 1 AS n_packs,
           ((cum_before + n_tokens - 1) // {_PACK_BUDGET})
             > (cum_before // {_PACK_BUDGET}) AS crosses_boundary
    FROM c
    """,
    doc=f"Sequence packing (concat-and-chunk, {_PACK_BUDGET}-token "
    "budget): documents are concatenated per source stream in doc_id "
    "order and chunked into fixed-budget training sequences; each doc "
    "gets its pack id, offset within the pack, and how many packs it "
    "spans. The running token count is the entire algorithm; packed "
    "sequences are never materialised. The standard pre-tokenizer "
    "assembly step (GPT-style causal-LM batching). At 100 TB the "
    "running sum is a TWO-PHASE distributed scan (ops/prefix.py): "
    "local sums per (source, doc_id-bucket) in parallel, then bucket "
    "offsets from a bucket-count-sized frame broadcast back — a "
    "single-window-per-stream plan would serialize each source stream "
    "into one task (a corpus is a handful of giant streams, so that "
    "is the worst possible skew).",
)
def sequence_packing(spark, sf_dir):
    from crypto_datalake_spark.ops.prefix import cum_before

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    c = cum_before(d, ["source"], "doc_id", "n_tokens")
    first_pack = F.expr(f"cum_before div {_PACK_BUDGET}")
    last_pack = F.expr(f"(cum_before + n_tokens - 1) div {_PACK_BUDGET}")
    return c.select(
        "doc_id",
        "source",
        "n_tokens",
        first_pack.alias("pack_id"),
        (F.col("cum_before") % _PACK_BUDGET).alias("pack_offset"),
        (last_pack - first_pack + 1).alias("n_packs"),
        (last_pack > first_pack).alias("crosses_boundary"),
    )


# incoming batch = deterministic 20% slice standing in for a new crawl
_INC_MOD, _INC_REM = 5, 4


@register(
    "dedup_incremental_lsh",
    sql=f"""
    WITH {_DK_LSH_BASE},
    cand AS (
      SELECT DISTINCT a.doc_id AS in_id, b.doc_id AS ex_id
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id % {_INC_MOD} = {_INC_REM}
       AND b.doc_id % {_INC_MOD} <> {_INC_REM}
    ),
    ver AS (
      SELECT c.in_id, count(DISTINCT c.ex_id) AS n_dup
      FROM cand c
      JOIN sh x ON x.doc_id = c.in_id
      JOIN sh y ON y.doc_id = c.ex_id
      WHERE CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
              / CAST(len(list_distinct(x.shingles || y.shingles)) AS DOUBLE)
            >= {_JACCARD_MIN}
      GROUP BY c.in_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(v.n_dup, 0) AS BIGINT) AS n_dup_existing,
           COALESCE(v.n_dup, 0) = 0 AS is_novel
    FROM documents d LEFT JOIN ver v ON d.doc_id = v.in_id
    WHERE d.doc_id % {_INC_MOD} = {_INC_REM}
    """,
    doc="Incremental ingestion dedup: an incoming batch (deterministic "
    "20% doc_id slice standing in for a new crawl) is near-dup-checked "
    "against the EXISTING corpus via the shared MinHash-LSH band index "
    "— band-bucket join of incoming x existing only, exact shingle "
    "Jaccard verification, then per-incoming-doc novelty verdict. The "
    "production shape for continuous ingestion at 100 TB: the existing "
    "band index is precomputed and persisted (~100 B/doc), the incoming "
    "batch broadcasts against it, per-batch cost O(|batch| + hits) — "
    "the corpus is never self-joined and never rescanned.",
)
def dedup_incremental_lsh(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    incoming_pred = F.col("doc_id") % _INC_MOD == _INC_REM
    # ONE signature pass, split by predicate — the registered demo shape;
    # the streaming pipeline (pipelines/corpus_ingest.py) builds the two
    # sides separately and shares the SAME join/verify/aggregate below
    sig, bands = lsh_signatures(docs)
    ver = batch_novelty_counts(
        sig.where(incoming_pred),
        bands.where(incoming_pred),
        sig.where(~incoming_pred),
        bands.where(~incoming_pred),
    )
    return novelty_verdict(docs.where(incoming_pred).select("doc_id"), ver)


def novelty_verdict(ids_df, ver):
    """Materialize batch_novelty_counts into the per-incoming verdict
    frame (doc_id, n_dup_existing, is_novel) — total over ``ids_df``
    (docs with no verified partner, including sub-3-token docs that
    produced no signature, come back n_dup_existing=0, is_novel=true).
    Shared by the registered query and the corpus-ingest pipeline."""
    return ids_df.join(ver, ids_df.doc_id == ver.in_id, "left").select(
        "doc_id",
        F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup_existing"),
        (F.coalesce("n_dup", F.lit(0)) == 0).alias("is_novel"),
    )


def batch_novelty_counts(in_sig, in_bands, ex_sig, ex_bands):
    """(in_id, n_dup) for every incoming doc with at least one verified
    near-dup among the existing docs: band-collision candidates between
    the two band indexes, exact-Jaccard verification, count distinct
    partners. THE incremental-dedup core, shared by the registered
    dedup_incremental_lsh demo and the streaming corpus-ingest pipeline
    so the stream runs the production join, not a twin. Incoming docs
    with no row have zero duplicates (left-join + coalesce at callers)."""
    cand = (
        in_bands.alias("a")
        .join(
            ex_bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .select(F.col("a.doc_id").alias("in_id"), F.col("b.doc_id").alias("ex_id"))
        .distinct()
    )
    x = in_sig.select(F.col("doc_id").alias("in_id"), F.col("shingles").alias("sa"))
    y = ex_sig.select(F.col("doc_id").alias("ex_id"), F.col("shingles").alias("sb"))
    from crypto_datalake_spark.queries.dedup import shingle_jaccard

    return (
        cand.join(x, "in_id")
        .join(y, "ex_id")
        .where(shingle_jaccard("sa", "sb") >= _JACCARD_MIN)
        .groupBy("in_id")
        .agg(F.countDistinct("ex_id").alias("n_dup"))
    )


# --------------------------------------- exact-substring span removal


@register(
    "scrub_exact_substrings",
    sql="""
    WITH {CTES},
    cuts AS (
      -- DISTINCT: two partners can cut the identical (s, e) interval,
      -- and tied rows may sort differently between the brk window and
      -- the sum(brk) window — deduping makes (s, e) a total order so
      -- the island assignment is deterministic
      SELECT DISTINCT doc_b AS doc_id, b_start AS s,
             b_start + match_tokens AS e
      FROM runs
    ),
    marked AS (
      SELECT doc_id, s, e,
             CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
                  THEN 1 ELSE 0 END AS brk
      FROM cuts
      WINDOW w AS (PARTITION BY doc_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    merged AS (
      SELECT doc_id, min(s) AS s, max(e) AS e
      FROM (SELECT *, sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
                                     ROWS UNBOUNDED PRECEDING) AS g
            FROM marked)
      GROUP BY doc_id, g
    ),
    keepers AS (
      SELECT t.doc_id, u.pos, t.tok[u.pos] AS tk
      FROM tok t, unnest(generate_series(1, len(t.tok))) AS u(pos)
      WHERE t.doc_id IN (SELECT doc_id FROM merged)
        AND NOT EXISTS (SELECT 1 FROM merged m
                        WHERE m.doc_id = t.doc_id
                          AND u.pos >= m.s AND u.pos < m.e)
    ),
    rebuilt AS (
      SELECT c.doc_id, coalesce(string_agg(k.tk, ' ' ORDER BY k.pos), '') AS text
      FROM (SELECT DISTINCT doc_id FROM merged) c
      LEFT JOIN keepers k USING (doc_id)
      GROUP BY c.doc_id
    )
    SELECT d.doc_id,
           coalesce(r.text, d.text) AS text,
           CAST(coalesce(rm.n_removed, 0) AS BIGINT) AS n_tokens_removed
    FROM documents d
    LEFT JOIN rebuilt r USING (doc_id)
    -- sum() over integers is HUGEINT in DuckDB; CAST to match the Spark
    -- side's LONG (the BIGINT discipline every other oracle follows)
    LEFT JOIN (SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS n_removed
               FROM merged GROUP BY doc_id) rm USING (doc_id)
    """.replace("{CTES}", ess_runs_ctes()),
    doc="Exact-substring span REMOVAL (the Lee et al. 2022 policy step "
    "on dedup_exact_substring's runs): for every maximal cross-document "
    "verbatim run, the higher-doc_id document loses its copy — cut "
    "intervals are merged per document (overlaps from different "
    "partners collapse via a cumulative-max interval merge, the "
    "standard gaps-and-islands variant) and the text is rebuilt from "
    "the surviving token positions; untouched documents pass through "
    "byte-identical, fully-cut documents come out empty, and "
    "n_tokens_removed accounts for every dropped token. All per-doc "
    "windows partition by doc_id (tiny, parallel); the rebuild is a "
    "filter+join over token positions of CUT documents only — documents "
    "without a duplicated span never enter the rebuild, so the policy "
    "pass costs O(runs + cut-doc tokens) on top of the run finder.",
)
def scrub_exact_substrings(spark, sf_dir):
    return remove_duplicate_spans(
        t(spark, sf_dir, "documents").select("doc_id", "text")
    )


def remove_duplicate_spans(d, n=None, cap=None, pos_cap=None, grams=None):
    """The Lee et al. span-removal policy over a (doc_id, text) frame —
    the plan documented on scrub_exact_substrings.  ``grams`` forwards
    the run finder's fingerprint tier (rolling Karp-Rabin vs pure-JVM
    slice hashing, queries/dedup.py)."""
    from pyspark.sql import Window

    from crypto_datalake_spark.queries.dedup import exact_substring_runs

    kw = {
        k: v
        for k, v in (
            ("n", n), ("cap", cap), ("pos_cap", pos_cap), ("grams", grams)
        )
        if v is not None
    }
    runs = exact_substring_runs(d, **kw)
    # dropDuplicates mirrors the oracle's DISTINCT: identical (s, e)
    # cuts from different partners would otherwise be tie-ordered
    # independently by the brk window and the sum(brk) window — today
    # Catalyst elides the second sort so both see one order, but that is
    # an optimizer detail, not a semantic guarantee
    cuts = runs.select(
        F.col("doc_b").alias("doc_id"),
        F.col("b_start").alias("s"),
        (F.col("b_start") + F.col("match_tokens")).alias("e"),
    ).dropDuplicates()
    # merge overlapping cut intervals per doc: an interval starts a new
    # island iff it begins past the running max end of everything before
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    merged = (
        cuts.withColumn(
            "brk",
            (prev_max_e.isNull() | (F.col("s") > prev_max_e)).cast("int"),
        )
        .withColumn(
            "g", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("doc_id", "g")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    iv = merged.groupBy("doc_id").agg(
        F.collect_list(F.struct("s", "e")).alias("iv"),
        F.sum(F.col("e") - F.col("s")).alias("n_removed"),
    )
    # rebuild = keep tokens whose 1-based position falls in no interval;
    # only CUT documents pay for the tokenize+filter (left join, null iv
    # passes the original text through untouched and byte-identical)
    kept = F.array_join(
        F.filter(
            F.split("text", " "),
            lambda tk, i: ~F.exists(
                F.col("iv"),
                lambda v: ((i + 1) >= v["s"]) & ((i + 1) < v["e"]),
            ),
        ),
        " ",
    )
    return d.join(iv, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("iv").isNull(), F.col("text")).otherwise(kept).alias("text"),
        F.coalesce("n_removed", F.lit(0)).alias("n_tokens_removed"),
    )


# ---------------------------------------------------- document chunking

_CHUNK_TOKENS = 32   # chunk size (tokens); production: model context budget
_CHUNK_OVERLAP = 8   # tokens shared between consecutive chunks
_CHUNK_STRIDE = _CHUNK_TOKENS - _CHUNK_OVERLAP


@register(
    "chunk_documents",
    sql=f"""
    SELECT doc_id,
           CAST((s - 1) // {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(s AS BIGINT) AS begin_pos,
           CAST(len(tok[s:s + {_CHUNK_TOKENS - 1}]) AS BIGINT) AS n_tokens,
           array_to_string(tok[s:s + {_CHUNK_TOKENS - 1}], ' ') AS text
    FROM (SELECT doc_id, tok,
                 unnest(generate_series(
                   1, greatest(1, len(tok) - {_CHUNK_OVERLAP}),
                   {_CHUNK_STRIDE})) AS s
          FROM (SELECT doc_id, string_split(text, ' ') AS tok
                FROM documents))
    """,
    doc=f"Sliding-window document chunking for training-sequence / RAG "
    f"prep: {_CHUNK_TOKENS}-token chunks with {_CHUNK_OVERLAP}-token "
    f"overlap (stride {_CHUNK_STRIDE}), the complement of sequence "
    "packing (ops/prefix.py packs SHORT docs into fixed budgets; this "
    "splits LONG docs).  Chunk starts are the arithmetic sequence 1, "
    f"1+{_CHUNK_STRIDE}, ... <= n_tokens, so chunk_id/begin_pos are "
    "derivable and deterministic; the final chunk may be short. Scale: "
    "a pure row-expanding map pass (sequence + slice + posexplode) — "
    "no shuffle, no Python, whole-stage-codegen'd except the array "
    "lambdas; output rows ~= tokens/stride per doc, each carrying only "
    "its own slice, so the expansion is bandwidth-proportional at any "
    "corpus size.  Chunk starts stop at n_tokens - overlap: a start past "
    "that point would emit a chunk fully contained in its predecessor — "
    "pure duplication for a training/RAG consumer.",
)
def chunk_documents(spark, sf_dir):
    return chunk_frame(t(spark, sf_dir, "documents"))


def chunk_frame(d, size: int = _CHUNK_TOKENS, stride: int = _CHUNK_STRIDE):
    """Sliding-window chunks over a (doc_id, text) frame — the plan
    documented on chunk_documents."""
    dd = d.select("doc_id", F.split("text", " ").alias("tok"))
    # starts capped at n - overlap: a later start adds zero novel tokens
    # (its chunk is fully contained in the previous one)
    last_start = F.greatest(F.lit(1), F.size("tok") - F.lit(size - stride))
    chunks = F.transform(
        F.sequence(F.lit(1), last_start, F.lit(stride)),
        lambda s: F.struct(
            s.cast("long").alias("begin_pos"),
            F.slice("tok", s, size).alias("ck"),
        ),
    )
    return dd.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "c")
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("c.begin_pos").alias("begin_pos"),
        F.size("c.ck").cast("long").alias("n_tokens"),
        F.array_join("c.ck", " ").alias("text"),
    )
