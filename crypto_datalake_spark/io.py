"""Lake table loaders over the driver's parquet testdata.

Normalisation contract (mirrors the reference's canonical-schema finalize
step, /root/reference/src/binance_minute_lake/transforms/minute_builder.py:644-651):
every table comes out with a fixed, documented schema; all timestamps are
TIMESTAMP_NTZ (naive UTC — identical semantics to the reference's
``pl.Datetime(tz="UTC")`` and to DuckDB's TIMESTAMP, so results are
independent of the Spark session timezone).

``events.ts`` is stored as parquet TIMESTAMP(NANOS).  Spark 4.x reads it
natively as TIMESTAMP_NTZ, truncating ns → µs exactly as DuckDB does when
it coerces ns to its native µs TIMESTAMP, so both engines see identical
values and no special handling is needed.  Spark 3.x rejects the column
([PARQUET_TYPE_ILLEGAL]); for that path we fall back to reading the
physical INT64 and converting by magnitude (values > 4e17 can only be
nanoseconds for plausible data; smaller epoch-scale values are treated as
microseconds — some Spark builds surface the physical long already
µs-truncated, which is exactly the drift that broke round 3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Spark 3.x fallback only: read events.ts as the raw physical INT64.
_EVENTS_PHYSICAL = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

# Epoch-anchored NTZ arithmetic: no session-timezone involvement anywhere.
# Magnitude guard: epoch-nanos for any date after ~1982 exceed 4e17, while
# epoch-micros stay below it until the year ~14655 — so the branch is
# unambiguous for real data regardless of which unit the reader surfaced.
_LONG_TO_NTZ = (
    "timestampadd(MICROSECOND, "
    "CASE WHEN abs(ts) > 400000000000000000 THEN ts div 1000 ELSE ts END, "
    "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
)


def _normalize_events(df: DataFrame) -> DataFrame:
    """Ensure events.ts is TIMESTAMP_NTZ regardless of how the reader surfaced it."""
    (ts_field,) = [f for f in df.schema.fields if f.name == "ts"]
    if isinstance(ts_field.dataType, LongType):
        return df.withColumn("ts", F.expr(_LONG_TO_NTZ))
    # Native read (Spark 4.x): TIMESTAMP(NANOS) arrives as TIMESTAMP_NTZ
    # already truncated to µs — identical to DuckDB's coercion.
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with the normalised schema."""
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        try:
            return _normalize_events(spark.read.parquet(path))
        except Exception:
            # Spark 3.x rejects TIMESTAMP(NANOS): read the physical INT64.
            return _normalize_events(spark.read.schema(_EVENTS_PHYSICAL).parquet(path))
    return spark.read.parquet(path)


def _variant_columns(schema: StructType, column_variants) -> tuple[list, dict]:
    names = [f.name for f in schema.fields]
    variants = {
        f.name: [f.name, *(column_variants or {}).get(f.name, [])]
        for f in schema.fields
    }
    return names, variants


def _coalesce_variants(raw_pdf, names: list, variants: dict):
    """First-present-variant coalesce over ONE parsed file's columns —
    the shared core of the plain-CSV and ZIP-member loaders."""
    import pandas as pd

    out = {}
    for n in names:
        present = [v for v in variants[n] if v in raw_pdf.columns]
        if not present:
            out[n] = pd.Series([None] * len(raw_pdf), dtype=object)
        else:
            s = raw_pdf[present[0]]
            for v in present[1:]:
                s = s.combine_first(raw_pdf[v])
            out[n] = s
    return pd.DataFrame(out)


def load_csv_with_variants(
    spark: SparkSession,
    path: str,
    schema: StructType,
    column_variants: dict[str, list[str]] | None = None,
) -> DataFrame:
    """CSV loader tolerating header variants (SURVEY.md §2.1 S7).

    The reference's Vision ZIP loader parses daily CSVs whose headers
    drifted across history and coalesces alternate column names into the
    canonical one (/root/reference/src/binance_minute_lake/sources/
    vision_loader.py:121-155, 264-346).

    Parsing is PER FILE — ``binaryFile`` scan (parallel across files) +
    in-executor pandas parse of each file's OWN header — not Spark's
    multi-file csv source: that source takes column names from the FIRST
    file only and binds every other file's rows positionally, so header
    drift across daily files (the entire point of variant tolerance)
    would never surface in ``columns`` and reordered/extra columns would
    silently land under the wrong canonical names.  Each file's columns
    coalesce first-present-variant, then ONE Spark-side cast to the
    target schema.  gzip/bzip2 decompress per extension; true ZIP
    archives go through :func:`load_zip_csv`.

    Bounds: ``binaryFile`` holds ONE whole file per task and caps files
    at 2 GiB — the right trade at the data's natural daily-file grain
    (the reference's Vision files are ~1-40 MB).  A monolithic
    uniform-header giant should go through plain splittable
    ``spark.read.csv`` instead.  Zero-byte / header-only files yield no
    rows (pandas raises EmptyDataError on truly empty input; an absent
    day is absent data, not a parse failure).
    """
    import pandas as pd

    names, variants = _variant_columns(schema, column_variants)
    str_schema = StructType([StructField(n, StringType()) for n in names])

    def parse(batches):
        import io as _io

        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                comp = (
                    "gzip"
                    if p.endswith(".gz")
                    else "bz2" if p.endswith(".bz2") else None
                )
                try:
                    raw = pd.read_csv(
                        _io.BytesIO(content), dtype=str, compression=comp
                    )
                except pd.errors.EmptyDataError:
                    continue  # zero-byte file: no rows, not an error
                yield _coalesce_variants(raw, names, variants)

    raw = spark.read.format("binaryFile").load(path)
    strs = raw.select("path", "content").mapInPandas(parse, str_schema)
    return strs.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def load_zip_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    column_variants: dict[str, list[str]] | None = None,
    member_suffix: str = ".csv",
) -> DataFrame:
    """Read CSV members inside daily ZIP archives, distributed (SURVEY.md
    §2.1 S7 tail).

    The reference's Vision loader downloads one ``<SYMBOL>-1m-<date>.zip``
    per symbol-day and parses the CSV member in-process
    (/root/reference/src/binance_minute_lake/sources/vision_loader.py:
    264-313).  Spark's text sources cannot open ZIP members, so the
    Spark-first shape is: ``binaryFile`` source (one row per archive —
    the scan parallelises across archives, which is exactly the data's
    natural grain: thousands of symbol-day files) → ``mapInPandas``
    extracts members with ``zipfile``/``pandas`` in-executor, Arrow-
    batched — no driver round-trip, no landing-zone pre-extract → every
    canonical column emitted as a STRING with the same first-present-
    variant coalesce as :func:`load_csv_with_variants` → one Spark-side
    cast to the target schema, so type coercion matches the plain-CSV
    path exactly.

    Headers are assumed present (the reference's ``pl.read_csv`` default;
    all Vision daily files since 2021 carry them).  Memory per task is
    one decompressed member (daily 1m klines ≪ executor memory).  The
    reference's ``.missing``-marker TTL cache is HTTP-ingestion logic
    (SURVEY S8-S10, out of engine scope): here a missing archive simply
    isn't on disk, so it never reaches the reader.
    """
    import pandas as pd

    names, variants = _variant_columns(schema, column_variants)
    str_schema = StructType([StructField(n, StringType()) for n in names])

    def extract(batches):
        import io as _io
        import zipfile

        for pdf in batches:
            for content in pdf["content"]:
                with zipfile.ZipFile(_io.BytesIO(content)) as zf:
                    members = [
                        m for m in zf.namelist() if m.endswith(member_suffix)
                    ]
                    for m in members:
                        with zf.open(m) as fh:
                            try:
                                raw = pd.read_csv(fh, dtype=str)
                            except pd.errors.EmptyDataError:
                                # a zero-byte/header-less member is "no
                                # rows", not an error — same tolerance as
                                # load_csv_with_variants; one empty member
                                # must not kill a thousand-archive load
                                continue
                        yield _coalesce_variants(raw, names, variants)

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .load(path)
    )
    strs = raw.select("content").mapInPandas(extract, str_schema)
    return strs.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (mirror of the reference's DuckDB
    BI view, /root/reference/src/binance_minute_lake/cli/app.py:112-154)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def warehouse_cache_path(name: str, source_paths) -> str:
    """The warehouse directory a ``warehouse_cached(name, source_paths)``
    build publishes to — the fingerprint (size + mtime of each source)
    is computable WITHOUT the artifact existing, so surrogate oracles
    can embed the path before the first build runs."""
    import hashlib

    fp = hashlib.md5()
    for p in sorted(source_paths):
        st = os.stat(p)
        fp.update(f"{p}:{st.st_size}:{st.st_mtime_ns};".encode())
    key = fp.hexdigest()[:12]
    wh = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse",
    )
    return os.path.join(wh, f"{name}__{key}")


def warehouse_cached(spark: SparkSession, name: str, source_paths, build):
    """Build-once parquet cache for derived tables (trained centroids,
    materialized synthetic stores): returns ``spark.read.parquet`` over a
    warehouse directory, building it via ``build() -> DataFrame`` on
    first use.

    The cache key fingerprints the SOURCE files (size + mtime), so a
    regenerated source dataset — or a different dataset mounted at the
    same directory name — invalidates the cache instead of silently
    serving stale derived data.  Publication is atomic: the build writes
    to a tmp directory that is renamed into place, so two processes
    racing the first build cannot interleave files (the loser discards
    its tmp and reads the winner's), and a crashed build leaves only an
    orphan tmp, never a half-written cache that passes the existence
    check.  Stale keys of the same ``name`` are pruned best-effort on
    publish.  A production lake would key on the source table's txn
    generation (txn.py) instead of file stat."""
    import glob
    import shutil
    import uuid as _uuid

    path = warehouse_cache_path(name, source_paths)
    wh = os.path.dirname(path)
    # validity check is the DIRECTORY, not _SUCCESS: publication is an
    # atomic rename of a fully-written tmp, so the path existing already
    # proves a complete build (and sessions configured with
    # marksuccessfuljobs=false would otherwise rebuild + EEXIST forever)
    if not os.path.exists(path):
        import time as _time

        tmp = f"{path}.tmp-{_uuid.uuid4().hex[:8]}"
        build().write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)  # atomic publish; fails if winner beat us
            for old in glob.glob(os.path.join(wh, f"{name}__*")):
                base = os.path.basename(old)
                if old == path:
                    continue
                if ".tmp-" in base:
                    # an in-flight tmp belongs to a live concurrent build —
                    # but a CRASHED build's orphan (full parquet copy of a
                    # derived table) would otherwise accumulate forever.
                    # Age-gate: no build runs for 6 hours.
                    try:
                        if _time.time() - os.path.getmtime(old) > 6 * 3600:
                            shutil.rmtree(old, ignore_errors=True)
                    except OSError:
                        pass
                else:
                    # UNPUBLISH before deleting: rmtree is not atomic, and
                    # a crash mid-delete would leave a partial directory at
                    # a readable cache path — a process still keyed to the
                    # old source fingerprint would read it as a complete
                    # build (silently truncated derived table).  Renaming
                    # to a .trash-* name first is atomic, so the old key's
                    # path either holds the full build or nothing; the
                    # trash path is never a computed cache key (keys are
                    # 12 hex chars, no suffix) so nothing ever reads it.
                    trash = f"{old}.trash-{_uuid.uuid4().hex[:8]}"
                    try:
                        os.rename(old, trash)
                    except OSError:
                        continue  # lost a race to a concurrent publisher
                    shutil.rmtree(trash, ignore_errors=True)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(path):  # not a lost race: real failure
                raise
    return spark.read.parquet(path)
