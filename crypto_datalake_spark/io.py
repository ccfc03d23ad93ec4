"""Lake table loaders over the driver's parquet testdata.

Normalisation contract (mirrors the reference's canonical-schema finalize
step, /root/reference/src/binance_minute_lake/transforms/minute_builder.py:644-651):
every table comes out with a fixed, documented schema; all timestamps are
TIMESTAMP_NTZ (naive UTC — identical semantics to the reference's
``pl.Datetime(tz="UTC")`` and to DuckDB's TIMESTAMP, so results are
independent of the Spark session timezone).

``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's parquet
reader rejects outright ([PARQUET_TYPE_ILLEGAL]).  We read the physical
INT64 (nanoseconds since epoch) via an explicit schema and truncate to
microseconds exactly as DuckDB does when it coerces ns → its native µs
TIMESTAMP, so both engines see identical values.
"""

from __future__ import annotations

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

# events.ts must be read as raw INT64 nanoseconds (see module docstring).
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
_NS_TO_NTZ = "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with the normalised schema."""
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        raw = spark.read.schema(_EVENTS_PHYSICAL).parquet(path)
        return raw.withColumn("ts", F.expr(_NS_TO_NTZ))
    return spark.read.parquet(path)


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
    vision_loader.py:121-155, 264-346). Spark-side: read with header
    inference, then for each canonical column take the first present
    variant; missing columns become NULL, then cast to the target schema.

    gzip/bzip2 CSVs decompress natively; for true ZIP archives,
    pre-extract in the landing zone (ingestion-side, like the reference's
    disk cache) — Spark's text sources do not read .zip members.
    """
    raw = spark.read.option("header", True).csv(path)
    cols = set(raw.columns)
    out = []
    for field in schema.fields:
        variants = [field.name, *(column_variants or {}).get(field.name, [])]
        present = [v for v in variants if v in cols]
        if not present:
            expr = F.lit(None)
        elif len(present) == 1:
            expr = F.col(present[0])
        else:
            expr = F.coalesce(*[F.col(v) for v in present])
        out.append(expr.cast(field.dataType).alias(field.name))
    return raw.select(*out)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (mirror of the reference's DuckDB
    BI view, /root/reference/src/binance_minute_lake/cli/app.py:112-154)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
