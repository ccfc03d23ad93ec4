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


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (mirror of the reference's DuckDB
    BI view, /root/reference/src/binance_minute_lake/cli/app.py:112-154)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
