"""ZIP-member CSV ingestion (SURVEY.md §2.1 S7 tail).

The reference's Vision loader parses CSVs inside daily ZIP archives
(vision_loader.py:264-313); load_zip_csv is the distributed twin:
binaryFile scan → in-executor zipfile extraction → header-variant
coalesce → Spark-side cast.  Tested against synthetic archives (header
variants, missing columns, multi-archive globs) and, where present, the
reference's own daily-klines fixtures.
"""

from __future__ import annotations

import glob
import io
import os
import zipfile

import pytest

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from crypto_datalake_spark.io import load_zip_csv

KLINES_SCHEMA = StructType(
    [
        StructField("open_time", LongType()),
        StructField("open", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
        StructField("close", DoubleType()),
        StructField("volume", DoubleType()),
        StructField("close_time", LongType()),
        StructField("quote_volume", DoubleType()),
        StructField("count", LongType()),
    ]
)

VARIANTS = {
    "quote_volume": ["quote_asset_volume"],
    "count": ["number_of_trades", "trades"],
}

REF_KLINES = "/root/reference/.cache/vision_api/klines"


def _write_zip(path, member, text):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(member, text)
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())


def test_zip_csv_header_variants_and_cast(spark, tmp_path):
    # archive 1: canonical headers
    _write_zip(
        tmp_path / "AAA-1m-2024-01-01.zip",
        "AAA-1m-2024-01-01.csv",
        "open_time,open,high,low,close,volume,close_time,quote_volume,count\n"
        "1000,1.0,2.0,0.5,1.5,10,1999,15.0,3\n"
        "2000,1.5,2.5,1.0,2.0,20,2999,30.0,4\n",
    )
    # archive 2: drifted headers (variant names) + a missing column (count)
    _write_zip(
        tmp_path / "AAA-1m-2024-01-02.zip",
        "AAA-1m-2024-01-02.csv",
        "open_time,open,high,low,close,volume,close_time,quote_asset_volume\n"
        "3000,2.0,3.0,1.5,2.5,30,3999,60.0\n",
    )
    df = load_zip_csv(spark, str(tmp_path), KLINES_SCHEMA, VARIANTS)
    assert df.schema == KLINES_SCHEMA
    rows = {r["open_time"]: r for r in df.collect()}
    assert set(rows) == {1000, 2000, 3000}
    assert rows[3000]["quote_volume"] == 60.0  # variant coalesced
    assert rows[3000]["count"] is None  # absent column -> NULL
    assert rows[1000]["count"] == 3 and isinstance(rows[1000]["count"], int)


def test_zip_csv_ignores_non_csv_members(spark, tmp_path):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("readme.txt", "not data")
        zf.writestr(
            "BBB.csv",
            "open_time,open,high,low,close,volume,close_time,quote_volume,count\n"
            "5000,1,1,1,1,1,5999,1.0,1\n",
        )
    (tmp_path / "BBB-1m-2024-01-01.zip").write_bytes(buf.getvalue())
    df = load_zip_csv(spark, str(tmp_path), KLINES_SCHEMA, VARIANTS)
    assert df.count() == 1


@pytest.mark.skipif(
    not os.path.isdir(REF_KLINES), reason="reference vision fixtures absent"
)
def test_zip_csv_reads_reference_daily_klines(spark):
    sym = sorted(os.listdir(REF_KLINES))[0]
    zips = sorted(glob.glob(f"{REF_KLINES}/{sym}/*.zip"))[:3]
    assert zips, "no zip fixtures for first symbol"
    # point the glob at the symbol dir; restrict via pathGlobFilter=*.zip
    df = load_zip_csv(
        spark, os.path.dirname(zips[0]), KLINES_SCHEMA, VARIANTS
    )
    n = df.count()
    assert n > 0
    got = df.where("open_time IS NULL OR open IS NULL").count()
    assert got == 0
    # minute spacing holds within each archive
    first = df.orderBy("open_time").limit(2).collect()
    assert first[1]["open_time"] - first[0]["open_time"] == 60_000


def test_plain_csv_header_drift_across_files(spark, tmp_path):
    """Two daily CSVs in one directory whose headers DIFFER (variant name
    + reordered columns). Spark's multi-file csv source binds rows
    positionally to the first file's header; the per-file loader must
    parse each file's own header so both days land correctly."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from crypto_datalake_spark.io import load_csv_with_variants

    d = tmp_path / "daily"
    d.mkdir()
    (d / "day1.csv").write_text("open_time,open\n1000,1.5\n")
    # day2: variant header name AND reversed column order
    (d / "day2.csv").write_text("open,openTime\n2.5,2000\n")

    schema = StructType(
        [StructField("open_time", LongType()), StructField("open", DoubleType())]
    )
    got = sorted(
        load_csv_with_variants(
            spark, str(d), schema, {"open_time": ["openTime"]}
        ).collect()
    )
    assert [(r["open_time"], r["open"]) for r in got] == [
        (1000, 1.5),
        (2000, 2.5),  # NOT (2, 2000.0) — positional binding would corrupt
    ]


def test_plain_csv_gzip_member(spark, tmp_path):
    import gzip

    from pyspark.sql.types import LongType, StructField, StructType

    from crypto_datalake_spark.io import load_csv_with_variants

    d = tmp_path / "gz"
    d.mkdir()
    (d / "a.csv.gz").write_bytes(gzip.compress(b"k\n7\n"))
    schema = StructType([StructField("k", LongType())])
    got = load_csv_with_variants(spark, str(d), schema).collect()
    assert [r["k"] for r in got] == [7]
