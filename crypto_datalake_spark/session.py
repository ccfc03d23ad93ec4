"""SparkSession construction tuned for the lake workload.

The reference is single-node Polars (no session concept); here the session
carries the scale-relevant knobs: AQE for runtime re-planning and skew-join
handling, broadcast threshold for the small dimension tables, UTC session
timezone so instant-typed timestamps render identically everywhere.

All lake timestamps are normalised to TIMESTAMP_NTZ by ``io`` (naive-UTC,
like the reference's ``pl.Datetime("ms", tz="UTC")`` columns — see
/root/reference/src/binance_minute_lake/core/schema.py:336-342), so query
results are independent of the session timezone; setting UTC is belt and
braces for anything that does cast through an instant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "crypto-datalake-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with lake-appropriate defaults.

    Scale notes (local[32] here, 1000-executor cluster in production):
    - AQE on: coalesces post-shuffle partitions, converts to broadcast
      joins at runtime, splits skewed shuffle partitions.
    - shuffle.partitions is a floor; AQE coalesces down, so oversizing is
      cheap while undersizing causes spills at 100 TB.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Python workers (mapInPandas: rolling-hash grams, EMA, multimodal)
    # inherit the JVM's environment, NOT the driver's sys.path — a driver
    # launched from any other cwd could import this package while its
    # workers raise ModuleNotFoundError mid-query (observed from /tmp).
    # Exporting the package root on PYTHONPATH before the JVM starts
    # makes worker imports cwd-independent; the driver-side equivalent
    # (spark.submit.pyFiles) ships a zip per app, overkill for local.
    _pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _pp = os.environ.get("PYTHONPATH", "")
    if _pkg_root not in _pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{_pkg_root}{os.pathsep}{_pp}" if _pp else _pkg_root
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif SparkSession.getActiveSession() is None:
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable defaults to an externally provided session.

    The driver hands our queries its own session; runtime confs keep
    rendering/semantics stable without rebuilding it.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass  # static conf on some builds; harmless
    return spark
