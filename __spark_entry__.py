"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``  — flagship query (HTF bucket aggregation over the
  events table) at sf0.001; smoke check.
- ``queries()``     — every implemented SURVEY.md §2 operator as a
  ``(spark, sf_dir) -> DataFrame`` callable.
- ``oracle_sql()``  — matching DuckDB SQL per query (same column names).

Implementations live in ``crypto_datalake_spark``; this module is a thin
adapter so the engine stays importable as a library.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crypto_datalake_spark import queries as _catalog  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: minute bars from raw events → 15-minute HTF bucket
    aggregation with completeness accounting (SURVEY.md §2.4 A4/A10 —
    the reference's core aggregator shape)."""
    return _catalog.REGISTRY["a4_htf_bucket_agg"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    # Surrogate oracles (the trained-model queries) read persisted
    # fitted artifacts from spark-warehouse/; if the driver executes an
    # oracle before the corresponding Spark query has built its
    # artifact, read_parquet would fail — so pre-build any missing
    # artifact here.  No-op (one os.path.exists check per artifact) when
    # the artifacts are already on disk.  Buildability is decided PER
    # artifact (an artifact whose sources are absent is skipped — its
    # surrogate oracle degrades to rows-only in resolved_sql — without
    # vetoing the pre-build of artifacts whose sources ARE present), and
    # a failed pre-build must never take the STATIC oracles down: the
    # affected surrogate oracles just fail per-query at the driver's
    # read_parquet instead.
    import sys as _sys

    from crypto_datalake_spark.queries.llm import missing_model_builds
    from crypto_datalake_spark.queries.registry import DRIVER_SF_DIR

    try:
        builds = missing_model_builds(DRIVER_SF_DIR)
        if builds:
            # reuses the driver's active session when one exists;
            # otherwise builds a local one (driver getOrCreate reuses it)
            from crypto_datalake_spark.session import get_spark

            spark = get_spark("cds-oracle-prebuild")
            for build in builds:
                build(spark)
    except Exception as e:  # noqa: BLE001 — oracle map must survive
        print(f"[oracle_sql] artifact pre-build failed: {e!r}",
              file=_sys.stderr)
    return _catalog.oracle_sql()
