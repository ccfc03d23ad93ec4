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
    return _catalog.oracle_sql()
