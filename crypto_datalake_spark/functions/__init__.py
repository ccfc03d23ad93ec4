"""Scalar/recurrence function library (UDF surface of SURVEY.md §2.9)."""

from crypto_datalake_spark.functions.ema import ema_by_group  # noqa: F401
from crypto_datalake_spark.functions.pivots import traditional_pivots  # noqa: F401
