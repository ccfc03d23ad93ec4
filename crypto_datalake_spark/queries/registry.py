"""Query registry: every SURVEY.md §2 operator as a certified query.

Each entry couples a Spark implementation ``(spark, sf_dir) -> DataFrame``
with its DuckDB oracle SQL (None for non-SQL-expressible ops).  The driver
hash-compares the two at sf=0.01, sorting columns by name, so:

- output column NAMES must match exactly on both sides;
- float aggregates must be engine-deterministic (see ops.agg: decimal
  sums, double division, explicit rank formulas);
- timestamps are TIMESTAMP_NTZ ↔ DuckDB naive TIMESTAMP.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None
    doc: str


REGISTRY: dict[str, Query] = {}


def register(name: str, sql: str | None = None, doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.sql for q in REGISTRY.values() if q.sql is not None}
