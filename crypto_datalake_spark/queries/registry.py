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


# The scale factor the external driver runs its correctness compare at;
# surrogate oracles that embed artifact paths resolve against it when no
# explicit sf_dir is given.
DRIVER_SF_DIR = "/root/testdata/sf0.01"


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    # str: static DuckDB oracle.  Callable: SURROGATE oracle — resolved
    # lazily with the sf_dir under test, so it can embed the path of a
    # persisted fitted artifact (trained centroids/codebooks/
    # coefficients) and oracle the serving policy CONDITIONAL on the
    # fit.  None: genuinely non-SQL-expressible (rows-only check).
    sql: str | Callable[[str], str] | None
    doc: str

    def resolved_sql(self, sf_dir: str = DRIVER_SF_DIR) -> str | None:
        if not callable(self.sql):
            return self.sql
        try:
            return self.sql(sf_dir)
        except OSError:
            # surrogate oracles fingerprint their source parquet to embed
            # the fitted-artifact path; on a host where sf_dir's sources
            # are absent the surrogate degrades to the rows-only check
            # instead of taking every STATIC oracle down with it
            return None


REGISTRY: dict[str, Query] = {}


def register(
    name: str, sql: str | Callable[[str], str] | None = None, doc: str = ""
):
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
    """Driver-facing oracle map, resolved at the driver's correctness SF
    (surrogate oracles embed artifact paths for that SF)."""
    out = {}
    for q in REGISTRY.values():
        s = q.resolved_sql()
        if s is not None:
            out[q.name] = s
    return out
