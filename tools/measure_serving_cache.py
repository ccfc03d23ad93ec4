#!/usr/bin/env python
"""Measure the ServingCache reuse payoff (VERDICT r13 item 4).

O4's correctness is property-swept (tests/test_serving_cache.py: TTL ×
equal-end, sub-window segments, single-flight), but until r14 its
PERFORMANCE story — what each reuse tier actually saves over a Spark
recompute — had never been measured.  This drives the REAL serving body
(``PerpetualDataService._cached_window``: planner → lake read →
aggregate → cache) over a 30-day × 1-symbol minute lake and times every
tier:

- miss      — cold full compute (limit bars) through serve_timeframe
- exact     — same (key, end) again: pure cache list slice
- superset  — same key at an older end inside the cached segment
              (the reference's sub-window serve, service.py:358-474)
- partial   — same key at a newer end: head-only fetch (gap+1 bars)
              merged with the cached tail, vs the full recompute a
              cache-less server would pay at that end

Prints one JSON line; the numbers live in SCALE.md next to the O4 row.

Usage:  python tools/measure_serving_cache.py
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crypto_datalake_spark.http_api import (  # noqa: E402
    PerpetualDataService,
    _to_epoch,
)
from crypto_datalake_spark.schema import finalize  # noqa: E402
from crypto_datalake_spark.session import get_spark  # noqa: E402

MINUTES = 43_200  # 30 days
TF = "5m"
LIMIT = 500


def _build_lake(spark, root: str) -> str:
    """One symbol, 30 days of synthetic minute bars conforming to the
    canonical schema (finalize adds the optional columns as NULL)."""
    base = dt.datetime(2024, 1, 1)
    df = (
        spark.range(MINUTES)
        .select(
            (F.lit(base) + F.make_interval(mins=F.col("id"))).alias("timestamp"),
            F.lit("BTCUSDT").alias("symbol"),
            (100.0 + F.pmod(F.col("id"), F.lit(50)).cast("double")).alias("open"),
            (110.0 + F.pmod(F.col("id"), F.lit(50)).cast("double")).alias("high"),
            (90.0 + F.pmod(F.col("id"), F.lit(50)).cast("double")).alias("low"),
            (105.0 + F.pmod(F.col("id"), F.lit(50)).cast("double")).alias("close"),
            F.lit(2.0).alias("volume_btc"),
            (200.0 + F.pmod(F.col("id"), F.lit(7)).cast("double")).alias("volume_usdt"),
            F.lit(10).cast("long").alias("trade_count"),
        )
    )
    path = os.path.join(root, "m1")
    finalize(df).write.parquet(path)
    return path


def main() -> None:
    spark = get_spark("cds-cache-bench", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="cache_bench_")
    try:
        tables = {"1m": _build_lake(spark, root)}
        sym = "BTCUSDT"
        key = (sym, TF, LIMIT)

        e0 = dt.datetime(2024, 1, 30, 23, 45)          # 5m-aligned
        e_old = e0 - dt.timedelta(minutes=25)          # sub-window end
        e_new = dt.datetime(2024, 1, 31, 0, 0)         # newer end, data exists

        def call(svc, end):
            return svc._cached_window(sym, TF, LIMIT, end, _to_epoch(end), key)

        # Spark/plan warmup on a throwaway service so the first timed
        # miss measures the serve path, not JVM/codegen startup
        call(PerpetualDataService(spark, tables), e0)

        def timed(fn, reps):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn()
                best = min(best, time.perf_counter() - t0)
            return best, out

        # miss: fresh cache each rep (full compute)
        def miss_once():
            svc = PerpetualDataService(spark, tables)
            return call(svc, e0)

        t_miss, (_, info) = timed(miss_once, 3)
        assert info["cache"] == "miss", info

        # exact + superset against one warm service
        svc = PerpetualDataService(spark, tables)
        call(svc, e0)
        t_exact, (bars, info) = timed(lambda: call(svc, e0), 5)
        assert info["cache"] == "exact" and len(bars) == LIMIT, info
        t_sup, (bars, info) = timed(lambda: call(svc, e_old), 5)
        assert info["cache"] == "superset" and len(bars) == LIMIT, info

        # partial: per rep, fresh service warmed at e0, timed at e_new
        def partial_once():
            s = PerpetualDataService(spark, tables)
            call(s, e0)
            t0 = time.perf_counter()
            out = call(s, e_new)
            return time.perf_counter() - t0, out

        t_partial = float("inf")
        for _ in range(3):
            took, (bars, info) = partial_once()
            t_partial = min(t_partial, took)
        assert info["cache"] == "partial" and len(bars) == LIMIT, info
        head_bars = info["head_bars_fetched"]

        # what a cache-less server pays at the same newer end
        def full_new_once():
            s = PerpetualDataService(spark, tables)
            return call(s, e_new)

        t_full_new, (_, info) = timed(full_new_once, 3)
        assert info["cache"] == "miss", info

        print(
            json.dumps(
                {
                    "metric": "serving-cache tier payoff (min-of-reps)",
                    "lake_minutes": MINUTES,
                    "tf": TF,
                    "limit": LIMIT,
                    "miss_sec": round(t_miss, 4),
                    "exact_sec": round(t_exact, 6),
                    "superset_sec": round(t_sup, 6),
                    "partial_sec": round(t_partial, 4),
                    "full_at_partial_end_sec": round(t_full_new, 4),
                    "head_bars_fetched": head_bars,
                    "exact_speedup": round(t_miss / t_exact, 1),
                    "superset_speedup": round(t_miss / t_sup, 1),
                    "partial_speedup": round(t_full_new / t_partial, 2),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
