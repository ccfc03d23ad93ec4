#!/usr/bin/env python
"""Measure the BM25 exact-DECIMAL(12,7) scoring tax (VERDICT r12 item 3).

Times ``bm25_topk`` twice at $SPARK_GRAFT_SF_DIR — shipped exact-decimal
scoring vs the production ``decimal_scores=False`` double-scoring knob —
with bench.py's exact methodology (noop sink, min-of-3, warmed session),
and prints one JSON line with both timings and the ratio.  The delta is
recorded in SCALE.md next to the BM25 plan note; the shipped semantics
stay decimal (bit-stable oracle ranking).

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/measure_bm25_decimal_tax.py
  SPARK_GRAFT_SF_DIR=/root/repo/scale_data/sf1 python tools/measure_bm25_decimal_tax.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_datalake_spark.queries.common import t  # noqa: E402
from crypto_datalake_spark.queries.retrieval import bm25_topk  # noqa: E402
from crypto_datalake_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spark = get_spark("cds-bm25-tax", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = t(spark, sf_dir, "documents")
    docs.limit(1).collect()  # file-listing/footer warmup

    def best_of(decimal_scores: bool) -> float:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            bm25_topk(docs, decimal_scores=decimal_scores).write.mode(
                "overwrite"
            ).format("noop").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    # decimal first, then double: the shared tokenize/codegen warmup is
    # absorbed by the decimal run, so any bias UNDERSTATES the tax
    dec = best_of(True)
    dbl = best_of(False)
    print(
        json.dumps(
            {
                "metric": "bm25_topk decimal-scoring tax (min-of-%d)" % runs,
                "decimal_sec": dec,
                "double_sec": dbl,
                "tax_ratio": round(dec / dbl, 3) if dbl else None,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
