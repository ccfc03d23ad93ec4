#!/usr/bin/env python
"""Time individual registered queries in isolation (noop sink, min-of-N).

Usage: python tools/profile_query.py q1 [q2 ...] [--runs 3] [--sf-dir DIR]

Same methodology as bench.py (warmup tables + worker pool, min-of-N
through the noop sink) but for an arbitrary subset, so a single query
can be iterated on without paying for the whole bench.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_datalake_spark.queries import REGISTRY  # noqa: E402
from crypto_datalake_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("cds-profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    from crypto_datalake_spark.io import TABLES, load_table

    for t in TABLES:
        load_table(spark, args.sf_dir, t).limit(1).collect()
    REGISTRY["s3_minmax_scan"].fn(spark, args.sf_dir).collect()
    spark.range(0, int(cpus), 1, int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    timings: dict[str, list[float]] = {}
    for name in args.queries:
        q = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            q.fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        timings[name] = runs
    print(json.dumps(
        {
            name: {"min": min(r), "runs": r}
            for name, r in timings.items()
        },
        indent=1,
    ))
    spark.stop()


if __name__ == "__main__":
    main()
