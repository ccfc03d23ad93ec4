#!/usr/bin/env python
"""Capture .explain("formatted") for bench queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [query ...]
  tag    subdirectory under plans/ plus the _before/_after suffix,
         e.g. "r14/search_bm25_topk_before" comes from
         `python tools/capture_plans.py r14 --suffix before search_bm25_topk`.

With no query list, captures every BENCH_QUERIES entry.

--no-checkpoint (VERDICT r14 item 3): localCheckpoint truncates the
plan at a Scan ExistingRDD, so work upstream of a checkpoint is
invisible in the default dumps and claims about it were not
plan-checkable.  The flag monkeypatches DataFrame.localCheckpoint to
identity while building the plan (semantically a no-op — checkpoints
here only pin materialization), writing `<name>_<suffix>_nockpt.txt`
with the FULL logical tree.  These dumps show the would-be-executed
shape, not the executed stages; read them alongside the default dumps.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402
from crypto_datalake_spark.queries import REGISTRY  # noqa: E402
from crypto_datalake_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", help="plans/ subdirectory (e.g. r14)")
    ap.add_argument("--suffix", default="before", choices=["before", "after"])
    ap.add_argument(
        "--no-checkpoint", action="store_true",
        help="patch localCheckpoint to identity so pre-checkpoint "
        "subtrees appear in the dump (files get a _nockpt suffix)",
    )
    ap.add_argument("queries", nargs="*", help="query names (default: all benched)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("cds-plans", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    file_suffix = args.suffix
    if args.no_checkpoint:
        # patch the CONCRETE class too: Spark 4 instances are
        # pyspark.sql.classic.dataframe.DataFrame, which overrides
        # localCheckpoint, so patching only the base alias is a no-op
        from pyspark.sql import DataFrame

        DataFrame.localCheckpoint = lambda self, eager=True: self
        try:
            from pyspark.sql.classic.dataframe import DataFrame as _CDF

            _CDF.localCheckpoint = lambda self, eager=True: self
        except ImportError:
            pass
        file_suffix = f"{args.suffix}_nockpt"

    names = args.queries or BENCH_QUERIES
    for name in names:
        q = REGISTRY[name]
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR capturing plan: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{file_suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
