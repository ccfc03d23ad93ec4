"""Reusable operator library.

Each module carries one family of non-native semantics from the reference,
re-expressed as composable DataFrame transforms that Catalyst can optimise
(no collect(), no Python row loops, single-shuffle designs):

- ``time``  — dense spines, arbitrary-interval bucketing, calendar buckets.
- ``asof``  — as-of joins with tolerance/direction/shift (union+window, no
              range-join blowup).
- ``fill``  — limited / unlimited forward-fill.
- ``dedup`` — keep-last dedup, union-dedup priority merges.
- ``gaps``  — gaps-and-islands, missing-bucket detection.
- ``agg``   — weighted averages, ratio-of-sums, nearest-rank percentiles,
              deterministic first/last-non-null, exact decimal sums.
"""

from crypto_datalake_spark.ops.agg import (  # noqa: F401
    dsum,
    first_nonnull,
    last_nonnull,
    nearest_rank_percentile,
    ratio_of_sums,
    wavg,
    wavg_with_mean_fallback,
)
from crypto_datalake_spark.ops.asof import asof_join  # noqa: F401
from crypto_datalake_spark.ops.dedup import keep_last, union_dedup  # noqa: F401
from crypto_datalake_spark.ops.fill import ffill  # noqa: F401
from crypto_datalake_spark.ops.gaps import islands, missing_slots  # noqa: F401
from crypto_datalake_spark.ops.time import (  # noqa: F401
    bucket_floor,
    expected_minutes,
    minute_spine,
)
