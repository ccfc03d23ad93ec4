"""Domain pipelines composing the operator library (SURVEY.md §3).

- ``minute_builder`` — spine densification + multi-source joins + derive +
  fill policies (§3.2, the ingestion transform).
- ``htf_aggregator`` — registry-driven HTF bucket aggregation with
  completeness accounting and incremental idempotent upsert (§3.3).
- ``serving`` — API-shaped timeframe aggregation + derived-field block +
  indicators (§3.1).
"""

from crypto_datalake_spark.pipelines.htf_aggregator import (  # noqa: F401
    aggregate_minutes,
    detect_missing_buckets,
    incremental_update,
)
from crypto_datalake_spark.pipelines.minute_builder import (  # noqa: F401
    build_canonical_frame,
)
from crypto_datalake_spark.pipelines.serving import (  # noqa: F401
    aggregate_canonical_frame,
)
