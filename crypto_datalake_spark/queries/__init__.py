"""Driver-facing query catalog.

Importing this package populates the registry from every query module.
"""

from crypto_datalake_spark.queries import (  # noqa: F401  (registration side-effects)
    aggs,
    core,
    dedup,
    derived,
    joins,
    llm,
    streaming_q,
    tpch,
    windows,
)
from crypto_datalake_spark.queries.registry import (  # noqa: F401
    REGISTRY,
    oracle_sql,
    queries,
)
