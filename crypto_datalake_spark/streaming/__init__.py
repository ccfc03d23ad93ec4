"""Structured Streaming subsystem (SURVEY.md §2.8 ST1-ST12).

The reference's WS collector (/root/reference/src/binance_minute_lake/
sources/websocket.py) is a thread + asyncio + SQLite stack; here every
piece maps to Structured Streaming:

- bronze append streams  → ``readStream`` file sources (``sources``)
- per-minute accumulators → event-time windowed agg + watermark
  (``minute_features``)
- order-book state machine → ``applyInPandasWithState`` (``orderbook``)
- silver upsert / late repair → ``foreachBatch`` merge (``silver``)
- retention cleanup → partition-drop delete (``silver.retention_delete``)
"""

from crypto_datalake_spark.streaming.minute_features import (  # noqa: F401
    minute_feature_stream,
)
from crypto_datalake_spark.streaming.orderbook import (  # noqa: F401
    DEPTH_EVENT_SCHEMA,
    book_state_stream,
    book_state_stream_tws,
)
from crypto_datalake_spark.streaming.sessions import (  # noqa: F401
    session_stream,
    session_stream_tws,
)
from crypto_datalake_spark.streaming.silver import (  # noqa: F401
    foreach_batch_upsert,
    retention_delete,
)
