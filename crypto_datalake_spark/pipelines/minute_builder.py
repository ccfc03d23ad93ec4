"""Canonical minute-bar builder: the §3.2 ingestion transform, Spark-first.

Reference shape (/root/reference/src/binance_minute_lake/transforms/
minute_builder.py:75-123): dense minute spine → successive left joins of
per-source frames → derived columns → limited forward-fill → 0-vs-NULL
gating → canonical-schema finalize.

Spark realization: every source lands as a per-minute keyed DataFrame
(bronze→silver agg upstream); the builder is ONE declarative pipeline —
Catalyst broadcast-joins the sparse aux series onto the spine, the ffill
is a single window pass per partition key. No driver-side loops.

Scale: the spine is `spark.range`-generated (distributed); joins key on
(symbol, timestamp) so a 1000-symbol × years build shuffles once per
source at most, and sparse sources broadcast. The ffill window partitions
by symbol — per-symbol sequential scan, all symbols in parallel.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_datalake_spark.ops.fill import ffill
from crypto_datalake_spark.ops.time import minute_spine
from crypto_datalake_spark.schema import (
    MINUTE_COLUMNS,
    SupportClass,
    finalize,
)

# sources that arrive sparse and forward-fill onto the dense spine
_FFILL_COLS = tuple(c.name for c in MINUTE_COLUMNS if c.ffill_limit is not None)
_FFILL_LIMIT = 60  # minutes (ref: core/config.py:20 max_ffill_minutes)


def build_canonical_frame(
    spark: SparkSession,
    sources: Mapping[str, DataFrame],
    start: str,
    end_exclusive: str,
    symbol: str,
) -> DataFrame:
    """Assemble the canonical minute frame for one symbol and window.

    ``sources`` maps source name → per-minute DataFrame keyed by
    ``timestamp`` (TIMESTAMP_NTZ minute floor). Recognized sources (all
    optional except ``klines``):

    - ``klines``: open/high/low/close/volume_btc/volume_usdt/trade_count
    - ``trades``: taker_buy_volume/max_trade/realized_vol
    - ``metrics``: oi_contracts (sparse snapshots)
    - ``funding``: funding_rate (sparse events)
    - ``live``: spread_pct/liq_notional/liq_count/has_depth/has_liq

    Join order and fill policy mirror minute_builder.py:93-123, 624-642;
    0-vs-NULL gating mirrors :585-616.
    """
    spine = minute_spine(spark, start, end_exclusive, 1).select(
        F.col("slot_ts").alias("timestamp")
    )
    frame = spine
    for name in ("klines", "trades", "metrics", "funding", "live"):
        src = sources.get(name)
        if src is not None:
            frame = frame.join(src, "timestamp", "left")

    frame = frame.withColumn("symbol", F.lit(symbol))

    # derived: vwap_1m = volume_usdt/volume_btc, close fallback when no qty
    # (ref: schema.py:44 "close if no qty"; minute_builder.py:545-569)
    if "vwap_1m" not in frame.columns:
        frame = frame.withColumn(
            "vwap_1m",
            F.when(
                F.col("volume_btc") > 0, F.col("volume_usdt") / F.col("volume_btc")
            ).otherwise(F.col("close")),
        )

    # limited forward-fill for snapshot columns — valid because the spine is
    # dense (one row per minute), so row-bounded == time-bounded
    present_ffill = [c for c in _FFILL_COLS if c in frame.columns]
    if present_ffill:
        frame = ffill(
            frame,
            present_ffill,
            order_by=["timestamp"],
            partition_by=["symbol"],
            limit=_FFILL_LIMIT,
        )

    # 0-vs-NULL gating: LIVE_ONLY sums are 0 when the collector observed the
    # minute (coverage flag true) with no events, NULL when no data exists
    for c in MINUTE_COLUMNS:
        if (
            c.support == SupportClass.LIVE_ONLY
            and c.coverage_flag
            and c.default is not None
            and c.name in frame.columns
        ):
            frame = frame.withColumn(
                c.name,
                F.when(
                    F.coalesce(F.col(c.coverage_flag), F.lit(False)),
                    F.coalesce(F.col(c.name), F.lit(c.default)),
                ).otherwise(F.lit(None)),
            )

    return finalize(frame)
