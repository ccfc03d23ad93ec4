"""Canonical schema registry: column specs, support classes, fill policies.

Mirrors the reference's registry-driven schema discipline
(/root/reference/src/binance_minute_lake/core/schema.py:20-342 — the
66-column tuple as single source of truth; core/enums.py:6-11 support
classes) re-expressed for Spark:

- every stored table has a fixed ``StructType`` derived from the registry;
- ``finalize`` = add-missing-as-null → cast-to-canonical → column-order
  projection (ref: transforms/minute_builder.py:644-651);
- a stable schema hash over name|dtype|support|fill participates in the
  write ledger (ref: schema.py:365-370).

The bar schema here is a representative core of the reference's 66-column
minute table: every support class, every fill policy, and every
aggregation-rule kind (§2.4 A4) appears at least once, so the pipelines
exercise the full rule machinery without 66 literal columns of noise.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from hashlib import sha256

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SupportClass(Enum):
    """Nullability/fill contract per column (ref: core/enums.py:6-11)."""

    HARD_REQUIRED = "hard_required"  # must be non-null to commit
    BACKFILL_AVAILABLE = "backfill_available"  # best-effort, declared default/ffill
    LIVE_ONLY = "live_only"  # NULL historically; 0-vs-NULL gated by coverage flags


class AggRule(Enum):
    """How the HTF aggregator rolls the column up (ref: aggregation_rules.py:16-89)."""

    FIRST_BY_TIME = "first_by_time"
    LAST_BY_TIME = "last_by_time"
    MAX = "max"
    MIN = "min"
    SUM = "sum"
    BOOL_OR = "bool_or"
    FIRST_NONNULL = "first_nonnull"
    LAST_NONNULL = "last_nonnull"
    WEIGHTED_AVG = "weighted_avg"  # weight column in `agg_weight`
    RATIO_OF_SUMS = "ratio_of_sums"  # numerator col in `agg_num`, denom in `agg_den`
    REALIZED_VOL = "realized_vol"  # sqrt(Σ log-return²) within bucket
    COUNT_OBSERVED = "count_observed"  # observed-minute accounting


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    dtype: T.DataType
    support: SupportClass
    agg: AggRule | None = None
    ffill_limit: int | None = None  # minutes; None = no forward-fill
    default: object | None = None  # fill_null default (0-vs-NULL gating elsewhere)
    agg_weight: str | None = None
    agg_num: str | None = None
    agg_den: str | None = None
    coverage_flag: str | None = None  # LIVE_ONLY gate column (has_*)


# --- canonical minute-bar registry (representative core of the 66) --------
MINUTE_COLUMNS: tuple[ColumnSpec, ...] = (
    ColumnSpec("timestamp", T.TimestampNTZType(), SupportClass.HARD_REQUIRED),
    ColumnSpec("symbol", T.StringType(), SupportClass.HARD_REQUIRED),
    ColumnSpec("open", T.DoubleType(), SupportClass.HARD_REQUIRED, AggRule.FIRST_BY_TIME),
    ColumnSpec("high", T.DoubleType(), SupportClass.HARD_REQUIRED, AggRule.MAX),
    ColumnSpec("low", T.DoubleType(), SupportClass.HARD_REQUIRED, AggRule.MIN),
    ColumnSpec("close", T.DoubleType(), SupportClass.HARD_REQUIRED, AggRule.LAST_BY_TIME),
    ColumnSpec("volume_btc", T.DoubleType(), SupportClass.HARD_REQUIRED, AggRule.SUM),
    ColumnSpec("volume_usdt", T.DoubleType(), SupportClass.HARD_REQUIRED, AggRule.SUM),
    ColumnSpec("trade_count", T.LongType(), SupportClass.HARD_REQUIRED, AggRule.SUM),
    # vwap is recomputed as ratio-of-sums at HTF, never aggregated directly
    # (ref: aggregation_rules.py:234-245; README.md:283-285)
    ColumnSpec(
        "vwap_1m", T.DoubleType(), SupportClass.BACKFILL_AVAILABLE,
        AggRule.RATIO_OF_SUMS, agg_num="volume_usdt", agg_den="volume_btc",
    ),
    ColumnSpec(
        "taker_buy_volume", T.DoubleType(), SupportClass.BACKFILL_AVAILABLE, AggRule.SUM,
        default=0.0,
    ),
    ColumnSpec("max_trade", T.DoubleType(), SupportClass.BACKFILL_AVAILABLE, AggRule.MAX),
    # snapshot columns: ffill-limited in the minute builder, first/last-non-null at HTF
    ColumnSpec(
        "oi_contracts", T.DoubleType(), SupportClass.BACKFILL_AVAILABLE,
        AggRule.LAST_NONNULL, ffill_limit=60,
    ),
    ColumnSpec(
        "funding_rate", T.DoubleType(), SupportClass.BACKFILL_AVAILABLE,
        AggRule.FIRST_NONNULL, ffill_limit=60,
    ),
    # depth quality: volume-weighted at HTF with mean fallback
    ColumnSpec(
        "spread_pct", T.DoubleType(), SupportClass.LIVE_ONLY,
        AggRule.WEIGHTED_AVG, agg_weight="volume_usdt", coverage_flag="has_depth",
    ),
    # liquidation sums: 0 when collector observed the minute, NULL when absent
    ColumnSpec(
        "liq_notional", T.DoubleType(), SupportClass.LIVE_ONLY, AggRule.SUM,
        default=0.0, coverage_flag="has_liq",
    ),
    ColumnSpec(
        "liq_count", T.LongType(), SupportClass.LIVE_ONLY, AggRule.SUM,
        default=0, coverage_flag="has_liq",
    ),
    ColumnSpec("has_depth", T.BooleanType(), SupportClass.LIVE_ONLY, AggRule.BOOL_OR),
    ColumnSpec("has_liq", T.BooleanType(), SupportClass.LIVE_ONLY, AggRule.BOOL_OR),
    ColumnSpec(
        "realized_vol", T.DoubleType(), SupportClass.BACKFILL_AVAILABLE,
        AggRule.REALIZED_VOL,
    ),
)

MINUTE_SCHEMA = T.StructType(
    [
        T.StructField(c.name, c.dtype, c.support != SupportClass.HARD_REQUIRED)
        for c in MINUTE_COLUMNS
    ]
)

HARD_REQUIRED = tuple(
    c.name for c in MINUTE_COLUMNS if c.support == SupportClass.HARD_REQUIRED
)
LIVE_ONLY = tuple(c.name for c in MINUTE_COLUMNS if c.support == SupportClass.LIVE_ONLY)


def finalize(df: DataFrame, columns: tuple[ColumnSpec, ...] = MINUTE_COLUMNS) -> DataFrame:
    """Add-missing-as-null + cast-to-canonical + column-order projection
    (ref: transforms/minute_builder.py:644-651; live_data_api_service/utils.py:18-28)."""
    existing = set(df.columns)
    return df.select(
        *[
            (F.col(c.name) if c.name in existing else F.lit(None)).cast(c.dtype).alias(c.name)
            for c in columns
        ]
    )


def schema_hash(columns: tuple[ColumnSpec, ...] = MINUTE_COLUMNS) -> str:
    """Stable hash over name|dtype|support|fill — ledger entry component
    (ref: schema.py:365-370; writer/atomic.py:113-117)."""
    payload = "\n".join(
        f"{c.name}|{c.dtype.simpleString()}|{c.support.value}|{c.ffill_limit}|{c.default}"
        for c in columns
    )
    return sha256(payload.encode()).hexdigest()


def validate_hard_required(df: DataFrame, keys: tuple[str, ...] = ("symbol", "timestamp")):
    """DQ gate: unique keys + zero nulls in HARD_REQUIRED columns
    (ref: validation/dq.py:22-63). Returns (ok, dict of violation counts);
    one aggregation pass, no collect loops."""
    # ONE pass: per-key counts carry the per-key null sums, the global agg
    # folds both — two separate actions would scan the source twice
    row = (
        df.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
                for c in HARD_REQUIRED
            ],
        )
        .agg(
            F.sum((F.col("_n") > 1).cast("long")).alias("dup_keys"),
            *[F.sum(f"nulls_{c}").alias(f"nulls_{c}") for c in HARD_REQUIRED],
        )
        .collect()[0]
        .asDict()
    )
    dup = row.pop("dup_keys")
    violations = {k: v for k, v in row.items() if v} | (
        {"dup_keys": dup} if dup else {}
    )
    return (not violations, violations)
