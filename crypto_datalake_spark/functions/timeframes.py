"""Timeframe parsing / symbol normalization (SURVEY.md §2.9 U4/U5).

The reference keeps three slightly different alias tables (API
/root/reference/src/live_data_api_service/timeframes.py:25-108, aggregator
bucketing.py:16-46, indicators live_indicators/timeframes.py:14-48);
this engine unifies them into ONE canonical table (ops.time.
TIMEFRAME_MINUTES) plus the alias map here.
"""

from __future__ import annotations

from dataclasses import dataclass

from crypto_datalake_spark.ops.time import TIMEFRAME_MINUTES

# alias → canonical token (timeframes.py:25-40: '1hr'→'1h', '60m'→'1h', …)
ALIASES: dict[str, str] = {
    "1hr": "1h",
    "60m": "1h",
    "2hr": "2h",
    "4hr": "4h",
    "1day": "1d",
    "1wk": "1w",
    "1mo": "1M",
    "1month": "1M",
}

# per-timeframe default bar limits (timeframes.py:70-104 inline limits)
DEFAULT_LIMIT = 200
MAX_LIMIT = 500

KNOWN_QUOTES = ("USDT", "USDC", "BUSD")


@dataclass(frozen=True)
class TimeframeRequest:
    timeframe: str  # canonical token
    limit: int


def normalize_timeframe(token: str) -> str:
    """Alias-resolve a timeframe token; raise on unknown (U4)."""
    tok = token.strip()
    tok = ALIASES.get(tok, ALIASES.get(tok.lower(), tok))
    if tok not in TIMEFRAME_MINUTES:
        raise ValueError(f"unknown timeframe: {token!r}")
    return tok


def parse_timeframe_requests(
    spec: str,
    default_limit: int = DEFAULT_LIMIT,
    max_limit: int = MAX_LIMIT,
) -> list[TimeframeRequest]:
    """Parse ``"1m,5m=25,1hr"`` → per-timeframe requests with inline limits
    (ref: timeframes.py:70-104). Limits clamp to [1, max_limit]; duplicate
    timeframes keep the last spec (consistent with keep-last discipline).
    """
    out: dict[str, TimeframeRequest] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            tok, lim_s = part.split("=", 1)
            limit = max(1, min(int(lim_s), max_limit))
        else:
            tok, limit = part, default_limit
        tf = normalize_timeframe(tok)
        out[tf] = TimeframeRequest(tf, limit)
    if not out:
        raise ValueError("empty timeframe spec")
    return list(out.values())


def normalize_symbol(sym: str) -> str:
    """``BTC`` → ``BTCUSDT`` unless already quoted (U5, ref:
    timeframes.py:41-50)."""
    s = sym.strip().upper()
    if not s:
        raise ValueError("empty symbol")
    if any(s.endswith(q) and len(s) > len(q) for q in KNOWN_QUOTES):
        return s
    return s + "USDT"
