"""Time-bucket granularity: parsing + the auto ladder.

Ref: hyperdxio/hyperdx ``packages/common-utils/src/core/utils.ts:427-470``
(`convertDateRangeToGranularityString`) — pick the smallest ladder step that
keeps the chart at <= maxBuckets buckets; 10m is skipped so every step divides
its successors (materialized-view rollup divisibility).
"""

from __future__ import annotations

import re
from datetime import datetime

# seconds per ladder step — core/utils.ts granularity ladder 15s..30d
LADDER: tuple[tuple[str, int], ...] = (
    ("15 second", 15),
    ("30 second", 30),
    ("1 minute", 60),
    ("5 minute", 300),
    ("15 minute", 900),
    ("30 minute", 1800),
    ("1 hour", 3600),
    ("2 hour", 7200),
    ("6 hour", 21600),
    ("12 hour", 43200),
    ("1 day", 86400),
    ("2 day", 172800),
    ("7 day", 604800),
    ("30 day", 2592000),
)

_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def granularity_seconds(granularity: str) -> int:
    """'5 minute' / '5 minutes' / '1h'-style string -> seconds."""
    m = re.fullmatch(
        r"\s*(\d+)\s*(second|minute|hour|day|week)s?\s*", granularity, re.IGNORECASE
    )
    if not m:
        raise ValueError(f"unparseable granularity: {granularity!r}")
    return int(m.group(1)) * _UNIT_SECONDS[m.group(2).lower()]


# api/src/utils/common.ts convertMsToGranularityString thresholds — note it
# includes the 10-minute step the chart ladder above deliberately skips
_MS_LADDER: tuple[tuple[int, str], ...] = (
    (30, "30 second"),
    (60, "1 minute"),
    (5 * 60, "5 minute"),
    (10 * 60, "10 minute"),
    (15 * 60, "15 minute"),
    (30 * 60, "30 minute"),
    (3600, "1 hour"),
    (2 * 3600, "2 hour"),
    (6 * 3600, "6 hour"),
    (12 * 3600, "12 hour"),
    (86400, "1 day"),
    (2 * 86400, "2 day"),
    (7 * 86400, "7 day"),
    (30 * 86400, "30 day"),
)


def convert_ms_to_granularity_string(ms: int) -> str:
    """api/src/utils/common.ts:44-79 convertMsToGranularityString: smallest
    granularity whose seconds cover ceil(ms/1000); saturates at 30 day."""
    import math

    secs = math.ceil(ms / 1000)
    for cap, name in _MS_LADDER:
        if secs <= cap:
            return name
    return _MS_LADDER[-1][1]


def auto_granularity(
    date_range: tuple[datetime, datetime], max_buckets: int = 60
) -> str:
    """Smallest ladder step with range/step <= max_buckets (core/utils.ts:427)."""
    span = (date_range[1] - date_range[0]).total_seconds()
    for name, secs in LADDER:
        if span / secs <= max_buckets:
            return name
    return LADDER[-1][0]
