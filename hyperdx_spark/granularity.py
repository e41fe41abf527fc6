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


def auto_granularity(
    date_range: tuple[datetime, datetime], max_buckets: int = 60
) -> str:
    """Smallest ladder step with range/step <= max_buckets (core/utils.ts:427)."""
    span = (date_range[1] - date_range[0]).total_seconds()
    for name, secs in LADDER:
        if span / secs <= max_buckets:
            return name
    return LADDER[-1][0]
