"""Emerging & disappeared signals — what is NEW or GONE between a
baseline window and the current window.

Parity target: ``packages/api/src/mcp/tools/query/emergingSignals.ts``
(clickstack_emerging_signals) + ``runEventPatterns.ts`` normalizeTemplate.
Mines event patterns (Drain) in BOTH windows and set-differences them by
share of window: emerging = newly present (above the brand-new floor) or
>= minShareRatio× more frequent now; disappeared = the reverse. This is
NOVELTY (set membership over time); :mod:`event_deltas` is distribution
shift within a shared population — the reference documents the split.

Spark shape: two bounded-sample minings (the reference's own design —
each window samples ``sample_size`` rows, so the driver never holds more
than 2 x sample_size bodies); the set difference and classification are
pure driver math over the mined template lists.
"""

from __future__ import annotations

import math
import re
from typing import Optional

from pyspark.sql import DataFrame

#: emergingSignals.ts:36 — relative tolerance admitting exact-ratio float
#: boundaries (3 * (1/10000) rounds just above 3/10000) without admitting
#: meaningfully-below shifts (2.9x stays out)
RATIO_REL_TOLERANCE = 1e-9

_WS_RE = re.compile(r"\s+")


def normalize_template(pattern: str) -> str:
    """runEventPatterns.ts:252-258 normalizeTemplate: ``<*>`` to a stable
    marker, whitespace collapsed, trimmed, lowercased — the cross-window
    join key for mined templates."""
    return _WS_RE.sub(" ", pattern.replace("<*>", "\u0001")).strip().lower()


def classify_shift(
    cur_share: float,
    base_share: float,
    ratio: float,
    new_pattern_share_floor: float,
) -> Optional[str]:
    """emergingSignals.ts:38-62 classifyShift: 'emerging', 'disappeared',
    or None. Brand-new patterns (baseShare == 0) must clear the floor
    (~two sampled rows' worth of share); ratio comparisons cross-multiply
    with a tiny relative tolerance biased toward qualifying, and require a
    REAL directional change so minShareRatio=1 cannot flood the report
    with stable patterns."""
    if base_share == 0:
        return "emerging" if cur_share >= new_pattern_share_floor else None
    tol = 1 - RATIO_REL_TOLERANCE
    if cur_share > base_share and cur_share >= ratio * base_share * tol:
        return "emerging"
    if cur_share == 0 or (
        base_share > cur_share and base_share >= ratio * cur_share * tol
    ):
        return "disappeared"
    return None


def _js_round4(x: float) -> float:
    # JS Math.round(x * 10000) / 10000 — half rounds UP, not banker's
    return math.floor(x * 10000 + 0.5) / 10000


def emerging_signals(
    current_df: DataFrame,
    baseline_df: DataFrame,
    *,
    text_col: str = "body",
    sample_size: int = 10_000,
    top_n: int = 20,
    min_share_ratio: float = 3.0,
    current_range=None,
    baseline_range=None,
    masking=(),
) -> dict:
    """The full tool (emergingSignals.ts registerEmergingSignals): mine
    both windows, build share-of-window maps keyed by the NORMALIZED
    template (two clusters of one window normalizing to the same key
    merge ADDITIVELY), classify every key, rank by absolute share swing,
    and format with 'new'/'gone'/'shifted' statuses and JS-rounded 4dp
    shares. Overlapping windows are rejected outright — a shared row
    contaminates the set difference (ts:175-186)."""
    from hyperdx_spark.analytics.drain import mine_patterns

    if current_range is not None and baseline_range is not None:
        if (
            baseline_range[1] > current_range[0]
            and baseline_range[0] < current_range[1]
        ):
            raise ValueError(
                "baseline and current windows overlap — the baseline must"
                " end at or before the current window starts"
            )

    def mine(df: DataFrame):
        total = df.count()
        patterns = mine_patterns(
            df, text_col=text_col, sample_size=sample_size,
            total_count=total, trend_buckets=0, masking=masking,
        )
        sampled = sum(p.sample_count for p in patterns)
        return patterns, sampled, total

    cur_patterns, cur_sampled, cur_total = mine(current_df)
    base_patterns, base_sampled, base_total = mine(baseline_df)

    by_key: dict[str, dict] = {}

    def ingest(patterns, sampled: int, which: str) -> None:
        denom = sampled or 1
        for p in patterns:
            key = normalize_template(p.pattern)
            a = by_key.setdefault(
                key,
                {
                    "pattern": p.pattern,
                    "cur_share": 0.0, "base_share": 0.0,
                    "cur_count": 0, "base_count": 0,
                    # the reference's sample is the first raw pattern body
                    # (__hdx_pattern_body); our mined samples are the raw
                    # rows — take the mined text column's value
                    "sample": (
                        str(p.samples[0][text_col])
                        if p.samples and text_col in p.samples[0].__fields__
                        else p.pattern
                    ),
                },
            )
            share = p.sample_count / denom
            a[f"{which}_share"] += share
            a[f"{which}_count"] += p.estimated_count

    ingest(cur_patterns, cur_sampled, "cur")
    ingest(base_patterns, base_sampled, "base")

    floor = 2 / cur_sampled if cur_sampled > 0 else 0
    emerging, disappeared = [], []
    for a in by_key.values():
        verdict = classify_shift(
            a["cur_share"], a["base_share"], min_share_ratio, floor
        )
        if verdict == "emerging":
            emerging.append(a)
        elif verdict == "disappeared":
            disappeared.append(a)
    emerging.sort(key=lambda a: -(a["cur_share"] - a["base_share"]))
    disappeared.sort(key=lambda a: -(a["base_share"] - a["cur_share"]))

    def fmt(a: dict) -> dict:
        return {
            "pattern": a["pattern"],
            "current_share": _js_round4(a["cur_share"]),
            "baseline_share": _js_round4(a["base_share"]),
            "current_estimated_count": a["cur_count"],
            "baseline_estimated_count": a["base_count"],
            "status": (
                "new" if a["base_share"] == 0
                else "gone" if a["cur_share"] == 0 else "shifted"
            ),
            "sample": a["sample"][:300],
        }

    return {
        "summary": {
            "current": {"sampled": cur_sampled, "total": cur_total},
            "baseline": {"sampled": base_sampled, "total": base_total},
            "min_share_ratio": min_share_ratio,
            "emerging_count": len(emerging),
            "disappeared_count": len(disappeared),
        },
        "emerging": [fmt(a) for a in emerging[:top_n]],
        "disappeared": [fmt(a) for a in disappeared[:top_n]],
    }
