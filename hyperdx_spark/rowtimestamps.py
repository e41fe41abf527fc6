"""Row timestamp anchor resolution (ref: packages/app/src/utils/
rowTimestamps.ts:1-130; spec utils/__tests__/rowTimestamps.test.ts).

A source's ``timestampValueExpression`` may be composite ("EventDate,
EventTime" sort keys lead with a day-precision partition column), so the
row query projects EVERY token under ``__hdx_timestamp_value_<i>`` aliases
and the response meta's types settle which one carries the event's real
precision.  ``resolve_row_timestamp_anchor`` picks the highest-precision
DateTime-typed value (earlier token wins ties); day-precision columns are
skipped — anchoring on one puts the instant at midnight and a narrow
window around it excludes the event.  ``get_row_lookup_window`` bounds a
cross-source row lookup asymmetrically (4 h back / 1 h forward): the
destination span starts at or before the origin log, so a symmetric
window drops long-running spans.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from typing import Mapping, Optional, Sequence

from .compile import split_and_trim_with_bracket
from .functions.chcompat import classify_timestamp_type
from .jsnum import js_date_ms

#: ref rowTimestamps.ts:105-106
ROW_LOOKUP_WINDOW_LOOKBACK_HOURS = 4
ROW_LOOKUP_WINDOW_LEAD_HOURS = 1


def timestamp_value_alias(index: int) -> str:
    """Alias for the i-th column of a source's (possibly composite)
    ``timestampValueExpression`` (ref rowTimestamps.ts:12-14)."""
    return f"__hdx_timestamp_value_{index}"


def get_timestamp_value_selects(
    timestamp_value_expression: Optional[str],
) -> list[dict]:
    """Select entries projecting every column of a
    ``timestampValueExpression`` (ref rowTimestamps.ts:25-37) — all tokens,
    because which one carries the real precision isn't knowable from the
    expression alone."""
    if not timestamp_value_expression or not timestamp_value_expression.strip():
        return []
    return [
        {"value_expression": expr, "alias": timestamp_value_alias(i)}
        for i, expr in enumerate(
            split_and_trim_with_bracket(timestamp_value_expression)
        )
    ]


def _parse_value(raw) -> Optional[datetime]:
    """Numbers are unix seconds; strings go through the JS Date emulation
    (ref rowTimestamps.ts:76-83)."""
    if isinstance(raw, (int, float)) and not isinstance(raw, bool):
        ms = float(raw) * 1000
    elif isinstance(raw, datetime):
        return raw if raw.tzinfo else raw.replace(tzinfo=timezone.utc)
    else:
        parsed = js_date_ms(str(raw))
        if parsed is None:
            return None
        ms = parsed
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc)


def resolve_row_timestamp_anchor(
    *,
    timestamp_value_expression: Optional[str],
    row: Optional[Mapping],
    meta: Optional[Sequence[Mapping]],
) -> Optional[datetime]:
    """The instant a row happened, resolved from the highest-precision
    timestamp column the row query actually returned (ref
    rowTimestamps.ts:49-94).  None when no DateTime-typed token came back —
    callers must treat that as "no usable anchor" rather than fall back to
    a day-precision value."""
    if (
        not timestamp_value_expression
        or not timestamp_value_expression.strip()
        or row is None
        or meta is None
    ):
        return None

    best: Optional[tuple[int, datetime]] = None
    for index, _expr in enumerate(
        split_and_trim_with_bracket(timestamp_value_expression)
    ):
        alias = timestamp_value_alias(index)
        meta_type = next((m["type"] for m in meta if m.get("name") == alias), None)
        classified = classify_timestamp_type(meta_type)
        # Day-precision columns can't locate the event within its day.
        if classified is None or classified["kind"] == "date":
            continue
        raw = row.get(alias)
        if raw is None:
            continue
        date = _parse_value(raw)
        if date is None:
            continue
        # Highest precision wins; on a tie the earlier token does
        if best is None or classified["precision"] > best[0]:
            best = (classified["precision"], date)

    return best[1] if best else None


def get_row_lookup_window(
    focus_timestamp: Optional[str],
) -> Optional[tuple[datetime, datetime]]:
    """Window to bound a cross-source row lookup by, given the origin
    row's instant (ref rowTimestamps.ts:113-130): 4 h back, 1 h forward;
    None when the anchor is missing or unparseable."""
    if not focus_timestamp or not str(focus_timestamp).strip():
        return None
    ms = js_date_ms(str(focus_timestamp))
    if ms is None:
        return None
    focus = datetime.fromtimestamp(ms / 1000, tz=timezone.utc)
    return (
        focus - timedelta(hours=ROW_LOOKUP_WINDOW_LOOKBACK_HOURS),
        focus + timedelta(hours=ROW_LOOKUP_WINDOW_LEAD_HOURS),
    )
