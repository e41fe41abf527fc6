"""Shared MCP query-tool helpers (ref: packages/api/src/mcp/tools/query/
helpers.ts) — the pieces with query semantics: top-level where merging
into per-series conditions, ISO time-range parsing with the 15-minute
default, and the body-expression injection guard. The tool-glue around
them (tile envelopes, ClickHouse error shaping, response trimming) is
HTTP plumbing and stays out of scope."""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone
from typing import Optional, Sequence

#: helpers.ts:68 — reject bodyExpression values with SQL-unsafe characters
SAFE_BODY_EXPR_CHARS = re.compile(r"^[\w.':\[\]\-]+$")

#: helpers.ts:96 — the metric renderer's group cap for aggFn 'increase'
#: (mirrors INCREASE_MAX_NUM_GROUPS; metrics.py implements the cap)
INCREASE_TOP_N_CAP = 20


def is_safe_body_expression(expr: str) -> bool:
    """True when *expr* passes the SAFE_BODY_EXPR_CHARS whitelist — plain
    column names, dotted/bracketed map accessors; anything with spaces,
    parens, or quotes beyond the map-key form is rejected before being
    spliced into generated SQL."""
    return bool(SAFE_BODY_EXPR_CHARS.match(expr))


def merge_where_into_select_items(
    items: Sequence[dict],
    top_where: str,
    top_language: str,
) -> tuple[list[dict], list[str]]:
    """helpers.ts:188-228 mergeWhereIntoSelectItems: compose a top-level
    where into each select item's own condition — AND-combined when the
    languages match, adopted wholesale when the item has none, and left
    UNTOUCHED (with a warning) when the languages differ (Lucene + SQL
    cannot be merged textually; the item's own filter takes precedence).
    Items are dicts with optional ``where`` / ``where_language``; returns
    (merged items, warnings)."""
    if not top_where:
        return list(items), []
    warnings: list[str] = []
    merged = []
    for idx, item in enumerate(items):
        item_where = item.get("where") or ""
        item_lang = item.get("where_language") or "lucene"
        if item_where and item_lang == top_language:
            merged.append(
                {
                    **item,
                    "where": f"({top_where}) AND ({item_where})",
                    "where_language": top_language,
                }
            )
        elif not item_where:
            merged.append(
                {**item, "where": top_where, "where_language": top_language}
            )
        else:
            warnings.append(
                f'select[{idx}]: top-level where ({top_language}) was NOT'
                f' applied because this item uses whereLanguage:'
                f'"{item_lang}". Set the item\'s whereLanguage to'
                f' "{top_language}" or rewrite the top-level where in'
                f" {item_lang} to apply both filters."
            )
            merged.append(item)
    return merged, warnings


def parse_time_range(
    start_time: Optional[str] = None,
    end_time: Optional[str] = None,
    *,
    now: Optional[datetime] = None,
):
    """helpers.ts:254-271 parseTimeRange: ISO strings via the shared JS
    Date emulation; a missing end defaults to now, a missing start to
    end − 15 minutes; unparseable input or an inverted/zero-length range
    returns ``{"error": ...}`` (the tools surface it verbatim)."""
    from hyperdx_spark.jsnum import js_date_ms

    def parse(s: Optional[str], default: datetime):
        if s is None:
            return default
        ms = js_date_ms(str(s))
        if ms is None:
            return None
        return datetime.fromtimestamp(ms / 1000, tz=timezone.utc).replace(
            tzinfo=None
        )

    now = now or datetime.now(timezone.utc).replace(tzinfo=None)
    end = parse(end_time, now)
    start = parse(start_time, (end - timedelta(minutes=15)) if end else None)
    if end is None or start is None:
        return {
            "error": "Invalid startTime or endTime: must be valid ISO 8601"
                     " strings"
        }
    if start >= end:
        return {"error": "endTime must be greater than startTime"}
    return {"start_date": start, "end_date": end}
