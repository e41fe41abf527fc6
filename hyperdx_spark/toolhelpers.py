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
#: (\Z not $: Python $ matches before a trailing newline, JS $ does not;
#: ASCII \w to match the JS character class)
SAFE_BODY_EXPR_CHARS = re.compile(r"^[\w.':\[\]\-]+\Z", re.ASCII)

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


#: mcp/tools/query/schemas.ts:45-59 — the MCP builder aggFn vocabulary
MCP_AGG_FN_OPTIONS = (
    "avg", "count", "count_distinct", "last_value", "max", "min",
    "quantile", "sum", "none", "increase",
)

#: table.ts:74-76 — orderBy aggFn-name resolution skips 'none' and
#: 'increase' ('increase' compiles to a multi-CTE pipeline, not a function)
AGG_FN_NAMES = frozenset(
    fn for fn in MCP_AGG_FN_OPTIONS if fn not in ("none", "increase")
)

_BARE_IDENTIFIER = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_ORDER_DIR_RE = re.compile(r"^(.+?)\s+(ASC|DESC)\s*$", re.IGNORECASE)


def _strip_identifier_quotes(value: str) -> str:
    t = value.strip()
    if len(t) >= 2 and (
        (t.startswith('"') and t.endswith('"'))
        or (t.startswith("`") and t.endswith("`"))
    ):
        return t[1:-1]
    return t


def _quote_alias_for_order_by(alias: str) -> str:
    if _BARE_IDENTIFIER.match(alias):
        return alias
    return '"' + alias.replace('"', '""') + '"'


def resolve_order_by(order_by: Optional[str], select_items: Sequence[dict]):
    """table.ts:128-196 resolveOrderBy: agents frequently write
    ``orderBy: "count"`` — resolve a bare aggFn name or (possibly quoted,
    any-case) alias to something the engine can ORDER BY. Alias matches
    return the CANONICAL alias case (quoted when multi-word); aggFn
    matches prefer the item's alias, else synthesize the expression
    (``count()``, ``count(DISTINCT expr)``, ``quantile(level)(expr)``);
    quantile without a level, 'none', and 'increase' pass through
    untouched. An optional trailing ASC/DESC is preserved."""
    if not order_by:
        return None
    m = _ORDER_DIR_RE.match(order_by)
    identifier = m.group(1) if m else order_by
    direction = f" {m.group(2).upper()}" if m else ""
    lower = _strip_identifier_quotes(identifier).lower()

    for s in select_items:
        alias = s.get("alias")
        if alias and alias.lower() == lower:
            return f"{_quote_alias_for_order_by(alias)}{direction}"

    if lower in AGG_FN_NAMES:
        match = next(
            (s for s in select_items
             if (s.get("agg_fn") or "").lower() == lower),
            None,
        )
        if match:
            if match.get("alias"):
                return (
                    f"{_quote_alias_for_order_by(match['alias'])}{direction}"
                )
            ve = match.get("value_expression")
            fn = match["agg_fn"]
            if fn == "count":
                return f"count(){direction}"
            if fn == "count_distinct" and ve:
                return f"count(DISTINCT {ve}){direction}"
            if fn == "quantile" and match.get("level") is not None and ve:
                return f"quantile({match['level']})({ve}){direction}"
            if fn == "quantile":
                return order_by  # no level: never synthesize invalid SQL
            if ve:
                return f"{fn}({ve}){direction}"
    return order_by


def get_metric_select_issues(item: dict) -> list[dict]:
    """schemas.ts:113-210 getMetricSelectIssues: the metric-select
    validation matrix — metricType ↔ metricName set together, increase is
    Sum-only, histogram kinds take only quantile(+level)/count, isDelta is
    Gauge-only, level requires quantile, count never takes a
    valueExpression, non-count non-metric items require one (metric items
    default it to 'Value'). Returns [{path, message}, ...]."""
    issues: list[dict] = []
    agg_fn = item.get("agg_fn")
    metric_type = item.get("metric_type")
    metric_name = item.get("metric_name")
    if metric_type and not metric_name:
        issues.append({
            "path": ["metricName"],
            "message": "metricName is required when metricType is set.",
        })
    if metric_name and not metric_type:
        issues.append({
            "path": ["metricType"],
            "message": "metricType is required when metricName is set. Use"
                       " one of: gauge, sum, histogram,"
                       " exponential histogram.",
        })
    if agg_fn == "increase" and metric_type != "sum":
        issues.append({
            "path": ["aggFn"],
            "message": 'aggFn "increase" is only valid for sum (counter)'
                       " metrics.",
        })
    if metric_type in ("histogram", "exponential histogram"):
        if agg_fn not in ("quantile", "count"):
            issues.append({
                "path": ["aggFn"],
                "message": f"{metric_type} metrics only support aggFn"
                           ' "quantile" (with level) or "count" today.',
            })
        if agg_fn == "quantile" and item.get("level") is None:
            issues.append({
                "path": ["level"],
                "message": 'level is required when aggFn is "quantile" on'
                           f" an {metric_type} metric.",
            })
    if item.get("is_delta") and metric_type != "gauge":
        issues.append({
            "path": ["isDelta"],
            "message": "isDelta is only valid for gauge metrics.",
        })
    if item.get("level") is not None and agg_fn != "quantile":
        issues.append({
            "path": ["level"],
            "message": 'level is only valid with aggFn:"quantile".',
        })
    if item.get("value_expression") and agg_fn == "count":
        issues.append({
            "path": ["valueExpression"],
            "message": 'valueExpression cannot be used with aggFn:"count".',
        })
    elif (
        not item.get("value_expression")
        and agg_fn != "count"
        and not metric_type
    ):
        issues.append({
            "path": ["valueExpression"],
            "message": "valueExpression is required for non-count"
                       " aggregation functions (or set metricType to query"
                       " a metric source).",
        })
    return issues


def validate_metric_select_items(items: Sequence[dict]) -> Optional[list[str]]:
    """schemas.ts:347-358: every item through the issue matrix, each error
    labeled ``select[idx].<path>``; None when all pass."""
    errors = [
        f"select[{idx}].{'.'.join(str(p) for p in issue['path'])}:"
        f" {issue['message']}"
        for idx, item in enumerate(items)
        for issue in get_metric_select_issues(item)
    ]
    return errors or None


def apply_metric_select_defaults(items: Sequence[dict]) -> list[dict]:
    """schemas.ts:331-339: metric items (metricType set) other than count
    default valueExpression to 'Value'; everything else passes through
    UNCHANGED (same object)."""
    return [
        {**item, "value_expression": "Value"}
        if item.get("metric_type")
        and item.get("agg_fn") != "count"
        and not item.get("value_expression")
        else item
        for item in items
    ]


def assert_source_kind_matches_select(source_kind: str, select) -> Optional[str]:
    """helpers.ts:337-377 assertSourceKindMatchesSelect: a metric source
    requires at least one metricType-annotated select item; a non-metric
    source rejects any. Raw-string selects pass (the renderer handles
    them). Returns the error message or None."""
    if isinstance(select, str) or not isinstance(select, (list, tuple)):
        return None
    metric_items = sum(
        1
        for item in select
        if isinstance(item, dict)
        and isinstance(item.get("metric_type"), str)
        and item["metric_type"]
    )
    if source_kind == "metric" and metric_items == 0:
        return (
            'Source kind is "metric", but no select item specifies'
            " metricType + metricName."
        )
    if source_kind != "metric" and metric_items > 0:
        return (
            f'Source kind is "{source_kind}", not metric — but'
            f" {metric_items} select item(s) set metricType."
        )
    return None
