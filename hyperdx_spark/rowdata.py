"""Row side-panel data lookup (ref: packages/app/src/components/
DBRowDataPanel.tsx:20-342; spec __tests__/DBRowDataPanel.test.ts).

The panel fetches ONE exact row by its :mod:`hyperdx_spark.rowwhere` id
and projects every semantic role under stable ``__hdx_*`` aliases so the
UI never re-derives expressions. The lookup is bounded by an optional
time window — but only when the source has a usable
``timestamp_value_expression`` (both halves are needed for the engine to
emit a filter) — and retries UNBOUNDED when the bounded query settles
empty-and-complete: the window may derive from a *different* row's
instant (a log's timestamp bounding a span lookup), so zero rows is not
evidence the row is missing. ``getJSONColumnNames`` /
``getMapColumnNames`` extract the result-meta column sets that
``facets.merge_path`` needs to keep numeric Map sub-keys from collapsing
into array-index syntax (HDX-4369).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from .compile import split_and_trim_with_bracket
from .model import Source
from .rowtimestamps import get_timestamp_value_selects

#: DBRowDataPanel.tsx:27-41 ROW_DATA_ALIASES
ROW_DATA_ALIASES = {
    "TIMESTAMP": "__hdx_timestamp",
    "BODY": "__hdx_body",
    "TRACE_ID": "__hdx_trace_id",
    "SPAN_ID": "__hdx_span_id",
    "SEVERITY_TEXT": "__hdx_severity_text",
    "SERVICE_NAME": "__hdx_service_name",
    "RESOURCE_ATTRIBUTES": "__hdx_resource_attributes",
    "EVENT_ATTRIBUTES": "__hdx_event_attributes",
    "EVENTS_EXCEPTION_ATTRIBUTES": "__hdx_events_exception_attributes",
    "SPAN_EVENTS": "__hdx_span_events",
    "DURATION_MS": "__hdx_duration_ms",
    "SPAN_KIND": "__hdx_span_kind",
    "SPAN_LINKS": "__hdx_span_links",
}


def get_first_timestamp_value_expression(expr: str) -> str:
    """First token of a (possibly composite) timestamp expression —
    source.ts getFirstTimestampValueExpression."""
    parts = split_and_trim_with_bracket(expr or "")
    return parts[0] if parts else expr


def get_displayed_timestamp_value_expression(source: Source) -> str:
    """source.ts:70-78: the log/trace-only displayed override, else the
    FIRST token of the source's timestamp expression."""
    displayed = (
        source.displayed_timestamp_value_expression
        if source.kind in ("log", "trace")
        else None
    )
    return displayed or get_first_timestamp_value_expression(
        source.timestamp_value_expression
    )


def get_event_body(source: Source) -> Optional[str]:
    """source.ts:81-91 getEventBody: trace -> span name; log -> body
    expression falling back to the implicit column; composite expressions
    collapse to their first token."""
    if source.kind == "trace":
        expression = source.span_name_expression or None
    elif source.kind == "log":
        expression = source.body_expression or source.implicit_column_expression
    else:
        expression = None
    multi = split_and_trim_with_bracket(expression or "")
    return expression if len(multi) == 1 else (multi[0] if multi else None)


def get_duration_ms_expression(source: Source) -> str:
    """source.ts:467-469: the trace duration scaled to milliseconds —
    ``(<expr>)/1e<precision-3>`` (precision = decimal digits of a second;
    the repo Source defaults precision to 3 i.e. ms-native, where the
    reference's helper falls back to 9/nanos when unset)."""
    return f"({source.duration_expression})/1e{source.duration_precision - 3}"


def get_duration_seconds_expression(source: Source) -> str:
    """source.ts:471-473: the trace duration scaled to seconds."""
    return f"({source.duration_expression})/1e{source.duration_precision}"


def build_row_lookup_config(
    source: Source,
    row_id: Optional[str],
    *,
    alias_with: Optional[Sequence[dict]] = None,
    date_range=None,
) -> dict:
    """The row-lookup ChartConfig assembly (DBRowDataPanel.tsx:98-230
    useRowData's baseConfig + window gating) as a pure function.

    Returns ``{select, where, limit, with?, date_range?,
    timestamp_value_expression?, has_window}``: SELECT ``*`` (or the
    source's known-columns list when set — ``SELECT *`` can fail against a
    Distributed/Merge table whose targets declare different column sets),
    the displayed timestamp under ``__hdx_timestamp``, EVERY token of the
    source's own timestamp expression under ``__hdx_timestamp_value_<i>``
    (rowTimestamps), and the body/trace/span/severity/service roles the
    repo's Source models. The window is attached only when BOTH halves
    exist: a blank ``timestamp_value_expression`` must not contribute a
    lone date range (the engine needs both to emit a filter)."""
    ts_expr = (
        source.timestamp_value_expression
        if (source.timestamp_value_expression or "").strip()
        else None
    )
    severity_expr = (
        source.severity_text_expression
        if source.kind == "log"
        else source.status_code_expression if source.kind == "trace" else None
    )
    select: list[dict] = [
        {"value_expression": source.known_columns_list_expression or "*"},
        {
            "value_expression": get_displayed_timestamp_value_expression(source),
            "alias": ROW_DATA_ALIASES["TIMESTAMP"],
        },
        *get_timestamp_value_selects(ts_expr),
    ]
    body = get_event_body(source)
    duration_ms = (
        get_duration_ms_expression(source)
        if source.kind == "trace" and source.duration_expression
        else None
    )
    for expr, alias in (
        (body, "BODY"),
        (source.trace_id_expression, "TRACE_ID"),
        (source.span_id_expression, "SPAN_ID"),
        (severity_expr, "SEVERITY_TEXT"),
        (source.service_name_expression, "SERVICE_NAME"),
        (duration_ms, "DURATION_MS"),
    ):
        if expr:
            select.append(
                {"value_expression": expr, "alias": ROW_DATA_ALIASES[alias]}
            )
    config = {
        "select": select,
        "where": row_id if row_id is not None else "0=1",
        "limit": 1,
        "has_window": date_range is not None and ts_expr is not None,
    }
    if alias_with:
        config["with"] = list(alias_with)
    if config["has_window"]:
        config["date_range"] = date_range
        # the multi-column expression passes through WHOLE: the filter must
        # cover every timestamp column of the sort key
        config["timestamp_value_expression"] = ts_expr
    return config


def row_lookup_fallback_state(
    *,
    has_window: bool,
    bounded_success: bool = False,
    bounded_complete: bool = True,
    bounded_row_count: int = 0,
    bounded_error: bool = False,
) -> dict:
    """The unbounded-retry policy (DBRowDataPanel.tsx:216-258) as data:

    - no window -> only the unbounded lookup runs;
    - bounded settles SUCCESSFUL + COMPLETE + EMPTY -> retry unbounded
      (the window may exclude the row being looked up);
    - bounded errors -> do NOT retry (an error is not evidence the row is
      outside the window, and retrying would hide it from the error state);
    - bounded incomplete (chunked partial success) -> do NOT retry yet.
    """
    is_bounded_empty = (
        has_window
        and bounded_success
        and bounded_complete is not False
        and bounded_row_count == 0
    )
    return {
        "bounded_enabled": has_window,
        "fallback_enabled": (not has_window) or is_bounded_empty,
        "is_bounded_empty": is_bounded_empty,
    }


def get_json_column_names(meta) -> list:
    """JSON-typed result columns — 'JSON' or 'JSON(<params>)'
    (DBRowDataPanel.tsx:319-327)."""
    return [
        _name(m)
        for m in (meta or [])
        if _type(m) == "JSON" or _type(m).startswith("JSON(")
    ]


def get_map_column_names(meta) -> list:
    """Map-typed result columns — 'Map(K, V)' or the bare 'Map'
    (DBRowDataPanel.tsx:329-342). Feeds facets.merge_path so
    numeric-looking sub-keys on a Map(String, ...) keep string-subscript
    form instead of collapsing to array-index syntax (HDX-4369)."""
    return [
        _name(m)
        for m in (meta or [])
        if _type(m) == "Map" or _type(m).startswith("Map(")
    ]


def row_has_k8s_context(source: Optional[Source], normalized_row) -> bool:
    """DBRowDataPanel.tsx:297-318 rowHasK8sContext: whether the row's
    resource attributes match a built-in infra correlation (k8s Pod/Node)
    — delegates to the same descriptor list the panel renders from, so
    the gate and the render never drift; False (never raising) on any
    gap. The repo's Source models resource attributes as a row key rather
    than a source expression, so presence of the normalized alias is the
    gate."""
    try:
        if source is None or not normalized_row:
            return False
        attrs = normalized_row.get(ROW_DATA_ALIASES["RESOURCE_ATTRIBUTES"])
        if not isinstance(attrs, Mapping):
            return False
        from .analytics.infra import get_active_infra_correlations

        return len(get_active_infra_correlations(attrs)) > 0
    except Exception:
        return False


def lookup_row(
    spark,
    source: Source,
    row_id: str,
    *,
    sf_dir: str,
    date_range=None,
):
    """Engine-side composition: run the bounded lookup and fall back
    unbounded per :func:`row_lookup_fallback_state` — one row (or none)
    back, with the ``__hdx_*`` projections. The bounded pass prunes
    parquet row groups via the pushed time filter; the unbounded retry is
    the reference's own full-scan fallback."""
    from pyspark.sql import functions as F

    from .functions.chcompat import translate_expr
    from .io import load_table

    def run(bounded: bool):
        cfg = build_row_lookup_config(
            source, row_id, date_range=date_range if bounded else None
        )
        tf = (
            (source.timestamp_value_expression, *date_range)
            if cfg["has_window"]
            else None
        )
        df = load_table(spark, sf_dir, source.table, time_filter=tf)
        df = df.where(F.expr(translate_expr(cfg["where"])))
        cols = [F.col("*")]
        for s in cfg["select"][1:]:
            cols.append(
                F.expr(translate_expr(s["value_expression"])).alias(s["alias"])
            )
        return df.select(*cols).limit(1)

    has_window = date_range is not None and bool(
        (source.timestamp_value_expression or "").strip()
    )
    if has_window:
        bounded = run(bounded=True)
        rows = bounded.collect()
        state = row_lookup_fallback_state(
            has_window=True, bounded_success=True, bounded_complete=True,
            bounded_row_count=len(rows),
        )
        if not state["fallback_enabled"]:
            return bounded
    return run(bounded=False)


def _name(m) -> str:
    return m["name"] if isinstance(m, Mapping) else m[0]


def _type(m) -> str:
    return m["type"] if isinstance(m, Mapping) else m[1]
