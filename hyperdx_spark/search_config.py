"""Saved-search → ChartConfig assembly.

Parity target: ``packages/common-utils/src/core/searchChartConfig.ts`` —
``buildSearchChartConfig`` (:120-187) and ``ALERT_COUNT_DEFAULT_SELECT``
(:48-56). The single source of truth for "how does a saved search (or an
unsaved alert preview) become a chart config", shared by the search page,
the alert preview chart, and the scheduled alert evaluator — one assembly
so all three produce the same row set for the same search and window.

Assembly rules:

* a log source's deprecated ``table_filter_expression`` is PREPENDED as a
  SQL filter (honored for backward compatibility; it is an application
  predicate, not isolation);
* the SELECT prefers the caller's, then the source's
  ``default_table_select_expression`` (log/trace sources), then ``''``;
* only LOG sources populate the body-expression fallback for bare-text
  search (trace span names have different semantics and must not
  auto-fall-back).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from hyperdx_spark.model import ChartConfig, Filter, SelectCol, SortSpec, Source

# Default SELECT used by alert evaluators when no caller-supplied SELECT is
# provided (searchChartConfig.ts:48-56): one count() aggregate, SQL-language
# condition fields pinned so evaluator and preview render identically.
ALERT_COUNT_DEFAULT_SELECT: list[SelectCol] = [
    SelectCol(agg_fn="count", agg_condition=None, agg_condition_language="sql",
              value_expression="")
]


def _resolve_select(
    source: Source, select: Union[str, Sequence[SelectCol], None]
) -> Union[str, Sequence[SelectCol]]:
    """Caller's select, else the source default (log/trace), else ''
    (searchChartConfig.ts:94-103) — empty strings and empty lists both
    fall through."""
    if select is not None and len(select) > 0:
        return select
    if source.kind in ("log", "trace"):
        return source.default_table_select_expression or ""
    return ""


def build_search_chart_config(
    source: Source,
    *,
    where: Optional[str] = None,
    where_language: Optional[str] = None,
    filters: Optional[Sequence[Filter]] = None,
    select: Union[str, Sequence[SelectCol], None] = None,
    order_by: Union[str, Sequence[SortSpec], None] = None,
    group_by: Optional[Sequence[str]] = None,
    date_range=None,
    date_range_end_inclusive: Optional[bool] = None,
    granularity: Optional[str] = None,
) -> ChartConfig:
    """Assemble the ChartConfig for a saved search / alert over *source*
    (buildSearchChartConfig, searchChartConfig.ts:120-187)."""
    from hyperdx_spark.model import SqlFilter

    table_filter: list[Filter] = (
        [SqlFilter(condition=source.table_filter_expression, type="sql")]
        if source.kind == "log" and source.table_filter_expression
        else []
    )
    merged = [*table_filter, *(filters or [])]

    # logs-only body fallback: a trace source's body/span-name expression
    # must not serve bare-text search (searchChartConfig.ts:152-158). The
    # serializer falls back source.implicit -> source.body, so a non-log
    # source is assembled WITHOUT the body expression.
    src = source
    if source.kind != "log" and source.body_expression:
        from dataclasses import replace as _replace

        src = _replace(source, body_expression=None)

    cfg = ChartConfig(
        source=src,
        select=_resolve_select(source, select),
        where=where or "",
        where_language=where_language or "sql",
        filters=merged,
        date_range=date_range,
        granularity=granularity,
    )
    if group_by is not None:
        cfg.group_by = list(group_by)
    if order_by is not None:
        cfg.order_by = order_by
    if date_range_end_inclusive is not None:
        cfg.date_range_end_inclusive = date_range_end_inclusive
    return cfg
