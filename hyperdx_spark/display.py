"""Display-shape config conversions (pie / bar / number / table tiles).

Every non-time-series dashboard tile rewrites its ChartConfig before the
compiler sees it (ref: packages/common-utils/src/core/utils.ts:811-900,
``convertToCategoricalChartConfig`` / ``convertToNumberChartConfig`` /
``convertToTableChartConfig``; spec in src/__tests__/utils.test.ts:294-713):

* **Categorical (pie/bar)** — no time dimension, so ``granularity`` is
  dropped and the per-tile ``seriesLimit`` is reinterpreted as a plain SQL
  LIMIT on the number of slices/bars (the ``__hdx_series_limit`` ranking CTE
  it drives on time charts is gated on granularity, which categorical charts
  never set).  When a limit applies and the user supplied no ORDER BY, a
  first-aggregate-DESC + group-ASC ordering is injected so the limit
  deterministically keeps the largest slices.
* **Number** — collapses to one value: drop granularity AND groupBy.
* **Table** — drop granularity; default a row limit (200) and a
  group-ascending ordering so the set of rows within the limit is stable.

Dialect note: the reference quotes the injected ORDER BY alias as a
ClickHouse double-quoted identifier (``"Value"``, embedded ``"`` doubled —
utils.ts:845-848).  Our expression language is Spark SQL, where the
identifier quote is the backtick (double quotes would parse as a string
*literal* with ANSI off), so :func:`quote_identifier` emits backticks and
doubles embedded backticks — same escaping rule, Spark spelling.
"""

from __future__ import annotations

import copy
import re
from typing import Optional, Sequence, Union

from hyperdx_spark.model import ChartConfig, SelectCol, SortSpec


def has_positive_series_limit(series_limit: object) -> bool:
    """Whether a tile's ``seriesLimit`` should apply an actual limit
    (ref core/utils.ts:52-58, ``hasPositiveSeriesLimit``).

    A positive *integer* caps the series; ``0`` means unlimited and ``None``
    means unset — both apply no limit.  Non-integers (a float smuggled in
    through an untyped tiles field) are rejected rather than passed to SQL,
    matching the reference's ``Number.isInteger`` guard.
    """
    return (
        series_limit is not None
        and not isinstance(series_limit, bool)
        and isinstance(series_limit, int)
        and series_limit > 0
    )


def has_non_empty_order_by(
    order_by: Union[str, Sequence[SortSpec], None],
) -> bool:
    """True when the user supplied a usable ORDER BY (ref utils.ts:781-790):
    a non-blank string or a non-empty sort-spec list."""
    if order_by is None:
        return False
    if isinstance(order_by, str):
        return len(order_by.strip()) > 0
    return len(order_by) > 0


def quote_identifier(name: str) -> str:
    """Quote *name* as a Spark SQL identifier (backticks, embedded backticks
    doubled) — the Spark spelling of the reference's double-quote-and-double
    escaping (utils.ts:845-848)."""
    return "`" + name.replace("`", "``") + "`"


def convert_to_categorical_chart_config(config: ChartConfig) -> ChartConfig:
    """Normalize a builder config for categorical (pie/bar) rendering
    (ref core/utils.ts:811-881, ``convertToCategoricalChartConfig``).

    The input is not mutated.  ``granularity`` is dropped; a positive
    ``series_limit`` becomes ``limit`` unless an explicit limit is already
    set; ``series_limit`` is always cleared (it has no meaning past this
    conversion).  A user-supplied ORDER BY always wins; otherwise, when a
    limit applies and a group-by is present, order by the first aggregate
    descending (aliasing it ``Value`` if unnamed) with the group columns as
    an ascending tiebreak.
    """
    cfg = copy.deepcopy(config)
    cfg.granularity = None

    if has_positive_series_limit(cfg.series_limit) and cfg.limit is None:
        cfg.limit = cfg.series_limit
    cfg.series_limit = None

    # Only inject the default ordering when we have something to order by:
    # a limit to make deterministic, at least one derived select column to
    # rank on, and a group-by (a groupless categorical chart is one slice —
    # the reference's `typeof groupBy === 'string'` guard, utils.ts:838).
    if (
        not has_non_empty_order_by(cfg.order_by)
        and cfg.limit is not None
        and isinstance(cfg.select, (list, tuple))
        and len(cfg.select) > 0
        and len(cfg.group_by) > 0
    ):
        first: SelectCol = cfg.select[0]
        if not (first.alias or "").strip():
            first.alias = "Value"
        cfg.order_by = [
            SortSpec(quote_identifier(first.alias.strip()), "DESC"),
            *[SortSpec(g, "ASC") for g in cfg.group_by if g.strip()],
        ]
    return cfg


MAX_RENDERED_TIME_CHART_SERIES = 250  # app defaults.ts:16


def resolve_rendered_series_cap(series_limit) -> float:
    """Client-side render cap resolution (app defaults.ts:44-58): ``0`` is
    the explicit load-all escape hatch (infinity); unset, non-integer, or
    negative values fall back to the default cap — malformed input must
    never DISABLE the guard."""
    if series_limit == 0 and isinstance(series_limit, int) and not isinstance(series_limit, bool):
        return float("inf")
    # same usable-positive-integer rule as the CTE gate (Number.isInteger)
    if has_positive_series_limit(series_limit):
        return series_limit
    return MAX_RENDERED_TIME_CHART_SERIES


def convert_to_time_chart_config(
    config: ChartConfig,
    *,
    align_date_range_to_granularity: bool = True,
    max_buckets: int = 80,
) -> ChartConfig:
    """Line/bar TIME chart rewrite (app ChartUtils.tsx:115-165
    convertToTimeChartConfig; ``max_buckets`` generalizes the 80-bucket
    target like the reference CLI's terminal-width cap,
    cli/shared/tileConfig.ts:261-296): 'auto'/unset granularity resolves
    from the date range; the range aligns to the granularity
    grid unless alignment is off, and an aligned range turns END-EXCLUSIVE
    (the aligned end is the next bucket's start — inclusive would
    double-count boundary events); a non-positive seriesLimit is
    normalized AWAY (a cleared null must not be carried over), and the row
    limit pins to 100000."""
    from hyperdx_spark.granularity import auto_granularity
    from hyperdx_spark.metadata import get_aligned_date_range

    cfg = copy.deepcopy(config)
    if not has_positive_series_limit(cfg.series_limit):
        cfg.series_limit = None
    if cfg.granularity in (None, "auto") and cfg.date_range:
        cfg.granularity = auto_granularity(cfg.date_range, max_buckets)
    if align_date_range_to_granularity and cfg.date_range and cfg.granularity:
        cfg.date_range = get_aligned_date_range(cfg.date_range, cfg.granularity)
        cfg.date_range_end_inclusive = False
    cfg.limit = 100_000
    return cfg


def convert_to_number_chart_config(config: ChartConfig) -> ChartConfig:
    """Number charts collapse to a single aggregate value: drop the time
    bucket (granularity) and any group-by (ref core/utils.ts:868-874)."""
    cfg = copy.deepcopy(config)
    cfg.granularity = None
    cfg.group_by = []
    return cfg


def convert_to_table_chart_config(config: ChartConfig) -> ChartConfig:
    """Table charts drop the time bucket and, so the set of rows kept within
    the limit is stable, default a row limit (200) and a group-by ordering
    when the user hasn't set them (ref core/utils.ts:876-900).

    The ordering default is gated on the *reference's* falsy check
    (``!convertedConfig.orderBy``): an unset or empty-string ORDER BY gets
    the default, but an explicitly empty list does not.
    """
    cfg = copy.deepcopy(config)
    cfg.granularity = None

    if cfg.limit is None:
        cfg.limit = 200

    order_falsy = cfg.order_by is None or cfg.order_by == ""
    if cfg.group_by and order_falsy:
        cfg.order_by = [SortSpec(g, "ASC") for g in cfg.group_by if g.strip()]
    return cfg


def chart_drilldown_filters(
    group_filters=(),
    value_range_filter=None,
) -> list:
    """Chart-point → search drill-down filter derivation
    (app ChartUtils.tsx:1173-1203 buildEventsSearchUrl's additionalFilters):
    clicking a series point opens search scoped to that point.

    - each (column, value) group filter becomes ``col IN (<escaped>)``
      (skipped when the column is empty or the value null — the
      reference's ``value != null`` gate);
    - ``value_range_filter`` ({expression, value, threshold=0.05}) adds a
      ±threshold BETWEEN on the Y expression — but ONLY for
      non-aggregate expressions (an aggregate's value is a property of
      the bucket, not of any single row, so no row filter can reproduce
      it).

    Values are escaped with the sqlstring semantics the reference uses
    (``SqlString.escape``); returns ``[{"type": "sql", "condition": ...}]``
    entries that compose with ``filters_to_query``.
    """
    from hyperdx_spark.analytics.event_deltas import is_aggregate_function
    from hyperdx_spark.rowwhere import sqlstring_escape

    out = []
    for gf in group_filters or ():
        column = gf.get("column") if isinstance(gf, dict) else gf[0]
        value = gf.get("value") if isinstance(gf, dict) else gf[1]
        if column and value is not None:
            out.append(
                {
                    "type": "sql",
                    "condition": f"{column} IN ({sqlstring_escape(value)})",
                }
            )
    if value_range_filter:
        expression = value_range_filter["expression"]
        value = value_range_filter["value"]
        threshold = value_range_filter.get("threshold", 0.05)
        if not is_aggregate_function(expression):
            lo = value * (1 - threshold)
            hi = value * (1 + threshold)
            out.append(
                {
                    "type": "sql",
                    "condition": (
                        f"{expression} BETWEEN {sqlstring_escape(lo)}"
                        f" AND {sqlstring_escape(hi)}"
                    ),
                }
            )
    return out


# source.ts:477-494 — aggregate functions whose output preserves the unit
# of the input value (count/count_distinct are dimensionless)
DURATION_PRESERVING_AGG_FNS = {
    "avg", "min", "max", "sum", "any", "last_value",
    "quantile", "quantileMerge",
    "p50", "p90", "p95", "p99",
    "heatmap", "histogram", "histogramMerge",
}

_COMBINATOR_SUFFIX_RE = re.compile(r"If(State|Merge)?$")


def is_duration_preserving_agg_fn(agg_fn) -> bool:
    """source.ts:496-501: no aggFn means a raw expression (unit preserved);
    combinator forms strip their If/IfState/IfMerge suffix first."""
    if not agg_fn:
        return True
    return _COMBINATOR_SUFFIX_RE.sub("", agg_fn) in DURATION_PRESERVING_AGG_FNS


def get_trace_duration_number_format(source, select_expression):
    """source.ts:515-536 getTraceDurationNumberFormat: a duration
    NumberFormat when a trace chart's select EXACTLY equals the source's
    duration expression (arbitrary SQL — substring matching would be
    fragile) under a unit-preserving aggregate; None otherwise.
    ``select_expression``: {"value_expression", "agg_fn"} (a SelectCol
    works too)."""
    if (
        source is None
        or getattr(source, "kind", None) != "trace"
        or not getattr(source, "duration_expression", None)
    ):
        return None
    ve = (
        select_expression.get("value_expression")
        if isinstance(select_expression, dict)
        else getattr(select_expression, "value_expression", None)
    )
    agg = (
        select_expression.get("agg_fn")
        if isinstance(select_expression, dict)
        else getattr(select_expression, "agg_fn", None)
    )
    if not ve or not is_duration_preserving_agg_fn(agg):
        return None
    if ve == source.duration_expression:
        return {
            "output": "duration",
            "factor": 10 ** -source.duration_precision,
        }
    return None


def get_first_series_number_format(select_items, source):
    """source.ts:545-561: the first series-specific numberFormat wins; else
    the first inferred duration format from a trace source's duration
    expression; else None."""
    for series in select_items:
        nf = (
            series.get("number_format")
            if isinstance(series, dict)
            else getattr(series, "number_format", None)
        )
        if nf:
            return nf
    for series in select_items:
        fmt = get_trace_duration_number_format(source, series)
        if fmt:
            return fmt
    return None


def promote_series_condition(config: ChartConfig) -> tuple:
    """buildEventsSearchUrl's where-promotion (ChartUtils.tsx:1160-1171):
    when the global where is empty and there is exactly ONE series, that
    series' aggCondition becomes the search query. Returns
    (where, where_language)."""
    where = config.where or ""
    language = config.where_language or "lucene"
    # a raw-string select has no per-series conditions to promote
    if (
        len(where) == 0
        and not isinstance(config.select, str)
        and len(config.select) == 1
    ):
        sc = config.select[0]
        where = sc.agg_condition or ""
        language = sc.agg_condition_language or "lucene"
    return where, language


def can_replay_dashboard_search(config: ChartConfig) -> bool:
    """buildDashboardReplaySearchUrl's gating (ChartUtils.tsx:1256-1270):
    per-series aggConditions can be replayed only when there is exactly
    one series AND no global where — buildEventsSearchUrl can promote one
    condition into the event query but cannot faithfully replay several,
    or combine one with a global query."""
    if isinstance(config.select, str):
        # raw-string selects carry no per-series conditions
        return True
    has_per_series = any(
        sc.agg_condition is not None and sc.agg_condition.strip()
        for sc in config.select
    )
    can_promote = len(config.select) == 1 and len(config.where or "") == 0
    return not has_per_series or can_promote


def extract_group_columns(group_by) -> list:
    """ChartUtils.tsx:1283-1296 extractGroupColumns: both the string form
    ('col1, col2') and the array form ([{valueExpression}, ...] or
    ['col1', ...])."""
    if not group_by:
        return []
    if isinstance(group_by, str):
        return [v.strip() for v in group_by.split(",")]
    return [
        g if isinstance(g, str) else (
            g.get("value_expression") if isinstance(g, dict)
            else getattr(g, "value_expression", g)
        )
        for g in group_by
    ]


def build_search_replay_params(
    config: ChartConfig,
    *,
    group_filters=(),
    value_range_filter=None,
    require_replayable: bool = False,
):
    """The semantic core of buildEventsSearchUrl /
    buildDashboardReplaySearchUrl (ChartUtils.tsx:1130-1277): the search
    page state a chart click (or dashboard replay) opens — promoted
    where + language, the config's filters plus the drill-down filters,
    and the range in epoch ms. Returns None when ``require_replayable``
    and the per-series conditions cannot be faithfully replayed. URL
    serialization and metric-source remapping are UI plumbing and stay
    client-side."""
    if require_replayable and not can_replay_dashboard_search(config):
        return None
    where, language = promote_series_condition(config)
    filters = list(config.filters or []) + chart_drilldown_filters(
        group_filters, value_range_filter
    )
    out = {"where": where, "where_language": language, "filters": filters}
    if config.date_range is not None:
        out["from_ms"] = int(config.date_range[0].timestamp() * 1000)
        out["to_ms"] = int(config.date_range[1].timestamp() * 1000)
    return out


# ChartUtils.tsx:54-72 — aggregate functions whose per-row values can be
# "attributed" back to individual rows for a ±range drill-down (count/sum/
# count_distinct/increase are totals no single row reproduces). Unknown
# aggFns default to attributable (`?.isAttributable !== false`).
NON_ATTRIBUTABLE_AGG_FNS = {"count", "sum", "count_distinct", "increase"}


def table_row_drilldown(config: ChartConfig, row) -> dict:
    """buildTableRowSearchUrl's row → drill inputs derivation
    (ChartUtils.tsx:1301-1368): the group filters come from the row's
    values of the config's group columns (nulls skipped); the value-range
    filter comes from the FIRST select column — only when its aggFn is
    attributable, and only when the row's first non-group column holds a
    number. Returns {"group_filters", "value_range_filter"} ready for
    :func:`chart_drilldown_filters` / :func:`build_search_replay_params`."""
    group_columns = extract_group_columns(config.group_by)
    group_filters = [
        {"column": col, "value": row[col]}
        for col in group_columns
        if row.get(col) is not None
    ]
    value_range_filter = None
    first = config.select[0] if config.select else None
    if first is not None:
        agg_fn = None if isinstance(first, str) else first.agg_fn
        attributable = agg_fn not in NON_ATTRIBUTABLE_AGG_FNS
        if attributable:
            value_expression = (
                first if isinstance(first, str) else first.value_expression
            )
            group_set = set(group_columns)
            value_column = next(
                (k for k in row if k not in group_set), None
            )
            row_value = row.get(value_column) if value_column else None
            if row_value is not None and isinstance(
                row_value, (int, float)
            ) and not isinstance(row_value, bool):
                value_range_filter = {
                    "expression": value_expression,
                    "value": row_value,
                }
    return {
        "group_filters": group_filters,
        "value_range_filter": value_range_filter,
    }


def resolve_comparison_click(label, rows, selected):
    """app components/PropertyComparisonChart.tsx resolveComparisonClick:
    the comparison bar chart's selection toggle — clicking the selected
    bar deselects, the aggregated 'Other' bucket and unknown labels never
    select. Rows are dicts with 'name' and optional 'isOther'."""
    if not label:
        return None
    row = next((r for r in rows if r.get("name") == label), None)
    if row is None or row.get("isOther"):
        return None
    return None if label == selected else label
