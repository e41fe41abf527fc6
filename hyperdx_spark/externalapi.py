"""External API v2 chart-series surface (ref: packages/api/src/routers/
external-api/v2/charts.ts — the public /api/v2/charts/series endpoint).

The endpoint translates the external series dialect into internal
ChartConfigs (one per series), runs them, and zips the rows into
``{ts_bucket, group, series_<i>.data}`` records. The HTTP/auth/metrics
glue stays out of scope; the dialect mapping, validation, and response
shaping are query semantics and live here."""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Optional, Sequence

from .model import ChartConfig, SelectCol, Source

#: charts.ts:159-176 — the public granularity tokens and their internal
#: intervals ('1s' is documented for testing only and excluded from the
#: public schema)
API_GRANULARITY_TO_INTERNAL = {
    "1s": "1 second",
    "30s": "30 second",
    "1m": "1 minute",
    "5m": "5 minute",
    "10m": "10 minute",
    "15m": "15 minute",
    "30m": "30 minute",
    "1h": "1 hour",
    "2h": "2 hour",
    "6h": "6 hour",
    "12h": "12 hour",
    "1d": "1 day",
    "2d": "2 day",
    "7d": "7 day",
    "30d": "30 day",
    "auto": "auto",
}


def translate_granularity_to_interval(granularity: Optional[str]):
    """charts.ts:204-211: None/'auto' defer to auto-granularity; anything
    else maps through the public token table (unknown tokens -> None,
    which the config builder also treats as 'auto')."""
    if not granularity or granularity == "auto":
        return None
    return API_GRANULARITY_TO_INTERNAL.get(granularity)


def validate_series_group_by(series: Sequence[dict]) -> Optional[str]:
    """charts.ts series schema refinement: every series must share the
    SAME groupBy fields (the zipped response has ONE group tuple per
    row). Returns the reference's message or None."""
    if not series:
        return None
    first = series[0].get("group_by") or []
    if all((s.get("group_by") or []) == first for s in series):
        return None
    return "All series must have the same groupBy fields"


def external_series_to_chart_config(
    external_series: dict,
    source: Source,
    *,
    series_index: int,
    start_time_ms: int,
    end_time_ms: int,
    granularity: Optional[str] = None,
    series_return_type: Optional[str] = None,
) -> ChartConfig:
    """charts.ts:216-318 buildChartConfigFromRequest: one external series
    to an internal ChartConfig — alias ``series_<i>``, the external
    ``where`` becomes the per-series aggCondition (lucene default), and
    the v1 dialect's dotted ``field`` wraps in single quotes (the legacy
    property shorthand the reference preserves verbatim). Metric sources
    resolve metricName from ``metricName ?? field`` and default the value
    expression to ``Value``."""
    agg_fn = external_series.get("agg_fn")
    if agg_fn is None:
        raise ValueError("aggFn must be set for time chart")
    field = external_series.get("field")
    metric_name = external_series.get("metric_name")
    is_metric = source.kind == "metric"

    def quoted(f: Optional[str]) -> str:
        if not f:
            return ""
        return f"'{f}'" if "." in f else f

    if is_metric:
        value_expression = (
            quoted(field) if (metric_name and field) else "Value"
        )
    else:
        value_expression = quoted(field)

    group_by = list(external_series.get("group_by") or [])
    translated = translate_granularity_to_interval(granularity)
    # seriesReturnType 'ratio' composes downstream via post.compute_ratio
    # (the reference passes it through to the renderer the same way)
    return ChartConfig(
        source=source,
        select=[
            SelectCol(
                agg_fn=agg_fn,
                level=external_series.get("level"),
                value_expression=value_expression,
                agg_condition=(external_series.get("where") or "").strip(),
                agg_condition_language=external_series.get("where_language")
                or "lucene",
                alias=f"series_{series_index}",
            )
        ],
        where="",
        group_by=group_by,
        date_range=(
            datetime.fromtimestamp(start_time_ms / 1000, tz=timezone.utc)
            .replace(tzinfo=None),
            datetime.fromtimestamp(end_time_ms / 1000, tz=timezone.utc)
            .replace(tzinfo=None),
        ),
        granularity=translated or "auto",
    )


def format_ch_result(
    data_rows: Sequence[dict],
    group_by_fields: Optional[Sequence[str]],
    *,
    bucket_col: str = "__hdx_time_bucket",
) -> list[dict]:
    """charts.ts:304-361 formatCHResult: zip per-series rows into ONE
    record per (ts_bucket, group) — epoch-ms bucket, the group tuple, and
    every ``series_<i>`` column renamed ``series_<i>.data``. First-seen
    order is preserved (a JS Map)."""
    if not data_rows:
        return []
    group_cols = list(group_by_fields or [])
    out: dict[str, dict] = {}
    for item in data_rows:
        ts_raw = item[bucket_col]
        ts = (
            int(ts_raw.replace(tzinfo=timezone.utc).timestamp() * 1000)
            if isinstance(ts_raw, datetime) and ts_raw.tzinfo is None
            else int(ts_raw.timestamp() * 1000)
            if isinstance(ts_raw, datetime)
            else int(ts_raw)
        )
        group = [item.get(f) for f in group_cols]
        key = f"{ts}|{'|'.join(str(g) for g in group)}"
        row = out.setdefault(key, {"ts_bucket": ts, "group": group})
        for k, v in item.items():
            if k.startswith("series_"):
                row[f"{k}.data"] = v
    return list(out.values())


def run_chart_series(
    spark,
    series: Sequence[dict],
    sources: Sequence[Source],
    *,
    sf_dir: str,
    start_time_ms: int,
    end_time_ms: int,
    granularity: Optional[str] = None,
    series_return_type: Optional[str] = None,
) -> list[dict]:
    """The /api/v2/charts/series execution shape: validate the shared
    groupBy, run ONE config per series (each against its own source),
    and zip the union of rows with :func:`format_ch_result`. Each
    series' bucket column is aliased ``__hdx_time_bucket`` so the zip
    key matches the reference's."""
    from .compile import compile_chart_config

    err = validate_series_group_by(series)
    if err:
        raise ValueError(err)
    if len(series) != len(sources):
        raise ValueError("series and sources must pair up")
    group_by = list(series[0].get("group_by") or []) if series else []
    rows: list[dict] = []
    for idx, (s, src) in enumerate(zip(series, sources)):
        cfg = external_series_to_chart_config(
            s, src, series_index=idx,
            start_time_ms=start_time_ms, end_time_ms=end_time_ms,
            granularity=granularity, series_return_type=series_return_type,
        )
        df = compile_chart_config(spark, cfg, sf_dir=sf_dir)
        df = df.withColumnRenamed("__timestamp", "__hdx_time_bucket")
        rows.extend(r.asDict() for r in df.collect())
    return format_ch_result(rows, group_by)
