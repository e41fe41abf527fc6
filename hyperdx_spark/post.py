"""Post-query operators — in the reference these run client-side over JSON
result sets; here they are DataFrame transformations so they stay distributed
and inside the same Catalyst plan.

Ref: hyperdxio/hyperdx ``packages/common-utils/src/clickhouse/index.ts``
(mergeResultSets 496-610, computeRatio/computeResultSetRatio 377-490) and
``packages/app/src/ChartUtils.tsx`` (fillNulls 1055-1119).
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


_NUMERIC_PREFIXES = (
    "double", "float", "int", "bigint", "smallint", "tinyint", "decimal",
)


def merge_result_sets(dfs: Sequence[DataFrame], on: Sequence[str]) -> DataFrame:
    """Client-side bucket merge (clickhouse/index.ts:496-610): N per-series
    result sets merged on (time bucket + group dims) — a full outer join on
    the bucket keys. Spark equivalent of the reference's hash-key merge.

    Alias collisions: a non-key column already present from an earlier
    result set is suffixed ``__<splitIdx>`` exactly like mergeResultSets
    (index.ts:529-533 — e.g. a same-alias ratio of ``count(x)`` filtered /
    unfiltered becomes ``count(x)`` and ``count(x)__1``).

    Column order mirrors the joined meta
    (queryChartConfig.int.test.ts:108-174): each split's VALUE column
    (its first numeric non-key column) comes first, in split order, then
    the bucket/group columns — the order useChartNumberFormats indexes
    config.select into."""
    keys = list(on)
    seen: set = set()
    renamed = []
    value_cols: list[str] = []
    for idx, df in enumerate(dfs):
        mapping = {}
        for c in df.columns:
            if c in keys:
                continue
            if c in seen:
                mapping[c] = f"{c}__{idx}"
            else:
                seen.add(c)
        d2 = df.withColumnsRenamed(mapping) if mapping else df
        renamed.append(d2)
        dtypes = dict(d2.dtypes)
        for c in d2.columns:
            if c in keys:
                continue
            if dtypes[c].startswith(_NUMERIC_PREFIXES):
                value_cols.append(c)
                break
    out = reduce(lambda a, b: a.join(b, on=keys, how="full_outer"), renamed)
    ordered = value_cols + [c for c in out.columns if c not in value_cols]
    # backtick-quote: metric aliases like `avg(metric.alpha)` contain dots
    return out.select(*[F.col(f"`{c}`") for c in ordered])


def compute_ratio(
    df: DataFrame,
    *,
    numerator: str,
    denominator: str,
    on_groups: Sequence[str] = (),
    bucket_col: str = "__timestamp",
    mode: str = "per_group",
    alias: str = "ratio",
) -> DataFrame:
    """Ratio series (clickhouse/index.ts:377-448; modes types.ts:1266-1267).

    per_group:       ratio = num / den row-wise.
    share_of_total:  denominator = per-bucket total of *denominator* across
                     all groups (window sum partitioned by bucket; Spark sum
                     skips NULLs, so a group missing its denominator doesn't
                     poison the bucket total — index.ts test parity). With no
                     bucket column (Table/Number ratio) every row shares one
                     bucket, so the share is of the grand total.

    A group absent from the (filtered) numerator result contributes ZERO,
    not "no data" (index.ts:437 ``row[numerator] ?? 0``) — a zero-error
    group reads 0%, not N/A. An undefined ratio (zero or missing
    denominator) is NULL here where the reference yields NaN — Spark's
    NULL is the engine-side spelling of the client's N/A rendering.
    """
    num = F.coalesce(F.col(numerator).cast("double"), F.lit(0.0))
    if mode == "share_of_total":
        bucket = (
            F.col(bucket_col) if bucket_col in df.columns else F.lit("__all__")
        )
        den = F.sum(F.col(denominator).cast("double")).over(
            Window.partitionBy(bucket)
        )
    elif mode == "per_group":
        den = F.col(denominator).cast("double")
    else:
        raise ValueError(f"unknown ratio mode {mode!r}")
    ratio = F.when(den != 0, num / den)
    return df.withColumn(alias, ratio)


def limit_ratio_series(
    df: DataFrame,
    n: int,
    *,
    group_cols: Sequence[str],
    ratio_col: str = "ratio",
) -> DataFrame:
    """Series cap for RATIO charts: rank by the ratio the chart plots with
    the finite guard (``max(if(isFinite(r), r, -inf))`` —
    renderSeriesLimitCte, renderChartConfig.ts:1393-1403). A ratio bucket
    whose denominator is 0 yields ±inf (0/0 -> NaN); unguarded, those
    sparse-bucket groups grab the top-N slots from genuinely high-ratio
    series. Applied after :func:`compute_ratio` (the reference collapses
    the two selects into ``divide(a, b)`` inside the CTE instead —
    mergeRatio, ts:1385-1391 — same ranking value)."""
    from hyperdx_spark.compile import _apply_series_limit

    return _apply_series_limit(
        df, list(group_cols), ratio_col, n, finite_guard=True
    )


def get_previous_date_range(current_range) -> tuple:
    """ChartUtils.tsx:482-489 getPreviousDateRange: the window immediately
    before the current one — both bounds shifted back by the range length
    in WHOLE seconds (differenceInSeconds truncates sub-second remainders,
    so a 90.7 s window shifts by 90 s; pinned, not 'fixed')."""
    from datetime import timedelta

    start, end = current_range
    offset_seconds = int((end - start).total_seconds())
    d = timedelta(seconds=offset_seconds)
    return (start - d, end - d)


def previous_period(
    df: DataFrame, *, bucket_col: str = "__timestamp", offset_seconds: int = 0
) -> DataFrame:
    """Previous-period overlay: shift buckets forward so the prior window
    aligns with the current one (ChartUtils.tsx previous-period offset)."""
    return df.withColumn(
        bucket_col,
        F.timestamp_seconds(F.unix_timestamp(F.col(bucket_col)) + offset_seconds),
    )


CHART_KEY_JOINER = " · "  # ChartUtils.tsx:198
PREVIOUS_PERIOD_SUFFIX = " (previous)"  # ChartUtils.tsx:199
MAX_RENDERED_TIME_CHART_SERIES = 250  # defaults.ts:16


def format_time_chart(
    df: DataFrame,
    *,
    ts_col: str = "__timestamp",
    value_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    date_range=None,
    step_seconds: Optional[int] = None,
    fill: Optional[float] = 0.0,
    previous_df: Optional[DataFrame] = None,
    previous_offset_seconds: int = 0,
    max_series: int = MAX_RENDERED_TIME_CHART_SERIES,
) -> tuple[list[dict], list[dict], int]:
    """Pivot aggregated rows into per-series chart lines
    (ChartUtils.tsx:704-830 formatResponseForTimeChart).

    Presentation-layer operator: runs on the driver over the (already
    aggregated, small) chart result, like the reference runs it in the
    browser. Returns (rows, line_meta, hidden_series_count):

    * rows: one dict per bucket ``{ts_col: epoch_s, "<series key>": value}``,
      empty buckets zero-filled when *date_range*+*step_seconds* are given;
    * series key = value column, group values joined with ``' · '``
      (value-column prefix omitted for single-value grouped charts);
      previous-period series get ``' (previous)'`` and their buckets are
      shifted forward by *previous_offset_seconds*;
    * the render cap keeps the top *max_series* LOGICAL series by peak
      value (current + previous pairs and multi-value-column siblings are
      kept or dropped together; current-period groups take priority).
    """
    value_cols = list(value_cols)
    group_cols = list(group_cols)
    omit_value_in_key = len(value_cols) == 1 and bool(group_cols)
    has_value_prefix = len(value_cols) > 1 and bool(group_cols)

    buckets: dict[int, dict] = {}
    lines: dict[str, dict] = {}

    def add(rows, is_previous: bool) -> None:
        offset = previous_offset_seconds if is_previous else 0
        for row in rows:
            ts = int(row[ts_col].timestamp()) + offset
            bucket = buckets.setdefault(ts, {ts_col: ts})
            parts = ["" if row[g] is None else str(row[g]) for g in group_cols]
            group_part = CHART_KEY_JOINER.join(parts)
            for vc in value_cols:
                if omit_value_in_key:
                    current_key = group_part
                elif group_cols:
                    current_key = CHART_KEY_JOINER.join([vc, *parts])
                else:
                    current_key = vc
                key = current_key + (PREVIOUS_PERIOD_SUFFIX if is_previous else "")
                v = row[vc]
                bucket[key] = float(v) if v is not None else None
                if key not in lines:
                    group_key = current_key
                    if has_value_prefix and current_key.startswith(vc + CHART_KEY_JOINER):
                        group_key = current_key[len(vc + CHART_KEY_JOINER):]
                    lines[key] = {
                        "data_key": key,
                        "current_period_key": current_key,
                        "group_key": group_key,
                        "value_column": vc,
                        "is_previous": is_previous,
                    }

    add(df.collect(), False)
    if previous_df is not None:
        add(previous_df.collect(), True)

    # zero-fill empty buckets (generateEmptyBuckets/fillNulls,
    # ChartUtils.tsx:1055-1119)
    if date_range is not None and step_seconds:
        lo = int(date_range[0].timestamp()) // step_seconds * step_seconds
        hi = int(date_range[1].timestamp()) // step_seconds * step_seconds
        for ts in range(lo, hi + 1, step_seconds):
            buckets.setdefault(ts, {ts_col: ts})
        if fill is not None:
            for bucket in buckets.values():
                for key in lines:
                    bucket.setdefault(key, fill)

    # render cap on logical groups, ranked by peak value; groups with a
    # current-period series outrank previous-only groups
    peaks: dict[str, float] = {}
    current_groups = set()
    for key, line in lines.items():
        g = line["group_key"]
        peak = max(
            (b[key] for b in buckets.values() if b.get(key) is not None),
            default=float("-inf"),
        )
        peaks[g] = max(peaks.get(g, float("-inf")), peak)
        if not line["is_previous"]:
            current_groups.add(g)
    ranked = sorted(
        peaks, key=lambda g: (g not in current_groups, -peaks[g], g)
    )
    kept = set(ranked[:max_series])
    hidden = len(ranked) - len(kept)
    line_meta = [ln for ln in lines.values() if ln["group_key"] in kept]
    kept_keys = {ln["data_key"] for ln in line_meta}
    rows = [
        {k: v for k, v in b.items() if k == ts_col or k in kept_keys}
        for _, b in sorted(buckets.items())
    ]
    return rows, line_meta, hidden
