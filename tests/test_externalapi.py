"""External API v2 chart-series surface (hyperdx_spark.externalapi) —
external-api/v2/charts.ts twins."""

from datetime import datetime

import pytest

from hyperdx_spark.externalapi import (
    API_GRANULARITY_TO_INTERNAL,
    external_series_to_chart_config,
    format_ch_result,
    run_chart_series,
    translate_granularity_to_interval,
    validate_series_group_by,
)
from hyperdx_spark.model import Source


def test_granularity_translation():
    assert translate_granularity_to_interval(None) is None
    assert translate_granularity_to_interval("auto") is None
    assert translate_granularity_to_interval("15m") == "15 minute"
    assert translate_granularity_to_interval("1d") == "1 day"
    assert translate_granularity_to_interval("bogus") is None
    # '1s' exists for testing but is excluded from the public schema
    assert "1s" in API_GRANULARITY_TO_INTERNAL


def test_series_group_by_consistency():
    ok = [{"group_by": ["service"]}, {"group_by": ["service"]}]
    assert validate_series_group_by(ok) is None
    bad = [{"group_by": ["service"]}, {"group_by": []}]
    assert validate_series_group_by(bad) == (
        "All series must have the same groupBy fields"
    )
    assert validate_series_group_by([]) is None


def test_external_series_to_chart_config():
    src = Source(table="events", timestamp_value_expression="ts")
    cfg = external_series_to_chart_config(
        {"agg_fn": "avg", "field": "value", "where": " level:err ",
         "group_by": ["event_type"]},
        src, series_index=1,
        start_time_ms=1704067200000, end_time_ms=1704153600000,
        granularity="1h",
    )
    sc = cfg.select[0]
    assert sc.alias == "series_1" and sc.agg_fn == "avg"
    assert sc.value_expression == "value"
    assert sc.agg_condition == "level:err"          # trimmed
    assert sc.agg_condition_language == "lucene"    # default
    assert cfg.granularity == "1 hour"
    assert cfg.date_range == (datetime(2024, 1, 1), datetime(2024, 1, 2))
    # the v1 dotted-field shorthand wraps in single quotes (verbatim)
    cfg = external_series_to_chart_config(
        {"agg_fn": "avg", "field": "a.b"}, src, series_index=0,
        start_time_ms=0, end_time_ms=1000,
    )
    assert cfg.select[0].value_expression == "'a.b'"
    # aggFn is mandatory
    with pytest.raises(ValueError, match="aggFn"):
        external_series_to_chart_config(
            {}, src, series_index=0, start_time_ms=0, end_time_ms=1,
        )
    # metric sources: metricName ?? field, value defaults to Value
    m = Source(table="m", kind="metric", timestamp_value_expression="ts")
    cfg = external_series_to_chart_config(
        {"agg_fn": "sum", "metric_name": "reqs"}, m, series_index=0,
        start_time_ms=0, end_time_ms=1000,
    )
    assert cfg.select[0].value_expression == "Value"


def test_format_ch_result_reference_example():
    """charts.ts:304-334 — the documented example verbatim."""
    rows = [
        {"series_0": "42", "ServiceName": "api-service",
         "__hdx_time_bucket": datetime(2023, 6, 15, 14, 0)},
        {"series_0": "17", "ServiceName": "web-service",
         "__hdx_time_bucket": datetime(2023, 6, 15, 14, 0)},
        {"series_1": "35", "ServiceName": "api-service",
         "__hdx_time_bucket": datetime(2023, 6, 15, 14, 0)},
        {"series_0": "22", "ServiceName": "api-service",
         "__hdx_time_bucket": datetime(2023, 6, 15, 14, 10)},
    ]
    out = format_ch_result(rows, ["ServiceName"])
    assert out == [
        {"ts_bucket": 1686837600000, "group": ["api-service"],
         "series_0.data": "42", "series_1.data": "35"},
        {"ts_bucket": 1686837600000, "group": ["web-service"],
         "series_0.data": "17"},
        {"ts_bucket": 1686838200000, "group": ["api-service"],
         "series_0.data": "22"},
    ]
    assert format_ch_result([], ["x"]) == []


def test_run_chart_series_executed(spark, sf_dir):
    """Two series (count + avg) over events, grouped by event_type at 1d:
    the zipped records carry both series' values per (bucket, group)."""
    src = Source(table="events", timestamp_value_expression="ts")
    out = run_chart_series(
        spark,
        [
            {"agg_fn": "count", "group_by": ["event_type"]},
            {"agg_fn": "avg", "field": "value", "group_by": ["event_type"]},
        ],
        [src, src],
        sf_dir=sf_dir,
        start_time_ms=1704067200000,   # 2024-01-01
        end_time_ms=1704240000000,     # 2024-01-03
        granularity="1d",
    )
    assert out, "expected zipped rows"
    row = next(r for r in out if r["group"] == ["error"]
               and r["ts_bucket"] == 1704067200000)
    assert "series_0.data" in row and "series_1.data" in row
    assert row["series_0.data"] > 0          # count
    assert 0 < row["series_1.data"] < 10000  # avg(value)
    # the groupBy mismatch is rejected up front
    with pytest.raises(ValueError, match="same groupBy"):
        run_chart_series(
            spark,
            [{"agg_fn": "count", "group_by": ["event_type"]},
             {"agg_fn": "count", "group_by": []}],
            [src, src], sf_dir=sf_dir,
            start_time_ms=0, end_time_ms=1000,
        )
