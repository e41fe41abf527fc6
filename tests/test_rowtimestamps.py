"""Twins of packages/app/src/utils/__tests__/rowTimestamps.test.ts plus
js_date_ms coverage for the shared JS Date emulation."""

from datetime import datetime, timezone

import pytest

from hyperdx_spark.functions.chcompat import classify_timestamp_type
from hyperdx_spark.jsnum import js_date_ms
from hyperdx_spark.rowtimestamps import (
    ROW_LOOKUP_WINDOW_LEAD_HOURS,
    ROW_LOOKUP_WINDOW_LOOKBACK_HOURS,
    get_row_lookup_window,
    get_timestamp_value_selects,
    resolve_row_timestamp_anchor,
    timestamp_value_alias,
)

TIMESTAMP = "2024-05-01T14:23:11.123456789Z"
# JS Date truncates the fraction to milliseconds
TS_DT = datetime(2024, 5, 1, 14, 23, 11, 123000, tzinfo=timezone.utc)


def _meta(types):
    return [
        {"name": timestamp_value_alias(i), "type": t}
        for i, t in enumerate(types)
    ]


# ---------------------------------------------------------------------------
# getTimestampValueSelects
# ---------------------------------------------------------------------------

def test_single_column_expression():
    assert get_timestamp_value_selects("Timestamp") == [
        {"value_expression": "Timestamp", "alias": "__hdx_timestamp_value_0"},
    ]


def test_composite_expression():
    assert get_timestamp_value_selects("EventDate, EventTime") == [
        {"value_expression": "EventDate", "alias": "__hdx_timestamp_value_0"},
        {"value_expression": "EventTime", "alias": "__hdx_timestamp_value_1"},
    ]


def test_does_not_split_inside_brackets():
    got = get_timestamp_value_selects(
        "toDate(EventTime), toDateTime64(EventTime, 9)"
    )
    assert got == [
        {"value_expression": "toDate(EventTime)",
         "alias": "__hdx_timestamp_value_0"},
        {"value_expression": "toDateTime64(EventTime, 9)",
         "alias": "__hdx_timestamp_value_1"},
    ]


@pytest.mark.parametrize("expr", [None, "", "   "])
def test_projects_nothing_for_blank(expr):
    assert get_timestamp_value_selects(expr) == []


# ---------------------------------------------------------------------------
# classifyTimestampType (core/utils.ts:153-174)
# ---------------------------------------------------------------------------

def test_classify_timestamp_type():
    assert classify_timestamp_type("Date") == {"kind": "date", "precision": -1}
    assert classify_timestamp_type("Date32") == {"kind": "date", "precision": -1}
    assert classify_timestamp_type("DateTime") == {
        "kind": "datetime", "precision": 0}
    assert classify_timestamp_type("DateTime('UTC')") == {
        "kind": "datetime", "precision": 0}
    assert classify_timestamp_type("DateTime64(9)") == {
        "kind": "datetime64", "precision": 9}
    assert classify_timestamp_type("Nullable(DateTime64(3, 'UTC'))") == {
        "kind": "datetime64", "precision": 3}
    assert classify_timestamp_type("String") is None
    assert classify_timestamp_type(None) is None
    assert classify_timestamp_type("") is None


# ---------------------------------------------------------------------------
# resolveRowTimestampAnchor
# ---------------------------------------------------------------------------

def test_resolves_single_datetime64():
    assert resolve_row_timestamp_anchor(
        timestamp_value_expression="Timestamp",
        row={"__hdx_timestamp_value_0": TIMESTAMP},
        meta=_meta(["DateTime64(9)"]),
    ) == TS_DT


def test_skips_day_precision_column_of_composite():
    assert resolve_row_timestamp_anchor(
        timestamp_value_expression="EventDate, EventTime",
        row={"__hdx_timestamp_value_0": "2024-05-01",
             "__hdx_timestamp_value_1": TIMESTAMP},
        meta=_meta(["Date", "DateTime64(9)"]),
    ) == TS_DT


def test_resolves_fine_column_regardless_of_order():
    assert resolve_row_timestamp_anchor(
        timestamp_value_expression="EventTime, EventDate",
        row={"__hdx_timestamp_value_0": TIMESTAMP,
             "__hdx_timestamp_value_1": "2024-05-01"},
        meta=_meta(["DateTime64(9)", "Date32"]),
    ) == TS_DT


def test_prefers_highest_precision():
    assert resolve_row_timestamp_anchor(
        timestamp_value_expression="EventSecond, EventNano",
        row={"__hdx_timestamp_value_0": "2024-05-01T14:23:11Z",
             "__hdx_timestamp_value_1": TIMESTAMP},
        meta=_meta(["DateTime", "DateTime64(9)"]),
    ) == TS_DT


def test_breaks_precision_ties_on_earlier_token():
    assert resolve_row_timestamp_anchor(
        timestamp_value_expression="EventTime, ObservedTime",
        row={"__hdx_timestamp_value_0": TIMESTAMP,
             "__hdx_timestamp_value_1": "2024-05-01T18:00:00.000Z"},
        meta=_meta(["DateTime64(9)", "DateTime64(9)"]),
    ) == TS_DT


def test_looks_through_nullable_and_timezone():
    assert resolve_row_timestamp_anchor(
        timestamp_value_expression="Timestamp",
        row={"__hdx_timestamp_value_0": TIMESTAMP},
        meta=_meta(["Nullable(DateTime64(3, 'UTC'))"]),
    ) == TS_DT


def test_numeric_value_is_unix_seconds():
    assert resolve_row_timestamp_anchor(
        timestamp_value_expression="Timestamp",
        row={"__hdx_timestamp_value_0": 1714573391},
        meta=_meta(["DateTime"]),
    ) == datetime.fromtimestamp(1714573391, tz=timezone.utc)


@pytest.mark.parametrize("label,kwargs", [
    ("every column is day-precision", dict(
        timestamp_value_expression="EventDate, EventDate32",
        row={"__hdx_timestamp_value_0": "2024-05-01",
             "__hdx_timestamp_value_1": "2024-05-01"},
        meta=_meta(["Date", "Date32"]))),
    ("type is not a timestamp", dict(
        timestamp_value_expression="Timestamp",
        row={"__hdx_timestamp_value_0": TIMESTAMP},
        meta=_meta(["String"]))),
    ("meta has no entry for the alias", dict(
        timestamp_value_expression="Timestamp",
        row={"__hdx_timestamp_value_0": TIMESTAMP},
        meta=[{"name": "Timestamp", "type": "DateTime64(9)"}])),
    ("value missing from row", dict(
        timestamp_value_expression="Timestamp",
        row={},
        meta=_meta(["DateTime64(9)"]))),
    ("value unparseable", dict(
        timestamp_value_expression="Timestamp",
        row={"__hdx_timestamp_value_0": "not-a-timestamp"},
        meta=_meta(["DateTime64(9)"]))),
    ("meta unavailable", dict(
        timestamp_value_expression="Timestamp",
        row={"__hdx_timestamp_value_0": TIMESTAMP},
        meta=None)),
    ("row missing", dict(
        timestamp_value_expression="Timestamp",
        row=None,
        meta=_meta(["DateTime64(9)"]))),
    ("no timestamp expression", dict(
        timestamp_value_expression="   ",
        row={"__hdx_timestamp_value_0": TIMESTAMP},
        meta=_meta(["DateTime64(9)"]))),
])
def test_returns_none_on_rejection_paths(label, kwargs):
    assert resolve_row_timestamp_anchor(**kwargs) is None


# ---------------------------------------------------------------------------
# getRowLookupWindow
# ---------------------------------------------------------------------------

def test_window_reaches_further_back_than_forward():
    assert ROW_LOOKUP_WINDOW_LOOKBACK_HOURS > ROW_LOOKUP_WINDOW_LEAD_HOURS


def test_window_spans_4h_back_1h_forward():
    assert get_row_lookup_window("2024-05-02T12:00:00.000Z") == (
        datetime(2024, 5, 2, 8, 0, tzinfo=timezone.utc),
        datetime(2024, 5, 2, 13, 0, tzinfo=timezone.utc),
    )


def test_window_covers_span_started_hours_before_log():
    span_start = datetime(2024, 5, 2, 9, 0, tzinfo=timezone.utc)
    log_instant = "2024-05-02T12:30:00.000Z"
    start, end = get_row_lookup_window(log_instant)
    assert start < span_start
    assert end > datetime(2024, 5, 2, 12, 30, tzinfo=timezone.utc)


@pytest.mark.parametrize("v", [None, "", "   ", "not-a-timestamp"])
def test_window_none_on_bad_anchor(v):
    assert get_row_lookup_window(v) is None


# ---------------------------------------------------------------------------
# js_date_ms (shared JS Date emulation)
# ---------------------------------------------------------------------------

def test_js_date_ms_iso_forms():
    assert js_date_ms("2024-05-01T14:23:11.123456789Z") == TS_DT.timestamp() * 1000
    assert js_date_ms("2024-05-01") == datetime(
        2024, 5, 1, tzinfo=timezone.utc).timestamp() * 1000
    assert js_date_ms("2024") == datetime(
        2024, 1, 1, tzinfo=timezone.utc).timestamp() * 1000
    # offset designator
    assert js_date_ms("2024-05-01T14:00:00+02:00") == datetime(
        2024, 5, 1, 12, 0, tzinfo=timezone.utc).timestamp() * 1000
    # space separator (CH render form)
    assert js_date_ms("2024-05-01 14:23:11") == datetime(
        2024, 5, 1, 14, 23, 11, tzinfo=timezone.utc).timestamp() * 1000


def test_js_date_ms_rfc2822():
    assert js_date_ms("Mon, 01 Jan 2024 00:00:00 GMT") == datetime(
        2024, 1, 1, tzinfo=timezone.utc).timestamp() * 1000


def test_js_date_ms_rejects():
    assert js_date_ms("") is None
    assert js_date_ms("not-a-timestamp") is None
    assert js_date_ms("2024-13-01") is None  # out-of-range month


def test_parse_api_timestamp_widened_to_rfc2822():
    from hyperdx_spark.promql import parse_api_timestamp

    assert parse_api_timestamp("Mon, 01 Jan 2024 00:00:00 GMT") == datetime(
        2024, 1, 1, tzinfo=timezone.utc).timestamp()
    with pytest.raises(ValueError, match="Invalid timestamp"):
        parse_api_timestamp("not-a-date")


# ---------------------------------------------------------------------------
# Wiring: anchor -> lookup window -> ChartConfig date_range ("view events
# around this row", the reference's View Trace push)
# ---------------------------------------------------------------------------

def test_row_anchor_drives_chart_config_window(spark):
    from hyperdx_spark import (
        ChartConfig, SelectCol, Source, compile_chart_config,
    )
    from hyperdx_spark.io import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    # the row query projects every timestamp token under the aliases
    selects = get_timestamp_value_selects("ts")
    row_df = ev.selectExpr(
        *[f"{s['value_expression']} AS {s['alias']}" for s in selects],
        "event_id",
    ).orderBy("event_id").limit(1)
    row = {k: v for k, v in row_df.collect()[0].asDict().items()}
    anchor = resolve_row_timestamp_anchor(
        timestamp_value_expression="ts",
        row=row,
        meta=[{"name": "__hdx_timestamp_value_0", "type": "DateTime64(6)"}],
    )
    assert anchor is not None
    window = get_row_lookup_window(anchor.isoformat())
    assert window is not None and window[0] < anchor < window[1]

    cfg = ChartConfig(
        source=Source(table="events", timestamp_value_expression="ts"),
        select=[SelectCol(agg_fn="count", alias="cnt")],
        date_range=(window[0].replace(tzinfo=None), window[1].replace(tzinfo=None)),
    )
    out = compile_chart_config(spark, cfg, sf_dir="/root/testdata/sf0.001")
    # the anchor row itself falls inside its own lookup window
    assert out.collect()[0]["cnt"] >= 1
