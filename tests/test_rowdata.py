"""Row side-panel data lookup — DBRowDataPanel.test.ts twins
(DBRowDataPanel.tsx:20-342)."""

from datetime import datetime

from hyperdx_spark.model import Source
from hyperdx_spark.rowdata import (
    ROW_DATA_ALIASES,
    build_row_lookup_config,
    get_displayed_timestamp_value_expression,
    get_event_body,
    get_json_column_names,
    get_map_column_names,
    lookup_row,
    row_has_k8s_context,
    row_lookup_fallback_state,
)

SRC = Source(
    table="logs",
    kind="log",
    timestamp_value_expression="Timestamp",
    body_expression="Body",
)
RANGE = (datetime(2024, 1, 1), datetime(2024, 1, 1, 2))


def _ts_value_selects(cfg):
    return [
        s for s in cfg["select"]
        if (s.get("alias") or "").startswith("__hdx_timestamp_value_")
    ]


def test_json_and_map_column_names():
    meta = [
        {"name": "col1", "type": "String"},
        {"name": "col2", "type": "JSON"},
        {"name": "col3", "type": "JSON(1)"},
    ]
    assert get_json_column_names(meta) == ["col2", "col3"]
    meta = [
        ("col1", "String"),
        ("LogAttributes", "Map(String, String)"),
        ("ResourceAttributes", "Map(String, String)"),
        ("col4", "JSON"),
    ]
    assert get_map_column_names(meta) == ["LogAttributes", "ResourceAttributes"]
    # bare Map matches too; JSON never classifies as Map; None meta -> []
    assert get_map_column_names(
        [("bareMap", "Map"), ("typedMap", "Map(String, UInt8)"),
         ("notMap", "String")]
    ) == ["bareMap", "typedMap"]
    assert get_map_column_names(None) == []
    assert get_map_column_names([("BodyJson", "JSON")]) == []
    assert get_json_column_names(None) == []


def test_select_star_vs_known_columns():
    cfg = build_row_lookup_config(SRC, "id='abc123'")
    assert cfg["select"][0] == {"value_expression": "*"}
    known = Source(
        table="logs", kind="log", timestamp_value_expression="Timestamp",
        known_columns_list_expression="Timestamp, Body, ServiceName",
    )
    cfg = build_row_lookup_config(known, "id='abc123'")
    assert cfg["select"][0] == {
        "value_expression": "Timestamp, Body, ServiceName"
    }
    assert {"value_expression": "*"} not in cfg["select"]


def test_time_filter_gating():
    # no dateRange -> no window halves at all
    cfg = build_row_lookup_config(SRC, "id='abc123'")
    assert "date_range" not in cfg and "timestamp_value_expression" not in cfg
    assert cfg["has_window"] is False
    # dateRange + usable expression -> both halves attached
    cfg = build_row_lookup_config(SRC, "id='abc123'", date_range=RANGE)
    assert cfg["date_range"] == RANGE
    assert cfg["timestamp_value_expression"] == "Timestamp"
    # multi-column expression passes through WHOLE, not its first token
    multi = Source(
        table="logs", kind="log",
        timestamp_value_expression="EventDate, EventTime",
    )
    cfg = build_row_lookup_config(multi, "id='abc123'", date_range=RANGE)
    assert cfg["timestamp_value_expression"] == "EventDate, EventTime"
    # a blank expression must not contribute a lone dateRange
    blank = Source(table="logs", kind="log", timestamp_value_expression="   ")
    cfg = build_row_lookup_config(blank, "id='abc123'", date_range=RANGE)
    assert "date_range" not in cfg and "timestamp_value_expression" not in cfg
    assert cfg["has_window"] is False


def test_timestamp_value_selects_project_source_expression():
    # the source's own expression is projected, not the displayed one
    displayed = Source(
        table="logs", kind="log", timestamp_value_expression="Timestamp",
        displayed_timestamp_value_expression="ObservedTimestamp",
    )
    cfg = build_row_lookup_config(displayed, "id='abc123'")
    assert {
        "value_expression": "ObservedTimestamp",
        "alias": "__hdx_timestamp",
    } in cfg["select"]
    assert _ts_value_selects(cfg) == [
        {"value_expression": "Timestamp", "alias": "__hdx_timestamp_value_0"}
    ]
    # every column of a multi-column expression is projected (anchoring on
    # the first token would pin the anchor to EventDate's midnight)
    multi = Source(
        table="logs", kind="log",
        timestamp_value_expression="EventDate, EventTime",
    )
    cfg = build_row_lookup_config(multi, "id='abc123'")
    assert _ts_value_selects(cfg) == [
        {"value_expression": "EventDate", "alias": "__hdx_timestamp_value_0"},
        {"value_expression": "EventTime", "alias": "__hdx_timestamp_value_1"},
    ]
    # no usable expression -> none projected
    blank = Source(table="logs", kind="log", timestamp_value_expression="   ")
    cfg = build_row_lookup_config(blank, "id='abc123'")
    assert _ts_value_selects(cfg) == []


def test_displayed_timestamp_and_body_helpers():
    # displayed falls back to the FIRST token of a composite expression
    multi = Source(
        table="logs", kind="log",
        timestamp_value_expression="EventDate, EventTime",
    )
    assert get_displayed_timestamp_value_expression(multi) == "EventDate"
    # metric sources never use the displayed override
    metric = Source(
        table="m", kind="metric", timestamp_value_expression="ts",
        displayed_timestamp_value_expression="other",
    )
    assert get_displayed_timestamp_value_expression(metric) == "ts"
    # body: log -> bodyExpression || implicit; trace -> span name;
    # composite collapses to the first token
    assert get_event_body(SRC) == "Body"
    trace = Source(
        table="t", kind="trace", timestamp_value_expression="ts",
        span_name_expression="SpanName",
    )
    assert get_event_body(trace) == "SpanName"
    implicit = Source(
        table="logs", kind="log", timestamp_value_expression="ts",
        implicit_column_expression="Body, Attributes",
    )
    assert get_event_body(implicit) == "Body"


def test_unbounded_fallback_policy():
    # bounded finds the row -> no fallback
    s = row_lookup_fallback_state(
        has_window=True, bounded_success=True, bounded_row_count=1
    )
    assert s == {
        "bounded_enabled": True, "fallback_enabled": False,
        "is_bounded_empty": False,
    }
    # bounded settles empty -> retry unbounded
    s = row_lookup_fallback_state(
        has_window=True, bounded_success=True, bounded_row_count=0
    )
    assert s["fallback_enabled"] and s["is_bounded_empty"]
    # bounded errors -> do NOT retry (don't hide the error)
    s = row_lookup_fallback_state(
        has_window=True, bounded_success=False, bounded_error=True
    )
    assert not s["fallback_enabled"]
    # no window -> the unbounded lookup is the only one that runs
    s = row_lookup_fallback_state(has_window=False)
    assert s == {
        "bounded_enabled": False, "fallback_enabled": True,
        "is_bounded_empty": False,
    }
    # incomplete (chunked partial) bounded result -> not yet
    s = row_lookup_fallback_state(
        has_window=True, bounded_success=True, bounded_complete=False,
        bounded_row_count=0,
    )
    assert not s["fallback_enabled"]


def test_row_has_k8s_context():
    src = SRC
    row = {"__hdx_resource_attributes": {"k8s.pod.uid": "pod-1"}}
    assert row_has_k8s_context(src, row)
    assert not row_has_k8s_context(src, {"__hdx_resource_attributes": {}})
    assert not row_has_k8s_context(src, None)
    assert not row_has_k8s_context(None, row)
    # non-mapping attributes never raise
    assert not row_has_k8s_context(src, {"__hdx_resource_attributes": "x"})


def test_lookup_row_bounded_then_unbounded(spark, sf_dir):
    """Engine composition: the bounded lookup finds an in-window row; a
    window derived from a DIFFERENT instant misses it and the unbounded
    retry serves it (DBRowDataPanel.test.ts 'unbounded fallback')."""
    src = Source(table="events", kind="log", timestamp_value_expression="ts")
    from hyperdx_spark.io import load_table

    anchor = (
        load_table(spark, sf_dir, "events").orderBy("event_id").limit(1)
        .collect()[0]
    )
    row_id = f"event_id={anchor['event_id']}"
    in_window = (anchor["ts"].replace(hour=0, minute=0, second=0),
                 anchor["ts"].replace(hour=23, minute=59))
    got = lookup_row(
        spark, src, row_id, sf_dir=sf_dir, date_range=in_window
    ).collect()
    assert len(got) == 1 and got[0]["event_id"] == anchor["event_id"]
    assert got[0]["__hdx_timestamp"] == anchor["ts"]
    # a window that excludes the row: zero bounded rows -> unbounded retry
    off_window = (datetime(1999, 1, 1), datetime(1999, 1, 2))
    got = lookup_row(
        spark, src, row_id, sf_dir=sf_dir, date_range=off_window
    ).collect()
    assert len(got) == 1 and got[0]["event_id"] == anchor["event_id"]
