"""Trace waterfall + breakdown (hyperdx_spark.traces) — twins of the MCP
trace tools (mcp/tools/trace/waterfall.ts, breakdown.ts)."""

from datetime import datetime

import pytest

from hyperdx_spark.model import Source
from hyperdx_spark.traces import (
    build_pre_order_tree,
    duration_divisor,
    fetch_trace_spans,
    pick_trace,
    trace_breakdown,
    trace_waterfall,
)


def _span(sid, parent, ts, name="op", svc="svc", dur=1.0):
    return {
        "spanId": sid, "parentSpanId": parent, "serviceName": svc,
        "spanName": name, "spanKind": "SPAN_KIND_SERVER",
        "durationMs": dur, "statusCode": "", "statusMessage": "",
        "timestamp": ts,
    }


def test_duration_divisor():
    # waterfall.ts:160-165: ns->1e6, us->1e3, ms->1; floor at 1
    assert duration_divisor(9) == 1e6
    assert duration_divisor(6) == 1e3
    assert duration_divisor(3) == 1.0
    assert duration_divisor(0) == 1.0


def test_build_pre_order_tree():
    # root r; children c2 (earlier) then c1; grandchild g under c1
    spans = [
        _span("r", "", "2024-01-01T00:00:00Z"),
        _span("c1", "r", "2024-01-01T00:00:02Z"),
        _span("c2", "r", "2024-01-01T00:00:01Z"),
        _span("g", "c1", "2024-01-01T00:00:03Z"),
    ]
    tree = build_pre_order_tree(spans)
    assert [(s["spanId"], s["depth"]) for s in tree] == [
        ("r", 0), ("c2", 1), ("c1", 1), ("g", 2),
    ]
    # a span whose parent is NOT in the result set becomes a root
    # (truncation cut), ordered among roots by timestamp
    spans = [
        _span("orphan", "missing", "2024-01-01T00:00:00Z"),
        _span("r", "", "2024-01-01T00:00:01Z"),
        _span("c", "r", "2024-01-01T00:00:02Z"),
    ]
    tree = build_pre_order_tree(spans)
    assert [(s["spanId"], s["depth"]) for s in tree] == [
        ("orphan", 0), ("r", 0), ("c", 1),
    ]


def _src(table="spans"):
    return Source(
        table=table, kind="trace",
        timestamp_value_expression="ts",
        trace_id_expression="trace_id",
        span_id_expression="span_id",
        parent_span_id_expression="parent_span_id",
        span_name_expression="name",
        span_kind_expression="kind",
        service_name_expression="service",
        duration_expression="dur",
        duration_precision=9,  # stored ns
        status_code_expression="status_code",
        status_message_expression="status_msg",
    )


SPAN_SCHEMA = (
    "ts timestamp, trace_id string, span_id string, parent_span_id string,"
    " service string, name string, kind string, dur double, status_code"
    " string, status_msg string"
)


@pytest.fixture()
def span_dir(spark, tmp_path):
    d = datetime
    ns = 1e6  # 1 ms in stored ns
    rows = [
        # trace A: slowest (root 500ms), all OK — earliest trace
        (d(2024, 1, 1, 0, 0, 0), "A", "a-root", "", "api", "GET /x",
         "SPAN_KIND_SERVER", 500 * ns, "STATUS_CODE_OK", ""),
        (d(2024, 1, 1, 0, 0, 1), "A", "a-db", "a-root", "db", "SELECT",
         "SPAN_KIND_CLIENT", 300 * ns, "STATUS_CODE_OK", ""),
        (d(2024, 1, 1, 0, 0, 2), "A", "a-cache", "a-root", "cache", "GET",
         "SPAN_KIND_CLIENT", 100 * ns, "STATUS_CODE_OK", ""),
        # trace B: contains the error, later start, most recent end
        (d(2024, 1, 1, 1, 0, 0), "B", "b-root", "", "api", "GET /x",
         "SPAN_KIND_SERVER", 200 * ns, "STATUS_CODE_OK", ""),
        (d(2024, 1, 1, 1, 0, 1), "B", "b-db", "b-root", "db", "SELECT",
         "SPAN_KIND_CLIENT", 150 * ns, "STATUS_CODE_ERROR", "boom"),
    ]
    (tmp_path / "x").mkdir(exist_ok=True)
    spark.createDataFrame(rows, SPAN_SCHEMA).coalesce(1).write.parquet(
        str(tmp_path / "spans.parquet")
    )
    logs = [
        (d(2024, 1, 1, 0, 0, 1), "A", "a-db", "error", "db timeout", "db"),
        (d(2024, 1, 1, 0, 0, 0), "A", "a-root", "info", "handling", "api"),
    ]
    spark.createDataFrame(
        logs,
        "ts timestamp, trace_id string, span_id string, sev string,"
        " body string, service string",
    ).coalesce(1).write.parquet(str(tmp_path / "logs.parquet"))
    return str(tmp_path)


RANGE = (datetime(2024, 1, 1), datetime(2024, 1, 2))


def test_pick_trace_modes(spark, span_dir):
    src = _src()
    assert pick_trace(spark, src, span_dir, date_range=RANGE,
                      pick_by="slowest") == "A"
    assert pick_trace(spark, src, span_dir, date_range=RANGE,
                      pick_by="first_error") == "B"
    assert pick_trace(spark, src, span_dir, date_range=RANGE,
                      pick_by="most_recent") == "B"
    # pickFilter narrows the candidates (sql language)
    assert pick_trace(
        spark, src, span_dir, date_range=RANGE,
        pick_filter="service = 'db' AND dur >= 150000000",
        pick_filter_language="sql", pick_by="most_recent",
    ) == "B"
    assert pick_trace(
        spark, src, span_dir,
        date_range=(datetime(2030, 1, 1), datetime(2030, 1, 2)),
        pick_by="slowest",
    ) is None


def test_waterfall_end_to_end(spark, span_dir):
    src = _src()
    log_src = Source(
        table="logs", kind="log", timestamp_value_expression="ts",
        trace_id_expression="trace_id", span_id_expression="span_id",
        severity_text_expression="sev", body_expression="body",
        service_name_expression="service",
    )
    out = trace_waterfall(
        spark, src, span_dir, date_range=RANGE, pick_by="slowest",
        log_source=log_src,
    )
    assert out["trace_id"] == "A" and not out["truncated"]
    # pre-order: root then children in timestamp order; ns -> ms scaling
    assert [(s["spanId"], s["depth"]) for s in out["spans"]] == [
        ("a-root", 0), ("a-db", 1), ("a-cache", 1),
    ]
    assert out["spans"][0]["durationMs"] == 500.0
    assert out["summary"] == {
        "span_count": 3, "root_span": "GET /x", "root_service": "api",
        "total_duration_ms": 500.0,
    }
    # correlated logs sorted by ts, carrying their spanId
    assert [(l["spanId"], l["severityText"]) for l in out["logs"]] == [
        ("a-root", "info"), ("a-db", "error"),
    ]
    assert out["logs_truncated"] is False
    # explicit traceId skips the picker; maxSpans truncation detected
    out = trace_waterfall(spark, src, span_dir, trace_id="A", max_spans=2)
    assert out["truncated"] and len(out["spans"]) == 2
    # unknown trace -> None
    assert trace_waterfall(spark, src, span_dir, trace_id="Z") is None


def test_fetch_trace_spans_bounded(spark, span_dir):
    spans, truncated = fetch_trace_spans(
        spark, _src(), span_dir, "A", max_spans=500
    )
    assert len(spans) == 3 and not truncated
    assert spans[0]["statusCode"] == "STATUS_CODE_OK"


def test_trace_breakdown(spark, span_dir):
    src = _src()
    # parents: the api GET /x spans (both traces) -> children are the db +
    # cache spans of traces A and B, parent rows excluded
    out = trace_breakdown(
        spark, src, span_dir,
        parent_filter_sql="service = 'api' AND name = 'GET /x'",
        date_range=RANGE,
    ).collect()
    got = {(r["service"], r["operation"]): r for r in out}
    assert set(got) == {("db", "SELECT"), ("cache", "GET")}
    db = got[("db", "SELECT")]
    assert db["total_time_ms"] == 450.0 and db["calls"] == 2
    assert db["in_parents"] == 2
    assert got[("cache", "GET")]["total_time_ms"] == 100.0
    # ranked by total time DESC
    assert [r["operation"] for r in out] == ["SELECT", "GET"]
    # min_parent_duration_ms gates to trace A only (500ms root)
    out = trace_breakdown(
        spark, src, span_dir,
        parent_filter_sql="service = 'api' AND name = 'GET /x'",
        date_range=RANGE, min_parent_duration_ms=300,
    ).collect()
    got = {(r["service"], r["operation"]): r for r in out}
    assert got[("db", "SELECT")]["total_time_ms"] == 300.0
    assert got[("db", "SELECT")]["in_parents"] == 1
    # top_n caps the ranking
    out = trace_breakdown(
        spark, src, span_dir,
        parent_filter_sql="service = 'api' AND name = 'GET /x'",
        date_range=RANGE, top_n=1,
    ).collect()
    assert [r["operation"] for r in out] == ["SELECT"]


def test_trace_breakdown_approx_path(spark, span_dir):
    """exact=False swaps percentile -> percentile_approx (the 100 TB path;
    reference parity — breakdown.ts:229 uses CH's SAMPLING quantile).  On
    this tiny fixture approx == exact, and the plan must carry
    percentile_approx (bounded state), not the distinct-value-map
    percentile."""
    src = _src()
    kw = dict(
        parent_filter_sql="service = 'api' AND name = 'GET /x'",
        date_range=RANGE,
    )
    exact = trace_breakdown(spark, src, span_dir, exact=True, **kw)
    approx = trace_breakdown(spark, src, span_dir, exact=False, **kw)
    plan = approx._jdf.queryExecution().optimizedPlan().toString()
    assert "approx" in plan.lower()
    erows = {(r["service"], r["operation"]): r for r in exact.collect()}
    arows = {(r["service"], r["operation"]): r for r in approx.collect()}
    assert set(erows) == set(arows)
    for k, er in erows.items():
        ar = arows[k]
        # non-percentile columns identical
        assert (er["total_time_ms"], er["calls"], er["in_parents"]) == (
            ar["total_time_ms"], ar["calls"], ar["in_parents"]
        )
    # exact percentile INTERPOLATES (db SELECT: {150, 300} -> p50 = 225);
    # percentile_approx returns an actual element of the group, like CH's
    # sampling quantile family returns observed values at small n
    assert arows[("db", "SELECT")]["p50_ms"] in (150.0, 300.0)
    assert arows[("db", "SELECT")]["p99_ms"] == 300.0
    assert arows[("cache", "GET")]["p50_ms"] == 100.0
    assert arows[("cache", "GET")]["p99_ms"] == 100.0
