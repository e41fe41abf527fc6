"""Emerging & disappeared signals (hyperdx_spark.analytics.signals) —
emergingSignalsClassify.test.ts twinned + the composed tool executed."""

import pytest

from hyperdx_spark.analytics.signals import (
    classify_shift,
    emerging_signals,
    normalize_template,
)

RATIO = 3
FLOOR = 2 / 10_000


def test_classify_shift_reference_matrix():
    """emergingSignalsClassify.test.ts walked case by case."""
    c = classify_shift
    # brand-new (baseShare == 0): must clear the floor
    assert c(FLOOR, 0, RATIO, FLOOR) == "emerging"
    assert c(0.05, 0, RATIO, FLOOR) == "emerging"
    assert c(FLOOR / 2, 0, RATIO, FLOOR) is None
    # EXACT 3x at a 10k sample: the float boundary the tolerance admits
    assert c(3 / 10_000, 1 / 10_000, RATIO, FLOOR) == "emerging"
    assert c(3 / 500, 1 / 500, RATIO, FLOOR) == "emerging"
    # clearly under ratio stays out; the tolerance is tiny (2.9x out)
    assert c(2 / 500, 1 / 500, RATIO, FLOOR) is None
    assert c(2.9 / 10_000, 1 / 10_000, RATIO, FLOOR) is None
    # well above, and no epsilon penalty on clean shifts
    assert c(10 / 10_000, 1 / 10_000, RATIO, FLOOR) == "emerging"
    assert c(3.01 / 10_000, 1 / 10_000, RATIO, FLOOR) == "emerging"
    # disappeared: absent now, or >= ratio x rarer (exact boundary admits)
    assert c(0, 0.02, RATIO, FLOOR) == "disappeared"
    assert c(1 / 500, 3 / 500, RATIO, FLOOR) == "disappeared"
    assert c(1 / 10_000, 3 / 10_000, RATIO, FLOOR) == "disappeared"
    assert c(1 / 500, 2 / 500, RATIO, FLOOR) is None
    # stable patterns never classify — even at the schema-allowed ratio=1
    assert c(0.01, 0.01, RATIO, FLOOR) is None
    assert c(0.01, 0.01, 1, FLOOR) is None
    assert c(0.02, 0.01, 1, FLOOR) == "emerging"


def test_normalize_template():
    # <*> keeps a stable marker: 'a <*> b' must NOT collide with 'a b';
    # whitespace collapses, case folds (runEventPatterns.ts:252-258)
    assert normalize_template("A  <*>   B") == normalize_template("a <*> b")
    assert normalize_template("a <*> b") != normalize_template("a b")
    assert normalize_template("  X y  ") == "x y"


def test_emerging_signals_end_to_end(spark):
    """Composed tool over two synthetic windows: a template present only
    in the current window is 'new', one that vanished is 'gone', a 3x
    share shift is 'shifted'; stable templates stay out."""
    # varying numbers make Drain generalize to 'api request took <*> ms'
    # in BOTH windows, so the normalized key matches across them
    base_rows = (
        [("stable user login",)] * 40
        + [("legacy worker stopped",)] * 30
        + [(f"api request took {i} ms",) for i in range(10)]  # share 10/80
    )
    cur_rows = (
        [("stable user login",)] * 40
        + [(f"api request took {i} ms",) for i in range(30)]  # 3x the share
        + [("newsvc crashed hard",)] * 10                     # brand-new
    )
    base = spark.createDataFrame(base_rows, "body string")
    cur = spark.createDataFrame(cur_rows, "body string")
    out = emerging_signals(cur, base, text_col="body", sample_size=1000)

    em = {e["pattern"]: e for e in out["emerging"]}
    dis = {d["pattern"]: d for d in out["disappeared"]}
    assert "newsvc crashed hard" in em
    assert em["newsvc crashed hard"]["status"] == "new"
    assert em["newsvc crashed hard"]["baseline_share"] == 0.0
    shifted = next(
        e for p, e in em.items() if p.startswith("api request took")
    )
    assert shifted["status"] == "shifted"
    # shares: 30/80 vs 10/80 -> exactly 3x, the boundary the tolerance admits
    assert shifted["current_share"] == 0.375
    assert shifted["baseline_share"] == 0.125
    assert "legacy worker stopped" in dis
    assert dis["legacy worker stopped"]["status"] == "gone"
    # the stable template classifies as neither
    assert "stable user login" not in em and "stable user login" not in dis
    assert out["summary"]["current"]["sampled"] == 80
    assert out["summary"]["emerging_count"] == 2
    assert out["summary"]["disappeared_count"] == 1


def test_emerging_signals_rejects_overlapping_windows(spark):
    from datetime import datetime

    df = spark.createDataFrame([("x",)], "body string")
    with pytest.raises(ValueError, match="overlap"):
        emerging_signals(
            df, df,
            current_range=(datetime(2024, 1, 1, 1), datetime(2024, 1, 1, 3)),
            baseline_range=(datetime(2024, 1, 1, 0), datetime(2024, 1, 1, 2)),
        )
    # touching windows (baseline end == current start) are fine
    out = emerging_signals(
        df, df,
        current_range=(datetime(2024, 1, 1, 1), datetime(2024, 1, 1, 2)),
        baseline_range=(datetime(2024, 1, 1, 0), datetime(2024, 1, 1, 1)),
    )
    assert out["summary"]["emerging_count"] == 0


def test_denoise_search_results_reference_twin():
    """mcp/tools/query/denoise.ts: templates over 10% of the sample are
    noisy; matching rows drop; null-body and unmatched rows are kept;
    the body column resolves case-insensitively; template-string keying."""
    from hyperdx_spark.analytics.drain import denoise_search_results

    sample = [
        {"__hdx_pattern_body": f"heartbeat from node {i % 3}"}
        for i in range(90)
    ] + [{"__hdx_pattern_body": f"user {i} logged in"} for i in range(5)] + [
        {"__hdx_pattern_body": f"db query took {i} ms"} for i in range(5)
    ]
    rows = [
        {"Body": "heartbeat from node 7", "x": 1},   # noisy -> dropped
        {"Body": "user 99 logged in", "x": 2},       # 5% share -> kept
        {"Body": None, "x": 3},                      # null body -> kept
        {"Body": "completely novel line", "x": 4},   # no match -> kept
    ]
    out = denoise_search_results(
        rows, sample, body_column="body", total_count=1000
    )
    assert [r["x"] for r in out["rows"]] == [2, 3, 4]
    assert out["removed_patterns"] == [{
        "pattern": "heartbeat from node <*>",
        "estimated_count": 900, "sample_count": 90,
    }]
    # empty sample short-circuits; nothing noisy returns rows untouched
    assert denoise_search_results(rows, [], body_column="Body",
                                  total_count=0)["skipped"] == "no_sample_data"
    # 20 distinct ALPHABETIC leading tokens x 5 rows: every template at 5%
    # < 10% (digit-bearing first tokens would wildcard in the Drain tree
    # and collapse into one cluster)
    quiet = [
        {"__hdx_pattern_body":
         f"{'abcdefghijklmnopqrst'[i % 20]}svc handled request {i}"}
        for i in range(100)
    ]
    out = denoise_search_results(rows, quiet, body_column="Body",
                                 total_count=100)
    assert len(out["rows"]) == 4 and out["removed_patterns"] == []
    # unknown body column: skipped, rows untouched
    out = denoise_search_results(
        rows, sample, body_column="NoSuchCol", total_count=100
    )
    assert out["skipped"] == "body_column_not_in_results"


def test_tool_helpers_reference_twins():
    """helpers.ts:52-271 — where-merge matrix, time-range parsing, body
    expression guard."""
    from datetime import datetime

    from hyperdx_spark.toolhelpers import (
        is_safe_body_expression,
        merge_where_into_select_items as m,
        parse_time_range,
    )

    items = [
        {"agg_fn": "count", "where": "a:1", "where_language": "lucene"},
        {"agg_fn": "count"},
        {"agg_fn": "count", "where": "x = 1", "where_language": "sql"},
    ]
    merged, warnings = m(items, "svc:api", "lucene")
    assert merged[0]["where"] == "(svc:api) AND (a:1)"
    assert merged[1]["where"] == "svc:api"
    assert merged[1]["where_language"] == "lucene"
    assert merged[2]["where"] == "x = 1"  # language mismatch: untouched
    assert len(warnings) == 1 and "select[2]" in warnings[0]
    assert m(items, "", "lucene") == (items, [])

    now = datetime(2024, 1, 1, 12, 0)
    r = parse_time_range("2024-01-01T10:00:00Z", "2024-01-01T11:00:00Z",
                         now=now)
    assert r == {"start_date": datetime(2024, 1, 1, 10),
                 "end_date": datetime(2024, 1, 1, 11)}
    # missing end -> now; missing start -> end - 15m
    r = parse_time_range(None, None, now=now)
    assert r["end_date"] == now
    assert r["start_date"] == datetime(2024, 1, 1, 11, 45)
    assert "error" in parse_time_range("garbage", None, now=now)
    assert "error" in parse_time_range(
        "2024-01-01T11:00:00Z", "2024-01-01T10:00:00Z", now=now
    )
    assert "error" in parse_time_range(
        "2024-01-01T10:00:00Z", "2024-01-01T10:00:00Z", now=now
    )

    assert is_safe_body_expression("Body")
    assert is_safe_body_expression("SpanAttributes['http.url']")
    assert is_safe_body_expression("Events.Name")
    assert not is_safe_body_expression("concat(a, b)")
    assert not is_safe_body_expression("Body; DROP TABLE x")


def test_resolve_order_by_reference_matrix():
    """query.test.ts resolveOrderBy describe walked verbatim."""
    from hyperdx_spark.toolhelpers import resolve_order_by as r

    assert r(None, [{"agg_fn": "count"}]) is None
    assert r("SpanName", [{"agg_fn": "count"}]) == "SpanName"
    assert r("Total", [{"agg_fn": "count", "alias": "Total"}]) == "Total"
    # canonical alias case for case-insensitive matches, direction kept
    assert r("total", [{"agg_fn": "count", "alias": "Total"}]) == "Total"
    assert r("TOTAL DESC", [{"agg_fn": "count", "alias": "Total"}]) == "Total DESC"
    assert r("count", [{"agg_fn": "count"}]) == "count()"
    assert r("avg", [{"agg_fn": "avg", "value_expression": "Duration"}]) == "avg(Duration)"
    assert r("quantile", [{"agg_fn": "quantile", "value_expression": "Duration",
                           "level": 0.99}]) == "quantile(0.99)(Duration)"
    # alias beats synthesis; multi-word aliases quote (either match path)
    assert r("count", [{"agg_fn": "count", "alias": "Total"}]) == "Total"
    assert r("count", [{"agg_fn": "count", "alias": "Total Rows"}]) == '"Total Rows"'
    q = [{"agg_fn": "quantile", "value_expression": "Duration",
          "alias": "P95 Latency"}]
    assert r("P95 Latency", q) == '"P95 Latency"'
    assert r("p95 latency DESC", q) == '"P95 Latency" DESC'
    assert r('"P95 Latency" DESC', q) == '"P95 Latency" DESC'
    assert r("`P95 Latency`", q) == '"P95 Latency"'
    # aggFn matching is case-insensitive; count_distinct synthesizes DISTINCT
    assert r("Count", [{"agg_fn": "count"}]) == "count()"
    assert r("AVG", [{"agg_fn": "avg", "value_expression": "Duration"}]) == "avg(Duration)"
    assert r("count_distinct", [{"agg_fn": "count_distinct",
                                 "value_expression": "UserId"}]) == "count(DISTINCT UserId)"
    assert r("count_distinct DESC", [{"agg_fn": "count_distinct",
                                      "value_expression": "UserId"}]) == "count(DISTINCT UserId) DESC"
    # none / increase / level-less quantile pass through untouched
    assert r("none", [{"agg_fn": "none", "value_expression": "Duration / 1e6"}]) == "none"
    assert r("increase", [{"agg_fn": "increase", "value_expression": "Value"}]) == "increase"
    assert r("quantile", [{"agg_fn": "quantile", "value_expression": "Duration"}]) == "quantile"
    assert r("count DESC", [{"agg_fn": "count"}]) == "count() DESC"
    assert r("avg ASC", [{"agg_fn": "avg", "value_expression": "Duration"}]) == "avg(Duration) ASC"


def test_metric_select_validation_reference_matrix():
    """query.test.ts getMetricSelectIssues / validateMetricSelectItems /
    applyMetricSelectDefaults describes walked."""
    from hyperdx_spark.toolhelpers import (
        apply_metric_select_defaults,
        assert_source_kind_matches_select,
        get_metric_select_issues as g,
        validate_metric_select_items,
    )

    assert g({"agg_fn": "count"}) == []
    assert g({"agg_fn": "avg", "value_expression": "Duration"}) == []
    issues = g({"agg_fn": "avg"})
    assert len(issues) == 1 and issues[0]["path"] == ["valueExpression"]
    assert "required for non-count" in issues[0]["message"]
    assert g({"agg_fn": "avg", "metric_type": "gauge",
              "metric_name": "cpu"}) == []
    issues = g({"agg_fn": "count", "value_expression": "x"})
    assert len(issues) == 1 and issues[0]["path"] == ["valueExpression"]
    assert any(i["path"][0] == "metricName"
               for i in g({"agg_fn": "avg", "metric_type": "gauge",
                           "value_expression": "Value"}))
    assert any(i["path"][0] == "metricType"
               for i in g({"agg_fn": "avg", "metric_name": "cpu",
                           "value_expression": "Value"}))
    assert any(i["path"][0] == "aggFn"
               for i in g({"agg_fn": "increase", "metric_type": "gauge",
                           "metric_name": "cpu"}))
    assert g({"agg_fn": "increase", "metric_type": "sum",
              "metric_name": "reqs"}) == []
    assert any(i["path"][0] == "aggFn"
               for i in g({"agg_fn": "avg", "metric_type": "histogram",
                           "metric_name": "d"}))
    assert g({"agg_fn": "count", "metric_type": "histogram",
              "metric_name": "d"}) == []
    assert any(i["path"][0] == "level"
               for i in g({"agg_fn": "quantile", "metric_type": "histogram",
                           "metric_name": "d"}))
    assert g({"agg_fn": "quantile", "metric_type": "histogram",
              "metric_name": "d", "level": 0.95}) == []
    assert any(i["path"][0] == "aggFn"
               for i in g({"agg_fn": "avg",
                           "metric_type": "exponential histogram",
                           "metric_name": "d"}))
    assert g({"agg_fn": "count", "metric_type": "exponential histogram",
              "metric_name": "d"}) == []
    assert any(i["path"][0] == "level"
               for i in g({"agg_fn": "quantile",
                           "metric_type": "exponential histogram",
                           "metric_name": "d"}))
    assert g({"agg_fn": "quantile", "metric_type": "exponential histogram",
              "metric_name": "d", "level": 0.99}) == []
    assert any(i["path"][0] == "isDelta"
               for i in g({"agg_fn": "sum", "metric_type": "sum",
                           "metric_name": "x", "is_delta": True}))
    assert g({"agg_fn": "avg", "metric_type": "gauge", "metric_name": "x",
              "is_delta": True}) == []
    assert any(i["path"][0] == "level"
               for i in g({"agg_fn": "avg", "value_expression": "d",
                           "level": 0.5}))

    # validateMetricSelectItems: None when valid; select[idx].<path> labels
    assert validate_metric_select_items(
        [{"agg_fn": "count"},
         {"agg_fn": "avg", "value_expression": "Duration"}]
    ) is None
    errors = validate_metric_select_items(
        [{"agg_fn": "avg"},
         {"agg_fn": "increase", "metric_type": "gauge", "metric_name": "x"}]
    )
    assert any(e.startswith("select[0].valueExpression") for e in errors)
    assert any(e.startswith("select[1].aggFn") for e in errors)

    # applyMetricSelectDefaults: metric items default to Value; explicit
    # expressions and count items pass through unchanged (same object)
    out = apply_metric_select_defaults(
        [{"agg_fn": "avg", "metric_type": "gauge", "metric_name": "c"}]
    )
    assert out[0]["value_expression"] == "Value"
    out = apply_metric_select_defaults(
        [{"agg_fn": "avg", "metric_type": "gauge", "metric_name": "c",
          "value_expression": "Value * 100"}]
    )
    assert out[0]["value_expression"] == "Value * 100"
    item = {"agg_fn": "count", "metric_type": "histogram", "metric_name": "d"}
    assert apply_metric_select_defaults([item])[0] is item

    # source-kind x select-annotation cross checks
    assert assert_source_kind_matches_select("metric", "Value") is None
    assert assert_source_kind_matches_select(
        "metric", [{"agg_fn": "avg", "metric_type": "gauge",
                    "metric_name": "c"}]) is None
    assert "metric" in assert_source_kind_matches_select(
        "metric", [{"agg_fn": "count"}])
    assert "not metric" in assert_source_kind_matches_select(
        "log", [{"agg_fn": "avg", "metric_type": "gauge",
                 "metric_name": "c"}])
    assert assert_source_kind_matches_select("log", [{"agg_fn": "count"}]) is None


def test_code_review_regressions_r13():
    """r13 /code-review findings pinned: raw-string selects, newline-armored
    body-expression guard, ISO partial-date+time rejection, RecursionError
    fallback in explain, deep-chain DFS, date-cell sqlstring escape."""
    import datetime as dtm

    from hyperdx_spark.display import (
        build_search_replay_params,
        can_replay_dashboard_search,
        promote_series_condition,
    )
    from hyperdx_spark.jsnum import js_date_ms
    from hyperdx_spark.lucene.explain import explain_query
    from hyperdx_spark.model import ChartConfig, Source
    from hyperdx_spark.rowwhere import sqlstring_escape
    from hyperdx_spark.toolhelpers import is_safe_body_expression
    from hyperdx_spark.traces import build_pre_order_tree

    # raw-string selects carry no per-series conditions
    cfg = ChartConfig(
        source=Source(table="events", timestamp_value_expression="ts"),
        select="count() AS total", where="x:1",
    )
    assert promote_series_condition(cfg) == ("x:1", "lucene")
    assert can_replay_dashboard_search(cfg)
    assert build_search_replay_params(cfg, require_replayable=True)[
        "where"
    ] == "x:1"
    cfg.select = "*"  # length-1 string must not index into SelectCol attrs
    cfg.where = ""
    assert promote_series_condition(cfg) == ("", "lucene")

    # trailing newline fails the JS-anchored whitelist; unicode words too
    assert not is_safe_body_expression("Body\n")
    assert not is_safe_body_expression("Bödy")

    # a time part requires the FULL date (new Date('2024-01T10:00') is NaN)
    assert js_date_ms("2024-01T10:00") is None
    assert js_date_ms("2024T10:00") is None
    assert js_date_ms("2024-01-01T10:00") == 1704103200000.0

    # pathological nesting degrades to the parse-failure fallback line
    q = "(" * 4000 + "a" + ")" * 4000
    assert explain_query(q) == f"Message containing {q}"

    # a 1500-span linear chain builds without recursion
    spans = [
        {"spanId": f"s{i}", "parentSpanId": f"s{i-1}" if i else "",
         "timestamp": f"2024-01-01T00:00:{i:02d}", "durationMs": 1.0,
         "serviceName": "x", "spanName": "y"}
        for i in range(1500)
    ]
    tree = build_pre_order_tree(spans)
    assert len(tree) == 1500 and tree[-1]["depth"] == 1499

    # date-typed cells escape at midnight instead of crashing
    assert sqlstring_escape(dtm.date(2024, 1, 2)) == "'2024-01-02 00:00:00.000'"
