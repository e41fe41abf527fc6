"""Facet key plumbing twins (DBSearchPageFilters/utils.test.ts +
jsonAddToFilter.pipeline.test.ts — the 'Add to Filters' -> WHERE path)."""

from __future__ import annotations

from hyperdx_spark.facets import (
    build_json_extract_query,
    clean_clickhouse_expression,
    escape_filter_state_keys,
    get_filter_state_entry,
    group_facets_by_base_name,
    merge_path,
    parse_key_path,
    parse_map_field_name,
    to_clickhouse_key_expression,
    to_quoted_clickhouse_key_expression,
    unescape_filter_state_keys,
)
from hyperdx_spark.filters import (
    FilterSelection,
    filters_to_query,
    is_valid_filter_condition,
)


def test_clean_clickhouse_expression():
    assert clean_clickhouse_expression("`service-name`") == "service-name"
    assert (
        clean_clickhouse_expression("toString(ResourceAttributes.`hdx`.`sdk`)")
        == "ResourceAttributes.hdx.sdk"
    )
    assert clean_clickhouse_expression("ServiceName") == "ServiceName"
    assert clean_clickhouse_expression("`my-map`['k']") == "my-map['k']"


def test_parse_key_path():
    assert parse_key_path("LogAttributes['time']") == ["LogAttributes", "time"]
    assert parse_key_path('LogAttributes["time"]') == ["LogAttributes", "time"]
    assert parse_key_path("ServiceName") == ["ServiceName"]
    # dots inside the subscript stay one segment
    assert parse_key_path("M['host.name']") == ["M", "host.name"]


def test_group_facets_dedupes_dot_and_bracket_forms():
    grouped, non = group_facets_by_base_name([
        {"key": "LogAttributes.time", "value": ["1779461580003"]},
        {"key": "LogAttributes['time']",
         "value": ["1779461580003", "1779461580004"]},
    ])
    assert len(grouped) == 1 and len(grouped[0]["children"]) == 1
    child = grouped[0]["children"][0]
    assert child["propertyPath"] == "time"
    # bracket form wins so child key stays a valid SQL expression
    assert child["key"] == "LogAttributes['time']"
    assert child["value"] == ["1779461580003", "1779461580004"]

    # existing bracket form kept when the dot-form duplicate arrives second
    grouped, _ = group_facets_by_base_name([
        {"key": "LogAttributes['time']", "value": ["a"]},
        {"key": "LogAttributes.time", "value": ["b"]},
    ])
    child = grouped[0]["children"][0]
    assert child["key"] == "LogAttributes['time']"
    assert child["value"] == ["a", "b"]

    # values merge without duplicates
    grouped, _ = group_facets_by_base_name([
        {"key": "LogAttributes.foo", "value": ["x", "y"]},
        {"key": "LogAttributes['foo']", "value": ["y", "z"]},
    ])
    assert grouped[0]["children"][0]["value"] == ["x", "y", "z"]

    # different propertyPaths never collapse
    grouped, _ = group_facets_by_base_name([
        {"key": "LogAttributes['time']", "value": ["1"]},
        {"key": "LogAttributes['user']", "value": ["alice"]},
    ])
    assert len(grouped[0]["children"]) == 2


def test_get_filter_state_entry_tolerates_both_forms():
    def entry(*vals):
        return FilterSelection(included=set(vals))

    st = {"LogAttributes['time']": entry("a")}
    assert get_filter_state_entry(st, "LogAttributes['time']") is st["LogAttributes['time']"]
    assert get_filter_state_entry(st, "LogAttributes.time") is st["LogAttributes['time']"]
    st2 = {"LogAttributes.time": entry("1779461580003")}
    assert get_filter_state_entry(st2, "LogAttributes['time']") is st2["LogAttributes.time"]
    assert get_filter_state_entry({"OtherField": entry("x")}, "LogAttributes['time']") is None
    assert get_filter_state_entry({}, "Timestamp") is None


def test_to_clickhouse_key_expression_matrix():
    f = to_clickhouse_key_expression
    assert f("LogAttributes.time") == "LogAttributes['time']"
    # full property path with dots = ONE map key
    assert f("ResourceAttributes.host.name") == "ResourceAttributes['host.name']"
    assert f("LogAttributes['time']") == "LogAttributes['time']"
    assert f('LogAttributes["time"]') == 'LogAttributes["time"]'
    assert f("Body.`json`.`field`") == "Body.`json`.`field`"
    assert f("toString(LogAttributes['service.name'])") == (
        "toString(LogAttributes['service.name'])"
    )
    assert f("Timestamp") == "Timestamp"
    # HDX-4369: numeric-looking map sub-keys stay STRING subscripts
    assert f("LogAttributes.1") == "LogAttributes['1']"
    assert f("LogAttributes.42.foo") == "LogAttributes['42.foo']"
    # HDX-4427: raw function-call keys pass through untouched
    for key in [
        "JSONExtractString(Body, 'app.user.currency')",
        "JSONExtractString(Body, 'app', 'user.currency')",
        "JSONExtractString(Body, 'level')",
        "JSONExtractFloat(Body, 'metrics.latency')",
        "JSONExtractBool(Body, 'flags.enabled')",
        "JSONExtractString(LogAttributes['weird.key.payload'], 'abc.def.jqk/abcd')",
        "toString(Body)",
    ]:
        assert f(key) == key, key


def test_to_quoted_clickhouse_key_expression_matrix():
    f = to_quoted_clickhouse_key_expression
    known = {"ServiceName", "my column", "LogAttributes", "service-name", "my-map"}
    assert f("ServiceName", known) == "ServiceName"
    assert f("service-name", known) == "`service-name`"
    assert f("my column", known) == "`my column`"
    assert f("LogAttributes.host", known) == "LogAttributes['host']"
    assert f("my-map['k']", known) == "`my-map`['k']"
    assert f("LogAttributes['k']", known) == "LogAttributes['k']"
    assert f("Body.`json`.`field`", known) == "Body.`json`.`field`"
    # idempotent on an already-quoted key
    assert f("`service-name`", known) == "`service-name`"
    assert f(f("service-name", known), {"service-name"}) == "`service-name`"
    # JSONExtract keys pass through unquoted/unmangled
    assert f("JSONExtractString(Body, 'app.user.currency')", {"Body"}) == (
        "JSONExtractString(Body, 'app.user.currency')"
    )
    # schema-aware: a flat column whose NAME contains dots quotes whole
    cols = {"__hdx_materialized_k8s.cluster.name"}
    assert f("__hdx_materialized_k8s.cluster.name", cols) == (
        "`__hdx_materialized_k8s.cluster.name`"
    )
    assert f("ServiceName", {"ServiceName"}) == "ServiceName"
    assert f("LogAttributes.host", {"LogAttributes"}) == "LogAttributes['host']"
    assert f("LogAttributes['host']", {"LogAttributes"}) == "LogAttributes['host']"
    assert f("LogAttributes['host.name']", {"LogAttributes"}) == (
        "LogAttributes['host.name']"
    )


def test_merge_path_branches():
    # JSON column: backtick dotted segments
    assert merge_path(["Body", "a.b"], ["Body"]) == "Body.`a`.`b`"
    # Map column: string subscripts, numeric included (HDX-4369)
    assert merge_path(["M", "1"], [], ["M"]) == "M['1']"
    assert merge_path(["M", "k"], [], ["M"]) == "M['k']"
    # default: integers are 1-based array indices, strings subscript
    assert merge_path(["arr", "0"]) == "arr[1]"
    assert merge_path(["col", "k'v"]) == "col['k\\'v']"
    assert merge_path(["solo"]) == "solo"


def test_json_add_to_filter_pipeline_hdx4427():
    """jsonAddToFilter.pipeline.test.ts: every 'Add to Filters' key built by
    the real producer must serialize to a VALID sql filter condition and
    survive the escape path."""
    known = {"Body", "LogAttributes", "ServiceName"}

    cases = [
        build_json_extract_query(["Body", "app.user.currency"], ["Body"]),
        build_json_extract_query(["Body", "app", "user", "id"], ["Body"]),
        build_json_extract_query(["Body", "level"], ["Body"]),
        build_json_extract_query(
            ["Body", "metrics.latency"], ["Body"], [], "JSONExtractFloat"
        ),
        build_json_extract_query(
            ["Body", "flags.enabled"], ["Body"], [], "JSONExtractBool"
        ),
        build_json_extract_query(
            ["LogAttributes", "config", "db.host"],
            ["LogAttributes", "config"],
            [],
            "JSONExtractString",
            ["LogAttributes"],
        ),
    ]
    assert all(k is not None for k in cases)
    # the reported case emits the corrected, valid condition
    assert cases[0] == "JSONExtractString(Body, 'app.user.currency')"
    # Map anchor keeps the string subscript
    assert cases[5] == "JSONExtractString(LogAttributes['config'], 'db.host')"
    # no nested path -> None
    assert build_json_extract_query(["Body"], ["Body"]) is None

    values = [
        {"included": {"USD"}},
        {"included": {"u-1"}},
        {"included": {"error"}, "excluded": {"debug"}},
        {"included": {"200"}},
        {"included": {"true"}},
        {"included": {"localhost"}},
        {"included": {"O'Brien"}},  # single quote survives escaping
    ]
    keys = cases + [build_json_extract_query(["Body", "user.name"], ["Body"])]
    for key, v in zip(keys, values):
        state = {key: FilterSelection(included=set(v.get("included", ())),
                                      excluded=set(v.get("excluded", ())))}
        query = filters_to_query(escape_filter_state_keys(state, known))
        assert query, key
        for flt in query:
            assert is_valid_filter_condition(flt.condition, "sql"), (
                key, flt.condition,
            )


def test_escape_unescape_round_trip():
    st = {"LogAttributes.host": FilterSelection(included={"a"})}
    escaped = escape_filter_state_keys(st, {"LogAttributes"})
    assert list(escaped) == ["LogAttributes['host']"]
    # unescape restores a clean path for quoted keys
    back = unescape_filter_state_keys(
        {"`service-name`": FilterSelection(included={"x"})}
    )
    assert list(back) == ["service-name"]


def test_retain_filters_by_columns():
    """searchFilters.test.ts retainFiltersByColumns describes: exact and
    dot-root retention, nested JSON/Map keys kept via root, mixed drops."""
    from hyperdx_spark.facets import retain_filters_by_columns as r

    e = FilterSelection(included={"x"})
    # empty state: nothing dropped
    assert r({}, {"ServiceName"}) == ({}, [])
    # roots exist -> all kept
    st = {"ServiceName": e, "SeverityText": e}
    kept, dropped = r(st, {"ServiceName", "SeverityText", "Timestamp"})
    assert kept == st and dropped == []
    # nested JSON/Map keys retained via their root column
    kept, dropped = r({"LogAttributes.user": e}, {"LogAttributes"})
    assert list(kept) == ["LogAttributes.user"] and dropped == []
    # missing roots drop and are reported
    kept, dropped = r({"OldColumn": e, "Gone.sub": e}, {"ServiceName"})
    assert kept == {} and sorted(dropped) == ["Gone.sub", "OldColumn"]
    # mixed input keeps matches and drops the rest
    kept, dropped = r(
        {"ServiceName": e, "Gone.sub": e, "LogAttributes.k": e},
        {"ServiceName", "LogAttributes"},
    )
    assert sorted(kept) == ["LogAttributes.k", "ServiceName"]
    assert dropped == ["Gone.sub"]
    # exact match wins for a flat column whose NAME contains dots
    kept, dropped = r({"k8s.cluster.name": e}, {"k8s.cluster.name"})
    assert list(kept) == ["k8s.cluster.name"] and dropped == []


def test_get_field_expression_reference_twin():
    """useFieldExpressionGenerator.tsx: JSON columns -> toString(`c`.`k`)
    (sqlstring ??.?? identifier escaping, dots qualify); Map columns ->
    `c`['k'] (??[?]); custom convertFn."""
    from hyperdx_spark.facets import get_field_expression as f

    assert f("LogAttributes", "http.method") == "`LogAttributes`['http.method']"
    assert f("Body", "user.name", json_columns=["Body"]) == (
        "toString(`Body`.`user`.`name`)"
    )
    assert f("Body", "lvl", json_columns=["Body"],
             convert_fn="toInt64OrNull") == "toInt64OrNull(`Body`.`lvl`)"
    # sqlstring escaping guards hostile keys in both forms
    assert f("Attrs", "k'x") == "`Attrs`['k\\'x']"
    assert f("Bo`dy", "k", json_columns=["Bo`dy"]) == "toString(`Bo``dy`.`k`)"
