"""Twins of packages/app/src/hooks/__tests__/useRowWhere.test.tsx — the row
side-panel's exact-row WHERE builder.  The reference mocks MD5 as
``md5_<value>``; here the real md5 hex is asserted (same construction,
concrete digest)."""

import hashlib

import pytest

from hyperdx_spark.rowwhere import (
    alias_map_to_with_clauses,
    process_row_to_where_clause,
    row_where,
    sqlstring_escape,
    sqlstring_escape_id,
)


def _md5(s):
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _cm(name, ch_type, js_type, value_expr=None):
    return {
        name: {
            "name": name,
            "type": ch_type,
            "value_expr": value_expr or name,
            "js_type": js_type,
        }
    }


# ---------------------------------------------------------------------------
# processRowToWhereClause
# ---------------------------------------------------------------------------

def test_string_columns():
    assert process_row_to_where_clause(
        {"name": "test"}, _cm("name", "String", "string")
    ) == "name='test'"


def test_date_columns():
    assert process_row_to_where_clause(
        {"created_at": "2024-01-01T00:00:00Z"},
        _cm("created_at", "DateTime64", "date"),
    ) == "created_at=parseDateTime64BestEffort('2024-01-01T00:00:00Z', 9)"


def test_array_columns():
    assert process_row_to_where_clause(
        {"tags": ["tag1", "tag2"]}, _cm("tags", "Array(String)", "array")
    ) == "tags=JSONExtract('tag1', 'tag2', 'Array(String)')"


def test_map_columns():
    assert process_row_to_where_clause(
        {"attributes": {"key": "value"}},
        _cm("attributes", "Map(String, String)", "map"),
    ) == "attributes=JSONExtract(`key` = 'value', 'Map(String, String)')"


def test_json_columns_with_md5():
    v = '{"key": "value"}'
    got = process_row_to_where_clause({"data": v}, _cm("data", "JSON", "json"))
    assert got == f"lower(hex(MD5(toString(data))))='{_md5(v)}'"


def test_dynamic_null_string():
    assert process_row_to_where_clause(
        {"dynamic_field": "null"}, _cm("dynamic_field", "Dynamic", "dynamic")
    ) == "isNull(`dynamic_field`)"


def test_dynamic_quoted_string():
    assert process_row_to_where_clause(
        {"dynamic_field": '"quoted_value"'},
        _cm("dynamic_field", "Dynamic", "dynamic"),
    ) == (
        "toJSONString(dynamic_field) = coalesce(toJSONString(JSONExtract("
        "'\\\"quoted_value\\\"', 'Dynamic')), toJSONString('\\\"quoted_value\\\"'))"
    )


def test_dynamic_escaped_values():
    # JS source '{\\"took\\":7, not a valid json' — the actual string holds
    # literal backslash-quote pairs
    v = '{\\"took\\":7, not a valid json'
    got = process_row_to_where_clause(
        {"dynamic_field": v}, _cm("dynamic_field", "Dynamic", "dynamic")
    )
    esc = "'{\\\\\\\"took\\\\\\\":7, not a valid json'"
    assert got == (
        f"toJSONString(dynamic_field) = coalesce(toJSONString(JSONExtract("
        f"{esc}, 'Dynamic')), toJSONString({esc}))"
    )


def test_dynamic_nested_values():
    v = "{'foo': {'bar': 'baz'}}"
    got = process_row_to_where_clause(
        {"dynamic_field": v}, _cm("dynamic_field", "Dynamic", "dynamic")
    )
    esc = "'{\\'foo\\': {\\'bar\\': \\'baz\\'}}'"
    assert got == (
        f"toJSONString(dynamic_field) = coalesce(toJSONString(JSONExtract("
        f"{esc}, 'Dynamic')), toJSONString({esc}))"
    )


def test_dynamic_array_values():
    v = "['foo', 'bar']"
    got = process_row_to_where_clause(
        {"dynamic_field": v}, _cm("dynamic_field", "Dynamic", "dynamic")
    )
    esc = "'[\\'foo\\', \\'bar\\']'"
    assert got == (
        f"toJSONString(dynamic_field) = coalesce(toJSONString(JSONExtract("
        f"{esc}, 'Dynamic')), toJSONString({esc}))"
    )


def test_long_strings_with_md5():
    long = "a" * 600
    got = process_row_to_where_clause(
        {"description": long}, _cm("description", "String", "string")
    )
    # substring(0, 1000) of a 600-char value is the whole value
    assert got == f"lower(hex(MD5(leftUTF8(description, 1000))))='{_md5(long)}'"


def test_long_string_md5_hashes_first_1000_units_only():
    long = "x" * 1500
    got = process_row_to_where_clause(
        {"description": long}, _cm("description", "String", "string")
    )
    assert got == (
        f"lower(hex(MD5(leftUTF8(description, 1000))))='{_md5('x' * 1000)}'"
    )


def test_multiple_columns_joined_with_and():
    cm = {**_cm("name", "String", "string"), **_cm("age", "Int32", "number")}
    assert process_row_to_where_clause(
        {"name": "test", "age": 25}, cm
    ) == "name='test' AND age=25"


def test_custom_value_expr():
    assert process_row_to_where_clause(
        {"alias_name": "test"},
        _cm("alias_name", "String", "string", value_expr="original_column"),
    ) == "original_column='test'"


def test_tuple_columns():
    assert process_row_to_where_clause(
        {"coordinates": '{"s": "city", "i": 123}'},
        _cm("coordinates", "Tuple(String, Int32)", "tuple"),
    ) == 'toJSONString(coordinates)=\'{\\"s\\": \\"city\\", \\"i\\": 123}\''


def test_null_value_on_date_column():
    assert process_row_to_where_clause(
        {"event_created": None},
        _cm("event_created", "Nullable(DateTime64(3, 'UTC'))", "date"),
    ) == "isNull(event_created)"


def test_null_value_in_default_block():
    assert process_row_to_where_clause(
        {"name": None}, _cm("name", "String", "string")
    ) == "isNull(name)"


def test_error_when_column_type_not_found():
    with pytest.raises(ValueError, match="Column type not found for unknown_column"):
        process_row_to_where_clause({"unknown_column": "test"}, {})


def test_error_when_value_expr_not_found():
    cm = {"test": {"name": "test", "type": "String", "value_expr": None,
                   "js_type": "string"}}
    with pytest.raises(ValueError, match="valueExpr not found for test"):
        process_row_to_where_clause({"test": "value"}, cm)


# ---------------------------------------------------------------------------
# sqlstring escape port details
# ---------------------------------------------------------------------------

def test_sqlstring_escape_specials():
    assert sqlstring_escape("a'b") == "'a\\'b'"
    assert sqlstring_escape('a"b') == "'a\\\"b'"
    assert sqlstring_escape("a\\b") == "'a\\\\b'"
    assert sqlstring_escape("a\nb") == "'a\\nb'"
    assert sqlstring_escape(None) == "NULL"
    assert sqlstring_escape(True) == "true"
    assert sqlstring_escape(2.5) == "2.5"
    assert sqlstring_escape([["a", "b"], "c"]) == "('a', 'b'), 'c'"


def test_sqlstring_escape_id_qualifies_dots():
    assert sqlstring_escape_id("json.c") == "`json`.`c`"
    assert sqlstring_escape_id("a`b") == "`a``b`"


# ---------------------------------------------------------------------------
# useRowWhere (the hook twin: row_where factory)
# ---------------------------------------------------------------------------

def test_row_where_with_meta():
    fn = row_where(meta=[{"name": "id", "type": "String"},
                         {"name": "status", "type": "String"}])
    res = fn({"id": "123", "status": "active"})
    assert res["where"] == "id='123' AND status='active'"
    assert res["alias_with"] == []


def test_row_where_alias_map():
    fn = row_where(
        meta=[{"name": "user_id", "type": "String"},
              {"name": "user_status", "type": "String"}],
        alias_map={"user_id": "users.id", "user_status": "users.status"},
    )
    res = fn({"user_id": "123", "user_status": "active"})
    assert res["where"] == "users.id='123' AND users.status='active'"
    assert res["alias_with"] == [("user_id", "users.id"),
                                 ("user_status", "users.status")]


def test_row_where_alias_fallback_to_column_name():
    fn = row_where(
        meta=[{"name": "id", "type": "String"},
              {"name": "status", "type": "String"}],
        alias_map={"id": "users.id"},
    )
    res = fn({"id": "123", "status": "active"})
    assert res["where"] == "users.id='123' AND status='active'"
    assert res["alias_with"] == [("id", "users.id")]


def test_row_where_none_alias_values_skipped():
    fn = row_where(
        meta=[{"name": "id", "type": "String"},
              {"name": "status", "type": "String"}],
        alias_map={"id": "users.id", "status": None},
    )
    res = fn({"id": "123", "status": "active"})
    assert res["where"] == "users.id='123' AND status='active'"
    assert res["alias_with"] == [("id", "users.id")]


def test_row_where_empty_meta_raises():
    fn = row_where(meta=[])
    with pytest.raises(ValueError, match="Column type not found for id"):
        fn({"id": "123"})


def test_row_where_primary_key_columns_filter():
    meta = [
        {"name": "Timestamp", "type": "DateTime64"},
        {"name": "ServiceName", "type": "String"},
        {"name": "Body", "type": "String"},
        {"name": "__hdx_id", "type": "String"},
    ]
    fn = row_where(meta=meta,
                   primary_key_columns={"Timestamp", "ServiceName", "__hdx_id"})
    res = fn({
        "Timestamp": "2024-01-01T00:00:00Z",
        "ServiceName": "my-service",
        "Body": "a very long log message that should not be in the WHERE",
        "__hdx_id": "abc123",
    })
    assert "Body" not in res["where"]
    for col in ("Timestamp", "ServiceName", "__hdx_id"):
        assert col in res["where"]


def test_row_where_all_columns_without_pk_filter():
    fn = row_where(meta=[{"name": "id", "type": "String"},
                         {"name": "Body", "type": "String"}])
    res = fn({"id": "123", "Body": "hello"})
    assert res["where"] == "id='123' AND Body='hello'"


def test_row_where_otel_logs_schema_pk_filter():
    meta = [
        {"name": "Timestamp", "type": "DateTime64(9, 'UTC')"},
        {"name": "ServiceName", "type": "String"},
        {"name": "SeverityText", "type": "String"},
        {"name": "Body", "type": "String"},
        {"name": "_block_number", "type": "UInt64"},
        {"name": "_block_offset", "type": "UInt64"},
    ]
    pk = {"Timestamp", "ServiceName", "toDate(Timestamp)",
          "toStartOfFiveMinutes(Timestamp)", "_block_number", "_block_offset"}
    fn = row_where(meta=meta, primary_key_columns=pk)
    res = fn({
        "Timestamp": "2026-05-20T21:20:00.123456789Z",
        "ServiceName": "api-server",
        "SeverityText": "ERROR",
        "Body": "Connection refused to downstream service after 30s timeout",
        "_block_number": "2668",
        "_block_offset": "4",
    })
    assert "Body" not in res["where"]
    assert "SeverityText" not in res["where"]
    for col in ("Timestamp", "ServiceName", "_block_number", "_block_offset"):
        assert col in res["where"]


def test_row_where_strips_internal_fields():
    fn = row_where(meta=[{"name": "id", "type": "String"}])
    res = fn({"id": "1", "__hyperdx_id": "x", "__hyperdx_alias_with": []})
    assert res["where"] == "id='1'"


def test_row_where_date_type_classified_from_ch_type():
    fn = row_where(meta=[{"name": "Timestamp", "type": "DateTime64(9, 'UTC')"}])
    res = fn({"Timestamp": "2026-05-20T21:20:00Z"})
    assert res["where"] == (
        "Timestamp=parseDateTime64BestEffort('2026-05-20T21:20:00Z', 9)"
    )


def test_alias_map_to_with_clauses_filters_empty():
    assert alias_map_to_with_clauses(None) == []
    assert alias_map_to_with_clauses(
        {"a": "expr", "b": None, "c": "  ", "d": "x"}
    ) == [("a", "expr"), ("d", "x")]
