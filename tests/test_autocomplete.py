"""Search-input autocomplete tokenization — useAutoCompleteOptions.test.tsx
twinned (hyperdx_spark.autocomplete)."""

import pytest

from hyperdx_spark.autocomplete import (
    derive_map_columns_from_fields,
    tokenize_at_cursor,
)

END_CASES = [
    # (input, expected token at end, expected tokens)
    ("foo bar baz", "baz", ["foo", "bar", "baz"]),
    ("FieldName", "FieldName", ["FieldName"]),
    ("", "", [""]),
    # split-like semantics: consecutive spaces produce empty tokens
    ("foo  bar", "bar", ["foo", "", "bar"]),
    ("foo ", "", ["foo", ""]),
    # balanced quoted regions keep their whitespace
    ('Service:"hello world"', 'Service:"hello world"',
     ['Service:"hello world"']),
    ('ServiceName:"clickhouse" SeverityText:"debug"', 'SeverityText:"debug"',
     ['ServiceName:"clickhouse"', 'SeverityText:"debug"']),
    ('Service:"he said \\"hi\\"" other', "other",
     ['Service:"he said \\"hi\\""', "other"]),
    ('URL:"http://example.com/x" x', "x",
     ['URL:"http://example.com/x"', "x"]),
    # unclosed quotes: a following `ident:` pattern breaks the region
    ('ServiceName:" SeverityText:"debug"', 'SeverityText:"debug"',
     ['ServiceName:"', 'SeverityText:"debug"']),
    ('Service:"hel', 'Service:"hel', ['Service:"hel']),
    ('Service:"hello world', "world", ['Service:"hello', "world"]),
    ('A:" B:" C:"done"', 'C:"done"', ['A:"', 'B:"', 'C:"done"']),
    # whitespace followed by a non-identifier / no-colon ident can close
    ('Service:"hello !world"', 'Service:"hello !world"',
     ['Service:"hello !world"']),
    ('Service:"hello world done"', 'Service:"hello world done"',
     ['Service:"hello world done"']),
    ('Foo:" ResourceAttributes.service.name:"x"',
     'ResourceAttributes.service.name:"x"',
     ['Foo:"', 'ResourceAttributes.service.name:"x"']),
]


@pytest.mark.parametrize("value,expected_token,expected_tokens", END_CASES)
def test_tokenize_at_cursor_end(value, expected_token, expected_tokens):
    out = tokenize_at_cursor(value, len(value))
    assert out["tokens"] == expected_tokens
    assert out["token"] == expected_token


def test_tokenize_cursor_positioning():
    out = tokenize_at_cursor("foo bar baz", 0)
    assert out["token"] == "foo" and out["index"] == 0
    out = tokenize_at_cursor("foo bar baz", 5)
    assert out["token"] == "bar" and out["index"] == 1
    v = 'Service:"hello world" x'
    out = tokenize_at_cursor(v, 12)
    assert out["token"] == 'Service:"hello world"' and out["index"] == 0
    v = 'ServiceName:"cl other'
    out = tokenize_at_cursor(v, 15)
    assert out["token"] == 'ServiceName:"cl' and out["index"] == 0


def test_derive_map_columns_from_fields():
    fields = [
        {"path": ["ResourceAttributes"], "js_type": "map"},
        {"path": ["SpanAttributes"], "js_type": "map"},
        {"path": ["Body"], "js_type": "string"},
        {"path": ["ResourceAttributes", "host"], "js_type": "string"},
    ]
    assert derive_map_columns_from_fields(fields) == [
        "ResourceAttributes", "SpanAttributes",
    ]
    assert derive_map_columns_from_fields(None) == []
    assert derive_map_columns_from_fields([]) == []
    assert derive_map_columns_from_fields(
        [{"path": ["x"], "js_type": "number"}]
    ) == []
