"""Text-index kv-items rewrite (functions/kvindex.py) — ported from the
reference's rewriteSqlFilterWithKvItems.test.ts — plus an end-to-end check
that a rewritten filter produces the same rows as the un-rewritten map
predicate and reads the items column in the plan."""

import pytest
from pyspark.sql import functions as F

from hyperdx_spark.functions.kvindex import KvItemsInfo, rewrite_kv_filters

LOOKUP = {"attrs": KvItemsInfo(column_name="attrs_items")}


def rw(expr, lookup=LOOKUP):
    return rewrite_kv_filters(expr, lookup)


def test_verbatim_when_lookup_empty_or_expr_empty():
    assert rw("attrs['k'] = 'v'", {}) == "attrs['k'] = 'v'"
    assert rw("", LOOKUP) == ""


def test_rewrites_eq_to_array_contains():
    assert rw("attrs['env'] = 'prod'") == (
        "array_contains(`attrs_items`, 'env=prod')"
    )


def test_bails_on_empty_value_numeric_and_rhs_subscript():
    # Map['k']='' also matches absent keys via the subscript default
    assert rw("attrs['env'] = ''") == "attrs['env'] = ''"
    assert rw("attrs['env'] = 3") == "attrs['env'] = 3"
    assert rw("'prod' = attrs['env']") == "'prod' = attrs['env']"


def test_unknown_map_and_plain_columns_untouched():
    assert rw("other['env'] = 'prod'") == "other['env'] = 'prod'"
    assert rw("env = 'prod'") == "env = 'prod'"


def test_in_single_item_uses_contains_not_overlap():
    assert rw("attrs['env'] IN ('prod')") == (
        "array_contains(`attrs_items`, 'env=prod')"
    )


def test_in_many_items_uses_arrays_overlap():
    assert rw("attrs['env'] IN ('a', 'b', 'c')") == (
        "arrays_overlap(`attrs_items`, array('env=a', 'env=b', 'env=c'))"
    )


def test_in_bails_on_empty_value_and_not_in():
    assert rw("attrs['env'] IN ('a', '')") == "attrs['env'] IN ('a', '')"
    assert rw("attrs['env'] NOT IN ('a')") == "attrs['env'] NOT IN ('a')"


def test_rewrites_inside_boolean_chains_and_mixed():
    got = rw("attrs['a'] = 'x' AND other = 1 OR attrs['b'] IN ('y', 'z')")
    assert got == (
        "array_contains(`attrs_items`, 'a=x') AND other = 1 OR "
        "arrays_overlap(`attrs_items`, array('b=y', 'b=z'))"
    )


def test_custom_separator_and_multiple_lookup_entries():
    lookup = {
        "attrs": KvItemsInfo(column_name="ai", separator=":"),
        "labels": KvItemsInfo(column_name="li"),
    }
    got = rw("attrs['k'] = 'v' AND labels['x'] = 'y'", lookup)
    assert got == (
        "array_contains(`ai`, 'k:v') AND array_contains(`li`, 'x=y')"
    )


def test_no_has_any_falls_back_to_or_chain():
    lookup = {"attrs": KvItemsInfo(column_name="ai", use_has_any=False)}
    got = rw("attrs['e'] IN ('a', 'b')", lookup)
    assert got == (
        "(array_contains(`ai`, 'e=a') OR array_contains(`ai`, 'e=b'))"
    )


def test_special_chars_in_key_and_idempotence():
    assert rw("attrs['k8s.pod name'] = 'v'") == (
        "array_contains(`attrs_items`, 'k8s.pod name=v')"
    )
    once = rw("attrs['env'] = 'prod'")
    assert rw(once) == once


def test_element_at_spelling_is_rewritten():
    assert rw("element_at(attrs, 'env') = 'prod'") == (
        "array_contains(`attrs_items`, 'env=prod')"
    )


def test_end_to_end_filter_path(spark):
    """A sql-typed filters entry over a source with text_index_kv must read
    the items column and return the same rows as the map predicate."""
    from hyperdx_spark.compile import compile_chart_config
    from hyperdx_spark.model import ChartConfig, SelectCol, SqlFilter, Source

    rows = [
        (1, {"env": "prod", "tier": "web"}, ["env=prod", "tier=web"]),
        (2, {"env": "dev"}, ["env=dev"]),
        (3, {"tier": "web"}, ["tier=web"]),
    ]
    df = spark.createDataFrame(
        rows, "id long, attrs map<string,string>, attrs_items array<string>"
    )
    src = Source(
        table="kv_t",
        timestamp_value_expression="ts",
        text_index_kv={"attrs": KvItemsInfo(column_name="attrs_items")},
    )
    cfg = ChartConfig(
        source=src,
        select=[SelectCol(agg_fn=None, value_expression="id", alias="id")],
        filters=[SqlFilter(condition="attrs['env'] IN ('prod', 'stage')")],
    )
    out = compile_chart_config(spark, cfg, df=df)
    assert [r["id"] for r in out.collect()] == [1]
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "attrs_items" in plan
    assert "element_at" not in plan  # map never touched


def test_parse_kv_items_expression_both_forms():
    """Discovery parity (parseKvItemsExpression / ...CastExpression,
    queryParser.ts:1059-1141): both DDL forms, bare and parenthesized
    lambda vars, strict full-match bail-outs."""
    from hyperdx_spark.functions.kvindex import parse_kv_items_expression as p

    assert p(
        "arrayMap((arr) -> concat(arr.1, '=', arr.2), "
        "LogAttributes::Array(Tuple(String, String)))"
    ) == ("LogAttributes", "=")
    assert p(
        "arrayMap(x -> concat(x.1, ':', x.2), "
        "CAST(M, 'Array(Tuple(String, String))'))"
    ) == ("M", ":")
    # type string is whitespace-insensitive (the reference normalizes)
    assert p(
        "arrayMap(x -> concat(x.1, '=', x.2), "
        "CAST(M, 'Array( Tuple(String , String) )'))"
    ) == ("M", "=")
    # bail-outs: lambda-var mismatch, wrong tuple type, trailing tokens
    assert p("arrayMap((a) -> concat(b.1, '=', a.2), "
             "M::Array(Tuple(String, String)))") is None
    assert p("arrayMap((a) -> concat(a.1, '=', a.2), "
             "CAST(M, 'Array(Tuple(String, Int64))'))") is None
    assert p("arrayMap((a) -> concat(a.1, '=', a.2), "
             "M::Array(Tuple(String, String))) AND 1") is None
    assert p("") is None
    # queryParser.test.ts:2376-2505 remaining cases (r12 walk):
    # multi-char and EMPTY separators parse
    assert p(
        "arrayMap((arr) -> concat(arr.1, ' = ', arr.2), "
        "LogAttributes::Array(Tuple(String, String)))"
    ) == ("LogAttributes", " = ")
    assert p(
        "arrayMap((arr) -> concat(arr.1, '', arr.2), "
        "LogAttributes::Array(Tuple(String, String)))"
    ) == ("LogAttributes", "")
    # non-matching shapes
    assert p("LogAttributes") is None
    assert p("mapKeys(LogAttributes)") is None
    assert p(
        "arrayMap((k, v) -> concat(k, '=', v), mapKeys(LogAttributes), "
        "mapValues(LogAttributes))"
    ) is None
    # unrecognized characters in the column name bail out
    assert p(
        "arrayMap((arr) -> concat(arr.1, '=', arr.2), "
        "Log@Attributes::Array(Tuple(String, String)))"
    ) is None
    # CAST form: whitespace-free spelling, wrong type bails
    assert p(
        "arrayMap((arr)->concat(arr.1,'=',arr.2),"
        "CAST(LogAttributes,'Array(Tuple(String,String))'))"
    ) == ("LogAttributes", "=")
    assert p(
        "arrayMap((arr) -> concat(arr.1, '=', arr.2), "
        "CAST(LogAttributes, 'Array(String)'))"
    ) is None


def test_kv_items_lookup_end_to_end():
    from hyperdx_spark.functions.kvindex import (
        kv_items_lookup,
        rewrite_kv_filters,
    )

    lookup = kv_items_lookup({
        "_kv_items": "arrayMap((arr) -> concat(arr.1, '=', arr.2), "
                     "LogAttributes::Array(Tuple(String, String)))",
        "not_kv": "upper(x)",
    })
    assert set(lookup) == {"LogAttributes"}
    got = rewrite_kv_filters("LogAttributes['env'] = 'prod'", lookup)
    assert got == "array_contains(`_kv_items`, 'env=prod')"
