"""Conditional color rules — twins of types.test.ts:10-240
(ColorConditionSchema) and the app-side evaluator semantics, plus the
distributed Column variant asserted equal to the scalar evaluator."""

import pytest

from hyperdx_spark.coloring import (
    CHART_PALETTE_TOKENS,
    ColorCondition,
    conditional_color_column,
    evaluate_color_condition,
    resolve_conditional_color,
)


# ---- schema validation (types.test.ts) --------------------------------------


def test_parses_numeric_ordered_operators():
    for op in ("gt", "gte", "lt", "lte"):
        ColorCondition(op, 5, "chart-red")
    ColorCondition("gt", 5, "chart-red", label="hot")


def test_parses_between_including_inverted():
    ColorCondition("between", (1, 2), "chart-green")
    ColorCondition("between", (9, 2), "chart-green")  # inverted allowed


def test_parses_eq_neq_number_or_string():
    ColorCondition("eq", 5, "chart-blue")
    ColorCondition("eq", "ok", "chart-blue")
    ColorCondition("neq", 5, "chart-blue")


def test_parses_string_operators_and_regex():
    for op in ("contains", "startsWith", "endsWith"):
        ColorCondition(op, "err", "chart-error")
    ColorCondition("regex", r"^5\d\d$", "chart-error")


def test_parses_all_palette_tokens():
    for token in CHART_PALETTE_TOKENS:
        ColorCondition("gt", 0, token)
    assert len(CHART_PALETTE_TOKENS) == 13


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(operator="wat", value=1, color="chart-red"),
        dict(operator="gt", value=float("nan"), color="chart-red"),
        dict(operator="gt", value=float("inf"), color="chart-red"),
        dict(operator="gt", value="5", color="chart-red"),  # string on numeric
        dict(operator="contains", value=5, color="chart-red"),  # number on string
        dict(operator="gt", value=1, color="tomato"),  # invalid palette token
        dict(operator="contains", value="", color="chart-red"),
        dict(operator="startsWith", value="", color="chart-red"),
        dict(operator="endsWith", value="", color="chart-red"),
        dict(operator="regex", value="", color="chart-red"),
        dict(operator="regex", value="[unclosed", color="chart-red"),
        dict(operator="gt", value=1, color="chart-red", label="x" * 41),
    ],
)
def test_rejects_invalid_rules(kwargs):
    with pytest.raises(ValueError):
        ColorCondition(**kwargs)


# ---- evaluator (app/src/utils.ts:624-696) -----------------------------------


def test_evaluate_operators():
    assert evaluate_color_condition(6, ColorCondition("gt", 5, "chart-red"))
    assert not evaluate_color_condition(5, ColorCondition("gt", 5, "chart-red"))
    assert evaluate_color_condition(5, ColorCondition("gte", 5, "chart-red"))
    assert evaluate_color_condition(4, ColorCondition("lt", 5, "chart-red"))
    assert evaluate_color_condition(5, ColorCondition("lte", 5, "chart-red"))
    # between normalizes inverted bounds
    assert evaluate_color_condition(3, ColorCondition("between", (9, 2), "chart-red"))
    assert not evaluate_color_condition(1, ColorCondition("between", (9, 2), "chart-red"))
    assert evaluate_color_condition("ok", ColorCondition("eq", "ok", "chart-red"))
    assert evaluate_color_condition(1, ColorCondition("neq", 2, "chart-red"))
    assert evaluate_color_condition("err500", ColorCondition("contains", "err", "chart-red"))
    assert evaluate_color_condition("err500", ColorCondition("startsWith", "err", "chart-red"))
    assert evaluate_color_condition("err500", ColorCondition("endsWith", "500", "chart-red"))
    assert evaluate_color_condition("503", ColorCondition("regex", r"^5\d\d$", "chart-red"))


def test_evaluate_cross_type_is_false():
    # a string never matches a numeric operator and vice versa (utils.ts:630)
    assert not evaluate_color_condition("6", ColorCondition("gt", 5, "chart-red"))
    assert not evaluate_color_condition(5, ColorCondition("contains", "5", "chart-red"))
    assert not evaluate_color_condition(5, ColorCondition("eq", "5", "chart-red"))
    # neq guards on type too: cross-type mismatch returns false, not true
    assert not evaluate_color_condition(5, ColorCondition("neq", "5", "chart-red"))


def test_resolve_last_match_wins_and_fallback():
    rules = [
        ColorCondition("gt", 0, "chart-green"),
        ColorCondition("gt", 10, "chart-warning"),
        ColorCondition("gt", 100, "chart-error"),
    ]
    assert resolve_conditional_color(5, rules, "chart-gray") == "chart-green"
    assert resolve_conditional_color(50, rules, "chart-gray") == "chart-warning"
    assert resolve_conditional_color(500, rules, "chart-gray") == "chart-error"
    assert resolve_conditional_color(-1, rules, "chart-gray") == "chart-gray"
    assert resolve_conditional_color(None, rules, "chart-gray") == "chart-gray"
    assert resolve_conditional_color(5, [], "chart-gray") == "chart-gray"
    assert resolve_conditional_color(5, None, None) is None


# ---- distributed Column variant ---------------------------------------------


def test_column_variant_matches_scalar(spark):
    rules = [
        ColorCondition("gt", 0.0, "chart-green"),
        ColorCondition("between", (40.0, 60.0), "chart-warning"),
        ColorCondition("gt", 100.0, "chart-error"),
    ]
    vals = [-3.0, 0.0, 5.0, 50.0, 150.0, None]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {
        r["v"]: r["c"]
        for r in df.select(
            "v", conditional_color_column("v", rules, "chart-gray").alias("c")
        ).collect()
    }
    for v in vals:
        assert got[v] == resolve_conditional_color(v, rules, "chart-gray"), v


def test_column_variant_string_rules(spark):
    rules = [
        ColorCondition("contains", "err", "chart-error"),
        ColorCondition("regex", r"^warn", "chart-warning"),
    ]
    df = spark.createDataFrame(
        [("error",), ("warning",), ("ok",), (None,)], "v string"
    )
    got = {
        r["v"]: r["c"]
        for r in df.select(
            "v", conditional_color_column("v", rules).alias("c")
        ).collect()
    }
    assert got["error"] == "chart-error"
    assert got["warning"] == "chart-warning"
    assert got["ok"] is None
    assert got[None] is None
