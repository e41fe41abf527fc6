"""Conditional color rules for dashboard tiles.

Parity targets: ``packages/common-utils/src/types.ts:320-388``
(``ColorConditionSchema`` — the validated rule model; spec in
``__tests__/types.test.ts:10-240``) and ``packages/app/src/utils.ts:624-696``
(``evaluateColorCondition`` / ``resolveConditionalColor`` — the runtime).

A rule is (operator, value, color[, label]); rules are evaluated in order
and the LAST matching rule's color wins (higher-priority rules go last).
Besides the reference's scalar evaluator (used for a number tile's single
value), :func:`conditional_color_column` evaluates the same rules as a
Spark Column so a table tile's per-row coloring stays distributed.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Optional, Sequence, Union

CHART_PALETTE_TOKENS = (
    # categorical hues (types.ts:265-276)
    "chart-blue",
    "chart-orange",
    "chart-red",
    "chart-cyan",
    "chart-green",
    "chart-pink",
    "chart-purple",
    "chart-light-blue",
    "chart-brown",
    "chart-gray",
    # semantic tokens (types.ts:278-284)
    "chart-success",
    "chart-warning",
    "chart-error",
)

_NUMERIC_ORDERED = ("gt", "gte", "lt", "lte")
_STRING_MATCH = ("contains", "startsWith", "endsWith")
_OPERATORS = _NUMERIC_ORDERED + _STRING_MATCH + ("between", "eq", "neq", "regex")

Value = Union[int, float, str]


@dataclass
class ColorCondition:
    """One validated color rule (ColorConditionSchema). ``value`` is a
    finite number for ordered operators, a (lo, hi) pair for ``between``
    (inversion allowed — normalized at evaluation), a number or string for
    ``eq``/``neq``, and a non-empty string (valid regex for ``regex``) for
    the string operators."""

    operator: str
    value: Union[Value, tuple]
    color: str
    label: Optional[str] = None

    def __post_init__(self):
        op = self.operator
        if op not in _OPERATORS:
            raise ValueError(f"unknown operator {op!r}")
        if self.color not in CHART_PALETTE_TOKENS:
            raise ValueError(f"invalid palette token {self.color!r}")
        if self.label is not None and len(self.label) > 40:
            raise ValueError("label longer than 40 characters")
        if op in _NUMERIC_ORDERED:
            self._require_finite_number(self.value)
        elif op == "between":
            if not (isinstance(self.value, (tuple, list)) and len(self.value) == 2):
                raise ValueError("between requires a (lo, hi) pair")
            for v in self.value:
                self._require_finite_number(v)
        elif op in ("eq", "neq"):
            if isinstance(self.value, str):
                if len(self.value) > 200:
                    raise ValueError("string value longer than 200 characters")
            else:
                self._require_finite_number(self.value)
        elif op in _STRING_MATCH:
            if not isinstance(self.value, str) or not self.value:
                raise ValueError(f"{op} requires a non-empty string value")
            if len(self.value) > 200:
                raise ValueError("string value longer than 200 characters")
        elif op == "regex":
            if not isinstance(self.value, str) or not self.value:
                raise ValueError("regex requires a non-empty pattern")
            if len(self.value) > 500:
                raise ValueError("regex pattern longer than 500 characters")
            try:
                re.compile(self.value)
            except re.error as exc:
                raise ValueError(f"Invalid regex pattern: {exc}") from exc

    @staticmethod
    def _require_finite_number(v) -> None:
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise ValueError(f"numeric operator requires a number, got {v!r}")
        if not math.isfinite(v):
            raise ValueError("numeric operator requires a FINITE number")


def evaluate_color_condition(value: Value, rule: ColorCondition) -> bool:
    """Whether *value* matches *rule* (app/src/utils.ts:624-663). Cross-type
    comparisons are false (a string never matches a numeric operator and
    vice versa); bad regexes are a silent no-match."""
    op = rule.operator
    is_num = isinstance(value, (int, float)) and not isinstance(value, bool)
    if op == "gt":
        return is_num and value > rule.value
    if op == "gte":
        return is_num and value >= rule.value
    if op == "lt":
        return is_num and value < rule.value
    if op == "lte":
        return is_num and value <= rule.value
    if op == "between":
        if not is_num:
            return False
        a, b = rule.value
        return min(a, b) <= value <= max(a, b)
    same_kind = isinstance(rule.value, str) == isinstance(value, str)
    if op == "eq":
        # strict equality: cross-type mismatches are false (JS ===)
        return same_kind and value == rule.value
    if op == "neq":
        return same_kind and value != rule.value
    if op == "contains":
        return isinstance(value, str) and rule.value in value
    if op == "startsWith":
        return isinstance(value, str) and value.startswith(rule.value)
    if op == "endsWith":
        return isinstance(value, str) and value.endswith(rule.value)
    if op == "regex":
        if not isinstance(value, str):
            return False
        try:
            return re.search(rule.value, value) is not None
        except re.error:
            return False
    return False


def resolve_conditional_color(
    value: Optional[Value],
    rules: Optional[Sequence[ColorCondition]],
    fallback: Optional[str] = None,
) -> Optional[str]:
    """Display color for a tile value (app/src/utils.ts:679-690): rules in
    order, LAST match wins; no match / empty rules / null value ->
    *fallback*."""
    if not rules or value is None:
        return fallback
    match = fallback
    for rule in rules:
        if evaluate_color_condition(value, rule):
            match = rule.color
    return match


def conditional_color_column(
    col,
    rules: Sequence[ColorCondition],
    fallback: Optional[str] = None,
):
    """The same resolution as a Spark Column over a numeric or string
    column — per-row table-tile coloring without collecting. Last matching
    rule wins, so the CASE is built back-to-front (the final wrap is the
    first rule checked... the LAST rule).

    Caveats vs the scalar evaluator: comparisons follow the COLUMN's SQL
    type (apply numeric rules to numeric columns — a string column would
    be implicitly cast rather than cross-type-false), and regex rules run
    under Java regex (a Python-only construct like ``(?P<g>...)`` passes
    validation but fails at execution)."""
    from pyspark.sql import Column, functions as F

    c = F.col(col) if isinstance(col, str) else col
    out = F.lit(fallback)

    def cond(rule: ColorCondition) -> Column:
        op, v = rule.operator, rule.value
        if op == "gt":
            return c > F.lit(v)
        if op == "gte":
            return c >= F.lit(v)
        if op == "lt":
            return c < F.lit(v)
        if op == "lte":
            return c <= F.lit(v)
        if op == "between":
            lo, hi = min(v), max(v)
            return (c >= F.lit(lo)) & (c <= F.lit(hi))
        if op == "eq":
            return c == F.lit(v)
        if op == "neq":
            return c != F.lit(v)
        if op == "contains":
            return c.contains(v)
        if op == "startsWith":
            return c.startswith(v)
        if op == "endsWith":
            return c.endswith(v)
        if op == "regex":
            return F.regexp_like(c, F.lit(v))
        raise ValueError(op)

    for rule in rules:
        out = F.when(cond(rule), F.lit(rule.color)).otherwise(out)
    return out
