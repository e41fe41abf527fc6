"""Text-index kv-items rewrite (rewriteSqlFilterWithKvItems analogue).

The reference rewrites map-subscript equality filters into containment
checks over a materialized ``k<sep>v`` items array so ClickHouse's
token-bloom-filter text index can skip granules
(``core/renderChartConfig.ts:357-490``; applied to ``filters`` entries of
type ``sql`` at ``:1218-1222``):

* ``Map['k'] = 'v'``        -> ``has(items_col, 'k=v')``
* ``Map['k'] IN ('a','b')`` -> ``hasAny(items_col, ['k=a','k=b'])`` (CH >=
  26.5) or an OR-chain of ``has`` calls (backport branches)
* empty-string values bail out: CH ``Map(String,String)['k'] = ''`` also
  matches *absent* keys (subscript default), which ``has(items,'k=')``
  would not preserve.

Spark mapping: ``array_contains`` / ``arrays_overlap`` over the items
column. The payoff is the same shape as materialized-column substitution —
the rewritten predicate references one physical array column instead of
parsing the whole map/JSON blob per row, and parquet dictionary +
bloom-filter column metadata on the items column can skip row groups where
the pair never occurs (write the items column with
``parquet.bloom.filter.enabled`` for the full effect at 100 TB).

Only simple single-quoted literals are rewritten; anything else (nested
expressions, parameters, empty lists) is left untouched — exactly the
reference's conservative bail-outs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Mapping, Optional


@dataclass
class KvItemsInfo:
    """Where a map column's materialized items live (TextIndexInfoLookup
    entry: ``{kv: {columnName, separator, useHasAny}}``)."""

    column_name: str
    separator: str = "="
    use_has_any: bool = True


# `map_col['key'] OP ...` in either raw-subscript or translated
# element_at spelling; values are simple single-quoted literals
_LHS = r"(?:`?(?P<col>\w+)`?\[\s*'(?P<key>[^']*)'\s*\]|element_at\(\s*`?(?P<col2>\w+)`?\s*,\s*'(?P<key2>[^']*)'\s*\))"
_EQ_RE = re.compile(_LHS + r"\s*=\s*'(?P<val>[^']*)'")
_IN_RE = re.compile(_LHS + r"\s+IN\s+\((?P<vals>\s*'[^']*'(?:\s*,\s*'[^']*')*\s*)\)", re.IGNORECASE)
_VAL_RE = re.compile(r"'([^']*)'")


def _lit(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _contains(info: KvItemsInfo, key: str, value: str) -> str:
    return f"array_contains(`{info.column_name}`, {_lit(key + info.separator + value)})"


def rewrite_kv_filters(
    expr: str, lookup: Mapping[str, KvItemsInfo]
) -> str:
    """Rewrite map-subscript = / IN predicates inside *expr* to items-array
    containment. Unmatched or bail-out shapes pass through unchanged."""
    if not lookup or not expr:
        return expr

    def info_for(m: re.Match) -> Optional[tuple[KvItemsInfo, str]]:
        col = m.group("col") or m.group("col2")
        key = m.group("key") if m.group("col") else m.group("key2")
        info = lookup.get(col)
        return (info, key) if info else None

    def eq_repl(m: re.Match) -> str:
        hit = info_for(m)
        if hit is None or m.group("val") == "":
            return m.group(0)
        info, key = hit
        return _contains(info, key, m.group("val"))

    def in_repl(m: re.Match) -> str:
        hit = info_for(m)
        if hit is None:
            return m.group(0)
        info, key = hit
        values = _VAL_RE.findall(m.group("vals"))
        if not values or any(v == "" for v in values):
            return m.group(0)
        if len(values) == 1:
            return _contains(info, key, values[0])
        if info.use_has_any:
            items = ", ".join(_lit(key + info.separator + v) for v in values)
            return f"arrays_overlap(`{info.column_name}`, array({items}))"
        return (
            "(" + " OR ".join(_contains(info, key, v) for v in values) + ")"
        )

    expr = _IN_RE.sub(in_repl, expr)
    expr = _EQ_RE.sub(eq_repl, expr)
    return expr


# --------------------------------------------------------------------------
# KV-items column discovery from table DDL
# --------------------------------------------------------------------------

# arrayMap((x) -> concat(x.1, '<sep>', x.2), ... — both parenthesized and
# bare lambda forms; the backreference forces the SAME variable in both
# tuple accessors (queryParser.ts parseArrayMapConcatPrefix behavior)
_KV_LAMBDA = (
    r"\s*arrayMap\s*\(\s*\(?\s*(?P<v>\w+)\s*\)?\s*->\s*concat\s*\(\s*"
    r"(?P=v)\s*\.\s*1\s*,\s*'(?P<sep>[^']*)'\s*,\s*(?P=v)\s*\.\s*2\s*\)\s*,\s*"
)
_KV_INLINE_RE = re.compile(
    _KV_LAMBDA
    + r"`?(?P<col>\w+)`?\s*::\s*Array\s*\(\s*Tuple\s*\(\s*String\s*,"
    + r"\s*String\s*\)\s*\)\s*\)\s*$"
)
_KV_CAST_RE = re.compile(
    _KV_LAMBDA
    + r"CAST\s*\(\s*`?(?P<col>\w+)`?\s*,\s*'(?P<type>[^']*)'\s*\)\s*\)\s*$"
)


def parse_kv_items_expression(default_expression: str) -> Optional[tuple[str, str]]:
    """(source map column, separator) parsed from a kv-items column's
    ``default_expression`` — the discovery step that turns table metadata
    into a :func:`rewrite_kv_filters` lookup without any manual config.

    Mirrors the reference's two strategies, tried in order
    (``parseKvItemsExpression`` inline-cast form then
    ``parseKvItemsCastExpression``, queryParser.ts:1059-1141):

    * ``arrayMap((x) -> concat(x.1, '=', x.2), X::Array(Tuple(String, String)))``
    * ``arrayMap(x -> concat(x.1, '=', x.2), CAST(X, 'Array(Tuple(String, String))'))``

    Both accept bare or parenthesized lambda params and arbitrary
    whitespace; anything else (different body shape, a second lambda var,
    a non-``Array(Tuple(String, String))`` type, trailing tokens) returns
    None — the same conservative full-match bail-out as the reference.
    """
    m = _KV_INLINE_RE.fullmatch(default_expression)
    if m:
        return m.group("col"), m.group("sep")
    m = _KV_CAST_RE.fullmatch(default_expression)
    if m and re.sub(r"\s+", "", m.group("type")) == "Array(Tuple(String,String))":
        return m.group("col"), m.group("sep")
    return None


def kv_items_lookup(
    columns: Mapping[str, str], *, use_has_any: bool = True
) -> dict[str, KvItemsInfo]:
    """Build the map-column -> :class:`KvItemsInfo` lookup from
    ``{items_column_name: default_expression}`` table metadata (the
    ``KV_ITEMS_STRATEGIES`` scan over system.columns in the reference)."""
    out: dict[str, KvItemsInfo] = {}
    for items_col, expr in columns.items():
        parsed = parse_kv_items_expression(expr or "")
        if parsed:
            map_col, sep = parsed
            out[map_col] = KvItemsInfo(
                column_name=items_col, separator=sep, use_has_any=use_has_any
            )
    return out
