"""Row → exact-match WHERE clause (ref: packages/app/src/hooks/
useRowWhere.tsx:1-195; spec tests hooks/__tests__/useRowWhere.test.tsx).

The row side-panel's "find exactly this row again" lookup: each displayed
column becomes one equality conjunct, dispatched on the column's JS type
family (clickhouse/index.ts convertCHDataTypeToJSType):

- ``null``/missing   → ``isNull(expr)``
- date               → ``expr=parseDateTime64BestEffort('<v>', 9)``
- array / map        → ``expr=JSONExtract(<escaped v>, '<CH type>')``
- tuple              → ``toJSONString(expr)='<v>'``
- whole JSON column  → ``lower(hex(MD5(toString(expr))))='<md5(v)>'``
- dynamic (json.el)  → value ``'null'`` → ``isNull(`expr`)``; else
  ``toJSONString(expr) = coalesce(toJSONString(JSONExtract('<v>',
  'Dynamic')), toJSONString('<v>'))``
- default            → ``expr='<v>'``; strings longer than 512 UTF-16
  units compare ``lower(hex(MD5(leftUTF8(expr, 1000))))`` against the md5
  of the first 1000 units (md5 on big payloads would block the render
  thread, useRowWhere.tsx:108-119)

Literal escaping reproduces the ``sqlstring`` npm package (SqlString
.escape/.escapeId/.format): backslash-escaped quotes, ``, `` joined
arrays, ```k` = v`` object pairs, bare numbers/booleans.

Scale shape: pure driver-side string building over ONE row — the generated
WHERE goes through the chcompat shim into a Spark filter, where it
predicate-pushes like any other conjunctive equality filter.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Mapping, Optional, Sequence

from .functions.chcompat import convert_ch_data_type_to_js_type
from .jsnum import js_number_str

#: ref useRowWhere.tsx:13
MAX_STRING_LENGTH = 512

#: Internal row field names the table component injects for row tracking
#: (ref useRowWhere.tsx:19-22) — stripped before WHERE building.
INTERNAL_ROW_FIELDS = {"ID": "__hyperdx_id", "ALIAS_WITH": "__hyperdx_alias_with"}

# sqlstring CHARS_ESCAPE_MAP (sqlstring/lib/SqlString.js)
_ESCAPES = {
    "\0": "\\0",
    "\b": "\\b",
    "\t": "\\t",
    "\n": "\\n",
    "\r": "\\r",
    "\x1a": "\\Z",
    '"': '\\"',
    "'": "\\'",
    "\\": "\\\\",
}


def _escape_string(s: str) -> str:
    return "'" + "".join(_ESCAPES.get(c, c) for c in s) + "'"


def sqlstring_escape_id(val: str) -> str:
    """sqlstring ``SqlString.escapeId`` (the ``??`` placeholder): backtick
    quoting with inner backticks doubled; dots qualify (``a.b`` →
    ``\\`a\\`.\\`b\\```)."""
    return "`" + str(val).replace("`", "``").replace(".", "`.`") + "`"


def sqlstring_escape(val) -> str:
    """sqlstring ``SqlString.escape`` (the ``?`` placeholder): None →
    ``NULL``; bools bare; numbers via JS ``String(number)``; lists as
    ``a, b`` (nested lists parenthesised); dicts as ```k` = v`` pairs;
    strings quoted with backslash escapes."""
    if val is None:
        return "NULL"
    if isinstance(val, bool):
        return "true" if val else "false"
    if isinstance(val, int):
        return str(val) if abs(val) < 2**53 else js_number_str(float(val))
    if isinstance(val, float):
        return js_number_str(val)
    if isinstance(val, (list, tuple)):
        return ", ".join(
            "(" + sqlstring_escape(list(v)) + ")"
            if isinstance(v, (list, tuple))
            else sqlstring_escape(v)
            for v in val
        )
    if isinstance(val, dict):
        return ", ".join(
            f"{sqlstring_escape_id(k)} = {sqlstring_escape(v)}"
            for k, v in val.items()
        )
    if hasattr(val, "strftime"):  # datetime — sqlstring dateToString shape
        # a date-typed cell (no time component) renders at midnight, the
        # way a JS Date built from 'YYYY-MM-DD' stringifies
        micros = getattr(val, "microsecond", 0)
        if not hasattr(val, "hour"):
            return _escape_string(val.strftime("%Y-%m-%d 00:00:00.000"))
        return _escape_string(val.strftime("%Y-%m-%d %H:%M:%S.") + f"{micros // 1000:03d}")
    return _escape_string(str(val))


def _utf16_len(s: str) -> int:
    """JS ``String.prototype.length`` — UTF-16 code units."""
    return sum(2 if ord(c) > 0xFFFF else 1 for c in s)


def _js_substring(s: str, n: int) -> str:
    """JS ``substring(0, n)`` — slices UTF-16 code units.  A slice that
    would split a surrogate pair leaves a lone high surrogate, which the
    reference's crypto-js md5 cannot UTF-8 encode (encodeURIComponent
    throws) — mirrored as a ValueError."""
    out = []
    units = 0
    for ch in s:
        u = 2 if ord(ch) > 0xFFFF else 1
        if units + u > n:
            if u == 2 and units < n:
                raise ValueError(
                    "substring(0, n) splits a surrogate pair; the reference's "
                    "md5 encode throws on the lone surrogate"
                )
            break
        out.append(ch)
        units += u
    return "".join(out)


def _md5_hex(s: str) -> str:
    """crypto-js ``MD5(value).toString()`` — md5 of the UTF-8 bytes,
    lowercase hex."""
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def process_row_to_where_clause(
    row: Mapping[str, object], column_map: Mapping[str, Mapping]
) -> str:
    """ref ``processRowToWhereClause`` (useRowWhere.tsx:35-130): one
    ``AND``-joined equality conjunct per row entry, dispatched on the
    column's JS type.  ``column_map`` values carry ``type`` (the CH type
    string), ``js_type`` and ``value_expr``."""
    parts = []
    for column, value in row.items():
        cm = column_map.get(column)
        ch_type = cm.get("type") if cm else None
        js_type = cm.get("js_type") if cm else None
        value_expr = cm.get("value_expr") if cm else None

        if ch_type is None:
            raise ValueError(
                f"Column type not found for {column}, {dict(column_map)!r}"
            )
        if value_expr is None:
            raise ValueError(
                f"valueExpr not found for {column}, {dict(column_map)!r}"
            )

        # Nullish values for all types uniformly (tsx:58-60)
        if value is None:
            parts.append(f"isNull({value_expr})")
            continue

        if js_type == "date":
            parts.append(
                f"{value_expr}=parseDateTime64BestEffort("
                f"{sqlstring_escape(value)}, 9)"
            )
        elif js_type in ("array", "map"):
            parts.append(
                f"{value_expr}=JSONExtract({sqlstring_escape(value)}, "
                f"{sqlstring_escape(ch_type)})"
            )
        elif js_type == "tuple":
            parts.append(f"toJSONString({value_expr})={sqlstring_escape(value)}")
        elif js_type == "json":
            # whole json object: md5 the rendered text (tsx:82-87)
            parts.append(
                f"lower(hex(MD5(toString({value_expr}))))="
                f"{sqlstring_escape(_md5_hex(str(value)))}"
            )
        elif js_type == "dynamic":
            # json element, ex: json.c — can't distinguish null vs 'null'
            if value == "null":
                parts.append(f"isNull({sqlstring_escape_id(value_expr)})")
            else:
                v = sqlstring_escape(value)
                parts.append(
                    f"toJSONString({value_expr}) = "
                    f"coalesce(toJSONString(JSONExtract({v}, 'Dynamic')), "
                    f"toJSONString({v}))"
                )
        else:
            if isinstance(value, str) and _utf16_len(value) > MAX_STRING_LENGTH:
                # md5 the first 1000 UTF-16 units only — md5 on big
                # payloads blocks the table render (tsx:108-119)
                parts.append(
                    f"lower(hex(MD5(leftUTF8({value_expr}, 1000))))="
                    f"{sqlstring_escape(_md5_hex(_js_substring(value, 1000)))}"
                )
            else:
                parts.append(f"{value_expr}={sqlstring_escape(value)}")
    return " AND ".join(parts)


def alias_map_to_with_clauses(
    alias_map: Optional[Mapping[str, Optional[str]]],
) -> list[tuple[str, str]]:
    """ref ``aliasMapToWithClauses`` (core/utils.ts:1306-1328): alias-map
    entries with a non-empty (post-trim) expression become scalar WITH
    aliases (isSubquery: false) — returned as the ``(name, sql)`` pairs
    ``ChartConfig.with_aliases`` takes."""
    if not alias_map:
        return []
    return [
        (name, expr)
        for name, expr in alias_map.items()
        if expr is not None and expr.strip() != ""
    ]


def row_where(
    meta: Optional[Sequence[Mapping]] = None,
    alias_map: Optional[Mapping[str, Optional[str]]] = None,
    primary_key_columns: Optional[set] = None,
) -> Callable[[Mapping], dict]:
    """ref ``useRowWhere`` (useRowWhere.tsx:135-195): build the column map
    once (valueExpr = alias-map expression when provided, else the column
    name; js_type classified from the CH type string) and return a
    row → ``{"where", "alias_with"}`` callable.

    ``primary_key_columns`` restricts the WHERE to PK/partition/block
    columns — filtering on large columns like Body triggers expensive
    index loading (tsx:176-183); expression-valued PK entries that match
    no row key are silently skipped.
    """
    column_map = {}
    for c in meta or []:
        name = c["name"]
        if alias_map is not None:
            value_expr = alias_map.get(name)
            if value_expr is None:
                value_expr = name
        else:
            value_expr = name
        column_map[name] = {
            **c,
            "value_expr": value_expr,
            "js_type": convert_ch_data_type_to_js_type(c["type"]),
        }
    alias_with = alias_map_to_with_clauses(alias_map)

    def build(row: Mapping) -> dict:
        db_row = {
            k: v
            for k, v in row.items()
            if k not in (INTERNAL_ROW_FIELDS["ID"], INTERNAL_ROW_FIELDS["ALIAS_WITH"])
        }
        if primary_key_columns is not None:
            db_row = {k: v for k, v in db_row.items() if k in primary_key_columns}
        return {
            "where": process_row_to_where_clause(db_row, column_map),
            "alias_with": alias_with,
        }

    return build
