"""Materialized-column substitution (fastifySQL analogue).

The reference rewrites map/JSON accessor expressions to pre-materialized
physical columns by walking the SQL AST of SELECT and WHERE
(``core/renderChartConfig.ts:209-341`` ``fastifySQL``; the column lookup is
``core/metadata.ts:514-539``). On Spark the payoff is larger than on
ClickHouse: a physical column has its own parquet chunk with min/max stats
and dictionary encoding, so a substituted predicate reaches ``PushedFilters``
and prunes row groups, while ``get_json_object(props, ...)`` forces reading
and parsing the whole JSON blob for every row — at 100 TB that is the
difference between a stats-pruned scan of one narrow column and a full-blob
parse.

``Source.materialized_fields`` maps *logical accessors* to physical column
names. Keys may be written in any supported spelling — they are canonicalized
before matching:

* ``props.k``                          (Lucene dot-path)
* ``props['k']``                       (map/JSON subscript)
* ``JSONExtractString(props, 'k')``    (ClickHouse idiom)
* ``get_json_object(props, '$.k')``    (Spark idiom)

Substitution applies to raw-SQL expressions (select / where / group / order /
filters) via :func:`substitute`, and to Lucene field resolution via
:func:`lookup` in the serializer.
"""

from __future__ import annotations

import re
from typing import Mapping, Optional

_GJO_RE = re.compile(r"get_json_object\(\s*`?(\w+)`?\s*,\s*'\$\.([^']+)'\s*\)")
_ELEM_RE = re.compile(r"element_at\(\s*`?(\w+)`?\s*,\s*'([^']+)'\s*\)")
_SUBSCRIPT_RE = re.compile(r"`?(\w+)`?\[\s*'([^']+)'\s*\]")
_DOTPATH_RE = re.compile(r"\w+(?:\.\w+)+")

# chcompat's JSONExtract* rewrites wrap get_json_object in the CH
# missing-key default (if(col IS NULL, NULL, coalesce(..., '' | 0 | 0.0)))
# — match the WHOLE wrapper so substitution removes every reference to the
# JSON blob, not just the inner accessor (column pruning depends on it)
_GJO_STR_WRAP_RE = re.compile(
    r"if\(\s*`?(?:\w+)`?\s+IS\s+NULL\s*,\s*NULL\s*,\s*coalesce\(\s*"
    r"get_json_object\(\s*`?(\w+)`?\s*,\s*'\$\.([^']+)'\s*\)\s*,\s*''\s*\)\s*\)"
)
_GJO_INT_WRAP_RE = re.compile(
    r"if\(\s*`?(?:\w+)`?\s+IS\s+NULL\s*,\s*NULL\s*,\s*coalesce\(\s*try_cast\(\s*"
    r"get_json_object\(\s*`?(\w+)`?\s*,\s*'\$\.([^']+)'\s*\)\s+AS\s+BIGINT\s*\)"
    r"\s*,\s*0\s*\)\s*\)"
)
_GJO_FLT_WRAP_RE = re.compile(
    r"if\(\s*`?(?:\w+)`?\s+IS\s+NULL\s*,\s*NULL\s*,\s*coalesce\(\s*try_cast\(\s*"
    r"get_json_object\(\s*`?(\w+)`?\s*,\s*'\$\.([^']+)'\s*\)\s+AS\s+DOUBLE\s*\)"
    r"\s*,\s*0\.0\s*\)\s*\)"
)

_ACCESSOR_RES = (
    _GJO_STR_WRAP_RE,
    _GJO_INT_WRAP_RE,
    _GJO_FLT_WRAP_RE,
    _GJO_RE,
    _ELEM_RE,
    _SUBSCRIPT_RE,
)


def canonical_key(key: str) -> str:
    """Normalize one accessor spelling to the canonical ``col.path`` form."""
    from hyperdx_spark.functions.chcompat import translate_expr

    k = translate_expr(key.strip())
    for pat in _ACCESSOR_RES:
        m = pat.fullmatch(k)
        if m:
            return f"{m.group(1)}.{m.group(2)}"
    if _DOTPATH_RE.fullmatch(k):
        return k
    return k


def normalize_mapping(mapping: Mapping[str, str]) -> dict[str, str]:
    return {canonical_key(k): v for k, v in mapping.items()}


def lookup(mapping: Mapping[str, str], col: str, path: str) -> Optional[str]:
    """Physical column for accessor ``col.path``, or None."""
    if not mapping:
        return None
    return normalize_mapping(mapping).get(f"{col}.{path}")


def substitute(expr: str, mapping: Mapping[str, str]) -> str:
    """Replace materialized accessors inside a (translated) SQL expression
    with their physical columns. Unmatched accessors are left untouched."""
    if not mapping or not expr:
        return expr
    norm = normalize_mapping(mapping)

    def repl(m: re.Match) -> str:
        phys = norm.get(f"{m.group(1)}.{m.group(2)}")
        return f"`{phys}`" if phys else m.group(0)

    for pat in _ACCESSOR_RES:
        expr = pat.sub(repl, expr)
    return expr
