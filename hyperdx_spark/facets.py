"""Facet-panel key plumbing: the app's "Add to Filters" / search-filters
surface (packages/app/src/components/DBSearchPageFilters/utils.ts,
DBRowJsonViewer.tsx buildJSONExtractQuery, searchFilters.tsx
escapeFilterStateKeys, app utils.ts mergePath, core/metadata.ts
parseKeyPath).

A facet key can arrive in several spellings of the same logical field —
dot form ``LogAttributes.time`` (URL round-trips, setFilterValue), bracket
form ``LogAttributes['time']`` (facet discovery SQL), backtick JSON paths,
``toString(...)`` wrappers, or raw ``JSONExtract*`` function calls built by
the parsed-JSON viewer (HDX-4427). These helpers normalize between the
spellings and coerce keys into valid SQL expressions before they hit
``filters.filters_to_query``. Pure string functions — the distributed side
is untouched; this is the last mile between UI state and the WHERE clause.
"""

from __future__ import annotations

import re
from typing import Iterable, Mapping, Optional, Sequence

_TOSTRING_RE = re.compile(r"^toString\((.+)\)$")
_BACKTICK_RE = re.compile(r"`([^`]+)`")
_DOT_RE = re.compile(r"^([^.]+)\.(.+)$")
_BARE_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
# a key beginning with `identifier(` is a raw SQL function call
_FN_CALL_RE = re.compile(r"^[A-Za-z_]\w*\(")


def parse_key_path(key: str) -> list[str]:
    """core/metadata.ts:2700-2710 parseKeyPath: ``col['k']`` / ``col["k"]``
    split into [col, k]; anything else is a single segment."""
    i = key.find("['")
    if i != -1 and key.endswith("']"):
        return [key[:i], key[i + 2 : -2]]
    i = key.find('["')
    if i != -1 and key.endswith('"]'):
        return [key[:i], key[i + 2 : -2]]
    return [key]


def _escape_sql_single_quoted(v: str) -> str:
    return v.replace("\\", "\\\\").replace("'", "\\'")


def merge_path(
    path: Sequence[str],
    json_columns: Sequence[str] = (),
    map_columns: Sequence[str] = (),
) -> str:
    """app utils.ts:1152-1188 mergePath: JSON columns take backtick dotted
    segments, Map columns take STRING-key subscripts (a numeric-looking
    sub-key still renders as ``Map['1']`` — HDX-4369), anything else treats
    integer segments as 1-based array indices."""
    key, rest = path[0], list(path[1:])
    if not rest:
        return key
    if key in json_columns:
        segs = []
        for v in rest:
            segs.append(
                ".".join(
                    p if p.startswith("`") and p.endswith("`") else f"`{p}`"
                    for p in v.split(".")
                )
            )
        return f"{key}." + ".".join(segs)
    if key in map_columns:
        return key + "".join(f"['{_escape_sql_single_quoted(v)}']" for v in rest)

    from hyperdx_spark.jsnum import js_number, js_number_str

    def seg(v: str) -> str:
        # JS Number(v) semantics (shared emulation: '1_0' is NaN, not 10)
        n = js_number(v)
        if n is not None and n.is_integer() and n >= 0:
            # ClickHouse arrays are 1-based; flattened data is 0-based.
            # Rendered via String(number) like the JS template literal, so
            # degenerate indices keep JS fidelity ('1e30' -> '[1e+30]',
            # not the exact-integer digit string)
            return f"[{js_number_str(n + 1)}]"
        return f"['{_escape_sql_single_quoted(v)}']"

    return key + "".join(seg(v) for v in rest)


def clean_clickhouse_expression(key: str) -> str:
    """DBSearchPageFilters/utils.ts:10-19: unwrap ``toString(...)`` and
    strip backticks, leaving a clean property path."""
    clean = _TOSTRING_RE.sub(r"\1", key)
    return _BACKTICK_RE.sub(r"\1", clean)


def parse_map_field_name(key: str) -> Optional[tuple[str, str]]:
    """(base name, property path) for a map-like field key, in either
    bracket or dot form (utils.ts:22-47); None for flat keys."""
    clean = clean_clickhouse_expression(key)
    path = parse_key_path(clean)
    if len(path) >= 2:
        return path[0], ".".join(path[1:])
    m = _DOT_RE.match(clean)
    if m:
        return m.group(1), m.group(2)
    return None


def _is_bracket_form(key: str) -> bool:
    return "['" in key or '["' in key


def group_facets_by_base_name(facets: Iterable[Mapping]) -> tuple[list, list]:
    """utils.ts:62-131 groupFacetsByBaseName: facets (dicts with 'key' and
    'value' list) grouped under their map base names; dot-form and
    bracket-form entries for the same (base, propertyPath) collapse into
    ONE child — values merged without duplicates, the bracket-form key kept
    so the child key stays a valid SQL expression. Returns
    (grouped, non_grouped)."""
    grouped: dict[str, dict] = {}
    non_grouped: list = []
    for facet in facets:
        parsed = parse_map_field_name(facet["key"])
        if parsed is None:
            non_grouped.append(dict(facet))
            continue
        base, prop = parsed
        group = grouped.setdefault(
            base, {"key": base, "value": [], "children": []}
        )
        existing = next(
            (c for c in group["children"] if c["propertyPath"] == prop), None
        )
        if existing is not None:
            merged = list(existing["value"])
            for v in facet["value"]:
                if v not in merged:
                    merged.append(v)
            existing["value"] = merged
            if _is_bracket_form(facet["key"]) and not _is_bracket_form(
                existing["key"]
            ):
                existing["key"] = facet["key"]
        else:
            group["children"].append({**dict(facet), "propertyPath": prop})
    return list(grouped.values()), non_grouped


def get_filter_state_entry(filter_state: Mapping, key: str):
    """utils.ts:133-149: look up a FilterState entry by either spelling of
    a map sub-key (bracket form from facet SQL, dot form from URL state)."""
    direct = filter_state.get(key)
    if direct is not None:
        return direct
    parsed = parse_map_field_name(key)
    if parsed is None:
        return None
    base, prop = parsed
    hit = filter_state.get(f"{base}.{prop}")
    if hit is not None:
        return hit
    return filter_state.get(f"{base}['{prop}']")


def to_clickhouse_key_expression(key: str) -> str:
    """utils.ts:168-194 toClickHouseKeyExpression: dot-form Map sub-keys
    become bracket form via mergePath (the base is KNOWN to be a Map, so a
    numeric sub-key stays a string subscript — HDX-4369); bracket form,
    backtick JSON paths, and raw function-call expressions
    (``JSONExtract*``, ``toString(...)`` — HDX-4427) pass through."""
    if (
        "['" in key
        or '["' in key
        or "`" in key
        or _FN_CALL_RE.match(key)
    ):
        return key
    parsed = parse_map_field_name(key)
    if parsed is None:
        return key
    base, prop = parsed
    return merge_path([base, prop], [], [base])


def quote_identifier_if_needed(ident: str) -> str:
    """utils.ts:200-207: backtick-quote unless already a valid bare
    identifier (SqlString.escapeId with forbidQualified — the whole name is
    ONE identifier, internal backticks doubled)."""
    if _BARE_IDENT_RE.match(ident):
        return ident
    return "`" + ident.replace("`", "``") + "`"


def to_quoted_clickhouse_key_expression(
    key: str, known_columns: "set[str]"
) -> str:
    """utils.ts:209-235 toQuotedClickHouseKeyExpression: a whole-key match
    against a real column quotes the entire name as one identifier (flat
    columns with dots in the name); otherwise normalize to bracket form and
    quote only a map ROOT that is a known column."""
    if key in known_columns:
        return quote_identifier_if_needed(key)
    expr = to_clickhouse_key_expression(key)
    if expr.startswith("`") or expr.startswith('"'):
        return expr
    path = parse_key_path(expr)
    if len(path) >= 2 and path[0] in known_columns:
        bracket_start = expr.index("[")
        return quote_identifier_if_needed(path[0]) + expr[bracket_start:]
    return expr


def escape_filter_state_keys(filters: Mapping, known_columns: "set[str]"):
    """searchFilters.tsx:26-35: every FilterState key coerced to a valid
    SQL expression before serialization."""
    return {
        to_quoted_clickhouse_key_expression(k, known_columns): v
        for k, v in filters.items()
    }


def unescape_filter_state_keys(filters: Mapping):
    """searchFilters.tsx:38-44: persisted SQL keys back to clean paths."""
    return {clean_clickhouse_expression(k): v for k, v in filters.items()}


def retain_filters_by_columns(
    filter_state: Mapping, allowed_column_names: "set[str]"
) -> tuple[dict, list[str]]:
    """searchFilters.tsx:281-303 retainFiltersByColumns: on a source
    switch, keep only filters whose ROOT column exists on the new source
    (exact key match first — a flat column with dots in its name — then
    the dot-root); returns (kept, dropped keys) so callers can surface a
    notice for thrown-away state."""
    kept: dict = {}
    dropped: list[str] = []
    for key, value in filter_state.items():
        dot = key.find(".")
        root = key[:dot] if dot > 0 else key
        if key in allowed_column_names or root in allowed_column_names:
            kept[key] = value
        else:
            dropped.append(key)
    return kept, dropped


def build_json_extract_query(
    key_path: Sequence[str],
    parsed_json_root_path: Sequence[str],
    json_columns: Sequence[str] = (),
    json_extract_fn: str = "JSONExtractString",
    map_columns: Sequence[str] = (),
) -> Optional[str]:
    """DBRowJsonViewer.tsx:47-68 buildJSONExtractQuery: the "Add to
    Filters" key for a value inside parsed JSON — the anchor column
    rendered via mergePath (Map anchors keep string subscripts) and the
    nested path spliced as quoted args. None when there is no nested
    path."""
    nested = list(key_path[len(parsed_json_root_path):])
    if not nested:
        return None
    base = merge_path(parsed_json_root_path, json_columns, map_columns)
    args = ", ".join(f"'{p}'" for p in nested)
    return f"{json_extract_fn}({base}, {args})"


def get_field_expression(
    column: str,
    key: str,
    json_columns: Sequence[str] = (),
    convert_fn: str = "toString",
) -> str:
    """app hooks/useFieldExpressionGenerator.tsx:16-47: the SQL accessor
    for a Map or JSON column key — JSON columns render
    ``toString(`col`.`key`)`` (sqlstring ``??.??`` identifier escaping,
    dots qualify), Map columns render ``\\`col\\`['key']`` (``??[?]``).
    The ``convert_fn`` converts a Dynamic JSON field to a concrete type
    (default toString)."""
    from hyperdx_spark.rowwhere import sqlstring_escape, sqlstring_escape_id

    if column in json_columns:
        return (
            f"{convert_fn}({sqlstring_escape_id(column)}."
            f"{sqlstring_escape_id(key)})"
        )
    return f"{sqlstring_escape_id(column)}[{sqlstring_escape(key)}]"
