"""Select-alias extraction from raw SQL.

Parity target: ``packages/common-utils/src/clickhouse/index.ts`` —
``chSqlToAliasMap`` (:1118-1160) with the ``extractOuterSelectProjection``
fallback (:1032-1115). The alias map feeds the Event-Patterns alias
threading (``ChartConfig.with_aliases``): the Patterns view rebuilds its
SELECT, so a filter naming an alias the source's select defines only
resolves when that alias's definition is carried along.

The reference runs the statement through node-sql-parser and, when the full
statement is unparseable (ClickHouse-specific casts in a sampling CTE),
re-parses just the outer projection. Here the projection scanner IS the
parser: a quote/comment/paren-aware walk finds the top-level
``SELECT ... FROM`` span, splits it on top-level commas, and records every
``expr AS alias`` pair — which is exactly the subset the alias map needs.
Anything unparseable yields ``{}`` (same degrade as the reference).
"""

from __future__ import annotations

import re
from typing import Optional


def extract_outer_select_projection(sql: str) -> Optional[str]:
    """Text between the top-level SELECT and its FROM (clickhouse/index.ts:
    1032-1115): leading WITH/CTE clauses and nested subqueries are skipped
    because their SELECT/FROM keywords sit inside parentheses; string
    literals, quoted identifiers and SQL comments are opaque. ``None`` when
    no top-level SELECT...FROM is found."""
    depth = 0
    i = 0
    proj_start = -1
    n = len(sql)

    def word_char(c: Optional[str]) -> bool:
        return c is not None and re.match(r"[A-Za-z0-9_]", c) is not None

    def keyword_at(idx: int, kw: str) -> bool:
        if sql[idx : idx + len(kw)].upper() != kw:
            return False
        before = sql[idx - 1] if idx > 0 else None
        after = sql[idx + len(kw)] if idx + len(kw) < n else None
        return not word_char(before) and not word_char(after)

    while i < n:
        c = sql[i]
        if c == "'" or c == '"' or c == "`":
            close = sql.find(c, i + 1)
            if close == -1:
                break
            i = close + 1
            continue
        if c == "-" and sql[i + 1 : i + 2] == "-":
            nl = sql.find("\n", i + 2)
            if nl == -1:
                break
            i = nl + 1
            continue
        if c == "/" and sql[i + 1 : i + 2] == "*":
            end = sql.find("*/", i + 2)
            if end == -1:
                break
            i = end + 2
            continue
        if c == "(":
            depth += 1
            i += 1
            continue
        if c == ")":
            depth -= 1
            i += 1
            continue
        if depth != 0:
            i += 1
            continue
        if proj_start == -1:
            if keyword_at(i, "SELECT"):
                proj_start = i + len("SELECT")
                i = proj_start
                continue
        elif keyword_at(i, "FROM"):
            return sql[proj_start:i].strip()
        i += 1
    return None


def _strip_comments(s: str) -> str:
    """Remove -- line and /* block */ comments (quote-aware) — the parsed
    expressions the reference records are comment-free."""
    out: list[str] = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c in "'\"`":
            close = s.find(c, i + 1)
            close = n - 1 if close == -1 else close
            out.append(s[i : close + 1])
            i = close + 1
            continue
        if c == "-" and s[i + 1 : i + 2] == "-":
            nl = s.find("\n", i + 2)
            i = n if nl == -1 else nl + 1
            continue
        if c == "/" and s[i + 1 : i + 2] == "*":
            end = s.find("*/", i + 2)
            i = n if end == -1 else end + 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _split_top_level_commas(s: str) -> list[str]:
    parts: list[str] = []
    depth = 0
    cur: list[str] = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c in "'\"`":
            close = s.find(c, i + 1)
            close = n - 1 if close == -1 else close
            cur.append(s[i : close + 1])
            i = close + 1
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    if "".join(cur).strip():
        parts.append("".join(cur).strip())
    return parts


def _split_trailing_alias(item: str) -> Optional[tuple[str, str]]:
    """(expr, alias) when *item* ends in a top-level ``AS alias``; None for
    a bare column/expression (only explicit aliases enter the map)."""
    depth = 0
    last_as = -1
    i = 0
    n = len(item)
    while i < n:
        c = item[i]
        if c in "'\"`":
            close = item.find(c, i + 1)
            i = (n if close == -1 else close) + 1
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif depth == 0 and item[i : i + 2].upper() == "AS":
            before = item[i - 1] if i > 0 else " "
            after = item[i + 2] if i + 2 < n else " "
            if not re.match(r"[A-Za-z0-9_]", before) and not re.match(
                r"[A-Za-z0-9_]", after
            ):
                last_as = i
        i += 1
    if last_as == -1:
        return None
    expr = item[:last_as].strip()
    alias = item[last_as + 2 :].strip()
    # alias must be a single (possibly quoted) identifier
    m = re.fullmatch(r"`([^`]+)`|\"([^\"]+)\"|([A-Za-z_][A-Za-z0-9_]*)", alias)
    if not m or not expr:
        return None
    return expr, next(g for g in m.groups() if g is not None)


def sql_to_alias_map(sql: Optional[str]) -> dict[str, str]:
    """alias -> defining expression for every explicit ``expr AS alias`` in
    the outer SELECT projection (chSqlToAliasMap). Unparseable input yields
    ``{}`` — the alias map is best-effort by design."""
    if not sql or not sql.strip():
        return {}
    projection = extract_outer_select_projection(sql)
    if projection is None:
        return {}
    projection = _strip_comments(projection).strip()
    out: dict[str, str] = {}
    for item in _split_top_level_commas(projection):
        pair = _split_trailing_alias(item)
        if pair is not None:
            out[pair[1]] = pair[0]
    return out


def alias_map_to_with_aliases(alias_map: dict[str, str]) -> list[tuple[str, str]]:
    """Alias map -> ``ChartConfig.with_aliases`` entries (the reference's
    aliasMapToWith, core/utils.ts:1302) — scalar expression aliases the
    compiler projects before filters so alias-referencing filters resolve."""
    return [(name, expr) for name, expr in alias_map.items()]
