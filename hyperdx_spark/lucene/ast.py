"""Lucene AST node types.

Shape mirrors the @hyperdx/lucene parse tree the reference walks in
``queryParser.ts:2062-2116`` (left/operator/right nodes, term nodes with
field/quoted/prefix attributes), simplified to what the serializer needs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal, Optional, Union


@dataclass
class Term:
    """field:value leaf. field=None means implicit (full-text) column."""

    value: str
    field: Optional[str] = None
    quoted: bool = False
    # comparison prefix: one of '>', '>=', '<', '<=' or None
    prefix: Optional[str] = None
    negated: bool = False  # '-term' / NOT
    # True when the field arrived via grouped syntax f:(...) — the
    # reference's lucene AST keeps such terms <implicit>, so the quoted-
    # exact-equality shortcut (queryParser.ts:1962-1966) never fires for
    # them: f:("x y") is a substring search, f:"x y" is exact equality
    grouped: bool = False


@dataclass
class Range:
    """[a TO b] / {a TO b} with per-end inclusivity; '*' = unbounded."""

    field: Optional[str]
    low: str
    high: str
    include_low: bool = True
    include_high: bool = True
    negated: bool = False


@dataclass
class BoolOp:
    op: Literal["AND", "OR"]
    left: "Node"
    right: "Node"


@dataclass
class Not:
    child: "Node"


@dataclass
class Group:
    """Parenthesized query; when attached to a field, inner implicit terms
    inherit that field (queryParser.ts:2035-2055)."""

    child: "Node"
    field: Optional[str] = None
    negated: bool = False


@dataclass
class MatchAll:
    """Empty query -> TRUE."""


Node = Union[Term, Range, BoolOp, Not, Group, MatchAll]
