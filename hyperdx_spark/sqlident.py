"""Shared SQL identifier quoting for the SQL-text expression builders.

The r16 SQL-text builders (metrics.py, promql.py, dedup.py) each carried a
naive ``lambda c: f"`{c}`"``: a column/series/label name containing a
backtick would yield a malformed — or worse, semantics-altering — parsed
expression, where the former Column API handled such names safely
(r16 ADVICE #3). Spark's parser unescapes a doubled backtick inside a
quoted identifier, so ``a`b`` must be emitted as ``` `a``b` ```.
"""

from __future__ import annotations


def sql_ident(name: str) -> str:
    """Backtick-quote *name* for Spark SQL text, escaping embedded
    backticks — the textual equivalent of ``F.col(name)`` for any name."""
    return "`" + str(name).replace("`", "``") + "`"
