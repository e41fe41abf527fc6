"""Dashboard filter-state → SQL predicates.

Reference: ``packages/common-utils/src/filters.ts:44-141``. A ``FilterState``
is the UI's per-field selection model — a set of *included* values, a set of
*excluded* values, and an optional numeric *range* — fanned into every tile's
``filters`` array as plain SQL conditions:

* included  → ``key IN ('a', 'b')``
* excluded  → ``key NOT IN ('c')``
* range     → ``key BETWEEN min AND max``

Divergences from the reference, by design:

* values render **sorted** (the reference emits JS ``Set`` insertion order) so
  the generated SQL — and therefore the compiled plan — is deterministic;
* DateTime-typed columns wrap values in Spark ``to_timestamp``/``to_date``
  instead of ClickHouse ``parseDateTime*BestEffort`` (filters.ts
  ``dateTimeValueExpr``);
* ``stringifyKeys`` wraps the key in ``CAST(key AS STRING)`` rather than
  ClickHouse ``toString`` (same intent: compare Dynamic/JSON keys textually).

The emitted conditions are ordinary :class:`hyperdx_spark.model.SqlFilter`
rows, so they ride the existing WHERE assembly (`compile._where_clauses`) and
reach the parquet scan as pushed predicates — an IN-list over a partition or
stats-indexed column prunes files/row-groups at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Mapping, Optional, Union

from hyperdx_spark.lucene.serializer import _sql_str
from hyperdx_spark.model import SqlFilter

Value = Union[str, bool]


@dataclass
class FilterSelection:
    """One field's selection (filters.ts FilterState values)."""

    included: set[Value] = field(default_factory=set)
    excluded: set[Value] = field(default_factory=set)
    range: Optional[tuple[float, float]] = None  # numeric (min, max)


FilterState = Mapping[str, FilterSelection]


def _fmt_value(v: Value, dt_type: Optional[str]) -> str:
    """Render one literal; DateTime/Date columns get a parse wrapper so the
    comparison is typed (filters.ts dateTimeValueExpr analogue)."""
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    lit = _sql_str(v)
    if dt_type is None:
        return lit
    if dt_type.lower().startswith("date") and "time" not in dt_type.lower():
        return f"to_date({lit})"
    return f"to_timestamp({lit})"


def _sorted(values: set[Value]) -> list[Value]:
    # stable output: bools first (False < True), then strings sorted
    return sorted(values, key=lambda v: (isinstance(v, str), v))


def filters_to_query(
    state: FilterState,
    *,
    stringify_keys: bool = False,
    datetime_columns: Optional[Mapping[str, str]] = None,
) -> list[SqlFilter]:
    """FilterState → list of SqlFilter conditions (filters.ts:44-102).

    Fields with nothing selected emit nothing; a field with included,
    excluded AND range selections emits up to three conditions (the WHERE
    assembly ANDs them, same as the reference's filters array).
    """
    out: list[SqlFilter] = []
    for key, sel in state.items():
        if not (sel.included or sel.excluded or sel.range is not None):
            continue
        actual_key = f"CAST({key} AS STRING)" if stringify_keys else key
        dt_type = None if stringify_keys else (datetime_columns or {}).get(key)
        if sel.included:
            vals = ", ".join(_fmt_value(v, dt_type) for v in _sorted(sel.included))
            out.append(SqlFilter(condition=f"{actual_key} IN ({vals})"))
        if sel.excluded:
            vals = ", ".join(_fmt_value(v, dt_type) for v in _sorted(sel.excluded))
            out.append(SqlFilter(condition=f"{actual_key} NOT IN ({vals})"))
        if sel.range is not None:
            lo, hi = sel.range
            out.append(SqlFilter(condition=f"{actual_key} BETWEEN {lo!r} AND {hi!r}"))
    return out


def filter_state_to_predicate(
    state: FilterState,
    render_key: Callable[[str], str] = lambda k: k,
) -> Optional[str]:
    """Single AND-joined predicate with keys remapped through ``render_key``
    (filters.ts:103-131); ``None`` when nothing is selected, so callers can
    branch on constrained-vs-unconstrained without string inspection."""
    rendered = {render_key(k): sel for k, sel in state.items()}
    conditions = [f.condition for f in filters_to_query(rendered)]
    if not conditions:
        return None
    return " AND ".join(f"({c})" for c in conditions)
