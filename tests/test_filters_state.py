"""FilterState -> SQL predicate (filters.ts:44-141 parity): pure rendering
cases ported from filters.test.ts, plus an end-to-end compile check where the
emitted conditions ride the normal WHERE assembly, DuckDB-oracled."""

from datetime import datetime

import duckdb

from hyperdx_spark.compile import compile_chart_config
from hyperdx_spark.filters import (
    FilterSelection,
    filter_state_to_predicate,
    filters_to_query,
)
from hyperdx_spark.model import ChartConfig, SelectCol, Source


def test_empty_and_blank_selections_emit_nothing():
    assert filters_to_query({}) == []
    assert filters_to_query({"svc": FilterSelection()}) == []
    assert filter_state_to_predicate({"svc": FilterSelection()}) is None


def test_included_excluded_range_conditions():
    state = {
        "svc": FilterSelection(included={"api", "web"}, excluded={"dbg"}),
        "lvl": FilterSelection(range=(1.0, 5.0)),
    }
    conds = [f.condition for f in filters_to_query(state)]
    assert conds == [
        "svc IN ('api', 'web')",  # sorted for plan determinism
        "svc NOT IN ('dbg')",
        "lvl BETWEEN 1.0 AND 5.0",
    ]
    assert all(f.type == "sql" for f in filters_to_query(state))


def test_escaping_booleans_and_stringify_keys():
    state = {"k": FilterSelection(included={"o'brien", True})}
    conds = [f.condition for f in filters_to_query(state)]
    assert conds == ["k IN (TRUE, 'o\\'brien')"]  # bools sort first
    conds = [f.condition for f in filters_to_query(state, stringify_keys=True)]
    assert conds == ["CAST(k AS STRING) IN (TRUE, 'o\\'brien')"]


def test_datetime_column_wrapping():
    state = {"ts": FilterSelection(included={"2024-01-02 03:04:05"})}
    conds = [
        f.condition
        for f in filters_to_query(state, datetime_columns={"ts": "DateTime64(3)"})
    ]
    assert conds == ["ts IN (to_timestamp('2024-01-02 03:04:05'))"]
    conds = [
        f.condition
        for f in filters_to_query(state, datetime_columns={"ts": "Date"})
    ]
    assert conds == ["ts IN (to_date('2024-01-02 03:04:05'))"]
    # stringify_keys disables the wrapper (filters.ts: rendered JSON paths
    # already carry a type suffix)
    conds = [
        f.condition
        for f in filters_to_query(
            state, stringify_keys=True, datetime_columns={"ts": "Date"}
        )
    ]
    assert conds == ["CAST(ts AS STRING) IN ('2024-01-02 03:04:05')"]


def test_predicate_join_and_key_render():
    state = {
        "b": FilterSelection(included={"x"}),
        "a": FilterSelection(excluded={"y"}),
    }
    pred = filter_state_to_predicate(state, lambda k: f"m['{k}']")
    assert pred == "(m['b'] IN ('x')) AND (m['a'] NOT IN ('y'))"


def test_filter_state_rides_compile_where(spark, sf_dir):
    src = Source(table="events", timestamp_value_expression="ts")
    state = {
        "event_type": FilterSelection(included={"view", "click"}, excluded={"error"}),
        "value": FilterSelection(range=(10.0, 90.0)),
    }
    cfg = ChartConfig(
        source=src,
        select=[SelectCol(agg_fn="count", alias="cnt")],
        filters=filters_to_query(state),
        group_by=["event_type"],
        date_range=(datetime(2024, 1, 1), datetime(2024, 2, 1)),
    )
    df = compile_chart_config(spark, cfg, sf_dir=sf_dir)
    got = {(r["event_type"], r["cnt"]) for r in df.collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = set(
        con.execute(
            """
            SELECT event_type, count(*) FROM events
            WHERE ts >= TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2024-02-01'
              AND event_type IN ('click', 'view')
              AND event_type NOT IN ('error')
              AND value BETWEEN 10.0 AND 90.0
            GROUP BY 1
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


# ---- parseQuery / pinned-filter inversion (filters.test.ts:728-830) ---------

from hyperdx_spark.filters import (  # noqa: E402
    is_renderable_pinned_filter,
    parse_query,
    serialize_filter_state,
    validate_dashboard_filter_queries,
    validate_saved_filter_values,
    validate_saved_query,
)
from hyperdx_spark.model import SqlAstFilter, SqlFilter  # noqa: E402


def test_parse_query_numeric_between():
    state = parse_query([SqlFilter(condition="value BETWEEN 1 AND 2.5")])
    assert state["value"].range == (1.0, 2.5)
    assert not state["value"].included and not state["value"].excluded


def test_parse_query_drops_non_numeric_between():
    # quoted / date operands -> no NaN range emitted
    state = parse_query(
        [SqlFilter(condition="d BETWEEN '2024-01-01' AND '2024-02-01'")]
    )
    assert state == {}


def test_parse_query_drops_compound_between():
    # the greedy regex would swallow "2 AND other IN ('x')" as the max bound;
    # entirely-numeric bounds reject it instead of emitting a broken range
    state = parse_query(
        [SqlFilter(condition="v BETWEEN 1 AND 2 AND other IN ('x')")]
    )
    assert "v" not in state


def test_parse_query_extracts_in_clauses_from_compound():
    state = parse_query(
        [SqlFilter(condition="a IN ('x', 'y') AND b NOT IN ('z') AND c = 1")]
    )
    assert state["a"].included == {"x", "y"}
    assert state["b"].excluded == {"z"}
    assert "c" not in state  # comparison operators skipped


def test_parse_query_ignores_non_sql_filters():
    assert parse_query([SqlFilter(condition="a:x", type="lucene")]) == {}
    assert (
        parse_query([SqlAstFilter(operator="=", left="a", right="x")]) == {}
    )


def test_parse_query_round_trips_escaped_values():
    # values with quotes/backslashes survive emit -> parse exactly
    vals = {"o'brien", "back\\slash", "it's \\' mixed", "plain", True}
    emitted = filters_to_query({"col": FilterSelection(included=set(vals))})
    assert len(emitted) == 1
    state = parse_query(emitted)
    assert state["col"].included == vals


def test_parse_query_unwraps_date_values():
    dt = {"col": "DateTime64(9)"}
    emitted = filters_to_query(
        {"col": FilterSelection(included={"2024-01-01 00:00:00"})},
        datetime_columns=dt,
    )
    state = parse_query(emitted)
    assert state["col"].included == {"2024-01-01 00:00:00"}


def test_is_renderable_accepts_exactly_what_filters_to_query_emits():
    for sel in (
        FilterSelection(included={"x", "o'brien"}),
        FilterSelection(excluded={"y"}),
        FilterSelection(range=(1.0, 2.0)),
    ):
        for f in filters_to_query({"col": sel}):
            assert is_renderable_pinned_filter(f), f.condition


def test_is_renderable_rejects_divergent_shapes():
    # compound: the IN facet would display while AND foo = 1 still executes
    assert not is_renderable_pinned_filter(
        SqlFilter(condition="col IN ('x') AND foo = 1")
    )
    # inverted BETWEEN: key captures 'col NOT' -> displayed facet inverts
    assert not is_renderable_pinned_filter(
        SqlFilter(condition="col NOT BETWEEN 1 AND 2")
    )
    # two clauses on one column
    assert not is_renderable_pinned_filter(
        SqlFilter(condition="col IN ('x') AND col NOT IN ('y')")
    )
    # non-sql shapes
    assert not is_renderable_pinned_filter(SqlFilter(condition="a:x", type="lucene"))
    assert not is_renderable_pinned_filter(
        SqlAstFilter(operator="=", left="a", right="x")
    )


def test_serialize_filter_state():
    a = {"colA": FilterSelection(included={"x"})}
    b = {"colA": FilterSelection(included={"y"})}
    assert serialize_filter_state(a) != serialize_filter_state(b)
    # include vs exclude differ
    assert serialize_filter_state(
        {"colA": FilterSelection(included={"x"})}
    ) != serialize_filter_state({"colA": FilterSelection(excluded={"x"})})
    # stable across key/member order
    assert serialize_filter_state(
        {"colA": FilterSelection(included={"x", "y"}),
         "colB": FilterSelection(included={"z"})}
    ) == serialize_filter_state(
        {"colB": FilterSelection(included={"z"}),
         "colA": FilterSelection(included={"y", "x"})}
    )
    # range bounds included
    assert serialize_filter_state(
        {"colA": FilterSelection(range=(1.0, 2.0))}
    ) != serialize_filter_state({"colA": FilterSelection(range=(1.0, 3.0))})


# ---- saved-filter / saved-query validation (filters.test.ts:476-727) --------


def test_validate_saved_filter_values():
    assert validate_saved_filter_values([]) == []
    assert validate_saved_filter_values(["level:error"]) == []
    assert validate_saved_filter_values(["level:(error OR warn)"]) == []
    assert validate_saved_filter_values(["attrs.k:v"]) == []
    assert validate_saved_filter_values(["col IN ('a', 'b')"], "sql") == []
    assert validate_saved_filter_values(["m['k'] = 'v'"], "sql") == []
    assert validate_saved_filter_values(["", "   "]) == []  # no-ops
    bad = validate_saved_filter_values(['level:"unclosed'])
    assert bad == [
        {"index": 0, "language": "lucene", "condition": 'level:"unclosed'}
    ]
    assert validate_saved_filter_values(["col IN IN"], "sql") == [
        {"index": 0, "language": "sql", "condition": "col IN IN"}
    ]
    mixed = validate_saved_filter_values(
        ["level:error", 'bad:"x', "ok:y", 'worse:"z'], "lucene"
    )
    assert [i["index"] for i in mixed] == [1, 3]


def test_validate_saved_query():
    assert validate_saved_query(None) is None
    assert validate_saved_query("") is None
    assert validate_saved_query("level:error") is None
    assert validate_saved_query("col = 'x'", "sql") is None
    assert validate_saved_query("level:error")  is None
    assert validate_saved_query("up == 1", "promql") is None  # not validated
    assert validate_saved_query('level:"unclosed') == {
        "language": "lucene", "condition": 'level:"unclosed'
    }
    # missing language defaults to lucene
    assert validate_saved_query('a:"b') is not None


def test_validate_dashboard_filter_queries():
    assert validate_dashboard_filter_queries([]) == []
    ok = [
        {"where": None},
        {"where": "   ", "whereLanguage": "lucene"},
        {"where": "level:error", "whereLanguage": "lucene"},
        {"where": "col = 1", "whereLanguage": "sql"},
    ]
    assert validate_dashboard_filter_queries(ok) == []
    mixed = ok + [
        {"where": 'level:"x', "whereLanguage": "lucene"},
        {"where": "col = = 1", "whereLanguage": "sql"},
    ]
    issues = validate_dashboard_filter_queries(mixed)
    assert [i["index"] for i in issues] == [4, 5]


# ---- property fuzz: emit -> parse -> emit is a fixed point -------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_vals = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    min_size=1,
    max_size=12,
).filter(lambda s: s.strip())


@settings(max_examples=150, deadline=None)
@given(
    included=st.sets(_vals, max_size=4),
    excluded=st.sets(_vals, max_size=3),
    rng=st.one_of(
        st.none(),
        st.tuples(
            st.floats(-1e6, 1e6, allow_nan=False),
            st.floats(-1e6, 1e6, allow_nan=False),
        ),
    ),
)
def test_filters_round_trip_fixed_point(included, excluded, rng):
    """filters_to_query -> parse_query recovers the exact selection (values
    with quotes/backslashes included), and re-emitting yields identical SQL
    — the sidebar's display always matches the executed predicate."""
    sel = FilterSelection(included=set(included), excluded=set(excluded), range=rng)
    if not (sel.included or sel.excluded or sel.range is not None):
        return
    emitted = filters_to_query({"col": sel})
    state = parse_query(emitted)
    assert state["col"].included == sel.included
    assert state["col"].excluded == sel.excluded
    if rng is not None:
        assert state["col"].range == (rng[0], rng[1])
    re_emitted = filters_to_query(
        {"col": FilterSelection(**{
            "included": state["col"].included,
            "excluded": state["col"].excluded,
            "range": state["col"].range,
        })}
    )
    assert [f.condition for f in re_emitted] == [f.condition for f in emitted]
    # every emitted single clause is a renderable pinned filter
    for f in emitted:
        assert is_renderable_pinned_filter(f), f.condition


def test_serialize_distinguishes_bool_from_string():
    # r10 review fix: True and 'true' emit different predicates
    # (IN (TRUE) vs IN ('true')) so they must not share a cache key
    assert serialize_filter_state(
        {"c": FilterSelection(included={True})}
    ) != serialize_filter_state({"c": FilterSelection(included={"true"})})


def test_parse_query_compound_between_short_circuits():
    """Reference-faithful wart (parseQuery, filters.ts:440-470): a compound
    condition CONTAINING a BETWEEN short-circuits the whole condition (the
    regex key swallows the leading clauses); is_renderable_pinned_filter
    rejects such filters so the divergent facet never renders."""
    f = SqlFilter(condition="a IN ('x') AND v BETWEEN 1 AND 2")
    state = parse_query([f])
    assert "a" not in state  # the IN clause is NOT extracted (as reference)
    assert not is_renderable_pinned_filter(f)


def test_validator_survives_trailing_escaped_backslash():
    """r12 review finding: a literal ending in an escaped backslash (a
    Windows path) must still validate — \\\\ is consumed before \\' so the
    closing quote survives normalization."""
    from hyperdx_spark.filters import is_valid_filter_condition

    assert is_valid_filter_condition("col = 'C:\\\\'", "sql")
    assert is_valid_filter_condition("col = 'O\\'Brien'", "sql")
    assert is_valid_filter_condition("col = 'a\\\\b\\'c'", "sql")
    assert not is_valid_filter_condition("col = 'unterminated", "sql")


def test_dashboard_filter_constraints_and_grouping():
    """useDashboardFilterValues.tsx: a facet's own selection never narrows
    its own options; only ACTIVE sibling selections on the same
    (source, metricType) constrain; batch groups key on
    (source, metricType, where, whereLanguage)."""
    from hyperdx_spark.filters import (
        FilterSelection,
        dashboard_filter_constraints,
        group_filters_for_key_values,
    )

    filters = [
        {"id": "f1", "source": "s1", "source_metric_type": None,
         "expression": "service"},
        {"id": "f2", "source": "s1", "source_metric_type": None,
         "expression": "level"},
        {"id": "f3", "source": "s2", "source_metric_type": None,
         "expression": "region"},
    ]
    values = {
        "service": FilterSelection(included={"api"}),
        "level": FilterSelection(),               # inactive: no constraint
        "region": FilterSelection(excluded={"eu"}),
    }
    c = dashboard_filter_constraints(filters, values)
    # f1 is constrained by nothing (its own selection excluded; level is
    # inactive); f2 by f1's service selection; f3 by nothing (other source)
    assert c["f1"] is None
    assert set(c["f2"]) == {"service"}
    assert c["f3"] is None
    # a range counts as active
    values["level"] = FilterSelection(range=(1.0, 5.0))
    c = dashboard_filter_constraints(filters, values)
    assert set(c["f1"]) == {"level"}

    groups = group_filters_for_key_values(
        filters + [{"id": "f4", "source": "s1", "source_metric_type": None,
                    "expression": "host", "where": "env:prod",
                    "where_language": "lucene"}]
    )
    assert [[f["id"] for f in g] for g in groups] == [
        ["f1", "f2"], ["f3"], ["f4"],
    ]
