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
