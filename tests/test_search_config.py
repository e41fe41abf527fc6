"""buildSearchChartConfig assembly (searchChartConfig.ts:48-187 twins)."""

from datetime import datetime

import pytest

from hyperdx_spark.model import ChartConfig, SelectCol, Source, SqlFilter
from hyperdx_spark.search_config import (
    ALERT_COUNT_DEFAULT_SELECT,
    build_search_chart_config,
)

RANGE = (datetime(2024, 1, 1), datetime(2024, 2, 1))


def _log_source(**kw):
    kw.setdefault("table", "events")
    kw.setdefault("kind", "log")
    kw.setdefault("timestamp_value_expression", "ts")
    return Source(**kw)


def test_table_filter_prepended_for_log_sources():
    src = _log_source(table_filter_expression="event_type != 'view'")
    cfg = build_search_chart_config(
        src, filters=[SqlFilter(condition="value > 1", type="sql")]
    )
    assert [f.condition for f in cfg.filters] == [
        "event_type != 'view'",
        "value > 1",
    ]
    # trace sources never carry the filter
    tsrc = Source(table="t", kind="trace",
                  table_filter_expression="x = 1")
    assert build_search_chart_config(tsrc).filters == []


def test_select_resolution_chain():
    src = _log_source(default_table_select_expression="ts, event_type")
    # caller wins
    assert build_search_chart_config(src, select="event_id").select == "event_id"
    sel = [SelectCol(agg_fn="count")]
    assert build_search_chart_config(src, select=sel).select is sel
    # empty string and empty list fall through to the source default
    assert build_search_chart_config(src, select="").select == "ts, event_type"
    assert build_search_chart_config(src, select=[]).select == "ts, event_type"
    # non-log/trace sources get ''
    msrc = Source(table="m", kind="metric",
                  default_table_select_expression="v")
    assert build_search_chart_config(msrc).select == ""


def test_body_fallback_is_logs_only(spark):
    """A trace source's body expression must not serve bare-text search
    (span-name semantics differ — searchChartConfig.ts:152-158)."""
    from hyperdx_spark.lucene.serializer import SearchQueryBuilder

    df = spark.createDataFrame([("hello", "span")], "message string, name string")
    log = _log_source(implicit_column_expression=None, body_expression="message")
    cfg = build_search_chart_config(log, where="hello", where_language="lucene")
    assert SearchQueryBuilder(df.schema, cfg.source).build("hello")

    trace = Source(table="t", kind="trace",
                   implicit_column_expression=None, body_expression="name")
    tcfg = build_search_chart_config(trace, where="hello", where_language="lucene")
    with pytest.raises(ValueError):
        SearchQueryBuilder(df.schema, tcfg.source).build("hello")


def test_alert_default_select_shape():
    (col,) = ALERT_COUNT_DEFAULT_SELECT
    assert col.agg_fn == "count"
    assert col.agg_condition is None
    assert col.agg_condition_language == "sql"
    assert col.value_expression == ""


def test_assembled_config_compiles(spark, sf_dir):
    from hyperdx_spark.compile import compile_chart_config

    src = _log_source(table_filter_expression="event_type != 'view'")
    cfg = build_search_chart_config(
        src,
        select=ALERT_COUNT_DEFAULT_SELECT,
        where="value > 100",
        where_language="sql",
        date_range=RANGE,
        granularity="1 day",
    )
    rows = compile_chart_config(spark, cfg, sf_dir=sf_dir).collect()
    assert len(rows) > 0
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = con.execute(
        "SELECT count(*) FROM events WHERE ts >= TIMESTAMP '2024-01-01'"
        " AND ts <= TIMESTAMP '2024-02-01' AND value > 100"
        " AND event_type != 'view'"
    ).fetchone()[0]
    assert sum(r["count()"] for r in rows) == want
