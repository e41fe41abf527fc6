"""Select-alias extraction — twins of clickhouse.test.ts:150-313
(chSqlToAliasMap + resilient-parsing cases), plus the end-to-end bridge
into ChartConfig.with_aliases."""

from datetime import datetime

from hyperdx_spark.aliasmap import (
    alias_map_to_with_aliases,
    extract_outer_select_projection,
    sql_to_alias_map,
)

SAMPLING_CTE = (
    "WITH tableStats AS (SELECT count() as total,"
    " greatest(CAST(total / 10000 AS UInt32), 1) as sample_factor FROM db.t)"
)
SAMPLING_WHERE = (
    "cityHash64(Timestamp, rand()) %"
    " (SELECT sample_factor FROM tableStats) = 0"
)


def test_no_alias():
    sql = (
        "SELECT Timestamp,TimestampTime,ServiceName,TimestampTime FROM d.t"
        " WHERE (TimestampTime >= x AND TimestampTime <= y)"
        " ORDER BY TimestampTime DESC LIMIT 200 OFFSET 0"
    )
    assert sql_to_alias_map(sql) == {}


def test_normal_aliases():
    sql = (
        "SELECT Timestamp as time,Body as bodyTest,TimestampTime,ServiceName"
        " FROM d.t WHERE x ORDER BY TimestampTime DESC"
    )
    assert sql_to_alias_map(sql) == {"time": "Timestamp", "bodyTest": "Body"}


def test_bracket_aliases():
    sql = (
        "SELECT Timestamp as ts,ResourceAttributes['service.name'] as"
        " serviceTest,Body,TimestampTime FROM d.t WHERE x"
    )
    assert sql_to_alias_map(sql) == {
        "ts": "Timestamp",
        "serviceTest": "ResourceAttributes['service.name']",
    }


def test_json_path_and_expression_aliases():
    sql = (
        "SELECT Timestamp as ts,ResourceAttributes.service.name as service,"
        "toStartOfDay(LogAttributes.start.`time`) as start_time,Body FROM d.t"
        " WHERE (`ResourceAttributes`.`service`.`name` = 'serviceName')"
    )
    assert sql_to_alias_map(sql) == {
        "ts": "Timestamp",
        "service": "ResourceAttributes.service.name",
        "start_time": "toStartOfDay(LogAttributes.start.`time`)",
    }


def test_sampling_cte_recovery():
    # a leading CTE's SELECT/FROM sit inside parens and are skipped
    sql = (
        f"{SAMPLING_CTE} SELECT ServiceName as service, Timestamp as ts"
        f" FROM db.t WHERE {SAMPLING_WHERE} GROUP BY service, ts"
    )
    assert sql_to_alias_map(sql) == {"service": "ServiceName", "ts": "Timestamp"}
    sql = (
        f"{SAMPLING_CTE} SELECT toString(SpanId) as span, ServiceName as"
        f" service FROM db.t WHERE {SAMPLING_WHERE}"
    )
    assert sql_to_alias_map(sql) == {
        "span": "toString(SpanId)",
        "service": "ServiceName",
    }


def test_ignores_keywords_in_literals_and_comments():
    sql = (
        "WITH cte AS (SELECT 'a SELECT b FROM c literal' as lit FROM db.t)"
        " SELECT ServiceName as service FROM db.t"
    )
    assert sql_to_alias_map(sql) == {"service": "ServiceName"}
    sql = (
        f"{SAMPLING_CTE} SELECT /* not a real SELECT ... FROM */ ServiceName"
        " as service, -- trailing SELECT x FROM y\n Timestamp as ts FROM db.t"
    )
    assert sql_to_alias_map(sql) == {"service": "ServiceName", "ts": "Timestamp"}


def test_unparseable_yields_empty():
    assert sql_to_alias_map("NOT VALID SQL AT ALL )(") == {}
    assert sql_to_alias_map("") == {}
    assert sql_to_alias_map(None) == {}
    assert extract_outer_select_projection("WITH x AS (SELECT 1)") is None


def test_alias_is_last_top_level_as():
    # CAST(x AS UInt32) inside the expression must not be mistaken for the
    # column alias
    sql = "SELECT greatest(CAST(total / 10 AS UInt32), 1) as sf FROM t"
    assert sql_to_alias_map(sql) == {"sf": "greatest(CAST(total / 10 AS UInt32), 1)"}
    # bare expr with an embedded AS inside parens and NO alias -> skipped
    sql = "SELECT greatest(CAST(total AS UInt32), 1) FROM t"
    assert sql_to_alias_map(sql) == {}


def test_bridge_into_with_aliases(spark, sf_dir, events_source):
    """End to end: extract the source select's aliases and thread them so an
    alias-referencing filter resolves (the Event Patterns flow)."""
    from hyperdx_spark.compile import compile_chart_config
    from hyperdx_spark.model import ChartConfig

    select_sql = "SELECT event_type as service, ts, props FROM events"
    amap = sql_to_alias_map(select_sql)
    cfg = ChartConfig(
        source=events_source,
        with_aliases=alias_map_to_with_aliases(amap),
        select="props as __hdx_pattern_field, ts as __hdx_timestamp",
        where="service = 'error'",
        where_language="sql",
        limit=100,
        date_range=(datetime(2024, 1, 1), datetime(2024, 2, 1)),
    )
    rows = compile_chart_config(spark, cfg, sf_dir=sf_dir).collect()
    assert 0 < len(rows) <= 100
