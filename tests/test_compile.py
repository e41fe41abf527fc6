"""End-to-end ChartConfig -> DataFrame tests on the driver's events table,
cross-checked against DuckDB as the SQL oracle (SURVEY.md §5)."""

from datetime import datetime

import duckdb
import pytest

from hyperdx_spark.compile import compile_chart_config
from hyperdx_spark.model import (
    ChartConfig,
    QuerySettings,
    SelectCol,
    Source,
    SqlAstFilter,
    SqlFilter,
)

RANGE = (datetime(2024, 1, 1), datetime(2024, 2, 1))
EXACT = QuerySettings(approx_quantiles=False)


def duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in ("events",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchall()


def rows_of(df):
    return [tuple(r) for r in df.collect()]


def assert_same(spark_rows, duck_rows):
    def norm(rows):
        out = []
        for r in rows:
            out.append(
                tuple(
                    round(v, 6) if isinstance(v, float) else v
                    for v in r
                )
            )
        return sorted(out, key=repr)

    assert norm(spark_rows) == norm(duck_rows)


def test_minimum_slice(spark, sf_dir, events_source):
    """SURVEY §7.1: count of error events per 5m bucket per event_type."""
    cfg = ChartConfig(
        source=events_source,
        select=[SelectCol(agg_fn="count", alias="cnt")],
        where="error",
        where_language="lucene",
        granularity="5 minute",
        group_by=["event_type"],
        date_range=RANGE,
    )
    df = compile_chart_config(spark, cfg, sf_dir=sf_dir)
    got = rows_of(df)
    want = duck(
        sf_dir,
        """
        SELECT make_timestamp((floor(epoch(ts))::BIGINT // 300) * 300 * 1000000) AS __timestamp,
               event_type, count(*) AS cnt
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2024-02-01'
          AND list_contains(string_split_regex(lower(concat_ws(' ', event_type, props)), '[^a-z0-9]+'), 'error')
        GROUP BY 1, 2 ORDER BY 1
        """,
    )
    assert len(got) > 0
    assert_same(got, want)


def test_multi_agg_quantile(spark, sf_dir, events_source):
    cfg = ChartConfig(
        source=events_source,
        select=[
            SelectCol(agg_fn="sum", value_expression="value", alias="sum_v"),
            SelectCol(agg_fn="avg", value_expression="value", alias="avg_v"),
            SelectCol(agg_fn="quantile", value_expression="value", level=0.9, alias="p90_v"),
            SelectCol(agg_fn="count_distinct", value_expression="user_id", alias="users"),
        ],
        group_by=["event_type"],
        date_range=RANGE,
    )
    df = compile_chart_config(spark, cfg, sf_dir=sf_dir, settings=EXACT)
    want = duck(
        sf_dir,
        """
        SELECT event_type,
               sum(coalesce(try_cast(value AS DOUBLE), 0)) AS sum_v,
               avg(coalesce(try_cast(value AS DOUBLE), 0)) AS avg_v,
               quantile_cont(value, 0.9) AS p90_v,
               count(DISTINCT user_id) AS users
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2024-02-01'
        GROUP BY 1
        """,
    )
    assert_same(rows_of(df), want)


def test_agg_condition(spark, sf_dir, events_source):
    """Per-series conditional agg (countIf analogue) + OR pushdown."""
    cfg = ChartConfig(
        source=events_source,
        select=[
            SelectCol(agg_fn="count", agg_condition="event_type:error", alias="errors"),
            SelectCol(agg_fn="count", agg_condition="event_type:click", alias="clicks"),
        ],
        granularity="1 day",
        date_range=RANGE,
    )
    df = compile_chart_config(spark, cfg, sf_dir=sf_dir)
    want = duck(
        sf_dir,
        """
        SELECT make_timestamp((floor(epoch(ts))::BIGINT // 86400) * 86400 * 1000000) AS __timestamp,
               count(*) FILTER (lower(event_type) LIKE '%error%') AS errors,
               count(*) FILTER (lower(event_type) LIKE '%click%') AS clicks
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2024-02-01'
          AND (lower(event_type) LIKE '%error%' OR lower(event_type) LIKE '%click%')
        GROUP BY 1
        """,
    )
    assert_same(rows_of(df), want)


def test_filters_and_having(spark, sf_dir, events_source):
    cfg = ChartConfig(
        source=events_source,
        select=[SelectCol(agg_fn="avg", value_expression="value", alias="avg_v")],
        filters=[
            SqlFilter("value >= 1", "sql"),
            SqlAstFilter(operator="!=", left="event_type", right="view"),
        ],
        group_by=["event_type"],
        having="avg_v > 10",
        date_range=RANGE,
    )
    df = compile_chart_config(spark, cfg, sf_dir=sf_dir, settings=EXACT)
    want = duck(
        sf_dir,
        """
        SELECT event_type, avg(coalesce(try_cast(value AS DOUBLE),0)) AS avg_v
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2024-02-01'
          AND value >= 1 AND event_type != 'view'
        GROUP BY 1 HAVING avg_v > 10
        """,
    )
    assert_same(rows_of(df), want)


def test_search_projection_order_limit(spark, sf_dir, events_source):
    cfg = ChartConfig(
        source=events_source,
        select="event_id, ts, event_type, value",
        where="event_type:error value:>=30",
        where_language="lucene",
        order_by="ts DESC",
        limit=50,
        date_range=RANGE,
    )
    df = compile_chart_config(spark, cfg, sf_dir=sf_dir)
    got = rows_of(df)
    want = duck(
        sf_dir,
        """
        SELECT event_id, ts, event_type, value FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2024-02-01'
          AND lower(event_type) LIKE '%error%' AND value >= 30
        ORDER BY ts DESC LIMIT 50
        """,
    )
    assert got == want  # order-sensitive


def test_series_limit(spark, sf_dir, events_source):
    cfg = ChartConfig(
        source=events_source,
        select=[SelectCol(agg_fn="count", alias="cnt")],
        granularity="1 day",
        group_by=["event_type"],
        series_limit=2,
        date_range=RANGE,
    )
    df = compile_chart_config(spark, cfg, sf_dir=sf_dir)
    got = rows_of(df)
    kept = {r[1] for r in got}
    assert len(kept) == 2
    # top-2 series by peak bucket count must be kept
    want = duck(
        sf_dir,
        """
        WITH b AS (
          SELECT make_timestamp((floor(epoch(ts))::BIGINT // 86400) * 86400 * 1000000) AS b,
                 event_type, count(*) AS cnt
          FROM events
          WHERE ts >= TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2024-02-01'
          GROUP BY 1, 2)
        SELECT event_type FROM b GROUP BY 1 ORDER BY max(cnt) DESC, event_type LIMIT 2
        """,
    )
    assert kept == {r[0] for r in want}


def test_fill_nulls(spark, sf_dir, events_source):
    cfg = ChartConfig(
        source=events_source,
        select=[SelectCol(agg_fn="count", alias="cnt")],
        where='event_type:"signup"',
        granularity="6 hour",
        date_range=(datetime(2024, 1, 1), datetime(2024, 1, 8)),
        fill_nulls=0.0,
    )
    df = compile_chart_config(spark, cfg, sf_dir=sf_dir)
    got = rows_of(df)
    # one row per 6h bucket across the whole range, gaps zero-filled
    assert len(got) == 7 * 4 + 1


def test_json_dot_path(spark, sf_dir, events_source):
    cfg = ChartConfig(
        source=events_source,
        select=[SelectCol(agg_fn="count", alias="cnt")],
        where="props.k:>=50",
        where_language="lucene",
        date_range=RANGE,
    )
    df = compile_chart_config(spark, cfg, sf_dir=sf_dir)
    want = duck(
        sf_dir,
        """
        SELECT count(*) AS cnt FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2024-02-01'
          AND try_cast(coalesce(json_extract_string(props, '$.k'), '') AS DOUBLE) >= 50
        """,
    )
    assert_same(rows_of(df), want)


def test_cte_two_level_agg(spark, sf_dir, events_source):
    """renderWith (renderChartConfig.ts:1549-1617): inner CTE buckets hourly
    error counts; the outer config computes the daily max of those hourly
    counts. Must equal the directly-computed two-level SQL answer."""
    from datetime import datetime

    from hyperdx_spark.compile import compile_chart_config
    from hyperdx_spark.model import ChartConfig, SelectCol, Source

    rng = (datetime(2024, 1, 1), datetime(2024, 1, 8))
    inner = ChartConfig(
        source=events_source,
        select=[SelectCol(agg_fn="count", alias="cnt")],
        where="error",
        granularity="1 hour",
        group_by=["event_type"],
        date_range=rng,
    )
    outer = ChartConfig(
        source=Source(table="hourly", timestamp_value_expression="__timestamp"),
        ctes=[("hourly", inner)],
        select=[SelectCol(agg_fn="max", value_expression="cnt", alias="peak_hourly")],
        granularity="1 day",
        group_by=["event_type"],
        date_range=rng,
    )
    got = {
        (r["__timestamp"], r["event_type"]): r["peak_hourly"]
        for r in compile_chart_config(spark, outer, sf_dir=sf_dir).collect()
    }
    from hyperdx_spark.io import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").where(
        (F.col("ts") >= F.lit(rng[0])) & (F.col("ts") <= F.lit(rng[1]))
        & F.lower("event_type").contains("error")
    )
    hourly = ev.groupBy(
        F.timestamp_seconds((F.unix_timestamp("ts") / 3600).cast("long") * 3600).alias("h"),
        "event_type",
    ).count()
    daily = hourly.groupBy(
        F.timestamp_seconds((F.unix_timestamp("h") / 86400).cast("long") * 86400).alias("d"),
        "event_type",
    ).agg(F.max("count").alias("m"))
    expected = {(r["d"], r["event_type"]): float(r["m"]) for r in daily.collect()}
    assert got == expected and got


def test_multi_column_timestamp(spark, sf_dir, tmp_path):
    """pickBucketTimestampColumn (core/utils.ts:192-263): a source listing
    "event_date, ts" filters on BOTH columns (date bounds on the Date one
    for partition pruning) and buckets on the DateTime one."""
    from datetime import datetime

    from hyperdx_spark.compile import compile_chart_config
    from hyperdx_spark.io import load_table
    from hyperdx_spark.model import ChartConfig, SelectCol, Source
    from pyspark.sql import functions as F

    path = str(tmp_path / "dual_ts")
    load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    ).write.parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("dual_ts_events")

    rng = (datetime(2024, 1, 5), datetime(2024, 1, 10))
    cfg = ChartConfig(
        source=Source(table="dual_ts_events", timestamp_value_expression="event_date, ts"),
        select=[SelectCol(agg_fn="count", alias="cnt")],
        granularity="1 day",
        date_range=rng,
    )
    df = compile_chart_config(spark, cfg)
    plan = df.queryExecution.optimizedPlan().toString() if hasattr(df, "queryExecution") else ""
    got = {r["__timestamp"]: r["cnt"] for r in df.collect()}
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("ts") >= F.lit(rng[0])) & (F.col("ts") <= F.lit(rng[1]))
    )
    expected = {
        r["d"]: r["count"]
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("d")).count().collect()
    }
    assert got == expected and len(got) >= 5
    # both columns appear in the compiled filter
    explained = df._jdf.queryExecution().optimizedPlan().toString()
    assert "event_date" in explained and "ts" in explained


def test_exact_micros_no_float_truncation():
    from datetime import datetime, timezone

    from hyperdx_spark.io import _exact_micros

    # 2024-09-01 00:00:00.123457 UTC: float repr of timestamp()*1e6 lands
    # one microsecond low for many values in this shape
    dt = datetime(2024, 9, 1, 0, 0, 0, 123457)
    assert _exact_micros(dt) == 1725148800_000000 + 123457
    aware = dt.replace(tzinfo=timezone.utc)
    assert _exact_micros(aware) == _exact_micros(dt)
    # sweep: exact for every microsecond remainder in a 1000-value window
    base = datetime(2026, 1, 2, 3, 4, 5)
    for us in range(0, 1000):
        d = base.replace(microsecond=us)
        assert _exact_micros(d) % 1_000_000 == us


def test_chcompat_touint64_is_integer():
    from hyperdx_spark.functions.chcompat import translate_expr

    out = translate_expr("toUInt64(x)")
    assert "BIGINT" in out and "DOUBLE" not in out
    assert "BIGINT" in translate_expr("toInt64(x)")


def test_sqlast_filter_backslash_literal(spark, sf_dir, events_source):
    from hyperdx_spark.model import SqlAstFilter

    cfg = ChartConfig(
        source=events_source,
        select=[SelectCol(agg_fn="count", alias="cnt")],
        filters=[SqlAstFilter(operator="!=", left="event_type", right="x\\")],
        date_range=RANGE,
    )
    # must compile and run: a trailing backslash may not break the literal
    out = compile_chart_config(spark, cfg, sf_dir=sf_dir).collect()
    assert len(out) == 1 and out[0]["cnt"] > 0


def _write_mat_table(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from hyperdx_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    aug = ev.withColumn("mat_k", F.get_json_object("props", "$.k"))
    aug.write.mode("overwrite").parquet(str(tmp_path / "events_mat.parquet"))
    return Source(
        table="events_mat",
        timestamp_value_expression="ts",
        materialized_fields={"JSONExtractString(props, 'k')": "mat_k"},
    )


def test_materialized_lucene_plan_prunes_json_blob(spark, sf_dir, tmp_path):
    src = _write_mat_table(spark, sf_dir, tmp_path)
    cfg = ChartConfig(
        source=src,
        select=[SelectCol(agg_fn="count", alias="cnt")],
        where="props.k:>=50",
        where_language="lucene",
        granularity="1 day",
        date_range=RANGE,
    )
    df = compile_chart_config(spark, cfg, sf_dir=str(tmp_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    # the JSON blob is not read at all; the physical column is
    assert "mat_k" in scan
    assert "props" not in scan
    # same answer as the unsubstituted JSON probe
    base = ChartConfig(
        source=Source(table="events", timestamp_value_expression="ts"),
        select=[SelectCol(agg_fn="count", alias="cnt")],
        where="props.k:>=50",
        where_language="lucene",
        granularity="1 day",
        date_range=RANGE,
    )
    want = sorted(map(tuple, compile_chart_config(spark, base, sf_dir=sf_dir).collect()))
    got = sorted(map(tuple, df.collect()))
    assert got == want


def test_materialized_sql_where_pushdown(spark, sf_dir, tmp_path):
    src = _write_mat_table(spark, sf_dir, tmp_path)
    cfg = ChartConfig(
        source=src,
        select=[SelectCol(agg_fn="count", alias="cnt")],
        where="JSONExtractString(props, 'k') = '50'",
        where_language="sql",
        date_range=RANGE,
    )
    df = compile_chart_config(spark, cfg, sf_dir=str(tmp_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "props" not in scan
    # equality on the physical string column reaches PushedFilters
    # (toString truncates long lines; use the formatted explain)
    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "EqualTo(mat_k,50)" in formatted.replace("'", "")


def test_materialized_substitute_spellings():
    from hyperdx_spark.functions.materialize import canonical_key, substitute

    mapping = {"props['k']": "mat_k"}
    assert canonical_key("JSONExtractString(props, 'k')") == "props.k"
    assert canonical_key("get_json_object(props, '$.k')") == "props.k"
    assert canonical_key("props['k']") == "props.k"
    assert canonical_key("props.k") == "props.k"
    out = substitute("get_json_object(`props`, '$.k') = '5'", mapping)
    assert out == "`mat_k` = '5'"
    # unmapped accessors untouched
    assert substitute("get_json_object(props, '$.z')", mapping) == "get_json_object(props, '$.z')"


def test_builder_to_raw_sql_roundtrip(spark, sf_dir, events_source):
    from hyperdx_spark.builder_sql import builder_to_raw_sql
    from hyperdx_spark.io import load_table, register_tables
    from hyperdx_spark.macros import replace_macros

    ev = load_table(spark, sf_dir, "events")
    cfg = ChartConfig(
        source=events_source,
        select=[
            SelectCol(agg_fn="count", alias="cnt"),
            SelectCol(agg_fn="sum", value_expression="value", alias="s"),
        ],
        where="error",
        where_language="lucene",
        granularity="1 day",
        group_by=["event_type"],
        having="cnt > 0",
        date_range=RANGE,
    )
    tpl = builder_to_raw_sql(cfg, schema=ev.schema)
    assert not tpl.is_error
    assert "$__timeFilter" in tpl.sql and "$__sourceTable" in tpl.sql
    sql = replace_macros(tpl.sql, date_range=RANGE, interval_seconds=86400, table="events")
    register_tables(spark, sf_dir, ("events",), time_filter=("ts", *RANGE))
    got = sorted(map(tuple, spark.sql(sql).collect()))
    want = sorted(map(tuple, compile_chart_config(spark, cfg, sf_dir=sf_dir).collect()))
    assert got == want


def test_builder_to_raw_sql_errors(spark, sf_dir, events_source):
    from hyperdx_spark.builder_sql import builder_to_raw_sql

    # string select is Search-style -> not convertible
    t = builder_to_raw_sql(ChartConfig(source=events_source, select="event_id"))
    assert t.is_error and "cannot be auto-converted" in t.error
    # lucene condition without schema
    t2 = builder_to_raw_sql(
        ChartConfig(
            source=events_source,
            select=[SelectCol(agg_fn="count", alias="c")],
            where="error",
            where_language="lucene",
        )
    )
    assert t2.is_error and "schema" in t2.error
    # unsupported display types are rejected (RAW_SQL_DISPLAY_TYPES)
    t3 = builder_to_raw_sql(
        ChartConfig(
            source=events_source,
            select=[SelectCol(agg_fn="count", alias="c")],
        ),
        display_type="search",
    )
    assert t3.is_error and "cannot be auto-converted" in t3.error


def test_builder_to_raw_sql_series_limit_cte(spark, sf_dir, events_source):
    """builderToRawSql.test.ts:197 — a time-series seriesLimit macro-izes
    the __hdx_series_limit ranking CTE with the LIMIT inlined, and the
    executed template equals the compiled config."""
    from hyperdx_spark.builder_sql import builder_to_raw_sql
    from hyperdx_spark.io import register_tables
    from hyperdx_spark.macros import replace_macros

    cfg = ChartConfig(
        source=events_source,
        select=[SelectCol(agg_fn="count", alias="cnt")],
        granularity="1 day",
        group_by=["event_type"],
        series_limit=2,
        date_range=RANGE,
    )
    tpl = builder_to_raw_sql(cfg)
    assert not tpl.is_error
    assert "__hdx_series_limit" in tpl.sql
    assert "LIMIT 2" in tpl.sql
    assert "$__timeInterval" in tpl.sql
    sql = replace_macros(tpl.sql, date_range=RANGE, interval_seconds=86400, table="events")
    register_tables(spark, sf_dir, ("events",), time_filter=("ts", *RANGE))
    got = sorted(map(tuple, spark.sql(sql).collect()))
    want = sorted(
        map(tuple, compile_chart_config(spark, cfg, sf_dir=sf_dir).collect())
    )
    assert got == want
    # non-time-series display: the conversion drops granularity, so the
    # seriesLimit never caps and no CTE is emitted (renderSeriesLimitCte gate)
    tpl_table = builder_to_raw_sql(cfg, display_type="table")
    assert not tpl_table.is_error
    assert "__hdx_series_limit" not in tpl_table.sql


def test_builder_to_raw_sql_display_shapes(spark, sf_dir, events_source):
    """builderToRawSql display-type conversions: table strips granularity
    and inlines the default LIMIT; pie applies seriesLimit as LIMIT with
    the injected ordering; number drops groupBy; executed templates match
    the converted compiled configs."""
    from hyperdx_spark.builder_sql import builder_to_raw_sql
    from hyperdx_spark.display import (
        convert_to_categorical_chart_config,
        convert_to_number_chart_config,
        convert_to_table_chart_config,
    )
    from hyperdx_spark.io import register_tables
    from hyperdx_spark.macros import replace_macros

    register_tables(spark, sf_dir, ("events",), time_filter=("ts", *RANGE))
    cfg = ChartConfig(
        source=events_source,
        select=[SelectCol(agg_fn="count")],
        granularity="1 day",
        group_by=["event_type"],
        series_limit=2,
        date_range=RANGE,
    )
    # table: granularity stripped even though the form carries one
    tpl = builder_to_raw_sql(cfg, display_type="table")
    assert "$__timeInterval" not in tpl.sql
    assert "LIMIT 200" in tpl.sql
    # pie: seriesLimit -> LIMIT 2 + value-desc ordering
    tpl_pie = builder_to_raw_sql(cfg, display_type="pie")
    assert "LIMIT 2" in tpl_pie.sql and "`Value` DESC" in tpl_pie.sql
    got = sorted(map(tuple, spark.sql(
        replace_macros(tpl_pie.sql, date_range=RANGE, table="events")
    ).collect()))
    want = sorted(map(tuple, compile_chart_config(
        spark, convert_to_categorical_chart_config(cfg), sf_dir=sf_dir
    ).collect()))
    assert got == want
    # pie without a seriesLimit: no LIMIT at all
    no_cap = ChartConfig(
        source=events_source,
        select=[SelectCol(agg_fn="count")],
        group_by=["event_type"],
        date_range=RANGE,
    )
    assert "LIMIT" not in builder_to_raw_sql(no_cap, display_type="pie").sql
    # number: groupBy dropped -> single row
    tpl_num = builder_to_raw_sql(cfg, display_type="number")
    rows = spark.sql(
        replace_macros(tpl_num.sql, date_range=RANGE, table="events")
    ).collect()
    assert len(rows) == 1


def test_chcompat_round3_functions(spark):
    """New CH-function rewrites evaluate correctly in a real Spark session."""
    from hyperdx_spark.functions.chcompat import translate_expr

    cases = [
        # (ch expression, expected value)
        ("splitByChar('.', 'a.b.c')", ["a", "b", "c"]),
        ("replaceRegexpAll('ab12cd', '[0-9]+', 'X')", "abXcd"),
        ("replaceRegexpAll('2024-01-02', '(\\\\d+)-(\\\\d+)', '\\\\2/\\\\1')", "01/2024-02"),
        ("extractAll('a1b22c', '[0-9]+')", ["1", "22"]),
        ("dateDiff('hour', TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-02')", 24),
        ("toStartOfFiveMinutes(TIMESTAMP '2024-01-01 00:07:31')", "2024-01-01 00:05:00"),
        ("toYYYYMM(TIMESTAMP '2024-03-15')", 202403),
        ("toDayOfWeek(TIMESTAMP '2024-01-01')", 1),   # a Monday -> 1 in CH
        ("toDayOfWeek(TIMESTAMP '2024-01-07')", 7),   # a Sunday -> 7 in CH
        ("JSONExtractInt('{\"a\": 7}', 'a')", 7),
        ("JSONExtractFloat('{\"a\": 1.5}', 'a')", 1.5),
        ("JSONHas('{\"a\": 1}', 'b')", False),
        ("ifNull(NULL, 5)", 5),
        ("assumeNotNull(3)", 3),
        ("startsWith('hello', 'he')", True),
        ("indexOf(array(10, 20), 20)", 2),
        ("toDateTime('2024-01-01 12:00:00')", "2024-01-01 12:00:00"),
    ]
    for ch, want in cases:
        got = spark.sql(f"SELECT {translate_expr(ch)} AS v").collect()[0]["v"]
        if hasattr(got, "strftime"):
            got = got.strftime("%Y-%m-%d %H:%M:%S")
        if isinstance(got, list):
            got = list(got)
        assert got == want, (ch, got, want)


def test_chcompat_round6_functions(spark):
    """r6 CH-function rewrites: the remaining families the reference's
    query generator emits — hasToken (the search-path primitive),
    conditional aggregates (*If combinators), array set ops, and the
    lambda HOFs with ClickHouse's lambda-first argument order."""
    from hyperdx_spark.functions.chcompat import translate_expr

    cases = [
        ("hasToken('alpha beta-42', 'beta')", True),
        ("hasToken('alpha beta-42', 'bet')", False),  # token, not substring
        ("hasToken('alpha beta-42', '42')", True),
        # CH tokenizes on non-alnum *ASCII* only — bytes >= 0x80 stay
        # inside tokens (ADVICE r6 / VERDICT r7 #3)
        ("hasToken('un café noir', 'café')", True),
        ("hasToken('un café noir', 'caf')", False),
        ("hasToken('日本語 text', '日本語')", True),
        ("hasTokenCaseInsensitive('Alpha Beta', 'beta')", True),
        # CH folds case ASCII-only (byte tokenizer + tolower): é == é
        # matches byte-exactly, but É does NOT fold to é
        ("hasTokenCaseInsensitive('Un café noir', 'CAFé')", True),
        ("hasTokenCaseInsensitive('Un CAFÉ noir', 'café')", False),
        ("match('abc123', '[0-9]+')", True),
        ("match('abcdef', '^[0-9]+$')", False),
        ("hasAny(array(1, 2), array(2, 3))", True),
        ("hasAny(array(1, 2), array(3, 4))", False),
        ("hasAll(array(1, 2, 3), array(1, 3))", True),
        ("hasAll(array(1, 2), array(1, 4))", False),
        ("hasAll(array(1, 2), array())", True),  # empty needle -> true
        ("arrayExists(x -> x > 2, array(1, 3))", True),
        ("arrayExists(x -> x > 5, array(1, 3))", False),
        ("arrayMap(x -> x * 2, array(1, 2))", [2, 4]),
        ("arrayFilter(x -> x % 2 = 0, array(1, 2, 3, 4))", [2, 4]),
    ]
    for ch, want in cases:
        got = spark.sql(f"SELECT {translate_expr(ch)} AS v").collect()[0]["v"]
        if isinstance(got, list):
            got = list(got)
        assert got == want, (ch, translate_expr(ch), got, want)
    # conditional aggregates over a real frame (CH empty-set semantics:
    # sumIf -> 0, avgIf -> NaN)
    df = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "k int, v double")
    df.createOrReplaceTempView("chc6")
    row = spark.sql(
        "SELECT "
        + translate_expr("sumIf(v, k >= 2)") + " AS s, "
        + translate_expr("avgIf(v, k >= 2)") + " AS a, "
        + translate_expr("minIf(v, k >= 2)") + " AS mn, "
        + translate_expr("maxIf(v, k >= 2)") + " AS mx, "
        + translate_expr("sumIf(v, k > 99)") + " AS s0, "
        + translate_expr("avgIf(v, k > 99)") + " AS a0, "
        + translate_expr("minIf(v, k > 99)") + " AS mn0, "
        + translate_expr("maxIf(v, k > 99)") + " AS mx0 "
        "FROM chc6"
    ).collect()[0]
    import math
    assert row["s"] == 50.0 and row["a"] == 25.0
    assert row["mn"] == 20.0 and row["mx"] == 30.0
    assert row["s0"] == 0.0 and math.isnan(row["a0"])
    # CH minIf/maxIf over zero matching rows -> type default 0, not NULL
    # (VERDICT r7 What's-wrong #2)
    assert row["mn0"] == 0.0 and row["mx0"] == 0.0


def test_chcompat_r8_semantics_audit(spark):
    """r8 proactive CH-parity audit: three rewrites whose Spark near-
    equivalents silently diverge from ClickHouse —
    * toStartOfWeek: CH mode 0 starts weeks on SUNDAY (date_trunc('week')
      is Monday); explicit mode 1/3 is Monday;
    * arrayCompact: CH removes CONSECUTIVE duplicates only (run-length
      dedup), array_distinct would collapse [1,1,2,1] wrongly;
    * formatDateTime: CH takes MySQL-style % patterns, Spark takes Java
      patterns — untranslated, '%Y-%m' renders literally."""
    from hyperdx_spark.functions.chcompat import translate_expr

    cases = [
        # 2024-01-03 is a Wednesday -> preceding Sunday
        ("toString(toStartOfWeek(toDateTime('2024-01-03 10:00:00')))",
         "2023-12-31"),
        # a Sunday maps to itself under mode 0
        ("toString(toStartOfWeek(toDateTime('2024-01-07 00:00:00')))",
         "2024-01-07"),
        # explicit Monday-first mode
        ("toString(toStartOfWeek(toDateTime('2024-01-03 10:00:00'), 1))",
         "2024-01-01"),
        ("arrayCompact(array(1, 1, 2, 2, 2, 1))", [1, 2, 1]),
        ("arrayCompact(array(3, 3, 3))", [3]),
        ("formatDateTime(toDateTime('2024-03-05 07:08:09'), "
         "'%Y-%m-%d %H:%i:%s')", "2024-03-05 07:08:09"),
        # literal letters must not become Java pattern chars; %M is the
        # month NAME (modern CH default; minute is %i)
        ("formatDateTime(toDateTime('2024-03-05 07:08:09'), "
         "'day %d of %M')", "day 05 of March"),
        ("formatDateTime(toDateTime('2024-03-05 07:08:09'), '%H%%')",
         "07%"),
        # CH least/greatest propagate NULL; Spark's skip NULLs
        ("least(3, 1)", 1),
        ("least(3, NULL)", None),
        ("greatest(NULL, 7)", None),
    ]
    for ch, want in cases:
        got = spark.sql(f"SELECT {translate_expr(ch)} AS v").collect()[0]["v"]
        if isinstance(got, list):
            got = list(got)
        assert got == want, (ch, translate_expr(ch), got, want)
    # CH anyLast skips NULLs (aggregate NULL-skipping semantics)
    spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "k int, v string"
    ).createOrReplaceTempView("chc8")
    row = spark.sql(
        "SELECT " + translate_expr("anyLast(v)") + " AS lv "
        "FROM (SELECT * FROM chc8 ORDER BY k)"
    ).collect()[0]
    assert row["lv"] == "b"


# ---- Event-Patterns select-alias filter (HDX-1879) -------------------------
# Twin of renderChartConfig.test.ts:1272-1326: the Event Patterns view
# rebuilds the SELECT, so a filter referencing a source-level select alias
# only resolves when the alias map is threaded through `with` (scalar
# expression aliases, isSubquery: false).


def _pattern_cfg(events_source, with_aliases):
    return ChartConfig(
        source=events_source,
        with_aliases=with_aliases,
        select="props as __hdx_pattern_field, ts as __hdx_timestamp",
        where="service = 'error'",
        where_language="sql",
        limit=10000,
        date_range=RANGE,
    )


def test_pattern_filter_resolves_with_threaded_alias(spark, sf_dir, events_source):
    cfg = _pattern_cfg(events_source, [("service", "event_type")])
    df = compile_chart_config(spark, cfg, sf_dir=sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"__hdx_pattern_field", "__hdx_timestamp"}
    # the filter genuinely applied through the alias
    want = duck(
        sf_dir,
        "SELECT count(*) FROM events WHERE event_type = 'error'"
        " AND ts >= TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2024-02-01'",
    )[0][0]
    assert len(rows) == want


def test_pattern_filter_fails_without_alias_map(spark, sf_dir, events_source):
    # the bug the reference pins: no threaded alias map -> the filter
    # references a column that does not exist in the rebuilt SELECT
    # (ClickHouse: "Unknown identifier"; Spark: UNRESOLVED_COLUMN)
    from pyspark.errors import AnalysisException

    cfg = _pattern_cfg(events_source, [])
    with pytest.raises(AnalysisException):
        compile_chart_config(spark, cfg, sf_dir=sf_dir).collect()


def test_with_alias_visible_to_select_and_group_by(spark, sf_dir, events_source):
    # CH expression aliases are visible anywhere in the query — selects and
    # group-bys included
    cfg = ChartConfig(
        source=events_source,
        with_aliases=[("service", "event_type")],
        select=[SelectCol(agg_fn="count", alias="cnt")],
        group_by=["service"],
        date_range=RANGE,
    )
    df = compile_chart_config(spark, cfg, sf_dir=sf_dir)
    got = sorted((r["service"], r["cnt"]) for r in df.collect())
    want = sorted(
        tuple(r)
        for r in duck(
            sf_dir,
            "SELECT event_type, count(*) FROM events"
            " WHERE ts >= TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2024-02-01'"
            " GROUP BY 1",
        )
    )
    assert got == want


# ---- seriesLimit parity (renderChartConfig.test.ts:499-650 + ts:1345-1431) --


def test_series_limit_excludes_null_groups_from_ranking(spark, events_source):
    # Groups with a NULL component are dropped from the RANKING (the CTE's
    # IS NOT NULL filter): a NULL group with the highest peak must not eat a
    # top-N slot — all N slots go to real series.
    from pyspark.sql import functions as F

    from hyperdx_spark.compile import _apply_series_limit

    df = spark.createDataFrame(
        [(None, 100.0), ("a", 5.0), ("b", 3.0), ("c", 1.0)],
        "g string, v double",
    )
    out = _apply_series_limit(df, ["g"], "v", 2)
    assert sorted(r["g"] for r in out.collect()) == ["a", "b"]


def test_series_limit_keeps_empty_string_groups(spark):
    # empty-string groups are kept — the reference pins the ABSENCE of a
    # toString(col) != '' check
    from hyperdx_spark.compile import _apply_series_limit

    df = spark.createDataFrame(
        [("", 100.0), ("a", 5.0), ("b", 3.0)], "g string, v double"
    )
    out = _apply_series_limit(df, ["g"], "v", 2)
    assert sorted(r["g"] for r in out.collect()) == ["", "a"]


def test_ratio_series_limit_finite_guard(spark):
    # ratio rank is max(if(isFinite(r), r, -inf)): a group whose only
    # buckets are inf/NaN (sparse-bucket division) must lose to real ratios
    from hyperdx_spark.post import limit_ratio_series

    df = spark.createDataFrame(
        [
            ("sparse", float("inf")),
            ("sparse", float("nan")),
            ("hot", 0.9),
            ("warm", 0.5),
            ("cold", 0.1),
        ],
        "g string, ratio double",
    )
    out = limit_ratio_series(df, 2, group_cols=["g"])
    assert sorted({r["g"] for r in out.collect()}) == ["hot", "warm"]


# ---- queryChartConfig.int.test.ts:812-900 twins (r11) ------------------------


def _ratio_cap_fixture(spark):
    """The int-test's service table: inf_group divides by zero, noisy has
    the biggest totals, broken/flaky have the top finite ratios; errors sum
    17 / totals sum 68 (queryChartConfig.int.test.ts baseRatioConfig)."""
    rows = [
        (datetime(2024, 1, 1, 0, 10), "inf_group", "us-east", 5.0, 0.0),
        (datetime(2024, 1, 1, 0, 20), "noisy", "us-west", 6.0, 57.0),
        (datetime(2024, 1, 1, 0, 30), "broken", "eu-1", 4.0, 5.0),
        (datetime(2024, 1, 1, 0, 40), "flaky", "eu-2", 2.0, 6.0),
    ]
    return spark.createDataFrame(
        rows, "ts timestamp, service string, region string,"
        " errors double, total double"
    )


def _ratio_cap_cfg(select, group_by, series_limit=2):
    from hyperdx_spark.model import Source

    src = Source(table="svc", timestamp_value_expression="ts")
    return ChartConfig(
        source=src, select=select, group_by=group_by,
        granularity="1 day", date_range=RANGE, series_limit=series_limit,
    )


def test_series_limit_two_select_non_ratio_ranks_by_first_select(spark):
    """:812 'ranks a two-select non-ratio config by its first select only':
    top 2 by sum(errors) is {noisy, inf_group}; ranking by the second
    select would keep {noisy, flaky}, a ratio collapse {broken, flaky}."""
    df = _ratio_cap_fixture(spark)
    cfg = _ratio_cap_cfg(
        [
            SelectCol(agg_fn="sum", value_expression="errors", alias="e"),
            SelectCol(agg_fn="sum", value_expression="total", alias="t"),
        ],
        ["service"],
    )
    out = compile_chart_config(spark, cfg, df=df)
    assert sorted({r["service"] for r in out.collect()}) == ["inf_group", "noisy"]


def test_series_limit_three_select_ratio_mode_falls_back_to_first(spark):
    """:855 'ranks by the first select when ratio mode has other than two
    selects': a ratio needs exactly two selects, so three render as plain
    multi-series and the rank stays sum(errors) — the repo's explicit
    compute_ratio construction makes the collapse impossible, and the
    compiler rank is pinned to the FIRST alias."""
    df = _ratio_cap_fixture(spark)
    cfg = _ratio_cap_cfg(
        [
            SelectCol(agg_fn="sum", value_expression="errors", alias="e"),
            SelectCol(agg_fn="sum", value_expression="total", alias="t"),
            SelectCol(agg_fn="max", value_expression="total", alias="m"),
        ],
        ["service"],
    )
    out = compile_chart_config(spark, cfg, df=df)
    assert sorted({r["service"] for r in out.collect()}) == ["inf_group", "noisy"]


def test_ratio_cap_two_column_group_keeps_both_key_columns(spark):
    """:832 'groups by two columns without merging them into a ratio': the
    regression collapsed a two-item groupBy into divide(ServiceName,
    Region). Both key columns must survive as outputs and the finite-guard
    ranking still picks the top finite ratios {broken, flaky} with their
    own regions."""
    from pyspark.sql import functions as F

    from hyperdx_spark.post import compute_ratio, limit_ratio_series

    df = _ratio_cap_fixture(spark).groupBy("service", "region").agg(
        F.sum("errors").alias("errors"), F.sum("total").alias("total")
    )
    rated = compute_ratio(df, numerator="errors", denominator="total")
    out = limit_ratio_series(rated, 2, group_cols=["service", "region"])
    rows = out.collect()
    assert {"service", "region"}.issubset(set(out.columns))
    assert sorted(r["service"] for r in rows) == ["broken", "flaky"]
    assert sorted(r["region"] for r in rows) == ["eu-1", "eu-2"]


def test_ratio_no_group_by_aggregates_every_row(spark):
    """:873 'aggregates every row when there is no group-by to cap': the
    cap is gated on a non-empty group-by, so with seriesLimit set and no
    groups the single ratio row still covers ALL rows — 17/68."""
    from hyperdx_spark.post import compute_ratio, limit_ratio_series

    df = _ratio_cap_fixture(spark)
    cfg = _ratio_cap_cfg(
        [
            SelectCol(agg_fn="sum", value_expression="errors", alias="errors"),
            SelectCol(agg_fn="sum", value_expression="total", alias="total"),
        ],
        [],
    )
    agg = compile_chart_config(spark, cfg, df=df).drop("__timestamp")
    rated = compute_ratio(agg, numerator="errors", denominator="total")
    rated = limit_ratio_series(rated, 2, group_cols=[])  # no-op without groups
    rows = rated.collect()
    assert len(rows) == 1
    assert abs(rows[0]["ratio"] - 17.0 / 68.0) < 1e-9


def test_series_limit_multi_column_group(spark, events_source):
    # ts:648-695: multi-column group-by ranks as a tuple with per-column
    # null checks — any NULL component excludes the group from ranking
    from hyperdx_spark.compile import _apply_series_limit

    df = spark.createDataFrame(
        [
            ("a", "x", 9.0),
            ("a", None, 100.0),  # NULL second component: excluded
            ("b", "y", 5.0),
            ("c", "z", 1.0),
        ],
        "g1 string, g2 string, v double",
    )
    out = _apply_series_limit(df, ["g1", "g2"], "v", 2)
    kept = sorted((r["g1"], r["g2"]) for r in out.collect())
    assert kept == [("a", "x"), ("b", "y")]


def test_with_alias_filter_pushes_to_scan(spark, sf_dir, events_source):
    """Scale property: a filter on a scalar `with` alias collapses through
    the projection and reaches the parquet scan as a pushed predicate —
    alias threading costs nothing at 100 TB."""
    from hyperdx_spark.model import SqlFilter

    cfg = ChartConfig(
        source=events_source,
        with_aliases=[("service", "event_type")],
        select=[SelectCol(agg_fn="count", alias="cnt")],
        filters=[SqlFilter(condition="service = 'error'", type="sql")],
        granularity="1 day",
        date_range=RANGE,
    )
    df = compile_chart_config(spark, cfg, sf_dir=sf_dir)
    import re

    # toString truncates the PushedFilters list, so pin the scan-adjacent
    # Filter/DataFilters form instead
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert re.search(r"event_type#\d+ = error", plan), plan


# ---- optimizeTimestampValueExpression twins (utils.test.ts:2185-2397, r11) ---


def test_parse_to_start_of_function_reference_cases():
    from hyperdx_spark.compile import parse_to_start_of_function as p

    assert p("toStartOfDay(a.date)") == ("toStartOfDay", "a.date", "")
    assert p("toStartOfMinute(toDate(ResourceAttributes['timestamp']))") == (
        "toStartOfMinute", "toDate(ResourceAttributes['timestamp'])", "",
    )
    assert p("toStartOfMonth(timestamp, 'America/Los_Angeles')") == (
        "toStartOfMonth", "timestamp", ", 'America/Los_Angeles'",
    )
    assert p("toStartOfMonth(`time stamp`)") == (
        "toStartOfMonth", "`time stamp`", "",
    )
    assert p("toStartOfInterval(timestamp, INTERVAL 1 DAY)") == (
        "toStartOfInterval", "timestamp", ", INTERVAL 1 DAY",
    )
    assert p(
        "toStartOfInterval(timestamp, INTERVAL 1 DAY,"
        " toDateTime('2025-01-01'), 'America/Los_Angeles')"
    ) == (
        "toStartOfInterval", "timestamp",
        ", INTERVAL 1 DAY, toDateTime('2025-01-01'), 'America/Los_Angeles'",
    )
    # whitespace-soup variant keeps inner spacing of each arg
    assert p(
        "    toStartOfInterval ( timestamp,   INTERVAL  10 DAY,"
        "   toDateTime('2025-01-01' ),  'America/Los_Angeles' )   "
    ) == (
        "toStartOfInterval", "timestamp",
        ", INTERVAL  10 DAY, toDateTime('2025-01-01' ), 'America/Los_Angeles'",
    )
    for bad in [
        "timestamp", "toDate(timestamp)", "toDate(toStartOfDay(timestamp))",
        "toStartOfDay(timestamp), toDate(timestamp)",
        "toDate(timestamp), toStartOfDay(timestamp)", "",
        "(toStartOfDay(timestamp))", "toStartOfDay(",
        "-toInt64(toStartOfInterval(timestamp, toIntervalMinute(15)))",
        "negate(toStartOfMinute(timestamp))",
    ]:
        assert p(bad) is None, bad


def test_optimize_timestamp_value_expression_reference_cases():
    from hyperdx_spark.compile import optimize_timestamp_value_expression as o

    cases = [
        ("Timestamp", "Timestamp", "Timestamp"),
        ("Timestamp", None, "Timestamp"),
        ("Timestamp", "", "Timestamp"),
        ("Timestamp", "ServiceName, SpanName, toDateTime(Timestamp)",
         "Timestamp"),
        ("Timestamp",
         "toStartOfHour(Timestamp), ServiceName, SpanName, toDateTime(Timestamp)",
         "Timestamp, toStartOfHour(Timestamp)"),
        ("Timestamp", "toDateTime(Timestamp), ServiceName, SpanName, Timestamp",
         "Timestamp"),
        ("Timestamp",
         "ServiceName, toDateTime(Timestamp), SeverityText, toStartOfHour(Timestamp)",
         "Timestamp"),
        ("Timestamp", "toStartOfHour(Timestamp), other_column, Timestamp",
         "Timestamp, toStartOfHour(Timestamp)"),
        # user already configured a multi-column expression: unchanged
        (" toStartOfHour(Timestamp), Timestamp",
         "toStartOfHour(Timestamp), other_column, Timestamp",
         " toStartOfHour(Timestamp), Timestamp"),
        ("Timestamp",
         "toStartOfInterval(Timestamp, INTERVAL 1 HOUR), other_column, Timestamp",
         "Timestamp, toStartOfInterval(Timestamp, INTERVAL 1 HOUR)"),
        ("Timestamp",
         "toStartOfMinute(Timestamp), user_id, status, toUnixTimestamp64Nano(Timestamp)",
         "Timestamp, toStartOfMinute(Timestamp)"),
        ("Timestamp",
         "toStartOfMinute(TimestampTime), user_id, status, Timestamp",
         "Timestamp"),
        # garbage key segments (unbalanced brackets) are skipped, the
        # matching rollup still found
        ("Timestamp",
         "909]`23`9082eh[928e1p92e81hp92, d81p92d817h1p-93287dh129d7812hgpd91832h,"
         " toStartOfMinute(Timestamp), other_column, Timestamp",
         "Timestamp, toStartOfMinute(Timestamp)"),
        ("`Time stamp`",
         "toStartOfMinute(`Time stamp`), other_column, `Time stamp`",
         "`Time stamp`, toStartOfMinute(`Time stamp`)"),
        ("Timestamp",
         "-toInt64(toStartOfInterval(Timestamp, toIntervalMinute(15))),"
         " service_id, Timestamp",
         "Timestamp"),
        # reference quirk (utils.ts:1025-1029): the includes checks use the
        # UNTRIMMED expression — a whitespace-padded ts does NOT break at
        # toDateTime(Timestamp) (no substring match), so the later rollup is
        # still collected (its columnArgument comparison uses the TRIMMED ts)
        (" Timestamp ",
         "toDateTime(Timestamp), toStartOfHour(Timestamp), Timestamp",
         " Timestamp , toStartOfHour(Timestamp)"),
        # unpadded control: same key breaks at toDateTime(Timestamp)
        ("Timestamp",
         "toDateTime(Timestamp), toStartOfHour(Timestamp), Timestamp",
         "Timestamp"),
    ]
    for ts, pk, want in cases:
        assert o(ts, pk) == want, (ts, pk)


def test_split_and_trim_with_bracket_quirks():
    from hyperdx_spark.compile import split_and_trim_with_bracket as s

    assert s("a, f(b, c), d") == ["a", "f(b, c)", "d"]
    assert s("a, 'x, y', b") == ["a", "'x, y'", "b"]
    assert s("") == []
    assert s("a,,b") == ["a", "b"]          # blank segments dropped
    assert s("toStartOfDay(") == []          # unbalanced: no trailing flush
    assert s('f("a\\"b", c)') == ['f("a\\"b", c)']  # escaped quote stays inside


def test_optimized_ts_expression_feeds_multi_column_filter(spark, sf_dir):
    """End-to-end: the optimized expression drops into the existing
    multi-column timestamp machinery — the rollup becomes an extra pushed
    filter, the raw column stays the bucket."""
    from hyperdx_spark.compile import (
        optimize_timestamp_value_expression,
        pick_bucket_timestamp_expr,
    )
    from hyperdx_spark.io import load_table

    opt = optimize_timestamp_value_expression(
        "ts", "toStartOfHour(ts), event_type, ts"
    )
    assert opt == "ts, toStartOfHour(ts)"
    ev = load_table(spark, sf_dir, "events")
    bucket, all_exprs = pick_bucket_timestamp_expr(opt, ev)
    assert bucket == "ts"
    assert len(all_exprs) == 2 and any("date_trunc" in e or "toStartOfHour" in e
                                       or "hour" in e.lower() for e in all_exprs)
