"""Display-shape config conversions — pytest twins of the reference's spec
(packages/common-utils/src/__tests__/utils.test.ts:294-713) plus end-to-end
compile checks over the events table."""

from datetime import datetime

import pytest

from hyperdx_spark.display import (
    convert_to_categorical_chart_config,
    convert_to_number_chart_config,
    convert_to_table_chart_config,
    has_non_empty_order_by,
    has_positive_series_limit,
    quote_identifier,
)
from hyperdx_spark.model import ChartConfig, SelectCol, SortSpec, Source

DATE_RANGE = (datetime(2024, 1, 1), datetime(2024, 2, 1))


def _cfg(**kw):
    kw.setdefault("source", Source(table="events"))
    kw.setdefault("date_range", DATE_RANGE)
    return ChartConfig(**kw)


# ---- hasPositiveSeriesLimit (utils.test.ts:294-309) ----------------------


def test_has_positive_series_limit_positive_ints():
    assert has_positive_series_limit(1)
    assert has_positive_series_limit(250)


def test_has_positive_series_limit_zero_and_unset():
    # 0 = unlimited, None = unset — both apply no limit
    assert not has_positive_series_limit(0)
    assert not has_positive_series_limit(None)


def test_has_positive_series_limit_negative():
    assert not has_positive_series_limit(-5)


def test_has_positive_series_limit_non_integer():
    # Number.isInteger guard (utils.ts:52-58): a float from an untyped tiles
    # field must not bind as a LIMIT
    assert not has_positive_series_limit(0.5)
    assert not has_positive_series_limit(float("nan"))
    assert not has_positive_series_limit(True)  # bool is not a tile limit


# ---- hasNonEmptyOrderBy (utils.test.ts:520-553) ---------------------------


def test_has_non_empty_order_by():
    assert not has_non_empty_order_by(None)
    assert not has_non_empty_order_by("")
    assert not has_non_empty_order_by("   ")
    assert has_non_empty_order_by("ServiceName ASC")
    assert not has_non_empty_order_by([])
    assert has_non_empty_order_by([SortSpec("ServiceName", "DESC")])


# ---- convertToCategoricalChartConfig (utils.test.ts:311-510) ---------------


def test_categorical_removes_granularity_keeps_group_by():
    cfg = _cfg(granularity="5 minute", group_by=["event_type"])
    out = convert_to_categorical_chart_config(cfg)
    assert out.granularity is None
    assert out.group_by == ["event_type"]


def test_categorical_no_series_limit_no_injection():
    cfg = _cfg(select=[SelectCol(agg_fn="count")], group_by=["event_type"])
    out = convert_to_categorical_chart_config(cfg)
    assert out.order_by is None
    assert out.limit is None


def test_categorical_series_limit_becomes_limit_with_value_desc_order():
    cfg = _cfg(
        select=[SelectCol(agg_fn="count")],
        group_by=["event_type"],
        series_limit=5,
    )
    out = convert_to_categorical_chart_config(cfg)
    assert out.select[0].alias == "Value"
    assert out.order_by == [
        SortSpec("`Value`", "DESC"),
        SortSpec("event_type", "ASC"),
    ]
    assert out.limit == 5
    assert out.series_limit is None


def test_categorical_orders_by_existing_alias_with_identifier_escaping():
    # Reference escapes embedded double quotes by doubling (utils.ts:845-848);
    # the Spark spelling is backticks with embedded backticks doubled.
    cfg = _cfg(
        select=[SelectCol(agg_fn="count", alias="Request `Count`")],
        group_by=["event_type"],
        series_limit=3,
    )
    out = convert_to_categorical_chart_config(cfg)
    assert out.select[0].alias == "Request `Count`"
    assert out.order_by == [
        SortSpec("`Request ``Count```", "DESC"),
        SortSpec("event_type", "ASC"),
    ]
    assert out.limit == 3


def test_categorical_preserves_user_string_order_by():
    cfg = _cfg(
        select=[SelectCol(agg_fn="count")],
        group_by=["event_type"],
        series_limit=5,
        order_by="event_type ASC",
    )
    out = convert_to_categorical_chart_config(cfg)
    # The user's explicit ORDER BY wins; the limit keeps the top rows per
    # that ordering. No default alias is injected either.
    assert out.order_by == "event_type ASC"
    assert out.limit == 5
    assert out.select[0].alias is None


def test_categorical_preserves_user_sortspec_order_by():
    cfg = _cfg(
        select=[SelectCol(agg_fn="count")],
        group_by=["event_type"],
        series_limit=5,
        order_by=[SortSpec("event_type", "DESC")],
    )
    out = convert_to_categorical_chart_config(cfg)
    assert out.order_by == [SortSpec("event_type", "DESC")]
    assert out.limit == 5


def test_categorical_preserves_user_order_by_without_limit():
    cfg = _cfg(
        select=[SelectCol(agg_fn="count")],
        group_by=["event_type"],
        order_by="event_type ASC",
    )
    out = convert_to_categorical_chart_config(cfg)
    assert out.order_by == "event_type ASC"
    assert out.limit is None


def test_categorical_empty_string_order_by_gets_default():
    cfg = _cfg(
        select=[SelectCol(agg_fn="count")],
        group_by=["event_type"],
        series_limit=5,
        order_by="",
    )
    out = convert_to_categorical_chart_config(cfg)
    assert out.order_by == [
        SortSpec("`Value`", "DESC"),
        SortSpec("event_type", "ASC"),
    ]
    assert out.limit == 5


def test_categorical_explicit_limit_wins_over_series_limit():
    cfg = _cfg(
        select=[SelectCol(agg_fn="count")],
        group_by=["event_type"],
        series_limit=5,
        limit=2,
    )
    out = convert_to_categorical_chart_config(cfg)
    assert out.limit == 2


def test_categorical_zero_series_limit_is_unlimited():
    cfg = _cfg(
        select=[SelectCol(agg_fn="count")],
        group_by=["event_type"],
        series_limit=0,
    )
    out = convert_to_categorical_chart_config(cfg)
    assert out.limit is None
    assert out.order_by is None
    assert out.series_limit is None


def test_categorical_no_group_by_no_order_injection():
    cfg = _cfg(select=[SelectCol(agg_fn="count")], series_limit=5)
    out = convert_to_categorical_chart_config(cfg)
    assert out.order_by is None


def test_categorical_does_not_mutate_input():
    cfg = _cfg(
        select=[SelectCol(agg_fn="count")],
        group_by=["event_type"],
        series_limit=5,
    )
    convert_to_categorical_chart_config(cfg)
    assert cfg.select[0].alias is None
    assert cfg.order_by is None
    assert cfg.limit is None
    assert cfg.series_limit == 5
    assert cfg.granularity is None


def test_quote_identifier():
    assert quote_identifier("Value") == "`Value`"
    assert quote_identifier("a`b") == "`a``b`"


# ---- convertToNumberChartConfig (utils.ts:868-874) -------------------------


def test_number_drops_granularity_and_group_by():
    cfg = _cfg(
        select=[SelectCol(agg_fn="count")],
        granularity="1 hour",
        group_by=["event_type"],
        limit=7,
    )
    out = convert_to_number_chart_config(cfg)
    assert out.granularity is None
    assert out.group_by == []
    assert out.limit == 7  # everything else untouched
    assert cfg.group_by == ["event_type"]  # input not mutated


# ---- convertToTableChartConfig (utils.ts:876-900) --------------------------


def test_table_defaults_limit_and_group_order():
    cfg = _cfg(
        select=[SelectCol(agg_fn="count")],
        granularity="1 hour",
        group_by=["event_type"],
    )
    out = convert_to_table_chart_config(cfg)
    assert out.granularity is None
    assert out.limit == 200
    assert out.order_by == [SortSpec("event_type", "ASC")]


def test_table_keeps_explicit_limit_and_order():
    cfg = _cfg(
        select=[SelectCol(agg_fn="count")],
        group_by=["event_type"],
        limit=10,
        order_by="event_type DESC",
    )
    out = convert_to_table_chart_config(cfg)
    assert out.limit == 10
    assert out.order_by == "event_type DESC"


def test_table_no_group_by_no_order_default():
    cfg = _cfg(select=[SelectCol(agg_fn="count")])
    out = convert_to_table_chart_config(cfg)
    assert out.limit == 200
    assert out.order_by is None


def test_table_empty_list_order_by_not_defaulted():
    # the reference gate is the FALSY check (!orderBy): '' gets the default,
    # an explicitly empty array does not (utils.ts:893)
    out_empty_str = convert_to_table_chart_config(
        _cfg(group_by=["event_type"], order_by="")
    )
    assert out_empty_str.order_by == [SortSpec("event_type", "ASC")]
    out_empty_list = convert_to_table_chart_config(
        _cfg(group_by=["event_type"], order_by=[])
    )
    assert out_empty_list.order_by == []


# ---- end-to-end: converted configs compile and behave ----------------------


@pytest.fixture(scope="module")
def ev_source():
    return Source(table="events", kind="log", timestamp_value_expression="ts")


def test_categorical_compile_keeps_largest_slices(spark, sf_dir, ev_source):
    from hyperdx_spark.compile import compile_chart_config

    cfg = _cfg(
        source=ev_source,
        select=[SelectCol(agg_fn="count")],
        group_by=["event_type"],
        granularity="1 hour",  # dropped by the conversion
        series_limit=2,
    )
    out = compile_chart_config(
        spark, convert_to_categorical_chart_config(cfg), sf_dir=sf_dir
    )
    rows = out.collect()
    assert len(rows) == 2
    # the kept slices are the 2 largest by count, value-descending
    full = (
        compile_chart_config(
            spark,
            _cfg(
                source=ev_source,
                select=[SelectCol(agg_fn="count", alias="Value")],
                group_by=["event_type"],
            ),
            sf_dir=sf_dir,
        )
        .orderBy("Value", ascending=False)
        .collect()
    )
    expected = sorted(
        [(r["event_type"], r["Value"]) for r in full[:2]],
        key=lambda t: (-t[1], t[0]),
    )
    assert [(r["event_type"], r["Value"]) for r in rows] == expected


def test_number_compile_single_row(spark, sf_dir, ev_source):
    from hyperdx_spark.compile import compile_chart_config

    cfg = _cfg(
        source=ev_source,
        select=[SelectCol(agg_fn="count", alias="n")],
        group_by=["event_type"],
        granularity="1 hour",
    )
    rows = compile_chart_config(
        spark, convert_to_number_chart_config(cfg), sf_dir=sf_dir
    ).collect()
    assert len(rows) == 1
    assert rows[0]["n"] == 1000


def test_table_compile_stable_ordering(spark, sf_dir, ev_source):
    from hyperdx_spark.compile import compile_chart_config

    cfg = _cfg(
        source=ev_source,
        select=[SelectCol(agg_fn="count", alias="n")],
        group_by=["event_type"],
        granularity="1 hour",
    )
    rows = compile_chart_config(
        spark, convert_to_table_chart_config(cfg), sf_dir=sf_dir
    ).collect()
    types = [r["event_type"] for r in rows]
    assert types == sorted(types)  # group-ascending default ordering
    assert len(rows) <= 200


# ---- renderSeriesLimitCte gates now mirrored in compile (ts:1317-1333) ------


def test_series_limit_skipped_without_granularity(spark, sf_dir, ev_source):
    # a non-granular chart never applies the series cap — pie/bar tiles get
    # their LIMIT through the categorical conversion instead
    from hyperdx_spark.compile import compile_chart_config

    cfg = _cfg(
        source=ev_source,
        select=[SelectCol(agg_fn="count", alias="cnt")],
        group_by=["event_type"],
        series_limit=2,
    )
    rows = compile_chart_config(spark, cfg, sf_dir=sf_dir).collect()
    assert len(rows) > 2  # all groups kept


def test_series_limit_skipped_when_group_not_selected(spark, sf_dir, ev_source):
    # selectGroupBy === false skips the CTE in the reference; previously this
    # crashed (join keys dropped from the output) — now it's a clean skip
    from hyperdx_spark.compile import compile_chart_config

    cfg = _cfg(
        source=ev_source,
        select=[SelectCol(agg_fn="count", alias="cnt")],
        group_by=["event_type"],
        granularity="1 day",
        series_limit=2,
        select_group_by=False,
    )
    rows = compile_chart_config(spark, cfg, sf_dir=sf_dir).collect()
    assert len(rows) > 0
    assert set(rows[0].asDict()) == {"cnt"}


def test_series_limit_rejects_non_integer(spark, sf_dir, ev_source):
    # Number.isInteger guard: a float seriesLimit must not bind as a LIMIT
    from hyperdx_spark.compile import compile_chart_config

    cfg = _cfg(
        source=ev_source,
        select=[SelectCol(agg_fn="count", alias="cnt")],
        group_by=["event_type"],
        granularity="1 day",
        series_limit=2.5,
    )
    df = compile_chart_config(spark, cfg, sf_dir=sf_dir)
    assert df.select("event_type").distinct().count() > 2


# ---- convertToTimeChartConfig + resolveRenderedSeriesCap twins (r11) ---------
# (app ChartUtils.test.ts:1153-1260 + defaults.ts:44-58)


def test_resolve_rendered_series_cap():
    from hyperdx_spark.display import (
        MAX_RENDERED_TIME_CHART_SERIES,
        resolve_rendered_series_cap,
    )

    assert resolve_rendered_series_cap(None) == MAX_RENDERED_TIME_CHART_SERIES
    assert resolve_rendered_series_cap(0) == float("inf")  # load-all escape
    assert resolve_rendered_series_cap(5) == 5
    # malformed values fall back to the default — never disable the guard
    assert resolve_rendered_series_cap(-1) == MAX_RENDERED_TIME_CHART_SERIES
    assert resolve_rendered_series_cap(1.5) == MAX_RENDERED_TIME_CHART_SERIES
    assert resolve_rendered_series_cap(True) == MAX_RENDERED_TIME_CHART_SERIES


def test_convert_to_time_chart_config():
    from datetime import datetime

    from hyperdx_spark.display import convert_to_time_chart_config

    rng = (datetime(2025, 11, 26), datetime(2025, 11, 27))

    def conv(**kw):
        kw.setdefault("date_range", rng)
        return convert_to_time_chart_config(
            _cfg(select=[SelectCol(agg_fn="count", alias="cnt")], **kw)
        )

    # 'auto' and unset granularity resolve from the range (80-bucket target)
    assert conv(granularity="auto").granularity == "30 minute"
    assert conv(granularity=None).granularity == "30 minute"
    assert conv(granularity="5 minute").granularity == "5 minute"

    # seriesLimit normalization: unset/cleared/zero -> None; positive kept
    assert conv(granularity="5 minute").series_limit is None
    assert conv(granularity="5 minute", series_limit=None).series_limit is None
    assert conv(granularity="5 minute", series_limit=0).series_limit is None
    assert conv(granularity="5 minute", series_limit=5).series_limit == 5
    assert conv(granularity="5 minute", series_limit=100000).series_limit == 100000

    # aligned range turns end-exclusive; the row limit pins to 100000
    out = conv(granularity="1 hour",
               date_range=(datetime(2025, 11, 26, 0, 10),
                           datetime(2025, 11, 26, 22, 40)))
    assert out.date_range == (datetime(2025, 11, 26, 0, 0),
                              datetime(2025, 11, 26, 23, 0))
    assert out.date_range_end_inclusive is False
    assert out.limit == 100000

    # alignment off keeps the caller's exact range
    cfg = _cfg(select=[SelectCol(agg_fn="count", alias="cnt")],
               date_range=(datetime(2025, 11, 26, 0, 10),
                           datetime(2025, 11, 26, 22, 40)),
               granularity="1 hour")
    out = convert_to_time_chart_config(cfg, align_date_range_to_granularity=False)
    assert out.date_range == cfg.date_range


def test_time_chart_config_max_buckets_cap():
    """cli/shared/tileConfig.ts:261-296 — maxBuckets generalizes the
    80-bucket auto-granularity target (1 bucket ~ 1 terminal column)."""
    from datetime import datetime

    from hyperdx_spark.display import convert_to_time_chart_config
    from hyperdx_spark.granularity import granularity_seconds
    from hyperdx_spark.model import ChartConfig, Source

    cfg = ChartConfig(
        source=Source(table="events", timestamp_value_expression="ts"),
        granularity="auto",
        date_range=(datetime(2024, 1, 1), datetime(2024, 1, 1, 1)),
    )
    web = convert_to_time_chart_config(cfg)
    narrow = convert_to_time_chart_config(cfg, max_buckets=20)
    # 1h/80 -> 1 minute; 1h/20 -> coarser ladder rung
    assert granularity_seconds(web.granularity) == 60
    assert granularity_seconds(narrow.granularity) > 60
    assert granularity_seconds(narrow.granularity) * 20 >= 3600


def test_chart_drilldown_filters():
    """ChartUtils.tsx:1173-1203 — chart-point drill-down filter derivation:
    group IN filters, the ±5% value-range BETWEEN for non-aggregate Y
    expressions only, sqlstring escaping, null/empty gates."""
    from hyperdx_spark.display import chart_drilldown_filters as c

    assert c([{"column": "service", "value": "api"}]) == [
        {"type": "sql", "condition": "service IN ('api')"}
    ]
    # sqlstring escaping guards injection; numbers via String(number)
    assert c([{"column": "s", "value": "a'b"}]) == [
        {"type": "sql", "condition": "s IN ('a\\'b')"}
    ]
    assert c([{"column": "uid", "value": 7}]) == [
        {"type": "sql", "condition": "uid IN (7)"}
    ]
    # null value / empty column skipped (the reference's `value != null`)
    assert c([{"column": "level", "value": None}, {"column": "", "value": "x"}]) == []
    # ±threshold BETWEEN, default 0.05, non-aggregate only
    assert c([], {"expression": "duration", "value": 100.0}) == [
        {"type": "sql", "condition": "duration BETWEEN 95 AND 105"}
    ]
    assert c([], {"expression": "duration", "value": 100.0, "threshold": 0.5}) == [
        {"type": "sql", "condition": "duration BETWEEN 50 AND 150"}
    ]
    assert c([], {"expression": "avg(duration)", "value": 100.0}) == []
    # composes: group filters first, then the range filter
    got = c([{"column": "service", "value": "api"}],
            {"expression": "duration", "value": 100.0})
    assert [f["condition"] for f in got] == [
        "service IN ('api')", "duration BETWEEN 95 AND 105",
    ]


def test_trace_duration_number_format_reference_matrix():
    """source.test.ts getTraceDurationNumberFormat describe walked: exact
    expression match only, unit-preserving aggFns, combinator stripping,
    count/count_distinct dimensionless."""
    from hyperdx_spark.display import (
        get_first_series_number_format,
        get_trace_duration_number_format as g,
    )
    from hyperdx_spark.model import Source

    trace = Source(
        table="t", kind="trace", timestamp_value_expression="ts",
        duration_expression="Duration", duration_precision=9,
    )
    log = Source(table="l", kind="log", timestamp_value_expression="ts",
                 duration_expression="Duration")
    dur_fmt = {"output": "duration", "factor": 1e-9}

    assert g(log, {"value_expression": "Duration", "agg_fn": "avg"}) is None
    assert g(None, {"value_expression": "Duration"}) is None
    assert g(trace, {"value_expression": "other", "agg_fn": "avg"}) is None
    # exact match with unit-preserving aggFn
    assert g(trace, {"value_expression": "Duration", "agg_fn": "avg"}) == dur_fmt
    # raw expression (no aggFn) preserves the unit
    assert g(trace, {"value_expression": "Duration"}) == dur_fmt
    # only-contains is not a match (arbitrary SQL; substring is fragile)
    assert g(trace, {"value_expression": "Duration/1000", "agg_fn": "avg"}) is None
    # dimensionless aggregates never inherit the format
    assert g(trace, {"value_expression": "Duration", "agg_fn": "count"}) is None
    assert g(trace, {"value_expression": "Duration",
                     "agg_fn": "count_distinct"}) is None
    # combinator forms strip If/IfState/IfMerge
    assert g(trace, {"value_expression": "Duration", "agg_fn": "avgIf"}) == dur_fmt
    assert g(trace, {"value_expression": "Duration",
                     "agg_fn": "quantileIfState"}) == dur_fmt
    # series priority: explicit numberFormat beats the inferred duration
    explicit = {"value_expression": "x", "number_format": {"output": "number"}}
    got = get_first_series_number_format(
        [explicit, {"value_expression": "Duration", "agg_fn": "avg"}], trace
    )
    assert got == {"output": "number"}
    got = get_first_series_number_format(
        [{"value_expression": "cnt", "agg_fn": "count"},
         {"value_expression": "Duration", "agg_fn": "avg"}], trace
    )
    assert got == dur_fmt
    assert get_first_series_number_format(
        [{"value_expression": "cnt", "agg_fn": "count"}], trace
    ) is None


def test_duration_expressions():
    from hyperdx_spark.model import Source
    from hyperdx_spark.rowdata import (
        build_row_lookup_config,
        get_duration_ms_expression,
        get_duration_seconds_expression,
    )

    trace = Source(
        table="t", kind="trace", timestamp_value_expression="ts",
        duration_expression="Duration", duration_precision=9,
    )
    assert get_duration_ms_expression(trace) == "(Duration)/1e6"
    assert get_duration_seconds_expression(trace) == "(Duration)/1e9"
    cfg = build_row_lookup_config(trace, "id=1")
    assert {"value_expression": "(Duration)/1e6",
            "alias": "__hdx_duration_ms"} in cfg["select"]
    # log sources never project the duration alias
    log = Source(table="l", kind="log", timestamp_value_expression="ts",
                 duration_expression="Duration")
    cfg = build_row_lookup_config(log, "id=1")
    assert not any(s.get("alias") == "__hdx_duration_ms" for s in cfg["select"])


def test_search_replay_params_reference_twin():
    """dashboardReplaySearch.test.ts semantics: preserved query/filters/
    range, single-series condition promotion, rejection of conditions
    that cannot be faithfully replayed (ChartUtils.tsx:1130-1277)."""
    from datetime import datetime

    from hyperdx_spark.display import (
        build_search_replay_params,
        can_replay_dashboard_search,
        extract_group_columns,
        promote_series_condition,
    )
    from hyperdx_spark.model import ChartConfig, SelectCol, Source, SqlFilter

    src = Source(table="events", timestamp_value_expression="ts")
    rng = (datetime(2024, 1, 1), datetime(2024, 1, 2))

    # preserved where/filters/range
    cfg = ChartConfig(
        source=src, select=[SelectCol(agg_fn="count")], where="level:error",
        filters=[SqlFilter(condition="value > 1")], date_range=rng,
    )
    p = build_search_replay_params(cfg, require_replayable=True)
    assert p["where"] == "level:error" and p["where_language"] == "lucene"
    assert p["filters"][0].condition == "value > 1"
    assert p["from_ms"] == 1704067200000 and p["to_ms"] == 1704153600000

    # single per-series condition, no global where -> promoted
    cfg = ChartConfig(
        source=src, where="",
        select=[SelectCol(agg_fn="count", agg_condition="status:500",
                          agg_condition_language="lucene")],
        date_range=rng,
    )
    assert promote_series_condition(cfg) == ("status:500", "lucene")
    assert can_replay_dashboard_search(cfg)
    assert build_search_replay_params(cfg, require_replayable=True)[
        "where"
    ] == "status:500"

    # multiple per-series conditions cannot be faithfully replayed
    cfg = ChartConfig(
        source=src, where="",
        select=[
            SelectCol(agg_fn="count", agg_condition="status:500"),
            SelectCol(agg_fn="count", agg_condition="status:200"),
        ],
        date_range=rng,
    )
    assert not can_replay_dashboard_search(cfg)
    assert build_search_replay_params(cfg, require_replayable=True) is None
    # ...as can't a series condition combined with a global where
    cfg = ChartConfig(
        source=src, where="svc:api",
        select=[SelectCol(agg_fn="count", agg_condition="status:500")],
        date_range=rng,
    )
    assert not can_replay_dashboard_search(cfg)
    # but with promotion impossible the global where still replays alone
    cfg = ChartConfig(
        source=src, where="svc:api",
        select=[SelectCol(agg_fn="count")], date_range=rng,
    )
    assert build_search_replay_params(cfg, require_replayable=True)[
        "where"
    ] == "svc:api"

    # group-by extraction: string and array forms
    assert extract_group_columns("col1, col2") == ["col1", "col2"]
    assert extract_group_columns(["a", {"value_expression": "b"}]) == ["a", "b"]
    assert extract_group_columns(None) == []


def test_table_row_drilldown_reference_twin():
    """ChartUtils.tsx:1301-1368 buildTableRowSearchUrl's derivation: group
    filters from row values of group columns, value-range from the first
    select only when attributable and numeric."""
    from hyperdx_spark.display import (
        build_search_replay_params,
        table_row_drilldown,
    )
    from hyperdx_spark.model import ChartConfig, SelectCol, Source

    src = Source(table="events", timestamp_value_expression="ts")
    cfg = ChartConfig(
        source=src, group_by=["service"],
        select=[SelectCol(agg_fn="avg", value_expression="duration")],
    )
    d = table_row_drilldown(cfg, {"service": "api", "avg_d": 120.0})
    assert d["group_filters"] == [{"column": "service", "value": "api"}]
    assert d["value_range_filter"] == {"expression": "duration", "value": 120.0}
    # null group value skipped
    d = table_row_drilldown(cfg, {"service": None, "avg_d": 120.0})
    assert d["group_filters"] == []
    # non-attributable aggFns (count/sum/count_distinct/increase): no range
    for fn in ("count", "sum", "count_distinct", "increase"):
        cfg2 = ChartConfig(
            source=src, group_by=["service"],
            select=[SelectCol(agg_fn=fn, value_expression="duration")],
        )
        assert table_row_drilldown(
            cfg2, {"service": "api", "v": 5.0}
        )["value_range_filter"] is None
    # non-numeric first value column: no range filter
    d = table_row_drilldown(cfg, {"service": "api", "name": "x"})
    assert d["value_range_filter"] is None
    # composes into the replay params with the ±5% BETWEEN
    d = table_row_drilldown(cfg, {"service": "api", "avg_d": 100.0})
    p = build_search_replay_params(cfg, **d)
    assert [f["condition"] for f in p["filters"]] == [
        "service IN ('api')", "duration BETWEEN 95 AND 105",
    ]
