"""Time-chart formatting (post.format_time_chart) — ChartUtils.tsx parity:
series keys, previous-period overlay, zero-fill, top-by-peak render cap."""

from datetime import datetime

import pytest

from hyperdx_spark.post import (
    CHART_KEY_JOINER,
    PREVIOUS_PERIOD_SUFFIX,
    format_time_chart,
    merge_result_sets,
    previous_period,
)


@pytest.fixture(scope="module")
def chart_df(spark):
    rows = [
        (datetime(2024, 1, 1, 0), "api", 10.0, 1.0),
        (datetime(2024, 1, 1, 0), "web", 5.0, 2.0),
        (datetime(2024, 1, 1, 1), "api", 20.0, 3.0),
        # hour 2 missing entirely (zero-fill target)
        (datetime(2024, 1, 1, 3), "web", 7.0, 4.0),
    ]
    return spark.createDataFrame(
        rows, "`__timestamp` timestamp, service string, cnt double, avg_v double"
    )


def test_single_value_grouped_key_omits_value_column(spark, chart_df):
    rows, meta, hidden = format_time_chart(
        chart_df.select("__timestamp", "service", "cnt"),
        value_cols=["cnt"],
        group_cols=["service"],
    )
    keys = {m["data_key"] for m in meta}
    assert keys == {"api", "web"}
    assert hidden == 0
    first = rows[0]
    assert first["api"] == 10.0 and first["web"] == 5.0


def test_multi_value_key_prefixes_value_column(spark, chart_df):
    rows, meta, _ = format_time_chart(
        chart_df, value_cols=["cnt", "avg_v"], group_cols=["service"]
    )
    keys = {m["data_key"] for m in meta}
    assert f"cnt{CHART_KEY_JOINER}api" in keys
    assert f"avg_v{CHART_KEY_JOINER}web" in keys
    # group identity strips the value prefix: cnt·api and avg_v·api share it
    groups = {m["group_key"] for m in meta}
    assert groups == {"api", "web"}


def test_zero_fill(spark, chart_df):
    rows, _, _ = format_time_chart(
        chart_df.select("__timestamp", "service", "cnt"),
        value_cols=["cnt"],
        group_cols=["service"],
        date_range=(datetime(2024, 1, 1, 0), datetime(2024, 1, 1, 3)),
        step_seconds=3600,
    )
    assert len(rows) == 4  # hours 0-3 inclusive, hour 2 generated
    h2 = rows[2]
    assert h2["api"] == 0.0 and h2["web"] == 0.0


def test_previous_period_overlay_and_suffix(spark, chart_df):
    cur = chart_df.select("__timestamp", "service", "cnt")
    prev = previous_period(cur, offset_seconds=3600)  # pretend prior window
    rows, meta, _ = format_time_chart(
        cur,
        value_cols=["cnt"],
        group_cols=["service"],
        previous_df=cur,
        previous_offset_seconds=3600,
    )
    prev_keys = {m["data_key"] for m in meta if m["is_previous"]}
    assert prev_keys == {
        "api" + PREVIOUS_PERIOD_SUFFIX,
        "web" + PREVIOUS_PERIOD_SUFFIX,
    }
    # shifted: the previous series' first bucket lands one hour later
    ts0 = int(datetime(2024, 1, 1, 0).timestamp())
    by_ts = {r["__timestamp"]: r for r in rows}
    assert by_ts[ts0 + 3600]["api" + PREVIOUS_PERIOD_SUFFIX] == 10.0


def test_render_cap_keeps_top_by_peak(spark):
    rows_in = [
        (datetime(2024, 1, 1), f"g{i}", float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows_in, "`__timestamp` timestamp, g string, v double")
    rows, meta, hidden = format_time_chart(
        df, value_cols=["v"], group_cols=["g"], max_series=3
    )
    assert hidden == 7
    assert {m["data_key"] for m in meta} == {"g9", "g8", "g7"}


def test_merge_result_sets_full_outer(spark):
    a = spark.createDataFrame(
        [(datetime(2024, 1, 1), 1.0)], "`__timestamp` timestamp, a double"
    )
    b = spark.createDataFrame(
        [(datetime(2024, 1, 2), 2.0)], "`__timestamp` timestamp, b double"
    )
    m = merge_result_sets([a, b], on=["__timestamp"])
    got = {r["__timestamp"]: (r["a"], r["b"]) for r in m.collect()}
    assert got[datetime(2024, 1, 1)] == (1.0, None)
    assert got[datetime(2024, 1, 2)] == (None, 2.0)


def test_merge_result_sets_alias_collision(spark):
    from datetime import datetime

    a = spark.createDataFrame(
        [(datetime(2024, 1, 1), 1.0)], "`__timestamp` timestamp, cnt double"
    )
    b = spark.createDataFrame(
        [(datetime(2024, 1, 1), 2.0)], "`__timestamp` timestamp, cnt double"
    )
    m = merge_result_sets([a, b], on=["__timestamp"])
    # mergeResultSets collision suffix is __<splitIdx> (index.ts:529-533)
    # and value columns head the joined meta in split order
    assert m.columns == ["cnt", "cnt__1", "__timestamp"]
    row = m.collect()[0]
    assert row["cnt"] == 1.0 and row["cnt__1"] == 2.0


def test_merge_result_sets_value_columns_first(spark):
    """queryChartConfig.int.test.ts:108-174 twin: splitting a three-metric
    select yields per-metric results whose value columns (aliased
    `agg(metricName)` by setChartSelectsAlias) head the joined meta in
    select order, with the time bucket after them."""
    from hyperdx_spark.metrics import default_metric_alias

    t = datetime(2025, 4, 14, 12)
    dfs = [
        spark.createDataFrame(
            [(t, float(i + 1))],
            f"`__timestamp` timestamp, `{default_metric_alias('avg', name)}` double",
        )
        for i, name in enumerate(["metric.alpha", "metric.beta", "metric.gamma"])
    ]
    m = merge_result_sets(dfs, on=["__timestamp"])
    assert m.columns[:3] == [
        "avg(metric.alpha)", "avg(metric.beta)", "avg(metric.gamma)",
    ]
    assert m.columns.index("__timestamp") >= 3
    row = m.collect()[0]
    assert [row[c] for c in m.columns[:3]] == [1.0, 2.0, 3.0]


def test_default_metric_alias_rules():
    from hyperdx_spark.metrics import default_metric_alias

    assert default_metric_alias("avg", "m.cpu") == "avg(m.cpu)"
    assert default_metric_alias("increase", "m.req") == "increase(m.req)"
    assert default_metric_alias("sum", "m.g", is_delta=True) == "sum(delta(m.g))"


def test_ratio_merged_result_sets_semantics(spark):
    """Twins of clickhouse/index.ts computeResultSetRatio tests over a real
    merged (full-outer) pair: zero-numerator group reads 0 not NULL; a group
    missing its denominator doesn't poison the share_of_total bucket total;
    its own per_group ratio is NULL (the reference's NaN/N-A); grand-total
    share applies when there is no timestamp column."""
    from hyperdx_spark.post import compute_ratio, merge_result_sets

    errors = spark.createDataFrame(
        [("t0", "acme", 20.0), ("t0", "globex", 5.0)],
        "__timestamp string, tenant string, errors double",
    )
    total = spark.createDataFrame(
        [("t0", "acme", 100.0), ("t0", "initech", 100.0)],
        "__timestamp string, tenant string, total double",
    )
    merged = merge_result_sets([errors, total], on=["__timestamp", "tenant"])

    share = {
        r["tenant"]: r["ratio"]
        for r in compute_ratio(
            merged, numerator="errors", denominator="total",
            mode="share_of_total",
        ).collect()
    }
    # bucket total = 200 (globex's missing denominator is skipped, not NaN)
    assert share["acme"] == 20.0 / 200.0
    assert share["initech"] == 0.0  # zero-error group reads 0%, not N/A
    assert share["globex"] == 5.0 / 200.0

    per_group = {
        r["tenant"]: r["ratio"]
        for r in compute_ratio(
            merged, numerator="errors", denominator="total", mode="per_group"
        ).collect()
    }
    assert per_group["acme"] == 0.2
    assert per_group["initech"] == 0.0
    assert per_group["globex"] is None  # missing own denominator -> undefined

    # no timestamp column -> grand total (Table/Number ratio)
    flat = merged.drop("__timestamp")
    grand = {
        r["tenant"]: r["ratio"]
        for r in compute_ratio(
            flat, numerator="errors", denominator="total",
            mode="share_of_total",
        ).collect()
    }
    assert grand["acme"] == 0.1


def test_ratio_series_cap_int_cases(spark):
    """queryChartConfig.int.test.ts:568-744 twins: the cap keeps the
    highest-RATIO groups (not highest-numerator); non-finite ratios rank
    below every finite one but survive when the limit exceeds the group
    count."""
    from hyperdx_spark.post import compute_ratio, limit_ratio_series

    df = spark.createDataFrame(
        [
            # group, numerator, denominator: big numerator but low ratio
            ("bulk", 1000.0, 100000.0),   # ratio 0.01
            ("hot", 9.0, 10.0),           # ratio 0.9
            ("warm", 5.0, 10.0),          # ratio 0.5
            ("sparse", 3.0, 0.0),         # zero denominator -> undefined
        ],
        "g string, num double, den double",
    )
    rated = compute_ratio(df, numerator="num", denominator="den")
    top2 = {r["g"] for r in limit_ratio_series(rated, 2, group_cols=["g"]).collect()}
    assert top2 == {"hot", "warm"}  # ratio ranking, not numerator ranking
    # limit exceeding the group count keeps even the undefined-ratio group
    top10 = {r["g"] for r in limit_ratio_series(rated, 10, group_cols=["g"]).collect()}
    assert top10 == {"bulk", "hot", "warm", "sparse"}


def test_ratio_series_cap_no_groups_is_noop(spark):
    # r10 review fix: a non-grouped ratio has nothing to cap — clean no-op
    from hyperdx_spark.post import limit_ratio_series

    df = spark.createDataFrame([("t0", 0.5)], "__timestamp string, ratio double")
    assert limit_ratio_series(df, 2, group_cols=[]).count() == 1


def test_get_previous_date_range_truncates_to_seconds():
    """ChartUtils.tsx:482-489: shift back by the WHOLE-second range length
    (date-fns differenceInSeconds truncation)."""
    from datetime import datetime

    from hyperdx_spark.post import get_previous_date_range

    r = get_previous_date_range((datetime(2024, 1, 2), datetime(2024, 1, 3)))
    assert r == (datetime(2024, 1, 1), datetime(2024, 1, 2))
    # sub-second remainder truncates: 90.7s window shifts by 90s
    cur = (datetime(2024, 1, 1, 0, 0, 0), datetime(2024, 1, 1, 0, 1, 30, 700000))
    prev = get_previous_date_range(cur)
    assert prev == (
        datetime(2023, 12, 31, 23, 58, 30),
        datetime(2024, 1, 1, 0, 0, 0, 700000),
    )
