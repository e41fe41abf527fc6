"""Metric-semantics tests: gauge/counter-rate vs DuckDB window-function
oracles on the events table; histogram quantile vs hand-computed goldens
(modeled on the reference's renderChartConfig.int.test.ts fixtures)."""

from datetime import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from hyperdx_spark import metrics
from hyperdx_spark.post import compute_ratio, merge_result_sets


def duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con.execute(sql).fetchall()


def norm(rows):
    return sorted(
        [tuple(round(v, 6) if isinstance(v, float) else v for v in r) for r in rows],
        key=repr,
    )


def test_gauge_bucket(spark, sf_dir, events):
    """Gauge: last sample per (series, bucket), averaged across series."""
    df = metrics.gauge_bucket(
        events,
        ts="ts",
        value="value",
        series_cols=["user_id"],
        group_cols=["event_type"],
        bucket_seconds=86400,
        agg="avg",
        value_alias="v",
    )
    want = duck(
        sf_dir,
        """
        WITH inner_g AS (
          SELECT make_timestamp((floor(epoch(ts))::BIGINT // 86400) * 86400 * 1000000) AS b,
                 user_id, event_type, arg_max(value, ts) AS lastv
          FROM events GROUP BY 1, 2, 3)
        SELECT b, event_type, avg(lastv) AS v FROM inner_g GROUP BY 1, 2
        """,
    )
    assert norm(df.collect()) == norm(want)


def test_counter_rate_reset_clamp(spark):
    """Counter resets clamp to 0; first sample contributes nothing
    (renderChartConfig.ts:1871-1901 int-test semantics)."""
    rows = [
        # series A: 10 -> 15 -> 3 (reset) -> 7
        ("A", datetime(2024, 1, 1, 0, 0), 10.0),
        ("A", datetime(2024, 1, 1, 0, 1), 15.0),
        ("A", datetime(2024, 1, 1, 0, 2), 3.0),
        ("A", datetime(2024, 1, 1, 0, 3), 7.0),
        # series B in the same bucket: 100 -> 150
        ("B", datetime(2024, 1, 1, 0, 2), 100.0),
        ("B", datetime(2024, 1, 1, 0, 4), 150.0),
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    out = metrics.counter_rate(
        df,
        ts="ts",
        value="value",
        series_cols=["series"],
        bucket_seconds=3600,
        value_alias="rate",
    ).collect()
    assert len(out) == 1
    # A: +5, reset->0, +4 ; B: +50  => 59
    assert out[0]["rate"] == pytest.approx(59.0)


def test_counter_rate_delta_temporality(spark):
    rows = [
        ("A", datetime(2024, 1, 1, 0, 0), 5.0),
        ("A", datetime(2024, 1, 1, 0, 1), 7.0),
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    out = metrics.counter_rate(
        df, ts="ts", value="value", series_cols=["series"],
        bucket_seconds=3600, is_delta=True,
    ).collect()
    assert out[0]["rate"] == pytest.approx(12.0)


def test_counter_rate_oracle(spark, sf_dir, events):
    """Treat events.value as a cumulative counter per event_type series."""
    df = metrics.counter_rate(
        events,
        ts="ts",
        value="value",
        series_cols=["event_type"],
        group_cols=["event_type"],
        bucket_seconds=86400,
        value_alias="rate",
    )
    want = duck(
        sf_dir,
        """
        WITH d AS (
          SELECT event_type, ts, value,
                 lag(value) OVER (PARTITION BY event_type ORDER BY ts) AS prev
          FROM events)
        SELECT make_timestamp((floor(epoch(ts))::BIGINT // 86400) * 86400 * 1000000) AS b,
               event_type,
               sum(CASE WHEN prev IS NULL THEN NULL ELSE greatest(value - prev, 0) END) AS rate
        FROM d GROUP BY 1, 2
        """,
    )
    assert norm(df.collect()) == norm(want)


def test_counter_increase_top_groups(spark, sf_dir, events):
    df = metrics.counter_increase(
        events,
        ts="ts",
        value="value",
        series_cols=["event_type"],
        group_cols=["event_type"],
        bucket_seconds=86400,
        top_groups=2,
    )
    got = df.collect()
    assert len({r["event_type"] for r in got}) == 2


def test_histogram_quantile_linear_interp(spark):
    """Golden: single cumulative series, bounds [1, 5, 10], p50.

    t0 counts [0,0,0,0]; t1 counts [2,4,6,8] => delta [2,4,6,8], total 20,
    rank 10; cum [2,6,12,20] -> first >= 10 is bucket 3 (bounds 5..10),
    interp = 5 + (10-6)/6 * (10-5) = 8.3333…
    """
    rows = [
        ("s1", datetime(2024, 1, 1, 0, 0), [0, 0, 0, 0], [1.0, 5.0, 10.0]),
        ("s1", datetime(2024, 1, 1, 0, 1), [2, 4, 6, 8], [1.0, 5.0, 10.0]),
    ]
    df = spark.createDataFrame(
        rows, "series string, ts timestamp, counts array<bigint>, bounds array<double>"
    )
    out = metrics.histogram_quantile(
        df,
        ts="ts",
        bucket_counts="counts",
        explicit_bounds="bounds",
        series_cols=["series"],
        bucket_seconds=3600,
        level=0.5,
        value_alias="p50",
    ).collect()
    assert len(out) == 1
    assert out[0]["p50"] == pytest.approx(5 + (10 - 6) / 6 * 5)


def test_histogram_quantile_reset_and_unbounded(spark):
    """Reset (count decreased) uses current counts; rank landing in the last
    (+inf) bucket returns its lower bound (histogram.ts:232-246)."""
    rows = [
        ("s1", datetime(2024, 1, 1, 0, 0), [5, 5], [10.0]),
        ("s1", datetime(2024, 1, 1, 0, 1), [1, 9], [10.0]),  # reset: 1 < 5
    ]
    df = spark.createDataFrame(
        rows, "series string, ts timestamp, counts array<bigint>, bounds array<double>"
    )
    out = metrics.histogram_quantile(
        df,
        ts="ts",
        bucket_counts="counts",
        explicit_bounds="bounds",
        series_cols=["series"],
        bucket_seconds=3600,
        level=0.99,
        value_alias="p99",
    ).collect()
    # deltas: t0 [5,5] (first point) + t1 [1,9] (reset -> current) = [6,14]
    # total 20, rank 19.8 -> falls in unbounded bucket -> returns bound 10.0
    assert out[0]["p99"] == pytest.approx(10.0)


def test_ratio_and_merge(spark, sf_dir, events):
    from pyspark.sql import functions as F

    daily = events.groupBy(
        F.date_trunc("day", "ts").alias("__timestamp")
    )
    errors = daily.agg(
        F.count_if(F.col("event_type") == "error").alias("errors"),
        F.count("*").alias("total"),
    )
    merged = compute_ratio(errors, numerator="errors", denominator="total")
    got = merged.select("__timestamp", "ratio").collect()
    want = duck(
        sf_dir,
        """
        SELECT date_trunc('day', ts)::TIMESTAMP AS b,
               count(*) FILTER (event_type = 'error')::DOUBLE / count(*) AS ratio
        FROM events GROUP BY 1
        """,
    )
    assert norm(got) == norm(want)


def test_share_of_total(spark):
    rows = [
        (datetime(2024, 1, 1), "a", 10.0),
        (datetime(2024, 1, 1), "b", 30.0),
        (datetime(2024, 1, 2), "a", 5.0),
    ]
    df = spark.createDataFrame(rows, "__timestamp timestamp, g string, v double")
    out = compute_ratio(
        df, numerator="v", denominator="v", mode="share_of_total"
    ).collect()
    got = {(r["__timestamp"].day, r["g"]): r["ratio"] for r in out}
    assert got[(1, "a")] == pytest.approx(0.25)
    assert got[(1, "b")] == pytest.approx(0.75)
    assert got[(2, "a")] == pytest.approx(1.0)


# ---------------------------------------------------------------- histograms


def test_histogram_count_reset_semantics(spark):
    from hyperdx_spark import metrics

    rows = [
        # series s1 cumulative: 5 -> 8 (+3) -> 2 (reset: +2) -> 6 (+4)
        (datetime(2024, 1, 1, 0, 0), "s1", 5),
        (datetime(2024, 1, 1, 0, 1), "s1", 8),
        (datetime(2024, 1, 1, 0, 2), "s1", 2),
        (datetime(2024, 1, 1, 0, 3), "s1", 6),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, sid string, cnt long")
    out = metrics.histogram_count(
        df, ts="ts", count="cnt", series_cols=["sid"], bucket_seconds=3600
    ).collect()
    assert len(out) == 1
    assert out[0]["count"] == 3 + 2 + 4  # first point contributes 0


def test_exp_histogram_count_start_time_reset(spark):
    from hyperdx_spark import metrics

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # (ts, start, count): first point ignored; start change -> current
        (t(1), t(0), "s", 10),
        (t(2), t(0), "s", 15),   # +5
        (t(3), t(3), "s", 99),   # start == ts -> 0
        (t(4), t(3), "s", 7),    # start changed vs prev(t0->t3) -> current 7
        (t(5), t(3), "s", 9),    # +2
    ]
    df = spark.createDataFrame(rows, "ts timestamp, st timestamp, sid string, cnt long")
    out = metrics.exp_histogram_count(
        df, ts="ts", start_ts="st", count="cnt", series_cols=["sid"],
        bucket_seconds=3600,
    ).collect()
    assert len(out) == 1
    assert out[0]["count"] == 5 + 0 + 7 + 2


def _exp_hist_df(spark, rows):
    schema = (
        "ts timestamp, st timestamp, sid string, scale int, zero long, "
        "pos_off long, pos long_array, neg_off long, neg long_array"
    )
    schema = schema.replace("long_array", "array<long>")
    return spark.createDataFrame(rows, schema)


def test_exp_histogram_quantile_delta_simple(spark):
    from hyperdx_spark import metrics

    t0 = datetime(2024, 1, 1)
    # one delta sample, scale 0, buckets idx 0,1,2 -> counts 1,1,2
    df = _exp_hist_df(spark, [(t0, t0, "s", 0, 0, 0, [1, 1, 2], 0, [])])
    out = metrics.exp_histogram_quantile(
        df, ts="ts", start_ts="st", scale="scale", zero_count="zero",
        pos_offset="pos_off", pos_counts="pos", neg_offset="neg_off",
        neg_counts="neg", series_cols=["sid"], bucket_seconds=3600, level=0.5,
        temporality_col=None,
    )
    # temporality default cumulative; mark delta via temporality col instead
    df = df.withColumn("temp", F.lit(1))
    out = metrics.exp_histogram_quantile(
        df, ts="ts", start_ts="st", scale="scale", zero_count="zero",
        pos_offset="pos_off", pos_counts="pos", neg_offset="neg_off",
        neg_counts="neg", series_cols=["sid"], bucket_seconds=3600, level=0.5,
        temporality_col="temp",
    ).collect()
    # total=4 rank=2, cum=[1,2,4] -> bucket idx1, frac=(2-1)/1=1 -> 2^(1+1)=4
    assert len(out) == 1
    assert out[0]["p"] == pytest.approx(4.0)


def test_exp_histogram_quantile_zero_bucket(spark):
    from hyperdx_spark import metrics

    t0 = datetime(2024, 1, 1)
    df = _exp_hist_df(spark, [(t0, t0, "s", 0, 2, 0, [1, 1], 0, [])]).withColumn(
        "temp", F.lit(1)
    )
    out = metrics.exp_histogram_quantile(
        df, ts="ts", start_ts="st", scale="scale", zero_count="zero",
        pos_offset="pos_off", pos_counts="pos", neg_offset="neg_off",
        neg_counts="neg", series_cols=["sid"], bucket_seconds=3600, level=0.5,
        temporality_col="temp",
    ).collect()
    # ordered [zero(2), idx0(1), idx1(1)]: rank=2 -> zero bucket -> 0.0
    assert out[0]["p"] == pytest.approx(0.0)


def test_exp_histogram_quantile_scale_normalization(spark):
    from hyperdx_spark import metrics

    t0 = datetime(2024, 1, 1)
    rows = [
        # series a at scale 1, idx 2..3 -> normalized scale 0 idx 1 (cnt 4)
        (t0, t0, "a", 1, 0, 2, [1, 3], 0, []),
        # series b already at scale 0, idx 1 cnt 4
        (t0, t0, "b", 0, 0, 1, [4], 0, []),
    ]
    df = _exp_hist_df(spark, rows).withColumn("temp", F.lit(1))
    out = metrics.exp_histogram_quantile(
        df, ts="ts", start_ts="st", scale="scale", zero_count="zero",
        pos_offset="pos_off", pos_counts="pos", neg_offset="neg_off",
        neg_counts="neg", series_cols=["sid"], bucket_seconds=3600, level=0.5,
        temporality_col="temp",
    ).collect()
    # summed: idx1 cnt8; rank=4 -> frac=0.5 -> 2^(1.5)
    assert out[0]["p"] == pytest.approx(2 ** 1.5)


def test_exp_histogram_quantile_cumulative_alignment_reset(spark):
    from hyperdx_spark import metrics

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # cumulative series: first point ignored; second shifts the index
        # window so counts are dropped on alignment -> reset -> use current
        (t(1), t(0), "s", 0, 0, 0, [2, 2], 0, []),
        (t(2), t(0), "s", 0, 0, 1, [3, 1], 0, []),
    ]
    df = _exp_hist_df(spark, rows)
    out = metrics.exp_histogram_quantile(
        df, ts="ts", start_ts="st", scale="scale", zero_count="zero",
        pos_offset="pos_off", pos_counts="pos", neg_offset="neg_off",
        neg_counts="neg", series_cols=["sid"], bucket_seconds=3600, level=0.99,
    ).collect()
    # delta = current [3,1] at idx 1,2; total 4, rank 3.96 -> idx2,
    # frac=(3.96-3)/1=0.96 -> 2^(2.96)
    assert out[0]["p"] == pytest.approx(2 ** 2.96)


def test_exp_histogram_quantile_negative_side(spark):
    from hyperdx_spark import metrics

    t0 = datetime(2024, 1, 1)
    # only negative buckets: idx 0 cnt 3, idx 1 cnt 1 ->
    # ascending order: [neg idx1, neg idx0, zero(0)]
    df = _exp_hist_df(spark, [(t0, t0, "s", 0, 0, 0, [], 0, [3, 1])]).withColumn(
        "temp", F.lit(1)
    )
    out = metrics.exp_histogram_quantile(
        df, ts="ts", start_ts="st", scale="scale", zero_count="zero",
        pos_offset="pos_off", pos_counts="pos", neg_offset="neg_off",
        neg_counts="neg", series_cols=["sid"], bucket_seconds=3600, level=0.25,
        temporality_col="temp",
    ).collect()
    # rank=1 -> first bucket (neg idx1), frac=1/1=1 -> -2^(1+1-1) = -2
    assert out[0]["p"] == pytest.approx(-2.0)


def test_gauge_delta_extrapolated(spark):
    """renderDeltaExpression (renderChartConfig.ts:1655-1684): per-bucket
    extrapolated delta = (argMax - argMin) * interval / time_diff; 0 for
    single-sample buckets."""
    from datetime import datetime

    from hyperdx_spark import metrics

    rows = [
        # series s1, bucket 0: samples at 0s (v=10) and 40s (v=22) in a 60s
        # bucket -> (22-10)*60/40 = 18
        (datetime(2024, 1, 1, 0, 0, 0), 10.0, "s1"),
        (datetime(2024, 1, 1, 0, 0, 40), 22.0, "s1"),
        # series s2, single sample -> 0
        (datetime(2024, 1, 1, 0, 0, 30), 99.0, "s2"),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double, sid string")
    out = metrics.gauge_bucket(
        df, ts="ts", value="v", series_cols=["sid"], bucket_seconds=60,
        group_cols=["sid"], agg="sum", is_delta=True,
    ).collect()
    got = {r["sid"]: r["value"] for r in out}
    assert got["s1"] == 18.0
    assert got["s2"] == 0.0


def test_unsupported_metric_type_raises():
    import pytest as _pytest

    from hyperdx_spark.metrics import require_supported_metric_type

    assert require_supported_metric_type("Gauge") == "gauge"
    with _pytest.raises(ValueError, match="Unsupported metric type"):
        require_supported_metric_type("summary")


def test_metric_name_filter_migration_sql(spark):
    """createMetricNameFilter parity (renderChartConfig.ts:67-75): the
    semantic-convention migration SQL matches old AND new names; plain
    configs fall back to exact equality."""
    from hyperdx_spark.metrics import metric_name_filter

    df = spark.createDataFrame(
        [("k8s.pod.cpu.utilization", 1.0), ("k8s.pod.cpu.usage", 2.0),
         ("other.metric", 3.0)],
        "MetricName string, Value double",
    )
    mig = metric_name_filter(
        "k8s.pod.cpu.utilization",
        "MetricName IN ('k8s.pod.cpu.utilization', 'k8s.pod.cpu.usage')",
    )
    assert {r["Value"] for r in df.filter(mig).collect()} == {1.0, 2.0}
    eq = metric_name_filter("k8s.pod.cpu.utilization")
    assert {r["Value"] for r in df.filter(eq).collect()} == {1.0}


def test_metric_to_raw_sql_equals_dataframe_path(spark, sf_dir):
    """builderToRawSql metric templates (test family :211-350): the executed
    gauge/sum templates equal gauge_bucket/counter_rate on the same data."""
    from datetime import datetime

    from hyperdx_spark.io import load_table
    from hyperdx_spark.macros import replace_macros
    from hyperdx_spark.metrics import counter_rate, gauge_bucket, metric_to_raw_sql

    rng = (datetime(2024, 1, 1), datetime(2024, 2, 1))
    ev = load_table(spark, sf_dir, "events", time_filter=("ts", *rng))
    ev.createOrReplaceTempView("gauge_view")
    step = 86400

    gauge_tpl = metric_to_raw_sql(
        "gauge", ts="ts", value="value", series_cols=["user_id"], agg="avg"
    )
    assert "$__sourceTable(gauge)" in gauge_tpl and "$__timeInterval" in gauge_tpl
    got = spark.sql(
        replace_macros(
            gauge_tpl, date_range=rng, interval_seconds=step,
            metric_tables={"gauge": "gauge_view", "sum": "gauge_view"},
        )
    ).collect()
    want = (
        gauge_bucket(
            ev, ts="ts", value="value", series_cols=["user_id"],
            bucket_seconds=step, agg="avg",
        )
        .orderBy("__timestamp")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    sum_tpl = metric_to_raw_sql(
        "sum", ts="ts", value="value", series_cols=["user_id"]
    )
    got = spark.sql(
        replace_macros(
            sum_tpl, date_range=rng, interval_seconds=step,
            metric_tables={"gauge": "gauge_view", "sum": "gauge_view"},
        )
    ).collect()
    want = (
        counter_rate(
            ev, ts="ts", value="value", series_cols=["user_id"],
            bucket_seconds=step,
        )
        .orderBy("__timestamp")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_metric_to_raw_sql_filters_and_errors():
    from hyperdx_spark.metrics import metric_to_raw_sql

    tpl = metric_to_raw_sql(
        "gauge", series_cols=["s"], metric_name="k8s.pod.cpu.utilization",
    )
    assert "`MetricName` = 'k8s.pod.cpu.utilization'" in tpl
    # metricNameSql (k8s migration) wins over the plain equality
    tpl = metric_to_raw_sql(
        "gauge", series_cols=["s"], metric_name="x",
        metric_name_sql="MetricName IN ('old.name', 'new.name')",
    )
    assert "MetricName IN ('old.name', 'new.name')" in tpl
    assert "`MetricName` = 'x'" not in tpl
    import pytest as _pytest

    with _pytest.raises(ValueError):
        metric_to_raw_sql("gauge", series_cols=["s"], agg="median")
    with _pytest.raises(ValueError):
        metric_to_raw_sql("summary", series_cols=["s"])


def test_metric_to_raw_sql_histogram_equals_dataframe_path(spark):
    """r10: the histogram-quantile template (one statement of higher-order
    SQL) equals metrics.histogram_quantile — resets, multi-series element
    sums, unbounded last bucket and interpolation included."""
    from datetime import datetime

    from hyperdx_spark.macros import replace_macros
    from hyperdx_spark.metrics import histogram_quantile, metric_to_raw_sql

    rows = [
        # series 1: normal growth then a RESET (counts decrease)
        ("s1", datetime(2024, 1, 1, 0, 0), [0, 0, 0, 0], [1.0, 5.0, 10.0]),
        ("s1", datetime(2024, 1, 1, 0, 20), [2, 4, 6, 8], [1.0, 5.0, 10.0]),
        ("s1", datetime(2024, 1, 1, 1, 0), [1, 1, 1, 1], [1.0, 5.0, 10.0]),
        ("s1", datetime(2024, 1, 1, 1, 30), [3, 2, 5, 2], [1.0, 5.0, 10.0]),
        # series 2: contributes element-wise in the same buckets
        ("s2", datetime(2024, 1, 1, 0, 10), [1, 0, 0, 0], [1.0, 5.0, 10.0]),
        ("s2", datetime(2024, 1, 1, 0, 40), [5, 2, 1, 0], [1.0, 5.0, 10.0]),
        ("s2", datetime(2024, 1, 1, 1, 20), [6, 2, 1, 9], [1.0, 5.0, 10.0]),
    ]
    df = spark.createDataFrame(
        rows,
        "series string, ts timestamp, BucketCounts array<bigint>,"
        " ExplicitBounds array<double>",
    )
    df.createOrReplaceTempView("hist_view")
    rng = (datetime(2024, 1, 1), datetime(2024, 1, 2))

    tpl = metric_to_raw_sql(
        "histogram", ts="ts", series_cols=["series"], level=0.5
    )
    assert "$__sourceTable(histogram)" in tpl and "zip_with" in tpl
    got = spark.sql(
        replace_macros(
            tpl, date_range=rng, interval_seconds=3600,
            metric_tables={"histogram": "hist_view"},
        )
    ).collect()
    want = (
        histogram_quantile(
            df.where("ts >= timestamp'2024-01-01' AND ts <= timestamp'2024-01-02'"),
            ts="ts", bucket_counts="BucketCounts",
            explicit_bounds="ExplicitBounds", series_cols=["series"],
            bucket_seconds=3600, level=0.5, value_alias="p",
        )
        .orderBy("__timestamp")
        .collect()
    )
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g["__timestamp"] == w["__timestamp"]
        assert (g["p"] is None) == (w["p"] is None)
        if g["p"] is not None:
            assert abs(g["p"] - w["p"]) < 1e-9
