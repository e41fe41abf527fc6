"""PromQL adapter: parser shapes + evaluation over a synthetic samples
table with hand-computable answers."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from hyperdx_spark.promql import (
    Agg,
    BinOp,
    NumberLit,
    PromQLEngine,
    RangeFn,
    Selector,
    parse,
    parse_duration,
)

T0 = datetime(2024, 1, 1)


def _samples(spark):
    # http_requests_total: counter, 2 series (job=a / job=b), 1 sample/min
    rows = []
    for minute in range(0, 31):
        ts = datetime(2024, 1, 1, 0, minute)
        rows.append(("http_requests_total", ts, float(minute * 6), "a"))
        # series b resets at minute 20 (counter reset)
        v = minute * 10 if minute < 20 else (minute - 20) * 10
        rows.append(("http_requests_total", ts, float(v), "b"))
        rows.append(("mem_bytes", ts, 100.0 + minute, "a"))
    return spark.createDataFrame(rows, "`__name__` string, ts timestamp, value double, job string")


@pytest.fixture(scope="module")
def engine(spark):
    return PromQLEngine(_samples(spark))


def test_parse_duration():
    assert parse_duration("5m") == 300
    assert parse_duration("90s") == 90
    with pytest.raises(ValueError):
        parse_duration("5 parsecs")


def test_parse_shapes():
    n = parse('rate(http_requests_total{job="a", code=~"5.."}[5m])')
    assert isinstance(n, RangeFn) and n.fn == "rate"
    assert n.arg.name == "http_requests_total"
    assert ("job", "=", "a") in n.arg.matchers
    assert ("code", "=~", "5..") in n.arg.matchers
    assert n.arg.window_s == 300

    a = parse("sum by (job) (rate(x[1m]))")
    assert isinstance(a, Agg) and a.op == "sum" and a.by == ["job"]

    b = parse("mem_bytes / 1024")
    assert isinstance(b, BinOp) and isinstance(b.right, NumberLit)

    s = parse("up")
    assert isinstance(s, Selector) and s.name == "up" and s.window_s is None


def test_parse_errors():
    for bad in ["rate(x)", "sum by job (x)", 'x{job=a}', "x[", "1 + 2"]:
        with pytest.raises(ValueError):
            n = parse(bad)
            # BinOp(1,2) parses; evaluation rejects it
            if bad == "1 + 2":
                PromQLEngine._eval(None, None, n, None, None, None, None)


def test_instant_vector_latest_per_step(spark, engine):
    out = engine.query_range(
        spark, 'http_requests_total{job="a"}',
        datetime(2024, 1, 1, 0, 10), datetime(2024, 1, 1, 0, 12), 60,
    ).collect()
    got = {(r["__step"].minute, r["job"]): r["value"] for r in out}
    assert got == {(10, "a"): 60.0, (11, "a"): 66.0, (12, "a"): 72.0}


def test_rate_steady_counter(spark, engine):
    # series a increases 6/min -> rate over any aligned window = 0.1/s
    out = engine.query_range(
        spark, 'rate(http_requests_total{job="a"}[5m])',
        datetime(2024, 1, 1, 0, 10), datetime(2024, 1, 1, 0, 15), 300,
    ).collect()
    assert all(abs(r["value"] - 0.1) < 1e-9 for r in out)


def test_increase_handles_reset(spark, engine):
    # series b: +10/min, resets at minute 20 (0 again). Window (0:15, 0:25]:
    # deltas: 16..19 are +10 each (4 samples w/ prev in window), minute 20
    # reset contributes current=0, 21..25 +10 each -> 4*10 + 0 + 5*10 = 90
    out = engine.query_range(
        spark, 'increase(http_requests_total{job="b"}[10m])',
        datetime(2024, 1, 1, 0, 25), datetime(2024, 1, 1, 0, 25), 60,
    ).collect()
    assert len(out) == 1
    assert out[0]["value"] == 90.0


def test_agg_sum_collapses_labels(spark, engine):
    out = engine.query_range(
        spark, "sum(http_requests_total)",
        datetime(2024, 1, 1, 0, 10), datetime(2024, 1, 1, 0, 10), 60,
    ).collect()
    # job=a: 60, job=b: 100 -> 160; labels collapsed
    assert len(out) == 1 and out[0]["value"] == 160.0
    assert set(out[0].asDict()) == {"__step", "value"}


def test_avg_over_time_and_scalar_arith(spark, engine):
    out = engine.query_range(
        spark, "avg_over_time(mem_bytes[10m]) / 2",
        datetime(2024, 1, 1, 0, 10), datetime(2024, 1, 1, 0, 10), 60,
    ).collect()
    # samples minutes 1..10 (window exclusive at left edge): avg 105.5 / 2
    assert len(out) == 1
    assert abs(out[0]["value"] - 52.75) < 1e-9


def test_regex_matchers(spark, engine):
    out = engine.query_range(
        spark, 'http_requests_total{job=~"a|b"}',
        datetime(2024, 1, 1, 0, 5), datetime(2024, 1, 1, 0, 5), 60,
    ).collect()
    assert len(out) == 2
    out2 = engine.query_range(
        spark, 'http_requests_total{job!~"a"}',
        datetime(2024, 1, 1, 0, 5), datetime(2024, 1, 1, 0, 5), 60,
    ).collect()
    assert len(out2) == 1 and out2[0]["job"] == "b"


def test_topk_bottomk(spark, engine):
    out = engine.query_range(
        spark, "topk(1, http_requests_total)",
        datetime(2024, 1, 1, 0, 10), datetime(2024, 1, 1, 0, 10), 60,
    ).collect()
    assert len(out) == 1 and out[0]["job"] == "b"  # 100 > 60
    out2 = engine.query_range(
        spark, "bottomk(1, http_requests_total)",
        datetime(2024, 1, 1, 0, 10), datetime(2024, 1, 1, 0, 10), 60,
    ).collect()
    assert len(out2) == 1 and out2[0]["job"] == "a"


def test_vector_vector_ratio(spark, engine):
    # mem_bytes{job=a} / http_requests_total{job=a}: matched on (step, job)
    out = engine.query_range(
        spark, "mem_bytes / http_requests_total",
        datetime(2024, 1, 1, 0, 10), datetime(2024, 1, 1, 0, 10), 60,
    ).collect()
    # mem at :10 = 110, http{a} at :10 = 60 -> 110/60; job=b has no mem
    # series so one-to-one matching drops it
    assert len(out) == 1
    assert out[0]["job"] == "a"
    assert abs(out[0]["value"] - 110.0 / 60.0) < 1e-9


def test_vector_vector_division_by_zero_null(spark):
    rows = [
        ("num", datetime(2024, 1, 1, 0, 0), 5.0, "x"),
        ("den", datetime(2024, 1, 1, 0, 0), 0.0, "x"),
    ]
    from hyperdx_spark.promql import PromQLEngine

    eng = PromQLEngine(
        spark.createDataFrame(rows, "`__name__` string, ts timestamp, value double, job string")
    )
    out = eng.query_range(
        spark, "num / den",
        datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 0, 0), 60,
    ).collect()
    assert len(out) == 1 and out[0]["value"] is None


def test_offset_modifier(spark, engine):
    # sel offset 5m at step :15 == plain sel at step :10
    n = parse('http_requests_total{job="a"} offset 5m')
    assert n.offset_s == 300
    out = engine.query_range(
        spark, 'http_requests_total{job="a"} offset 5m',
        datetime(2024, 1, 1, 0, 15), datetime(2024, 1, 1, 0, 15), 60,
    ).collect()
    assert len(out) == 1 and out[0]["value"] == 60.0  # value at :10


def test_range_offset(spark, engine):
    # increase over [5m] offset 10m at :25 == increase [5m] at :15 (= 5*6)
    out = engine.query_range(
        spark, 'increase(http_requests_total{job="a"}[5m] offset 10m)',
        datetime(2024, 1, 1, 0, 25), datetime(2024, 1, 1, 0, 25), 60,
    ).collect()
    assert len(out) == 1 and out[0]["value"] == 30.0


def test_absent(spark, engine):
    out = engine.query_range(
        spark, 'absent(http_requests_total{job="nope"})',
        datetime(2024, 1, 1, 0, 10), datetime(2024, 1, 1, 0, 12), 60,
    ).collect()
    assert sorted(r["__step"].minute for r in out) == [10, 11, 12]
    assert all(r["value"] == 1.0 for r in out)
    # present series -> empty result
    out2 = engine.query_range(
        spark, 'absent(http_requests_total{job="a"})',
        datetime(2024, 1, 1, 0, 10), datetime(2024, 1, 1, 0, 12), 60,
    ).collect()
    assert out2 == []


def test_histogram_quantile(spark):
    # one histogram at a single step: buckets le=1 (30), le=2 (50), +Inf (60)
    # p50: rank = 0.5*60 = 30 -> first bucket reaches 30 exactly -> 1.0
    # p90: rank = 54 -> +Inf bucket -> highest finite bound 2.0
    # p75: rank = 45 -> second bucket: 1 + (2-1)*(45-30)/(50-30) = 1.75
    ts = datetime(2024, 1, 1, 0, 10)
    rows = [
        ("lat_bucket", ts, 30.0, "1"),
        ("lat_bucket", ts, 50.0, "2"),
        ("lat_bucket", ts, 60.0, "+Inf"),
    ]
    eng = PromQLEngine(
        spark.createDataFrame(rows, "`__name__` string, ts timestamp, value double, le string")
    )
    for phi, want in [(0.5, 1.0), (0.9, 2.0), (0.75, 1.75)]:
        out = eng.query_range(
            spark, f"histogram_quantile({phi}, lat_bucket)", ts, ts, 60
        ).collect()
        assert len(out) == 1
        assert abs(out[0]["value"] - want) < 1e-12, (phi, out)


def test_histogram_quantile_degenerate(spark):
    ts = datetime(2024, 1, 1, 0, 10)
    # no +Inf bucket -> NULL
    rows = [("lat_bucket", ts, 30.0, "1"), ("lat_bucket", ts, 50.0, "2")]
    eng = PromQLEngine(
        spark.createDataFrame(rows, "`__name__` string, ts timestamp, value double, le string")
    )
    out = eng.query_range(spark, "histogram_quantile(0.5, lat_bucket)", ts, ts, 60).collect()
    assert len(out) == 1 and out[0]["value"] is None


def test_vector_vector_many_to_many_raises(spark):
    # left collapses to (step, extra) with 2 rows/step, right to (step, job):
    # the only shared key is __step -> many-to-many -> error
    rows = [
        ("a_total", datetime(2024, 1, 1), 1.0, "x", "s1"),
        ("a_total", datetime(2024, 1, 1), 2.0, "x", "s2"),
        ("b_total", datetime(2024, 1, 1), 3.0, "x", "s1"),
    ]
    eng = PromQLEngine(
        spark.createDataFrame(
            rows, "`__name__` string, ts timestamp, value double, job string, extra string"
        ),
        label_cols=["job", "extra"],
    )
    with pytest.raises(Exception, match="many-to-many"):
        eng.query_range(
            spark, "sum by (extra) (a_total) / sum by (job) (b_total)",
            datetime(2024, 1, 1), datetime(2024, 1, 1), 60,
        ).collect()


def test_vector_vector_one_to_one_still_works(spark, engine):
    out = engine.query_range(
        spark, "mem_bytes / http_requests_total",
        datetime(2024, 1, 1, 0, 10), datetime(2024, 1, 1, 0, 10), 60,
    ).collect()
    assert len(out) == 1 and abs(out[0]["value"] - 110.0 / 60.0) < 1e-9


# -------------------------------------------------------------- matching

def _match_samples(spark):
    # err: per (job, code) counters; total: per job — the group_left idiom
    rows = []
    for minute in range(0, 11):
        ts = datetime(2024, 1, 1, 0, minute)
        rows.append(("errs", ts, float(minute * 2), "a", "500"))
        rows.append(("errs", ts, float(minute * 1), "a", "503"))
        rows.append(("errs", ts, float(minute * 4), "b", "500"))
        rows.append(("total", ts, float(minute * 10), "a", None))
        rows.append(("total", ts, float(minute * 8), "b", None))
    return spark.createDataFrame(
        rows, "`__name__` string, ts timestamp, value double, job string, code string"
    )


def test_parse_matching_modifiers():
    n = parse("a / on(job) group_left b")
    assert n.on == ["job"] and n.group == "left" and n.group_labels == []
    n = parse("a * ignoring(code) b")
    assert n.ignoring == ["code"] and n.group is None
    n = parse("a / on(job) group_right(env) b")
    assert n.group == "right" and n.group_labels == ["env"]


def test_group_left_share_of_total(spark):
    eng = PromQLEngine(_match_samples(spark), label_cols=["job", "code"])
    t = datetime(2024, 1, 1, 0, 10)
    out = eng.query_range(
        spark,
        "sum by (job, code) (increase(errs[10m])) / on(job) group_left "
        "sum by (job) (increase(total[10m]))",
        t, t, 60,
    ).collect()
    got = {(r["job"], r["code"]): r["value"] for r in out}
    assert abs(got[("a", "500")] - 20.0 / 100.0) < 1e-9
    assert abs(got[("a", "503")] - 10.0 / 100.0) < 1e-9
    assert abs(got[("b", "500")] - 40.0 / 80.0) < 1e-9


def test_ignoring_one_to_one(spark):
    # errs{job=b} has one code series; ignoring(code) matches it 1:1 to total{job=b}
    eng = PromQLEngine(_match_samples(spark), label_cols=["job", "code"])
    t = datetime(2024, 1, 1, 0, 10)
    out = eng.query_range(
        spark,
        'sum by (job, code) (increase(errs{job="b"}[10m])) / ignoring(code) '
        'sum by (job) (increase(total{job="b"}[10m]))',
        t, t, 60,
    ).collect()
    assert len(out) == 1 and abs(out[0]["value"] - 0.5) < 1e-9


def test_group_left_requires_unique_one_side(spark):
    eng = PromQLEngine(_match_samples(spark), label_cols=["job", "code"])
    t = datetime(2024, 1, 1, 0, 10)
    # the "one" side (right of group_left) has two code-series for job=a
    with pytest.raises(Exception, match="many-to-many"):
        eng.query_range(
            spark,
            "sum by (job, code) (increase(errs[10m])) / on(job) group_left "
            "sum by (job, code) (increase(errs[10m]))",
            t, t, 60,
        ).collect()


def test_group_right_mirrors_group_left(spark):
    eng = PromQLEngine(_match_samples(spark), label_cols=["job", "code"])
    t = datetime(2024, 1, 1, 0, 10)
    out = eng.query_range(
        spark,
        "sum by (job) (increase(total[10m])) * on(job) group_right "
        "sum by (job, code) (increase(errs[10m])) ",
        t, t, 60,
    ).collect()
    got = {(r["job"], r["code"]): r["value"] for r in out}
    # left op right = total * errs
    assert abs(got[("a", "500")] - 100.0 * 20.0) < 1e-9
    assert abs(got[("b", "500")] - 80.0 * 40.0) < 1e-9


def test_label_replace_and_join(spark):
    eng = PromQLEngine(_match_samples(spark), label_cols=["job", "code"])
    t = datetime(2024, 1, 1, 0, 10)
    out = eng.query_range(
        spark,
        'label_replace(sum by (job) (increase(total[10m])), "env", "prod-$1", "job", "(a)")',
        t, t, 60,
    ).collect()
    envs = {r["job"]: r["env"] for r in out}
    assert envs["a"] == "prod-a" and envs["b"] == ""  # b: no match -> unchanged ('' default)
    out = eng.query_range(
        spark,
        'label_join(sum by (job, code) (increase(errs[10m])), "jc", "-", "job", "code")',
        t, t, 60,
    ).collect()
    assert {r["jc"] for r in out} == {"a-500", "a-503", "b-500"}


# -------------------------------------------------------------- subqueries

def test_parse_subquery_shapes():
    n = parse("max_over_time(rate(http[5m])[30m:5m])")
    from hyperdx_spark.promql import Subquery
    assert isinstance(n.arg, Subquery)
    assert n.arg.range_s == 1800 and n.arg.res_s == 300
    n = parse("avg_over_time(x[1h:10m])")
    assert isinstance(n.arg, Subquery) and n.arg.range_s == 3600
    with pytest.raises(ValueError, match="explicit step"):
        parse("avg_over_time(x[1h:])")


def test_subquery_over_rate(spark):
    from datetime import timedelta

    rows = [
        ("http", T0 + timedelta(minutes=m), float(m * 6), "a")
        for m in range(0, 61)
    ]
    eng = PromQLEngine(
        spark.createDataFrame(rows, "`__name__` string, ts timestamp, value double, job string")
    )
    t = T0 + timedelta(hours=1)
    out = eng.query_range(spark, "max_over_time(rate(http[5m])[30m:5m])", t, t, 60).collect()
    # constant counter slope 6/min -> rate 0.1/s at every inner step
    assert len(out) == 1 and abs(out[0]["value"] - 0.1) < 1e-9


def test_subquery_over_instant_selector(spark):
    from datetime import timedelta

    rows = [
        ("http", T0 + timedelta(minutes=m), float(m * 6), "a")
        for m in range(0, 61)
    ]
    eng = PromQLEngine(
        spark.createDataFrame(rows, "`__name__` string, ts timestamp, value double, job string")
    )
    t = T0 + timedelta(hours=1)
    # inner instant at res-aligned 00:40/00:50/01:00 -> 240, 300, 360
    out = eng.query_range(spark, "avg_over_time(http[30m:10m])", t, t, 60).collect()
    assert len(out) == 1 and abs(out[0]["value"] - 300.0) < 1e-9
    assert out[0]["job"] == "a"  # labels survive the subquery


# ----------------------------------------------- extended function library

@pytest.fixture(scope="module")
def fn_engine(spark):
    from datetime import timedelta

    rows = []
    for m in range(0, 31):
        ts = T0 + timedelta(minutes=m)
        rows.append(("c", ts, float(m * 6), "a"))
        v = m * 10 if m < 20 else (m - 20) * 10  # reset at minute 20
        rows.append(("c", ts, float(v), "b"))
        rows.append(("g", ts, 100.0 + m, "a"))
    return PromQLEngine(
        spark.createDataFrame(
            rows, "`__name__` string, ts timestamp, value double, job string"
        )
    )


def _at30(spark, eng, q):
    from datetime import timedelta

    t = T0 + timedelta(minutes=30)
    out = eng.query_range(spark, q, t, t, 60).collect()
    return {r["job"] if "job" in r.asDict() else "_": r["value"] for r in out}


def test_irate_idelta(spark, fn_engine):
    assert abs(_at30(spark, fn_engine, "irate(c[5m])")["a"] - 0.1) < 1e-9
    assert abs(_at30(spark, fn_engine, "idelta(c[5m])")["a"] - 6.0) < 1e-9


def test_changes_resets(spark, fn_engine):
    r = _at30(spark, fn_engine, "resets(c[30m])")
    assert r["b"] == 1.0 and r["a"] == 0.0
    assert _at30(spark, fn_engine, "changes(c[10m])")["a"] == 10.0


def test_deriv_predict_linear(spark, fn_engine):
    # gauge g rises 1 per minute -> slope 1/60 per second
    assert abs(_at30(spark, fn_engine, "deriv(g[10m])")["a"] - 1 / 60) < 1e-9
    # value 130 at :30, predict 10 minutes ahead -> 140
    assert abs(_at30(spark, fn_engine, "predict_linear(g[10m], 600)")["a"] - 140.0) < 1e-6


def test_over_time_extensions(spark, fn_engine):
    import numpy as np

    assert abs(_at30(spark, fn_engine, "quantile_over_time(0.5, g[10m])")["a"] - 125.5) < 1e-9
    assert (
        abs(
            _at30(spark, fn_engine, "stddev_over_time(g[10m])")["a"]
            - np.std(np.arange(121, 131.0))
        )
        < 1e-9
    )
    assert _at30(spark, fn_engine, "present_over_time(g[5m])")["a"] == 1.0


def test_math_functions(spark, fn_engine):
    assert abs(_at30(spark, fn_engine, "sqrt(g)")["a"] - 130.0 ** 0.5) < 1e-9
    assert _at30(spark, fn_engine, "clamp(g, 0, 125)")["a"] == 125.0
    assert _at30(spark, fn_engine, "clamp_min(g, 200)")["a"] == 200.0
    assert _at30(spark, fn_engine, "round(g / 7)")["a"] == 19.0  # 18.57 -> 19


def test_comparison_filter_and_bool(spark, fn_engine):
    r = _at30(spark, fn_engine, "c > 150")
    assert set(r) == {"a"} and r["a"] == 180.0  # b at :30 = 100, dropped
    r = _at30(spark, fn_engine, "c > bool 150")
    assert r == {"a": 1.0, "b": 0.0}
    # vector-vector: b has no g series -> one-to-one match drops it
    r = _at30(spark, fn_engine, "c > g")
    assert set(r) == {"a"} and r["a"] == 180.0


def test_set_operators(spark, fn_engine):
    # and: c series where a g series with the same labels exists (only job=a)
    r = _at30(spark, fn_engine, "c and g")
    assert set(r) == {"a"} and r["a"] == 180.0
    # unless: drop series that exist on the right
    r = _at30(spark, fn_engine, "c unless g")
    assert set(r) == {"b"} and r["b"] == 100.0
    # or: union, left wins on overlap
    r = _at30(spark, fn_engine, "g or c")
    assert r["a"] == 130.0 and r["b"] == 100.0
    # composes with comparisons: alert idiom
    r = _at30(spark, fn_engine, "c > 150 or g > 1000")
    assert set(r) == {"a"} and r["a"] == 180.0


def test_at_modifier(spark, fn_engine):
    from datetime import timedelta

    # pin the selector to :10 regardless of step; epoch of 2024-01-01 00:10
    at = int((T0 + timedelta(minutes=10)).timestamp())
    t = T0 + timedelta(minutes=30)
    out = fn_engine.query_range(spark, f"g @ {at}", t, t, 60).collect()
    assert len(out) == 1 and out[0]["value"] == 110.0  # g at :10


def test_time_and_scalar_vector(spark, fn_engine):
    from datetime import timedelta

    t = T0 + timedelta(minutes=30)
    # time() - scalar start-time idiom: g started at epoch(T0)+... use
    # time() * 0 + 7 == 7 at every step to keep it deterministic
    out = fn_engine.query_range(spark, "time() * 0 + 7", t, t, 60).collect()
    assert len(out) == 1 and out[0]["value"] == 7.0
    # scalar() element-wise against a multi-series vector
    out = fn_engine.query_range(spark, "c - scalar(g)", t, t, 60).collect()
    got = {r["job"]: r["value"] for r in out}
    assert got == {"a": 180.0 - 130.0, "b": 100.0 - 130.0}
    # vector() literal
    out = fn_engine.query_range(spark, "vector(42)", t, t, 60).collect()
    assert len(out) == 1 and out[0]["value"] == 42.0
    # scalar() of a multi-series vector is NaN
    import math

    out = fn_engine.query_range(spark, "scalar(c)", t, t, 60).collect()
    assert len(out) == 1 and math.isnan(out[0]["value"])


def test_binop_common_agg_factoring(spark):
    """The share-of-total idiom factors: sum by (job,code)(X) / on(job)
    group_left sum by (job)(X) evaluates the inner X once (localCheckpoint)
    and the per-group shares must still sum to 1 — also for count, which
    re-aggregates as SUM of fine counts."""
    import collections

    eng = PromQLEngine(_match_samples(spark), label_cols=["job", "code"])
    t = datetime(2024, 1, 1, 0, 10)
    for op in ("sum", "count"):
        out = eng.query_range(
            spark,
            f"{op} by (job, code) (sum_over_time(errs[10m])) / on(job) "
            f"group_left {op} by (job) (sum_over_time(errs[10m]))",
            t, t, 60,
        ).collect()
        sums = collections.defaultdict(float)
        for r in out:
            sums[r["job"]] += r["value"]
        assert sums and all(abs(s - 1.0) < 1e-9 for s in sums.values()), (op, sums)


def test_at_start_end(spark, fn_engine):
    from datetime import timedelta

    t0, t1 = T0 + timedelta(minutes=10), T0 + timedelta(minutes=30)
    # @ start() pins g to :10 (110) at every step; @ end() to :30 (130)
    out = fn_engine.query_range(spark, "g @ start()", t0, t1, 600).collect()
    assert {r["value"] for r in out} == {110.0} and len(out) == 3
    out = fn_engine.query_range(spark, "g @ end()", t0, t1, 600).collect()
    assert {r["value"] for r in out} == {130.0} and len(out) == 3


def test_absent_over_time(spark, fn_engine):
    from datetime import timedelta

    t = T0 + timedelta(hours=2)  # samples end at :30 -> window (1:55, 2:00] empty
    out = fn_engine.query_range(spark, "absent_over_time(g[5m])", t, t, 60).collect()
    assert len(out) == 1 and out[0]["value"] == 1.0
    t2 = T0 + timedelta(minutes=20)
    out = fn_engine.query_range(spark, "absent_over_time(g[5m])", t2, t2, 60).collect()
    assert out == []  # samples present -> empty vector


def test_comparison_group_left(spark):
    # per-(job,code) error rates filtered against a per-job budget —
    # the k8s alert idiom `errs > on(job) group_left budget`
    rows = [
        ("e", datetime(2024, 1, 1), 5.0, "a", "500"),
        ("e", datetime(2024, 1, 1), 1.0, "a", "503"),
        ("e", datetime(2024, 1, 1), 9.0, "b", "500"),
        ("budget", datetime(2024, 1, 1), 3.0, "a", None),
        ("budget", datetime(2024, 1, 1), 10.0, "b", None),
    ]
    eng = PromQLEngine(
        spark.createDataFrame(
            rows, "`__name__` string, ts timestamp, value double, job string, code string"
        ),
        label_cols=["job", "code"],
    )
    t = datetime(2024, 1, 1)
    out = eng.query_range(spark, "e > on(job) group_left budget", t, t, 60).collect()
    got = {(r["job"], r["code"]): r["value"] for r in out}
    assert got == {("a", "500"): 5.0}  # only a/500 exceeds its budget
    # bool mode keeps every matched element as 0/1
    out = eng.query_range(spark, "e > bool on(job) group_left budget", t, t, 60).collect()
    got = {(r["job"], r["code"]): r["value"] for r in out}
    assert got == {("a", "500"): 1.0, ("a", "503"): 0.0, ("b", "500"): 0.0}


def test_sort_functions(spark, fn_engine):
    from datetime import timedelta

    t = T0 + timedelta(minutes=30)
    # sort/sort_desc order the instant vector by value; labels/values intact
    out = fn_engine.query_range(spark, "sort(c)", t, t, 60).collect()
    assert [r["value"] for r in out] == [100.0, 180.0]
    out = fn_engine.query_range(spark, "sort_desc(c)", t, t, 60).collect()
    assert [r["value"] for r in out] == [180.0, 100.0]
    assert {r["job"] for r in out} == {"a", "b"}


# ------------------------------------- aggregation operators + without()

def test_parse_agg_grouping_shapes():
    a = parse("sum without (job) (c)")
    assert isinstance(a, Agg) and a.without == ["job"] and a.by is None
    a = parse("sum(c) by (job)")  # trailing clause position
    assert isinstance(a, Agg) and a.by == ["job"]
    a = parse('count_values("ver", c)')
    assert a.op == "count_values" and a.param == "ver"
    a = parse("quantile(0.9, c) without (job)")
    assert a.op == "quantile" and a.param == 0.9 and a.without == ["job"]
    with pytest.raises(ValueError):
        parse("quantile(c)")  # missing phi
    with pytest.raises(ValueError):
        parse("count_values(ver, c)")  # label must be quoted


def test_stddev_stdvar_population(spark, fn_engine):
    # c at :30 -> {a: 180, b: 100}; population stddev = 40, var = 1600
    from datetime import timedelta

    t = T0 + timedelta(minutes=30)
    out = fn_engine.query_range(spark, "stddev(c)", t, t, 60).collect()
    assert len(out) == 1 and abs(out[0]["value"] - 40.0) < 1e-9
    out = fn_engine.query_range(spark, "stdvar(c)", t, t, 60).collect()
    assert len(out) == 1 and abs(out[0]["value"] - 1600.0) < 1e-9


def test_quantile_agg_linear_interp(spark, fn_engine):
    from datetime import timedelta

    t = T0 + timedelta(minutes=30)
    out = fn_engine.query_range(spark, "quantile(0.5, c)", t, t, 60).collect()
    assert len(out) == 1 and abs(out[0]["value"] - 140.0) < 1e-9
    # out-of-range phi -> +/-Inf (Prometheus semantics)
    out = fn_engine.query_range(spark, "quantile(1.5, c)", t, t, 60).collect()
    assert out[0]["value"] == float("inf")


def test_group_and_count_values(spark, fn_engine):
    from datetime import timedelta

    t = T0 + timedelta(minutes=30)
    out = fn_engine.query_range(spark, "group(c)", t, t, 60).collect()
    assert len(out) == 1 and out[0]["value"] == 1.0
    assert set(out[0].asDict()) == {"__step", "value"}
    out = fn_engine.query_range(spark, 'count_values("v", c)', t, t, 60).collect()
    got = {r["v"]: r["value"] for r in out}
    assert got == {"180": 1.0, "100": 1.0}


def test_sum_without_and_trailing_by(spark, fn_engine):
    from datetime import timedelta

    t = T0 + timedelta(minutes=30)
    out = fn_engine.query_range(spark, "sum without (job) (c)", t, t, 60).collect()
    assert len(out) == 1 and out[0]["value"] == 280.0
    out = fn_engine.query_range(spark, "sum(c) by (job)", t, t, 60).collect()
    got = {r["job"]: r["value"] for r in out}
    assert got == {"a": 180.0, "b": 100.0}


def test_topk_by_group(spark, fn_engine):
    from datetime import timedelta

    t = T0 + timedelta(minutes=30)
    # ungrouped: single winner
    out = fn_engine.query_range(spark, "topk(1, c)", t, t, 60).collect()
    assert len(out) == 1 and out[0]["job"] == "a"
    # per-job groups: every series is its own group -> both survive
    out = fn_engine.query_range(spark, "topk by (job) (1, c)", t, t, 60).collect()
    assert {r["job"] for r in out} == {"a", "b"}


# ---------------------------- holt_winters + calendar component functions

def _holt_winters_ref(vals, sf, tf):
    # prometheus functions.go funcDoubleExponentialSmoothing, verbatim
    s0, s1, b = 0.0, vals[0], vals[1] - vals[0]
    for i in range(1, len(vals)):
        x = sf * vals[i]
        b = b if (i - 1) == 0 else tf * (s1 - s0) + (1 - tf) * b
        y = (1 - sf) * (s1 + b)
        s0, s1 = s1, x + y
    return s1


def test_holt_winters(spark, fn_engine):
    from datetime import timedelta

    t = T0 + timedelta(minutes=30)
    # window (25m, 30m] of c{job=a}: minutes 26..30 -> 156..180 step 6
    expected = _holt_winters_ref([156.0, 162.0, 168.0, 174.0, 180.0], 0.5, 0.3)
    out = fn_engine.query_range(
        spark, "holt_winters(c[5m], 0.5, 0.3)", t, t, 60
    ).collect()
    got = {r["job"]: r["value"] for r in out}
    assert abs(got["a"] - expected) < 1e-9
    # alias name
    out = fn_engine.query_range(
        spark, "double_exponential_smoothing(c[5m], 0.5, 0.3)", t, t, 60
    ).collect()
    assert abs({r["job"]: r["value"] for r in out}["a"] - expected) < 1e-9
    with pytest.raises(ValueError):
        parse("holt_winters(c[5m], 1.5, 0.3)")  # sf must be in (0, 1)


def test_time_component_functions(spark, fn_engine):
    from datetime import timedelta

    t = T0 + timedelta(minutes=30)
    # value-as-epoch: g{job=a} at :30 = 130 -> 1970-01-01 00:02:10 UTC
    assert _at30(spark, fn_engine, "minute(g)")["a"] == 2.0
    assert _at30(spark, fn_engine, "hour(g)")["a"] == 0.0
    assert _at30(spark, fn_engine, "year(g)")["a"] == 1970.0
    assert _at30(spark, fn_engine, "day_of_week(g)")["a"] == 4.0  # Thursday
    assert _at30(spark, fn_engine, "days_in_month(g)")["a"] == 31.0
    # no-arg form: component of the evaluation step itself (2024-01-01 00:30)
    out = fn_engine.query_range(spark, "minute()", t, t, 60).collect()
    assert len(out) == 1 and out[0]["value"] == 30.0
    out = fn_engine.query_range(spark, "year()", t, t, 60).collect()
    assert out[0]["value"] == 2024.0


def test_modulo_power_atan2(spark, fn_engine):
    import math

    # g{job=a} at :30 = 130
    assert _at30(spark, fn_engine, "g % 7")["a"] == 130.0 % 7
    assert _at30(spark, fn_engine, "g ^ 2")["a"] == 130.0 ** 2
    assert abs(_at30(spark, fn_engine, "g atan2 g")["a"] - math.pi / 4) < 1e-12
    # precedence: ^ binds tighter than *; right-associative
    assert _at30(spark, fn_engine, "2 * g ^ 2")["a"] == 2 * 130.0 ** 2
    p = parse("g ^ 2 ^ 3")
    # right-assoc: g ^ (2 ^ 3); the literal side constant-folds to 8
    assert isinstance(p.right, NumberLit) and p.right.value == 8.0
    # literal folding edge cases: stay float, never Python-complex
    import math as _m
    assert _m.isnan(parse("(0 - 8) ^ 0.5").value)
    assert _m.isnan(parse("0 / 0").value)
    assert parse("1 / 0").value == float("inf")
    # pi() is a scalar literal; trig fns elementwise
    assert abs(_at30(spark, fn_engine, "sin(g * 0 + pi() / 2)")["a"] - 1.0) < 1e-12
    assert abs(_at30(spark, fn_engine, "cosh(g * 0)")["a"] - 1.0) < 1e-12


# ----------------------------------- Prometheus-exact extrapolation mode

def _extrapolated_ref(samples, range_start, range_end, is_counter, is_rate):
    # prometheus promql/functions.go extrapolatedRate, verbatim; samples =
    # [(epoch_s, value)] inside (range_start, range_end], time-ordered
    if len(samples) < 2:
        return None
    first_t, first_v = samples[0]
    last_t, last_v = samples[-1]
    result = 0.0
    prev = first_v
    for _, v in samples[1:]:
        if is_counter and v < prev:
            result += v
        else:
            result += v - prev
        prev = v
    sampled = last_t - first_t
    if sampled <= 0:
        return None
    avg = sampled / (len(samples) - 1)
    threshold = avg * 1.1
    dur_start = first_t - range_start
    dur_end = range_end - last_t
    if is_counter and result > 0 and first_v >= 0:
        dur_zero = sampled * (first_v / result)
        if dur_zero < dur_start:
            dur_start = dur_zero
    if dur_start >= threshold:
        dur_start = avg / 2
    if dur_end >= threshold:
        dur_end = avg / 2
    result *= (sampled + dur_start + dur_end) / sampled
    if is_rate:
        result /= range_end - range_start
    return result


@pytest.fixture(scope="module")
def xp_engine(spark):
    from datetime import timedelta

    from hyperdx_spark.promql import PromQLEngine

    # irregular spacing + a reset + a series starting mid-window
    rows = []
    for m, v in [(2, 5.0), (7, 23.0), (9, 41.0), (16, 11.0), (26, 30.0), (29, 57.0)]:
        rows.append(("e", T0 + timedelta(minutes=m), v, "a"))
    for m, v in [(22, 3.0), (27, 9.0)]:  # first-ever sample inside windows
        rows.append(("e", T0 + timedelta(minutes=m), v, "b"))
    return PromQLEngine(
        spark.createDataFrame(
            rows, "`__name__` string, ts timestamp, value double, job string"
        ),
        extrapolate=True,
    ), rows


@pytest.mark.parametrize(
    "fn,is_counter,is_rate",
    [("rate", True, True), ("increase", True, False), ("delta", False, False)],
)
def test_extrapolated_rate_matches_prometheus(spark, xp_engine, fn, is_counter, is_rate):
    from datetime import timedelta

    eng, rows = xp_engine
    t = T0 + timedelta(minutes=30)
    end_e = t.timestamp()
    start_e = end_e - 1800  # [30m] window
    out = eng.query_range(spark, f"{fn}(e[30m])", t, t, 60).collect()
    got = {r["job"]: r["value"] for r in out}
    for job in ("a", "b"):
        samples = sorted(
            (ts.timestamp(), v)
            for name, ts, v, j in rows
            if j == job and start_e < ts.timestamp() <= end_e
        )
        want = _extrapolated_ref(samples, start_e, end_e, is_counter, is_rate)
        assert abs(got[job] - want) < 1e-9, (job, got[job], want)


def test_extrapolate_off_by_default(spark, fn_engine):
    from datetime import timedelta

    # default engine keeps the documented no-extrapolation semantics
    t = T0 + timedelta(minutes=30)
    out = fn_engine.query_range(spark, "rate(c[5m])", t, t, 60).collect()
    got = {r["job"]: r["value"] for r in out}
    # window (25,30]: samples 26..30, prev endpoints 25..29 all >= window
    # start (inclusive bound) -> 5 deltas of 6 over 300s
    assert abs(got["a"] - 0.1) < 1e-9


def test_timestamp_function(spark, fn_engine):
    from datetime import timedelta

    # instant selector: the original sample time, even at a later step
    # (:30:30 step still sees the :30:00 sample within the lookback)
    t = T0 + timedelta(minutes=30, seconds=30)
    out = fn_engine.query_range(spark, "timestamp(g)", t, t, 60).collect()
    want = (T0 + timedelta(minutes=30)).timestamp()
    assert len(out) == 1 and out[0]["value"] == want
    # derived vector: the evaluation step time
    out = fn_engine.query_range(spark, "timestamp(sum(g))", t, t, 60).collect()
    assert len(out) == 1 and out[0]["value"] == t.timestamp()
    # the start-time idiom: time() - timestamp(g) = staleness age in seconds
    out = fn_engine.query_range(spark, "time() - timestamp(g)", t, t, 60).collect()
    assert len(out) == 1 and out[0]["value"] == 30.0


def test_sort_by_label(spark, fn_engine):
    from datetime import timedelta

    t = T0 + timedelta(minutes=30)
    out = fn_engine.query_range(spark, 'sort_by_label(c, "job")', t, t, 60).collect()
    assert [r["job"] for r in out] == ["a", "b"]
    out = fn_engine.query_range(
        spark, 'sort_by_label_desc(c, "job")', t, t, 60
    ).collect()
    assert [r["job"] for r in out] == ["b", "a"]
    with pytest.raises(ValueError):
        parse("sort_by_label(c)")  # needs at least one label


def test_vector_binop_plan_build_runs_no_jobs(spark):
    """The many-to-many uniqueness check must ride the join plan (window +
    raise_error), not eager .take(1) probes: building the binop DataFrame
    may launch ZERO Spark jobs."""
    eng = PromQLEngine(_match_samples(spark), label_cols=["job", "code"])
    t = datetime(2024, 1, 1, 0, 10)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    df = eng.query_range(
        spark,
        "sum by (job) (increase(errs[10m])) / sum by (job) (increase(total[10m]))",
        t, t, 60,
    )
    cmp_df = eng.query_range(
        spark,
        "sum by (job) (increase(errs[10m])) > sum by (job) (increase(total[10m]))",
        t, t, 60,
    )
    after = len(tracker.getJobIdsForGroup(None))
    assert after == before, "plan construction launched eager Spark jobs"
    assert df.collect() is not None and cmp_df.collect() is not None


def test_agg_by_absent_label_matches_topk(spark):
    """`sum by (nope)` over a vector without that label aggregates everything
    into one group (absent label == empty label), instead of raising."""
    eng = PromQLEngine(_match_samples(spark), label_cols=["job", "code"])
    t = datetime(2024, 1, 1, 0, 10)
    out = eng.query_range(
        spark, "sum by (nonexistent_label) (increase(errs[10m]))", t, t, 60
    ).collect()
    assert len(out) == 1


def test_many_to_many_fires_for_unmatched_dup_group(spark):
    """The lazy guard must error even when the duplicate match group has NO
    counterpart on the other operand (whole-stage codegen defers a guarded
    VALUE past the join's match check; the guard rides the join KEY, which
    is evaluated for every row). Prometheus errors regardless of the other
    side."""
    ts = datetime(2024, 1, 1)
    rows = [
        ("a_total", ts, 1.0, "x", "i1"),
        ("b_total", ts, 2.0, "y", "i1"),
        ("b_total", ts, 3.0, "y", "i2"),  # dup group job=y, unmatched in a
    ]
    eng = PromQLEngine(
        spark.createDataFrame(
            rows,
            "`__name__` string, ts timestamp, value double, job string, instance string",
        ),
        label_cols=["job", "instance"],
    )
    with pytest.raises(Exception, match="many-to-many"):
        eng.query_range(
            spark,
            "sum by (job, instance) (a_total)"
            " / on(job) sum by (job, instance) (b_total)",
            ts, ts, 60,
        ).collect()


def test_unary_minus_and_inf_nan_literals(spark, fn_engine):
    """Prometheus lexes inf/nan (any case) as float literals and supports
    unary +/- on any expression (r6 parity slice): `g > Inf` must compare
    against the literal — previously it silently vector-matched a metric
    named "Inf" — and `-g` negates element-wise via the -1 * g lowering."""
    from datetime import timedelta

    t = T0 + timedelta(minutes=30)

    def vals(q):
        return {
            r["job"]: r["value"]
            for r in fn_engine.query_range(spark, q, t, t, 60).collect()
        }

    # g at t=30 is 130 (job=a)
    assert vals("-g") == {"a": -130.0}
    assert vals("g * -1") == {"a": -130.0}
    assert vals("- -g") == {"a": 130.0}
    assert vals("g - -70") == {"a": 200.0}
    # unary binds at multiplication precedence: -2^2 folds to -4
    assert vals("g + -2^2") == {"a": 126.0}
    # Inf/NaN literals in comparisons: nothing exceeds Inf, all exceed -Inf
    assert vals("g > Inf") == {}
    assert vals("g > -Inf") == {"a": 130.0}
    assert vals("clamp_max(g, Inf)") == {"a": 130.0}
    # NaN comparisons are always false (IEEE)
    assert vals("g == NaN") == {}


def test_unary_minus_on_native_histogram(spark):
    """-h lowers to -1 * h, which the r6 histogram shape rules evaluate as
    field-wise negation (Prometheus gauge-histogram negation)."""
    from datetime import datetime

    hist_ddl = (
        "struct<schema:int, zero_count:double, zero_threshold:double, "
        "count:double, sum:double, pos_offset:int, pos_counts:array<double>, "
        "neg_offset:int, neg_counts:array<double>>"
    )
    t = datetime(2024, 1, 1)
    h = {
        "schema": 0, "zero_count": 2.0, "zero_threshold": 2.0 ** -128,
        "count": 6.0, "sum": 9.0, "pos_offset": 0,
        "pos_counts": [2.0, 2.0], "neg_offset": 0, "neg_counts": [],
    }
    eng = PromQLEngine(
        spark.createDataFrame(
            [("latency", t, None, "a", h)],
            f"`__name__` string, ts timestamp, value double, job string, histogram {hist_ddl}",
        )
    )
    out = eng.query_range(spark, "histogram_sum(-latency)", t, t, 60).collect()
    assert len(out) == 1 and out[0]["value"] == -9.0
    out = eng.query_range(spark, "histogram_count(-latency)", t, t, 60).collect()
    assert out[0]["value"] == -6.0


def test_compound_durations_sci_hex_and_negative_offset(spark, fn_engine):
    """r6 lexer parity: compound durations (1m30s), scientific and hex
    number literals, and negative offsets (look INTO the future) — all
    valid Prometheus the tokenizer previously rejected."""
    from datetime import timedelta

    t = T0 + timedelta(minutes=30)

    def vals(q, at=t):
        return {
            r["job"]: r["value"]
            for r in fn_engine.query_range(spark, q, at, at, 60).collect()
        }

    # compound == plain-seconds window (c grows 6/min for job=a)
    assert vals("increase(c[1m30s])") == vals("increase(c[90s])")
    # scientific / hex literals in comparisons: g at t=30 is 130
    assert vals("g > 1.3e2") == {}
    assert vals("g >= 1.3e2") == {"a": 130.0}
    assert vals("g > 0x81") == {"a": 130.0}  # 0x81 = 129
    # negative offset: evaluating 10 minutes in the past with offset -10m
    # lands back on the current sample
    t20 = T0 + timedelta(minutes=20)
    assert vals("g offset -10m", at=t20) == vals("g", at=t)
    # compound duration as offset
    assert vals("g offset 1m30s", at=t) == vals("g", at=T0 + timedelta(minutes=28, seconds=30))


# ------------------------- experimental functions (feature-flag gated)
# Prometheus reaches limitk / limit_ratio / mad_over_time only behind
# --enable-feature=promql-experimental-functions (parser-gated upstream);
# the reference's passthrough (routers/api/prometheus.ts) inherits that.
# VERDICT r7 #7: same opt-in here — parse()/PromQLEngine(experimental=True).

@pytest.fixture(scope="module")
def exp_engine(spark):
    from datetime import timedelta

    rows = []
    for m in range(0, 31):
        ts = T0 + timedelta(minutes=m)
        rows.append(("c", ts, float(m * 6), "a"))
        v = m * 10 if m < 20 else (m - 20) * 10
        rows.append(("c", ts, float(v), "b"))
        rows.append(("g", ts, 100.0 + m, "a"))
    return PromQLEngine(
        spark.createDataFrame(
            rows, "`__name__` string, ts timestamp, value double, job string"
        ),
        experimental=True,
    )


def test_experimental_functions_are_gated(spark, fn_engine):
    for q in ("limitk(1, c)", "limit_ratio(0.5, c)", "mad_over_time(c[5m])"):
        with pytest.raises(ValueError, match="experimental"):
            parse(q)
        with pytest.raises(ValueError, match="experimental"):
            fn_engine.query_range(spark, q, T0, T0, 60)
    # flag-enabled parse accepts all three
    for q in ("limitk(1, c)", "limit_ratio(-0.5, c)", "mad_over_time(c[5m])"):
        parse(q, experimental=True)
    with pytest.raises(ValueError):
        parse("limit_ratio(1.5, c)", experimental=True)  # r outside [-1, 1]
    # limitk k must be a non-negative integer (upstream parse-time check);
    # truncating 2.9 -> 2 or treating -1 as empty hid user errors
    with pytest.raises(ValueError, match="non-negative integer"):
        parse("limitk(2.9, c)", experimental=True)
    with pytest.raises(ValueError, match="non-negative integer"):
        parse("limitk(-1, c)", experimental=True)


def test_mad_over_time_all_null_window_emits_no_row(spark, exp_engine):
    """A window whose samples are all NULL must yield NO row, matching the
    quantile_over_time guard (ADVICE r8)."""
    import math
    from datetime import timedelta

    t = T0 + timedelta(minutes=30)
    rows = exp_engine.query_range(
        spark, "mad_over_time(c[5m])", t, t, 60
    ).collect()
    assert all(
        r["value"] is not None and not math.isnan(r["value"]) for r in rows
    )


def test_mad_over_time(spark, exp_engine):
    # window (25m, 30m] of c{job=a}: [156,162,168,174,180] -> median 168,
    # |x-med| sorted [0,6,6,12,12] -> MAD 6; job=b: [60..100] -> MAD 10
    got = _at30(spark, exp_engine, "mad_over_time(c[5m])")
    assert abs(got["a"] - 6.0) < 1e-9 and abs(got["b"] - 10.0) < 1e-9
    # even sample count interpolates both medians (prometheus quantile):
    # (26m, 30m] -> [162,168,174,180], med 171, devs [3,3,9,9] -> MAD 6
    got = _at30(spark, exp_engine, "mad_over_time(c[4m])")
    assert abs(got["a"] - 6.0) < 1e-9


def test_limitk_deterministic_subset(spark, exp_engine):
    from datetime import timedelta

    t = T0 + timedelta(minutes=30)
    all_rows = exp_engine.query_range(spark, "c", t, t, 60).collect()
    one = exp_engine.query_range(spark, "limitk(1, c)", t, t, 60).collect()
    assert len(one) == 1
    assert tuple(one[0]) in {tuple(r) for r in all_rows}  # a real subset
    # deterministic: same series picked on replay
    again = exp_engine.query_range(spark, "limitk(1, c)", t, t, 60).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in one]
    # k >= |series| passes everything through
    two = exp_engine.query_range(spark, "limitk(5, c)", t, t, 60).collect()
    assert len(two) == len(all_rows)
    # per-group: one series per job group survives even at k=1
    per = exp_engine.query_range(
        spark, "limitk by (job) (1, c)", t, t, 60
    ).collect()
    assert {r["job"] for r in per} == {"a", "b"}


def test_limit_ratio_partitions_exactly(spark, exp_engine):
    from datetime import timedelta

    t = T0 + timedelta(minutes=30)
    full = {tuple(r) for r in exp_engine.query_range(spark, "c", t, t, 60).collect()}
    for r in (0.3, 0.5, 0.8):
        keep = {
            tuple(x)
            for x in exp_engine.query_range(
                spark, f"limit_ratio({r}, c)", t, t, 60
            ).collect()
        }
        rest = {
            tuple(x)
            for x in exp_engine.query_range(
                spark, f"limit_ratio(-{round(1 - r, 3)}, c)", t, t, 60
            ).collect()
        }
        # complementary ratios partition the vector exactly (upstream
        # documents limit_ratio(r) + limit_ratio(r-1) == the full vector)
        assert keep | rest == full and not (keep & rest)
    # boundary ratios
    assert {
        tuple(x)
        for x in exp_engine.query_range(spark, "limit_ratio(1.0, c)", t, t, 60).collect()
    } == full
    assert (
        exp_engine.query_range(spark, "limit_ratio(-1.0, c)", t, t, 60).count()
        == len(full)
    )


def test_limit_selection_is_oracle_replayable(spark, exp_engine):
    """The experimental selection hash is md5 over the label tuple so a SQL
    oracle can replay the exact subset: recompute the pick in DuckDB and
    compare series sets for both limitk and limit_ratio."""
    import duckdb
    from datetime import timedelta

    t = T0 + timedelta(minutes=30)
    full = exp_engine.query_range(spark, "c", t, t, 60).collect()
    series = sorted({r["job"] for r in full})
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE s AS SELECT * FROM (VALUES "
        + ", ".join(f"('{j}')" for j in series)
        + ") v(job)"
    )
    # limitk(1, c): k smallest md5(labels)
    want_k = {
        r[0]
        for r in con.sql(
            "SELECT job FROM s ORDER BY md5(coalesce(job, '')), job LIMIT 1"
        ).fetchall()
    }
    got_k = {
        r["job"]
        for r in exp_engine.query_range(spark, "limitk(1, c)", t, t, 60).collect()
    }
    assert got_k == want_k
    # limit_ratio(0.5, c): first-8-hex-chars fraction < r
    want_r = {
        r[0]
        for r in con.sql(
            "SELECT job FROM s WHERE "
            "CAST(('0x' || substring(md5(coalesce(job, '')), 1, 8)) AS BIGINT)"
            " / 4294967296.0 < 0.5"
        ).fetchall()
    }
    got_r = {
        r["job"]
        for r in exp_engine.query_range(
            spark, "limit_ratio(0.5, c)", t, t, 60
        ).collect()
    }
    assert got_r == want_r


def test_prometheus_api_param_parsing():
    """Twins of routers/api/prometheus.test.ts:21-70 (parseTimestamp /
    parseDuration — the HTTP-API parameter parsers, distinct from the
    PromQL-expression duration) plus the /query_range resolution guard."""
    import pytest

    from hyperdx_spark.promql import (
        PROMETHEUS_MAX_RESOLUTION,
        parse_api_duration,
        parse_api_timestamp,
        validate_range_resolution,
    )

    # numbers pass through; numeric strings are unix seconds
    assert parse_api_timestamp(1700000000) == 1700000000
    assert parse_api_timestamp(1700000000.5) == 1700000000.5
    assert parse_api_timestamp("1700000000") == 1700000000
    assert parse_api_timestamp("1700000000.5") == 1700000000.5
    # RFC3339 -> unix seconds
    assert parse_api_timestamp("2023-11-14T22:13:20.000Z") == 1700000000
    with pytest.raises(ValueError, match="Invalid timestamp"):
        parse_api_timestamp("not-a-date")

    assert parse_api_duration(60) == 60
    assert parse_api_duration("60") == 60
    for s, want in [("500ms", 0.5), ("30s", 30), ("5m", 300), ("2h", 7200),
                    ("1d", 86400), ("1w", 604800), ("1y", 31536000),
                    ("1.5h", 5400)]:
        assert parse_api_duration(s) == want, s
    with pytest.raises(ValueError, match="Invalid duration"):
        parse_api_duration("5x")
    with pytest.raises(ValueError, match="Invalid duration"):
        parse_api_duration("garbage")

    assert PROMETHEUS_MAX_RESOLUTION == 11_000
    validate_range_resolution(0, 11_000 * 60, 60)  # exactly at the cap: ok
    with pytest.raises(ValueError, match="exceeded maximum resolution of 11,000"):
        validate_range_resolution(0, 11_000 * 60 + 60, 60)
    with pytest.raises(ValueError, match="exceeded maximum"):
        validate_range_resolution(0, 600, 0)  # non-positive step


def test_prometheus_response_formatters(spark, exp_engine):
    """formatMatrixResponse / formatVectorResponse twins
    (prometheus.ts:112-147): metric = label map, values = chronological
    [unix_seconds, "stringified value"] pairs, one entry per label set."""
    from datetime import datetime, timezone

    from hyperdx_spark.promql import to_prometheus_matrix, to_prometheus_vector

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    t1 = datetime(2024, 1, 1, 0, 1, tzinfo=timezone.utc)
    df = spark.createDataFrame(
        [
            (t1, "api", 2.5),
            (t0, "api", 42.0),
            (t0, "web", 0.5),
        ],
        "__step timestamp, service string, value double",
    )
    matrix = to_prometheus_matrix(df)
    assert matrix == [
        {
            "metric": {"service": "api"},
            "values": [[t0.timestamp(), "42"], [t1.timestamp(), "2.5"]],
        },
        {"metric": {"service": "web"}, "values": [[t0.timestamp(), "0.5"]]},
    ]
    vector = to_prometheus_vector(df.where("__step = timestamp'2024-01-01 00:00:00'"))
    assert vector == [
        {"metric": {"service": "api"}, "value": [t0.timestamp(), "42"]},
        {"metric": {"service": "web"}, "value": [t0.timestamp(), "0.5"]},
    ]
    # end-to-end: a real query_range result round-trips through the shape
    got = to_prometheus_matrix(
        exp_engine.query_range(
            spark, "c", datetime(2024, 1, 1), datetime(2024, 1, 1, 0, 5), 60
        )
    )
    assert got and all(
        isinstance(e["metric"], dict)
        and all(isinstance(p[1], str) for p in e["values"])
        for e in got
    )


def test_prometheus_label_values(spark, exp_engine):
    """GET /label/:name/values twins (prometheus.ts:713-810): grammar
    validation, '__name__' = metric names, sorted distinct values, unknown
    label = empty."""
    assert exp_engine.label_values("__name__") == ["c", "g"]
    assert exp_engine.label_values("job") == ["a", "b"]
    assert exp_engine.label_values("nope") == []
    for bad in ("../evil", "a b", "9lead", "x?y", ""):
        with pytest.raises(ValueError, match="Invalid label name"):
            exp_engine.label_values(bad)


def test_resolve_exemplar_window():
    """Twins of prometheus.test.ts:150-208 resolveExemplarWindow."""
    from hyperdx_spark.promql import resolve_exemplar_window as w

    DAY = 86400
    end = 1_700_000_000
    # inside the cap: untouched
    assert w(str(end - DAY), str(end)) == (end - DAY, end)
    # over-wide windows NARROW (keeping the requested end), never reject
    assert w(str(end - 30 * DAY), str(end)) == (end - 7 * DAY, end)
    # inverted / missing / unparseable bounds reject with the exact error
    for s, e in [(str(end), str(end - DAY)), (None, str(end)),
                 (str(end - DAY), None), ("", str(end)),
                 ("not-a-time", str(end))]:
        with pytest.raises(ValueError, match="invalid or missing start/end"):
            w(s, e)
    # ISO timestamps parse like parseTimestamp
    s, e = w("2023-11-14T22:13:20Z", "2023-11-14T22:14:20Z")
    assert e - s == 60
    # explicit cap honoured
    assert w(str(end - 100), str(end), 10) == (end - 10, end)
