"""Heatmap bounds + bucketing twins of the reference spec tests
(packages/app/src/components/__tests__/heatmapBuckets.test.ts and
DBHeatmapChart.test.ts).  The regression block reproduces the p99-vs-max
scenario the reference documents: rare latency spikes must stay visible."""

import math

import pytest

from hyperdx_spark.analytics.heatmap import (
    bucket_to_y_value,
    compute_bucket_percentiles,
    compute_effective_min,
    format_data_for_heatmap,
    get_quantile_lo,
    heatmap,
    heatmap_bounds,
)


# ---------------------------------------------------------------------------
# Test helpers — ports of the heatmapBuckets.test.ts fixtures
# ---------------------------------------------------------------------------

def _nearest_rank(values, level):
    s = sorted(values)
    if not s:
        return 0
    return s[max(0, math.ceil(level * len(s)) - 1)]


def _width_bucket(value, lo, hi, n):
    if value < lo:
        return 0
    if value >= hi:
        return n + 1
    return math.floor((value - lo) / (hi - lo) * n) + 1


def _simulate(values, scale, n_buckets=40):
    """Pure-python twin of computeHeatmapBuckets (heatmapBuckets.test.ts
    :102-131): the post-fix pipeline with quantile lower / true-max upper."""
    q_lo = get_quantile_lo(scale)
    nonneg = [v for v in values if v >= 0]
    mn = _nearest_rank(nonneg, q_lo)
    mx = max(values)
    eff = compute_effective_min(mn, mx, scale)
    counts = [0] * (n_buckets + 2)
    for v in values:
        if scale == "log":
            clamped = max(v, eff)
            b = _width_bucket(
                math.log(clamped), math.log(eff), math.log(mx), n_buckets
            )
        else:
            b = _width_bucket(v, eff, mx, n_buckets)
        counts[b] += 1
    return {"min": mn, "max": mx, "effective_min": eff, "counts": counts}


def _latency_data(base_count, base_mean, base_std, spike_count, spike_mean,
                  spike_std):
    """LCG + Box-Muller generator, seed-for-seed with heatmapBuckets.test.ts
    :172-200 (same IEEE double ops, so identical values)."""
    values = []
    seed = 42

    def rand():
        nonlocal seed
        seed = (seed * 1664525 + 1013904223) & 0x7FFFFFFF
        return seed / 0x7FFFFFFF

    def normal(mean, std):
        u1 = rand()
        u2 = rand()
        z = math.sqrt(-2 * math.log(u1 + 1e-10)) * math.cos(2 * math.pi * u2)
        return max(0.001, mean + z * std)

    for _ in range(base_count):
        values.append(normal(base_mean, base_std))
    for _ in range(spike_count):
        values.append(normal(spike_mean, spike_std))
    return values


def _spark_counts(spark, values, scale, n_buckets=40):
    """Run the real Spark heatmap over one time bucket; return the dense
    bucket-count array 0..n+1 so it compares against _simulate."""
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", float(v)) for v in values], "ts string, value double"
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "value")
    rows = heatmap(
        df, ts="ts", value="value", bucket_seconds=86400,
        n_buckets=n_buckets, scale=scale,
    ).collect()
    counts = [0] * (n_buckets + 2)
    for r in rows:
        counts[r["x_bucket"]] += r["count"]
    return counts


# ---------------------------------------------------------------------------
# Pure-function twins
# ---------------------------------------------------------------------------

def test_quantile_lo_levels():
    assert get_quantile_lo("log") == 0.01
    assert get_quantile_lo("linear") == 0.001
    with pytest.raises(ValueError):
        get_quantile_lo("sqrt")


def test_effective_min_caps_log_scale():
    assert compute_effective_min(0.001, 1000, "log") == 0.1
    assert compute_effective_min(5, 1000, "log") == 5
    assert compute_effective_min(0.001, 1000, "linear") == 0.001
    # JS `max*1e-4 || 1e-4`: falsy cap falls back to 1e-4
    assert compute_effective_min(0.0, 0.0, "log") == 1e-4
    assert math.isnan(compute_effective_min(float("nan"), 10, "log"))


def test_bucket_to_y_value_linear_uniform():
    n = 10
    vals = [bucket_to_y_value(j, n, 0, 100, "linear") for j in range(n + 1)]
    for i, v in enumerate(vals):
        assert v == pytest.approx(i * 10)


def test_bucket_to_y_value_log_uniform_in_log_space():
    n = 10
    vals = [bucket_to_y_value(j, n, 1, 1000, "log") for j in range(n + 1)]
    diffs = [b - a for a, b in zip(vals, vals[1:])]
    for d in diffs[1:]:
        assert d == pytest.approx(diffs[0], abs=1e-5)


def test_width_bucket_semantics(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", v) for v in [-1.0, 5.0, 50.0, 99.0, 100.0, 200.0]],
        "ts string, value double",
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "value")
    rows = heatmap(
        df, ts="ts", value="value", n_buckets=10, scale="linear",
        bounds=(0.0, 100.0),
    ).collect()
    got = {}
    for r in rows:
        got[r["x_bucket"]] = got.get(r["x_bucket"], 0) + r["count"]
    # -1 underflows to 0; 100 and 200 overflow to n+1=11; 5→1, 50→6, 99→10
    assert got == {0: 1, 1: 1, 6: 1, 10: 1, 11: 2}


# ---------------------------------------------------------------------------
# Regression: old p99 max hid latency spikes (heatmapBuckets.test.ts:205-324)
# ---------------------------------------------------------------------------

def test_spike_regression_log_scale(spark):
    values = _latency_data(1000, 50, 30, 5, 2000, 500)  # 0.5% spikes
    sim = _simulate(values, "log", 40)
    assert sim["max"] > 1000  # true max includes the spikes
    # At most 1 value overflows (the exact max, widthBucket >= check)
    assert sim["counts"][41] <= 1
    assert sum(sim["counts"][30:41]) > 0  # spikes spread over high buckets
    assert _spark_counts(spark, values, "log", 40) == sim["counts"]


def test_spike_regression_at_exactly_one_percent(spark):
    values = _latency_data(990, 50, 20, 10, 3000, 500)
    sim = _simulate(values, "log", 40)
    assert sim["counts"][41] <= 1
    assert _spark_counts(spark, values, "log", 40) == sim["counts"]


def test_near_zero_outliers_capped_on_log_scale(spark):
    values = [0.0001, 0.0001] + [10 + i * 0.1 for i in range(998)]
    sim = _simulate(values, "log", 40)
    assert sim["effective_min"] > 0.001  # max*1e-4 cap engaged
    assert sim["counts"][0] == 0  # clamped into bucket 1, not underflow
    assert _spark_counts(spark, values, "log", 40) == sim["counts"]


def test_wide_range_log_scale(spark):
    values = (
        [0.1 + i * 0.01 for i in range(100)]
        + [1 + i * 0.2 for i in range(500)]
        + [100 + i * 3 for i in range(300)]
        + [1000 + i * 200 for i in range(50)]
    )
    sim = _simulate(values, "log", 40)
    assert sim["counts"][41] <= 1
    assert sum(1 for c in sim["counts"][1:41] if c > 0) > 20
    assert _spark_counts(spark, values, "log", 40) == sim["counts"]


def test_linear_scale_matches_simulation(spark):
    values = _latency_data(500, 50, 30, 5, 2000, 500)
    sim = _simulate(values, "linear", 40)
    assert _spark_counts(spark, values, "linear", 40) == sim["counts"]


def test_bounds_query_min_ignores_negatives(spark):
    df = spark.createDataFrame(
        [(v,) for v in [-50.0, -10.0] + [float(i) for i in range(1, 101)]],
        "value double",
    )
    row = heatmap_bounds(df, value="value", scale="log").collect()[0]
    # min = nearest-rank p1 of the non-negative values; max over ALL values
    assert row["min"] == 1.0
    assert row["max"] == 100.0


def test_degenerate_range_yields_empty(spark):
    # max == effectiveMin → the reference's `enabled` gate keeps the bucket
    # query from running; our plan filters every row out.
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 5.0)] * 3, "ts string, value double"
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "value")
    assert heatmap(df, ts="ts", value="value", scale="log").count() == 0


# ---------------------------------------------------------------------------
# formatDataForHeatmap / computeBucketPercentiles (DBHeatmapChart.test.ts)
# ---------------------------------------------------------------------------

_T0 = 1751760000000  # 2026-07-06T00:00:00Z epoch-ms
_T1 = _T0 + 3600_000

_BASE = dict(
    timestamp_column="__hdx_time_bucket",
    generated_ts_buckets=[_T0, _T1],
    scale="linear",
    effective_min=0,
    max_v=4,
    n_buckets=4,
)


def _row(ts_ms, x_bucket, count):
    return {"__hdx_time_bucket": ts_ms, "x_bucket": x_bucket, "count": count}


def test_format_zero_filled_grid_when_no_data():
    time, bucket, count = format_data_for_heatmap([], **_BASE)
    assert time == [_T0] * 6 + [_T1] * 6
    assert bucket == [0, 1, 2, 3, 4, 5, 0, 1, 2, 3, 4, 5]
    assert count == [0] * 12


def test_format_places_counts_into_cells():
    time, bucket, count = format_data_for_heatmap(
        [_row(_T0, 1, "5"), _row(_T0, 3, "2"), _row(_T1, 0, "7")], **_BASE
    )
    assert len(time) == 12 and len(bucket) == 12
    assert count == [0, 5, 0, 2, 0, 0, 7, 0, 0, 0, 0, 0]


def test_format_tolerates_empty_time_buckets():
    _, _, count = format_data_for_heatmap([_row(_T1, 2, "9")], **_BASE)
    assert count == [0, 0, 0, 0, 0, 0, 0, 0, 9, 0, 0, 0]


def test_format_drops_duplicate_groups():
    time, bucket, count = format_data_for_heatmap(
        [_row(_T0, 1, "5"), _row(_T0, 1, "3"), _row(_T0, 2, "4"),
         _row(_T1, 1, "6")],
        **_BASE,
    )
    assert len(time) == 12 and len(bucket) == 12
    assert count == [0, 5, 4, 0, 0, 0, 0, 6, 0, 0, 0, 0]


def test_percentiles_pooled_across_time_buckets():
    data = format_data_for_heatmap(
        [_row(_T0, 1, "3"), _row(_T0, 4, "1"), _row(_T1, 1, "5"),
         _row(_T1, 2, "1")],
        **_BASE,
    )
    assert compute_bucket_percentiles(data) == {
        0: 0, 1: 80, 2: 90, 3: 90, 4: 100, 5: 100,
    }


def test_percentiles_empty_grid():
    assert compute_bucket_percentiles(
        format_data_for_heatmap([], **_BASE)
    ) == {}


def test_percentiles_sorted_by_y_value():
    assert compute_bucket_percentiles([[0, 0], [5, 1], [1, 3]]) == {
        1: 75, 5: 100,
    }


def test_heatmap_parts_equals_composed_union(spark, sf_dir):
    # r16 optimization contract: the shared-scan heatmap_parts must be
    # row-for-row identical to the two-heatmap() union it replaced in
    # q_heatmap (one bounds pass + one bucket pass instead of four scans).
    from pyspark.sql import functions as F

    from hyperdx_spark.analytics.heatmap import heatmap, heatmap_parts
    from hyperdx_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    composed = (
        heatmap(ev, ts="ts", value="value", bucket_seconds=86400,
                n_buckets=80, scale="log").withColumn("part", F.lit("log"))
        .unionByName(
            heatmap(ev, ts="ts", value="value", bucket_seconds=86400,
                    n_buckets=80, scale="linear")
            .withColumn("part", F.lit("lin")))
    )
    fused = heatmap_parts(
        ev, ts="ts", value="value", bucket_seconds=86400, n_buckets=80,
        parts=(("log", "log"), ("lin", "linear")),
    )
    assert fused.columns == composed.columns
    a = sorted(map(tuple, composed.collect()))
    b = sorted(map(tuple, fused.collect()))
    assert a == b
