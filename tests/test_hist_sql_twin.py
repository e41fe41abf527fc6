"""Full-output twins of the pre-r16 Column-built explicit-bounds histogram
builders.

r16 optimization: ``metrics.histogram_count`` / ``exp_histogram_count`` /
``histogram_quantile`` built their expression trees Column-by-Column
(~1,000 py4j RPCs for q_histogram before any job ran).  The engine now
emits the identical expressions as Spark-SQL text staged through
``selectExpr`` projections.  This test keeps the ORIGINAL Column
implementations verbatim as reference twins and asserts bit-identical
output (floats compared by repr) over fixtures that cover every branch:
first points, count/element decreases, bounds/size changes, start==ts and
start-change resets, mixed temporality, the unbounded last bucket, the
rank-in-first-bucket interpolation, group_cols, and multiple time buckets.

The composed paths stay pinned by tests/test_metrics.py goldens and the
strict q_histogram / q_exp_histogram oracle gates.
"""

from datetime import datetime
from typing import Optional, Sequence

import pytest
from pyspark.sql import DataFrame, Window, functions as F

from hyperdx_spark.metrics import (
    _bucket,
    exp_histogram_count,
    histogram_count,
    histogram_quantile,
)

# ---------------------------------------------------------------------------
# The pre-r16 Column implementations, verbatim (the reference twins).
# ---------------------------------------------------------------------------


def histogram_count_columns(
    df: DataFrame,
    *,
    ts: str,
    count: str,
    series_cols: Sequence[str],
    bucket_seconds: int,
    group_cols: Sequence[str] = (),
    temporality_col: Optional[str] = None,
    bucket_alias: str = "__timestamp",
    value_alias: str = "count",
) -> DataFrame:
    w = Window.partitionBy(*[F.col(c) for c in series_cols]).orderBy(F.col(ts))
    cur = F.col(count).cast("long")
    prev = F.lag(cur, 1).over(w)
    cum_delta = F.when(prev.isNull(), F.lit(0)).otherwise(
        F.when(cur < prev, cur).otherwise(cur - prev)
    )
    if temporality_col is None:
        delta = cum_delta
    else:
        t = F.col(temporality_col)
        delta = (
            F.when(t == 1, cur).when(t == 2, cum_delta).otherwise(F.lit(0))
        )
    b = _bucket(F.col(ts), bucket_seconds).alias(bucket_alias)
    return (
        df.withColumn("__delta", delta)
        .groupBy(b, *[F.col(c) for c in group_cols])
        .agg(F.sum("__delta").alias(value_alias))
    )


def exp_histogram_count_columns(
    df: DataFrame,
    *,
    ts: str,
    start_ts: str,
    count: str,
    series_cols: Sequence[str],
    bucket_seconds: int,
    group_cols: Sequence[str] = (),
    temporality_col: Optional[str] = None,
    bucket_alias: str = "__timestamp",
    value_alias: str = "count",
) -> DataFrame:
    w = Window.partitionBy(*[F.col(c) for c in series_cols]).orderBy(F.col(ts))
    cur = F.col(count).cast("long")
    prev = F.lag(cur, 1).over(w)
    prev_start = F.lag(F.col(start_ts), 1).over(w)
    is_first = prev.isNull()
    cum_delta = (
        F.when(is_first | (F.col(start_ts) == F.col(ts)), F.lit(0))
        .when((F.col(start_ts) != prev_start) | (cur < prev), cur)
        .otherwise(cur - prev)
    )
    if temporality_col is None:
        delta = cum_delta
    else:
        t = F.col(temporality_col)
        delta = F.when(t == 1, cur).when(t == 2, cum_delta).otherwise(F.lit(0))
    b = _bucket(F.col(ts), bucket_seconds).alias(bucket_alias)
    return (
        df.withColumn("__delta", delta)
        .groupBy(b, *[F.col(c) for c in group_cols])
        .agg(F.sum("__delta").alias(value_alias))
    )


def histogram_quantile_columns(
    df: DataFrame,
    *,
    ts: str,
    bucket_counts: str,
    explicit_bounds: str,
    series_cols: Sequence[str],
    bucket_seconds: int,
    level: float,
    group_cols: Sequence[str] = (),
    bucket_alias: str = "__timestamp",
    value_alias: str = "p",
    cumulative: bool = True,
) -> DataFrame:
    w = Window.partitionBy(*[F.col(c) for c in series_cols]).orderBy(F.col(ts))
    cur = F.col(bucket_counts)
    if cumulative:
        prev = F.lag(cur, 1).over(w)
        prev_bounds = F.lag(F.col(explicit_bounds), 1).over(w)
        decreased = F.exists(
            F.zip_with(cur, prev, lambda a, b: a < b), lambda x: x
        )
        reset = (
            prev.isNull()
            | (F.size(cur) != F.size(prev))
            | (prev_bounds != F.col(explicit_bounds))
            | decreased
        )
        delta = F.when(reset, cur.cast("array<double>")).otherwise(
            F.zip_with(cur, prev, lambda a, b: (a - b).cast("double"))
        )
        deltad = df.withColumn("__delta", delta)
    else:
        deltad = df.withColumn("__delta", cur.cast("array<double>"))

    b = _bucket(F.col(ts), bucket_seconds).alias(bucket_alias)
    exploded = deltad.select(
        b,
        *[F.col(c) for c in group_cols],
        F.col(explicit_bounds).alias("__bounds"),
        F.posexplode(F.col("__delta")).alias("__idx", "__cnt"),
    )
    summed = exploded.groupBy(
        bucket_alias, *group_cols, "__bounds", "__idx"
    ).agg(F.sum("__cnt").alias("__cnt"))
    assembled = (
        summed.groupBy(bucket_alias, *group_cols, "__bounds")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__idx"), F.col("__cnt")))
            ).alias("__pairs")
        )
        .withColumn(
            "__counts", F.transform(F.col("__pairs"), lambda s: s["__cnt"])
        )
        .drop("__pairs")
    )
    total = F.aggregate("__counts", F.lit(0.0), lambda acc, x: acc + x)
    rank = F.lit(level) * total
    cum = F.expr(
        "transform(__counts, (x, i) -> aggregate(slice(__counts, 1, i + 1),"
        " CAST(0.0 AS DOUBLE), (a, b) -> a + b))"
    )
    out = assembled.withColumn("__cum", cum).withColumn("__rank", rank)
    idx = F.expr("array_position(transform(__cum, c -> c >= __rank), true)")
    out = out.withColumn("__i", idx)
    lower = F.when(F.col("__i") <= 1, F.lit(0.0)).otherwise(
        F.expr("element_at(__bounds, int(__i) - 1)")
    )
    upper_exists = F.col("__i") <= F.size(F.col("__bounds"))
    upper = F.expr("element_at(__bounds, int(__i))")
    cum_before = F.when(F.col("__i") <= 1, F.lit(0.0)).otherwise(
        F.expr("element_at(__cum, int(__i) - 1)")
    )
    cnt_in = F.expr("element_at(__counts, int(__i))")
    frac = F.when(
        cnt_in > 0, (F.col("__rank") - cum_before) / cnt_in
    ).otherwise(F.lit(0.0))
    interp = F.when(~upper_exists, lower).otherwise(
        lower + (upper - lower) * frac
    )
    value = F.when(F.col("__i") == 0, None).otherwise(interp)
    return out.select(bucket_alias, *group_cols, value.alias(value_alias))


# ---------------------------------------------------------------------------
# Fixtures
# ---------------------------------------------------------------------------


def _t(m):
    return datetime(2024, 1, 1, 0, m)


COUNT_SCHEMA = "ts timestamp, st timestamp, sid string, grp string, cnt long, temp int"

# covers: first point (0), increments, count decrease (reset -> current),
# start==ts skip, start change (reset -> current), delta temporality
# pass-through, unknown temporality (0), several series/groups/time buckets
COUNT_ROWS = [
    (_t(1), _t(0), "a", "x", 10, 2),   # first -> 0
    (_t(2), _t(0), "a", "x", 25, 2),   # +15
    (_t(3), _t(0), "a", "x", 5, 2),    # decreased -> 5
    (_t(4), _t(4), "a", "x", 9, 2),    # start == ts (exp: 0; plain: 4)
    (_t(5), _t(4), "a", "x", 12, 2),   # start changed (exp: 12; plain: 3)
    (_t(1), _t(0), "b", "y", 7, 2),    # first
    (_t(2), _t(0), "b", "y", 7, 2),    # +0
    (_t(3), _t(0), "b", "y", 3, 1),    # delta row -> 3 (with temporality)
    (_t(4), _t(0), "b", "y", 4, 0),    # unknown temporality -> 0
    (datetime(2024, 1, 1, 1, 2), _t(0), "a", "x", 20, 2),  # next hour
]

QUANT_SCHEMA = (
    "ts timestamp, sid string, grp string, counts array<long>, "
    "bounds array<double>"
)

B3 = [10.0, 20.0, 30.0]
B3X = [15.0, 25.0, 35.0]

# covers: first point, element-wise increments, element decrease (reset),
# bounds change (reset), size change (reset), all-zero counts, the
# unbounded last bucket, several series/groups/time buckets
QUANT_ROWS = [
    (_t(1), "a", "x", [1, 3, 2, 1], B3),       # first -> reset
    (_t(2), "a", "x", [2, 5, 2, 1], B3),       # deltas [1,2,0,0]
    (_t(3), "a", "x", [1, 5, 2, 1], B3),       # element decreased -> reset
    (_t(4), "a", "x", [2, 6, 3, 1], B3X),      # bounds changed -> reset
    (_t(5), "a", "x", [2, 6, 3, 1, 4], B3X + [45.0]),  # size changed -> reset
    (_t(1), "b", "y", [0, 0, 0, 9], B3),       # mass in unbounded last bucket
    (_t(2), "b", "y", [0, 0, 0, 12], B3),
    (_t(3), "b", "y", [0, 0, 0, 0], B3),       # decreased -> reset, all zero
    (datetime(2024, 1, 1, 1, 7), "a", "x", [3, 1, 0, 0], B3),  # next hour
]

KW_COUNT = dict(
    ts="ts", count="cnt", series_cols=["sid"], bucket_seconds=3600,
    group_cols=["grp"],
)
KW_QUANT = dict(
    ts="ts", bucket_counts="counts", explicit_bounds="bounds",
    series_cols=["sid"], bucket_seconds=3600,
)


def _canon(rows):
    return sorted(
        tuple(repr(float(v)) if isinstance(v, float) else v for v in r)
        for r in rows
    )


def _assert_pair(ref_df, new_df):
    ref, new = ref_df.collect(), new_df.collect()
    assert ref_df.columns == new_df.columns
    assert _canon(ref) == _canon(new), (_canon(ref), _canon(new))
    assert len(ref) > 0


# ---------------------------------------------------------------------------
# histogram_count / exp_histogram_count
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("temporality_col", [None, "temp"])
def test_histogram_count_twin(spark, temporality_col):
    df = spark.createDataFrame(COUNT_ROWS, COUNT_SCHEMA)
    kw = {**KW_COUNT, "temporality_col": temporality_col}
    _assert_pair(
        histogram_count_columns(df, **kw), histogram_count(df, **kw)
    )


@pytest.mark.parametrize("temporality_col", [None, "temp"])
def test_exp_histogram_count_twin(spark, temporality_col):
    df = spark.createDataFrame(COUNT_ROWS, COUNT_SCHEMA)
    kw = {**KW_COUNT, "start_ts": "st", "temporality_col": temporality_col}
    _assert_pair(
        exp_histogram_count_columns(df, **kw), exp_histogram_count(df, **kw)
    )


def test_histogram_count_aliases_twin(spark):
    df = spark.createDataFrame(COUNT_ROWS, COUNT_SCHEMA)
    kw = {**KW_COUNT, "bucket_alias": "bkt", "value_alias": "total"}
    _assert_pair(
        histogram_count_columns(df, **kw), histogram_count(df, **kw)
    )


# ---------------------------------------------------------------------------
# histogram_quantile
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("level", [0.25, 0.517, 0.9, 0.99])
@pytest.mark.parametrize("cumulative", [True, False])
def test_histogram_quantile_twin(spark, level, cumulative):
    df = spark.createDataFrame(QUANT_ROWS, QUANT_SCHEMA)
    kw = {**KW_QUANT, "level": level, "cumulative": cumulative}
    _assert_pair(
        histogram_quantile_columns(df, **kw), histogram_quantile(df, **kw)
    )


def test_histogram_quantile_group_cols_twin(spark):
    df = spark.createDataFrame(QUANT_ROWS, QUANT_SCHEMA)
    kw = {**KW_QUANT, "level": 0.5, "group_cols": ["grp"],
          "bucket_alias": "bkt", "value_alias": "p50"}
    _assert_pair(
        histogram_quantile_columns(df, **kw), histogram_quantile(df, **kw)
    )


def test_histogram_quantile_unbounded_last_bucket(spark):
    """Mass beyond the last bound returns the last bound (no upper)."""
    rows = [(_t(1), "s", "g", [0, 0, 0, 5], B3)]
    df = spark.createDataFrame(rows, QUANT_SCHEMA)
    kw = {**KW_QUANT, "level": 0.9, "cumulative": False}
    ref = histogram_quantile_columns(df, **kw).collect()
    new = histogram_quantile(df, **kw).collect()
    assert _canon(ref) == _canon(new)
    assert new[0]["p"] == 30.0  # lower bound of the unbounded bucket
