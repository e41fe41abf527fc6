"""OTel metric semantics — gauge, sum/counter rate, increase, histogram.

Ref: hyperdxio/hyperdx ``core/renderChartConfig.ts`` (translateMetricChartConfig
1686-2173) and ``core/histogram.ts``. The reference rewrites the ChartConfig
into CTE pipelines; here each rewrite is a DataFrame transformation chain.

Series identity: the reference hashes (ScopeAttributes, ResourceAttributes,
Attributes) with cityHash64 (histogram.ts:61-62); we hash the same tuple with
``xxhash64`` — identity-only use, never persisted.

Scale notes:
* Per-series window functions shuffle once on the series hash; state per
  series is one row (lag) — bounded memory, AQE handles skewed series.
* Bucketed aggregation after the window reuses the same partitioning when the
  series hash is in the grouping key (no second shuffle for the inner agg).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def series_hash(*cols: Column) -> Column:
    """Series identity hash (ref histogram.ts:61-62 cityHash64 analogue)."""
    return F.xxhash64(*cols)


def _bucket(ts: Column, step: int) -> Column:
    return F.timestamp_seconds((F.unix_timestamp(ts) / step).cast("long") * step)


def gauge_bucket(
    df: DataFrame,
    *,
    ts: str,
    value: str,
    series_cols: Sequence[str],
    bucket_seconds: int,
    group_cols: Sequence[str] = (),
    agg: str = "avg",
    bucket_alias: str = "__timestamp",
    value_alias: str = "value",
) -> DataFrame:
    """Gauge chart (renderChartConfig.ts:1725-1819).

    Per (series, time-bucket) take ``last_value(Value)`` = argMax(Value, ts),
    then apply the user aggregation across series per (bucket, groups).
    """
    b = _bucket(F.col(ts), bucket_seconds).alias(bucket_alias)
    inner = (
        df.groupBy(b, *[F.col(c) for c in set(series_cols) | set(group_cols)])
        .agg(F.max_by(F.col(value), F.col(ts)).alias("__last"))
    )
    outer_agg = {
        "avg": F.avg,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "count": F.count,
    }[agg]
    return (
        inner.groupBy(bucket_alias, *group_cols)
        .agg(outer_agg(F.col("__last")).alias(value_alias))
    )


def counter_rate(
    df: DataFrame,
    *,
    ts: str,
    value: str,
    series_cols: Sequence[str],
    bucket_seconds: int,
    group_cols: Sequence[str] = (),
    bucket_alias: str = "__timestamp",
    value_alias: str = "rate",
    is_delta: bool = False,
) -> DataFrame:
    """Monotonic-counter rate (renderChartConfig.ts:1820-2075).

    Cumulative temporality: per-row Rate = value - lag(value) within the
    series, **reset-clamped** to ``greatest(delta, 0)`` (a counter reset
    yields 0, not the Prometheus reset=current convention — documented
    divergence at renderChartConfig.ts:1878-1884). The first sample of a
    series has no previous row and contributes nothing. Delta temporality:
    rows pass through as-is. Bucket value = sum(Rate).
    """
    if is_delta:
        rated = df.withColumn("__rate", F.col(value).cast("double"))
    else:
        w = Window.partitionBy(*[F.col(c) for c in series_cols]).orderBy(F.col(ts))
        prev = F.lag(F.col(value), 1).over(w)
        delta = F.col(value).cast("double") - prev.cast("double")
        rated = df.withColumn(
            "__rate", F.when(prev.isNull(), None).otherwise(F.greatest(delta, F.lit(0.0)))
        )
    b = _bucket(F.col(ts), bucket_seconds).alias(bucket_alias)
    return (
        rated.groupBy(b, *[F.col(c) for c in group_cols])
        .agg(F.sum("__rate").alias(value_alias))
    )


def counter_increase(
    df: DataFrame,
    *,
    ts: str,
    value: str,
    series_cols: Sequence[str],
    bucket_seconds: int,
    group_cols: Sequence[str] = (),
    top_groups: int = 20,
    bucket_alias: str = "__timestamp",
    value_alias: str = "increase",
) -> DataFrame:
    """``increase`` agg (renderChartConfig.ts:1971-2060): counter-rate summed
    across series, with the fixed top-20-groups cap ranked by total increase
    (empty groups excluded). The cap is a broadcast semi-join."""
    rates = counter_rate(
        df,
        ts=ts,
        value=value,
        series_cols=series_cols,
        bucket_seconds=bucket_seconds,
        group_cols=group_cols,
        bucket_alias=bucket_alias,
        value_alias=value_alias,
    )
    if not group_cols:
        return rates
    ranking = (
        rates.where(F.coalesce(*[F.col(g).cast("string") for g in group_cols]) != "")
        .groupBy(*group_cols)
        .agg(F.sum(value_alias).alias("__total"))
        .orderBy(F.desc_nulls_last("__total"), *[F.asc(g) for g in group_cols])
        .limit(top_groups)
        .select(*group_cols)
    )
    cols = rates.columns
    return rates.join(F.broadcast(ranking), on=list(group_cols), how="left_semi").select(*cols)


def histogram_quantile(
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
    """Explicit-bounds histogram quantile (core/histogram.ts:137-250).

    1. per-series element-wise delta of ``BucketCounts`` vs the previous
       sample (reset if any element decreased or the bounds changed -> use
       current counts as the delta);
    2. element-wise sum of deltas across series per (time bucket, groups);
    3. cumulative sum across buckets, rank = level * total, find the first
       histogram bucket whose cumulative count exceeds the rank;
    4. linear interpolation within [lower_bound, upper_bound]; the last
       bucket is unbounded (+inf) -> its lower bound is returned; rank in
       the first bucket interpolates from 0.

    All array math uses Spark higher-order functions (zip_with, aggregate,
    transform) — JVM-side, no UDFs.
    """
    w = Window.partitionBy(*[F.col(c) for c in series_cols]).orderBy(F.col(ts))
    cur = F.col(bucket_counts)
    if cumulative:
        prev = F.lag(cur, 1).over(w)
        prev_bounds = F.lag(F.col(explicit_bounds), 1).over(w)
        # reset detection: any element decreased, length or bounds changed
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
        # first-point rows: the reference keeps the current counts when the
        # series starts (histogram.ts reset semantics: current<prev -> current)
        deltad = df.withColumn("__delta", delta)
    else:
        deltad = df.withColumn("__delta", cur.cast("array<double>"))

    b = _bucket(F.col(ts), bucket_seconds).alias(bucket_alias)
    # element-wise sum across series (sumForEach): explode to (idx, cnt) and
    # re-assemble — distributed, no size assumption on the arrays
    exploded = deltad.select(
        b,
        *[F.col(c) for c in group_cols],
        F.col(explicit_bounds).alias("__bounds"),
        F.posexplode(F.col("__delta")).alias("__idx", "__cnt"),
    )
    summed = exploded.groupBy(bucket_alias, *group_cols, "__bounds", "__idx").agg(
        F.sum("__cnt").alias("__cnt")
    )
    assembled = (
        summed.groupBy(bucket_alias, *group_cols, "__bounds")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__idx"), F.col("__cnt")))
            ).alias("__pairs")
        )
        .withColumn("__counts", F.transform(F.col("__pairs"), lambda s: s["__cnt"]))
        .drop("__pairs")
    )
    # cumulative distribution + rank -> interpolate (histogram.ts:205-250)
    total = F.aggregate("__counts", F.lit(0.0), lambda acc, x: acc + x)
    rank = F.lit(level) * total
    cum = F.expr(
        "transform(__counts, (x, i) -> aggregate(slice(__counts, 1, i + 1), CAST(0.0 AS DOUBLE), (a, b) -> a + b))"
    )
    out = assembled.withColumn("__cum", cum).withColumn("__rank", rank)
    # idx of first bucket with cum >= rank
    idx = F.expr("array_position(transform(__cum, c -> c >= __rank), true)")
    out = out.withColumn("__i", idx)  # 1-based; 0 = not found
    lower = F.when(F.col("__i") <= 1, F.lit(0.0)).otherwise(
        F.expr("element_at(__bounds, int(__i) - 1)")
    )
    upper_exists = F.col("__i") <= F.size(F.col("__bounds"))
    upper = F.expr("element_at(__bounds, int(__i))")
    cum_before = F.when(F.col("__i") <= 1, F.lit(0.0)).otherwise(
        F.expr("element_at(__cum, int(__i) - 1)")
    )
    cnt_in = F.expr("element_at(__counts, int(__i))")
    frac = F.when(cnt_in > 0, (F.col("__rank") - cum_before) / cnt_in).otherwise(F.lit(0.0))
    interp = F.when(~upper_exists, lower).otherwise(lower + (upper - lower) * frac)
    value = F.when(F.col("__i") == 0, None).otherwise(interp)
    return out.select(
        bucket_alias, *group_cols, value.alias(value_alias)
    )
