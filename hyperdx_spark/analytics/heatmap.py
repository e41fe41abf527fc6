"""Heatmap bucketing (ref: packages/app/src/components/DBHeatmapChart.tsx
:406-560 and :600-710; spec tests: components/__tests__/heatmapBuckets.test.ts
and DBHeatmapChart.test.ts).

Two-phase design, reference-exact:

1. **Bounds** (``buildHeatmapBoundsConfig``, DBHeatmapChart.tsx:409-476): the
   LOWER bound is ``quantile(0.01)`` (log scale) / ``quantile(0.001)``
   (linear) over the *non-negative* values; the UPPER bound is the true
   ``max()`` over ALL values.  heatmapBuckets.test.ts:1-13 documents why the
   upper bound is max() and not a quantile: a p99 upper bound crammed rare
   (<1%) latency spikes into one invisible overflow bucket.
2. **effectiveMin** (DBHeatmapChart.tsx:768-773): for log scale
   ``max(min, max*1e-4 || 1e-4)`` — caps the axis to ~4 orders of magnitude
   so near-zero outliers don't stretch it; the JS ``||`` kicks in when
   ``max*1e-4`` is 0 or NaN.  Linear scale uses the raw quantile min.
3. **Bucketing** (DBHeatmapChart.tsx:503-510): ClickHouse
   ``widthBucket(log(greatest(v, effectiveMin)), log(effectiveMin),
   log(max), n)`` for log scale, ``widthBucket(v, effectiveMin, max, n)``
   for linear.  widthBucket returns 0 for underflow, n+1 for v >= hi, else
   ``floor((v-lo)/(hi-lo)*n)+1``.  The bucket query only runs when
   ``max > effectiveMin`` (the ``enabled`` gate, tsx:786).

Quantile semantics: ClickHouse ``quantile`` is modelled by the reference
spec test as nearest-rank (heatmapBuckets.test.ts:31-38); Spark's
``percentile_disc`` and DuckDB's ``quantile_disc`` are both exactly
nearest-rank, so the Spark plan and the SQL oracle agree bit-for-bit.

Scale shape: the bounds side is ONE row (broadcast cross join — no driver
action needed); the bucketing is a pure projection inside codegen; the only
shuffle is the final (time, x_bucket) count aggregation with cardinality
<= time_buckets x (n_buckets+2).  ``percentile_disc`` is an exact aggregate
(per-value counts); at 100 TB pass ``exact_bounds=False`` to bound memory
with ``approx_percentile`` — the reference's ClickHouse ``quantile`` is
itself sampling-based, so approximate bounds are within its contract.
"""

from __future__ import annotations

import math
from typing import Iterable, Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ref HEATMAP_N_BUCKETS, DBHeatmapChart.tsx:406
HEATMAP_N_BUCKETS = 80


def get_quantile_lo(scale: str) -> float:
    """Quantile level for the LOWER bound (ref tsx:420, spec test
    heatmapBuckets.test.ts:24-28): log scale p1, linear p0.1.  The upper
    bound uses the actual max() — no quantile."""
    _check_scale(scale)
    return 0.01 if scale == "log" else 0.001


def _check_scale(scale: str) -> None:
    if scale not in ("log", "linear"):
        raise ValueError(f"unknown heatmap scale {scale!r}")


def compute_effective_min(min_v: float, max_v: float, scale: str) -> float:
    """ref DBHeatmapChart.tsx:768-773 / heatmapBuckets.test.ts:43-50:
    ``scaleType === 'log' ? Math.max(min, max*1e-4 || 1e-4) : min``.

    The JS ``||`` falls back to 1e-4 when ``max*1e-4`` is falsy (0, -0 or
    NaN); Math.max propagates NaN, matched here.
    """
    _check_scale(scale)
    if scale != "log":
        return min_v
    cap = max_v * 1e-4
    if cap == 0 or math.isnan(cap):
        cap = 1e-4
    if math.isnan(min_v) or math.isnan(cap):
        return float("nan")
    return max(min_v, cap)


def bucket_to_y_value(
    j: float, n_buckets: int, effective_min: float, max_v: float, scale: str
) -> float:
    """y-axis value of bucket index ``j`` (ref tsx:629-640): log scale
    returns ln of the geometric bucket boundary (uniform spacing in log
    space for the renderer); linear returns ``min + j*step``."""
    if scale == "log" and effective_min > 0 and max_v > effective_min:
        actual = effective_min * (max_v / effective_min) ** (j / n_buckets)
        return math.log(actual)
    return effective_min + j * ((max_v - effective_min) / n_buckets)


def width_bucket(v: Column, lo: Column, hi: Column, n_buckets: int) -> Column:
    """ClickHouse ``widthBucket(v, lo, hi, n)`` (spec:
    heatmapBuckets.test.ts:66-80): 0 for v < lo, n+1 for v >= hi, else
    ``floor((v-lo)/(hi-lo)*n)+1``."""
    return (
        F.when(v < lo, F.lit(0))
        .when(v >= hi, F.lit(n_buckets + 1))
        .otherwise((F.floor((v - lo) / (hi - lo) * n_buckets) + 1).cast("int"))
        .cast("int")
    )


def heatmap_bounds(
    df: DataFrame,
    *,
    value: str = "value",
    scale: str = "log",
    exact: bool = True,
) -> DataFrame:
    """The FIRST query (ref ``buildHeatmapBoundsConfig``, tsx:411-476): one
    row ``(min, max)`` where min = nearest-rank quantile of the non-negative
    values (aggCondition ``value >= 0``, tsx:432/465) and max = true max
    over ALL values.  ``exact=False`` swaps ``percentile_disc`` for
    ``approx_percentile`` (the 100 TB path; CH quantile is itself
    approximate)."""
    q_lo = get_quantile_lo(scale)
    v = F.col(value).cast("double")
    nonneg = F.when(v >= 0, v)
    if exact:
        min_agg = F.expr(
            f"percentile_disc({q_lo!r}) WITHIN GROUP "
            f"(ORDER BY CASE WHEN CAST({value} AS DOUBLE) >= 0 "
            f"THEN CAST({value} AS DOUBLE) END)"
        )
    else:
        min_agg = F.percentile_approx(nonneg, F.lit(q_lo), F.lit(100000))
    return df.agg(min_agg.alias("min"), F.max(v).alias("max"))


def heatmap(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    bucket_seconds: int = 86400,
    n_buckets: int = HEATMAP_N_BUCKETS,
    scale: str = "log",
    bounds: Optional[tuple[float, float]] = None,
    ts_alias: str = "__timestamp",
    exact_bounds: bool = True,
) -> DataFrame:
    """(time bucket, x_bucket 0..n_buckets+1, count) heatmap cells — the
    SECOND query (ref ``buildHeatmapBucketConfig``, tsx:484-560) composed
    with the bounds query in one plan via a broadcast single-row join.

    ``bounds`` pins ``(effective_min, max)`` directly (the reference's
    editor-preview path, tsx:481-483); otherwise they derive from
    :func:`heatmap_bounds` + the effectiveMin cap, computed in-plan.
    Rows are produced only when ``max > effective_min`` (the reference's
    ``enabled`` gate, tsx:786) — degenerate ranges yield an empty result.
    """
    _check_scale(scale)
    v = F.col(value).cast("double")

    if bounds is not None:
        src = df.withColumn("__eff", F.lit(float(bounds[0]))).withColumn(
            "__hi", F.lit(float(bounds[1]))
        )
    else:
        b = heatmap_bounds(df, value=value, scale=scale, exact=exact_bounds)
        if scale == "log":
            cap = F.col("max") * F.lit(1e-4)
            cap = F.when(
                cap.isNull() | F.isnan(cap) | (cap == 0), F.lit(1e-4)
            ).otherwise(cap)
            eff = F.greatest(F.col("min"), cap)
        else:
            eff = F.col("min")
        b = b.select(eff.alias("__eff"), F.col("max").alias("__hi"))
        src = df.crossJoin(F.broadcast(b))

    if scale == "log":
        x = F.log(F.greatest(v, F.col("__eff")))
        lo = F.log(F.col("__eff"))
        hi = F.log(F.col("__hi"))
    else:
        x = v
        lo = F.col("__eff")
        hi = F.col("__hi")

    return (
        src.where(F.col("__hi") > F.col("__eff"))
        .withColumn("x_bucket", width_bucket(x, lo, hi, n_buckets))
        .groupBy(
            F.timestamp_seconds(
                (F.unix_timestamp(F.col(ts)) / bucket_seconds).cast("long")
                * bucket_seconds
            ).alias(ts_alias),
            "x_bucket",
        )
        .agg(F.count("*").alias("count"))
    )


def heatmap_parts(
    df: DataFrame,
    *,
    parts: Sequence[tuple[str, str]] = (("log", "log"), ("lin", "linear")),
    ts: str = "ts",
    value: str = "value",
    bucket_seconds: int = 86400,
    n_buckets: int = HEATMAP_N_BUCKETS,
    ts_alias: str = "__timestamp",
    exact_bounds: bool = True,
) -> DataFrame:
    """Several :func:`heatmap` scales over ONE pair of input scans.

    ``parts`` is ``[(label, scale), ...]``; the result is row-for-row the
    ``unionByName`` of ``heatmap(df, scale=s).withColumn("part", lit(l))``
    per part (pytest-asserted), with columns
    ``(ts_alias, x_bucket, count, part)``.

    Why (r16, guide §2.3/§6): the composed form runs one bounds aggregate
    and one bucket aggregate PER scale — four full input scans for the
    standard log+linear pair.  Both bounds rows come from the same
    aggregate pass (two ``percentile_disc`` levels + one ``max``), and the
    bucket pass broadcasts the per-part ``(eff, hi)`` rows and buckets
    each input row once per part inside one codegen'd projection — two
    scans total, halving the query's input I/O at any scale.  Every
    per-part arithmetic path is the same Column expression CASE-selected
    by part, so the produced doubles are bit-identical to the composed
    form's.
    """
    labels = [p[0] for p in parts]
    scales = [p[1] for p in parts]
    for s in scales:
        _check_scale(s)
    v = F.col(value).cast("double")

    # one bounds pass: every distinct quantile level + the shared max
    levels = sorted({get_quantile_lo(s) for s in scales})
    aggs = [F.max(v).alias("max")]
    for q_lo in levels:
        if exact_bounds:
            min_agg = F.expr(
                f"percentile_disc({q_lo!r}) WITHIN GROUP "
                f"(ORDER BY CASE WHEN CAST({value} AS DOUBLE) >= 0 "
                f"THEN CAST({value} AS DOUBLE) END)"
            )
        else:
            min_agg = F.percentile_approx(
                F.when(v >= 0, v), F.lit(q_lo), F.lit(100000)
            )
        aggs.append(min_agg.alias(f"min_{str(q_lo).replace('.', '_')}"))
    b = df.agg(*aggs)

    # per-part (label, eff, hi) rows — same effectiveMin Columns as
    # heatmap()'s bounds branch, selected per scale
    part_structs = []
    for label, scale in parts:
        mn = F.col(f"min_{str(get_quantile_lo(scale)).replace('.', '_')}")
        if scale == "log":
            cap = F.col("max") * F.lit(1e-4)
            cap = F.when(
                cap.isNull() | F.isnan(cap) | (cap == 0), F.lit(1e-4)
            ).otherwise(cap)
            eff = F.greatest(mn, cap)
        else:
            eff = mn
        part_structs.append(
            F.struct(
                F.lit(label).alias("part"),
                F.lit(scale == "log").alias("__is_log"),
                eff.alias("__eff"),
                F.col("max").alias("__hi"),
            )
        )
    bounds = b.select(
        F.explode(F.array(*part_structs)).alias("__b")
    ).select("__b.part", "__b.__is_log", "__b.__eff", "__b.__hi")

    src = df.crossJoin(F.broadcast(bounds))
    is_log = F.col("__is_log")
    x = F.when(is_log, F.log(F.greatest(v, F.col("__eff")))).otherwise(v)
    lo = F.when(is_log, F.log(F.col("__eff"))).otherwise(F.col("__eff"))
    hi = F.when(is_log, F.log(F.col("__hi"))).otherwise(F.col("__hi"))
    return (
        src.where(F.col("__hi") > F.col("__eff"))
        .withColumn("x_bucket", width_bucket(x, lo, hi, n_buckets))
        .groupBy(
            F.timestamp_seconds(
                (F.unix_timestamp(F.col(ts)) / bucket_seconds).cast("long")
                * bucket_seconds
            ).alias(ts_alias),
            "x_bucket",
            "part",
        )
        .agg(F.count("*").alias("count"))
        .select(ts_alias, "x_bucket", "count", "part")
    )


def format_data_for_heatmap(
    data: Sequence[Mapping],
    *,
    timestamp_column: str,
    generated_ts_buckets: Sequence,
    scale: str,
    effective_min: float,
    max_v: float,
    n_buckets: int,
) -> tuple[list, list, list]:
    """Dense ``[time, bucket, count]`` grid for the renderer (ref
    ``formatDataForHeatmap``, tsx:602-677): every (time bucket, 0..n+1)
    cell gets a row, missing cells zero-filled, duplicate (time, x_bucket)
    groups from unmerged distributed results dropped (first wins).  Rows
    must arrive sorted by (time, x_bucket) — the reference walks the grid
    and its data cursor in lockstep.

    ``generated_ts_buckets`` holds epoch-ms ints (or datetimes, converted);
    counts may be strings (CH returns UInt64 as string — parsed base-10).
    """
    times: list = []
    buckets: list = []
    counts: list = []

    def _ms(t) -> int:
        if hasattr(t, "timestamp"):
            return int(t.timestamp() * 1000)
        return int(t)

    data_index = 0
    n_rows = len(data)
    for tb in generated_ts_buckets:
        generated_ms = _ms(tb)
        for j in range(n_buckets + 2):
            row = data[data_index] if data_index < n_rows else None
            if (
                row is not None
                and _ms(row[timestamp_column]) == generated_ms
                and row["x_bucket"] == j
            ):
                times.append(_ms(row[timestamp_column]))
                buckets.append(
                    bucket_to_y_value(
                        row["x_bucket"], n_buckets, effective_min, max_v, scale
                    )
                )
                counts.append(int(str(row["count"]), 10))
                while (
                    data_index < n_rows
                    and _ms(data[data_index][timestamp_column]) == generated_ms
                    and data[data_index]["x_bucket"] == j
                ):
                    data_index += 1
            else:
                times.append(generated_ms)
                buckets.append(
                    bucket_to_y_value(j, n_buckets, effective_min, max_v, scale)
                )
                counts.append(0)

    return times, buckets, counts


def compute_bucket_percentiles(
    data: tuple[Iterable, Iterable, Iterable]
) -> dict[float, float]:
    """Cumulative share (0-100) of events at or below each y-bucket, keyed
    by that bucket's y-value and accumulated in ascending y order (ref
    ``computeBucketPercentiles``, tsx:683-707).  Empty grid → empty map
    (the tooltip omits the percentile rather than dividing by zero)."""
    _, ys, cnts = data
    ys = list(ys)
    cnts = list(cnts)
    bucket_totals: dict[float, float] = {}
    total = 0
    for y, c in zip(ys, cnts):
        bucket_totals[y] = bucket_totals.get(y, 0) + c
        total += c
    if total == 0:
        return {}
    percentiles: dict[float, float] = {}
    cumulative = 0
    for y in sorted(bucket_totals):
        cumulative += bucket_totals[y]
        percentiles[y] = (cumulative / total) * 100
    return percentiles
