"""Heatmap bucketing (ref: packages/app/src/components/DBHeatmapChart.tsx
:484-560): value → y-bucket over a log or linear scale between min/max
bounds (bounds from a separate min/max aggregation, broadcast), count per
(x = time bucket, y = bucket).

Scale shape: the bounds side is one row (broadcast); the bucketing is a
pure projection inside codegen; the only shuffle is the final (x, y)
count aggregation — cardinality ≤ time_buckets × y_buckets.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heatmap(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    bucket_seconds: int = 86400,
    y_buckets: int = 20,
    scale: str = "linear",
    bounds: Optional[tuple[float, float]] = None,
    ts_alias: str = "__timestamp",
) -> DataFrame:
    """(x time bucket, ybucket 0..y_buckets-1, cnt) heatmap cells.

    ``scale='log'`` buckets on log10 of the (positive-clamped) value, the
    reference's log mode; bounds default to the observed min/max via a
    broadcast single-row aggregate, or pass them to pin a fixed axis.
    """
    v = F.col(value).cast("double")
    if scale == "log":
        x = F.log10(F.greatest(v, F.lit(1e-12)))
    elif scale == "linear":
        x = v
    else:
        raise ValueError(f"unknown heatmap scale {scale!r}")
    src = df.withColumn("__x", x)
    if bounds is None:
        b = src.agg(F.min("__x").alias("lo"), F.max("__x").alias("hi"))
        src = src.crossJoin(F.broadcast(b))
    else:
        src = src.withColumn("lo", F.lit(float(bounds[0]))).withColumn(
            "hi", F.lit(float(bounds[1]))
        )
    span = F.col("hi") - F.col("lo")
    ybucket = F.when(span > 0, F.least(
        F.floor((F.col("__x") - F.col("lo")) / span * y_buckets),
        F.lit(y_buckets - 1),
    )).otherwise(F.lit(0)).cast("int")
    return (
        src.withColumn("ybucket", ybucket)
        .groupBy(
            F.timestamp_seconds(
                (F.unix_timestamp(F.col(ts)) / bucket_seconds).cast("long")
                * bucket_seconds
            ).alias(ts_alias),
            "ybucket",
        )
        .agg(F.count("*").alias("cnt"))
    )
