"""Post-query operators — in the reference these run client-side over JSON
result sets; here they are DataFrame transformations so they stay distributed
and inside the same Catalyst plan.

Ref: hyperdxio/hyperdx ``packages/common-utils/src/clickhouse/index.ts``
(mergeResultSets 496-610, computeRatio/computeResultSetRatio 377-490) and
``packages/app/src/ChartUtils.tsx`` (fillNulls 1055-1119).
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_result_sets(dfs: Sequence[DataFrame], on: Sequence[str]) -> DataFrame:
    """Client-side bucket merge (clickhouse/index.ts:496-610): N per-series
    result sets merged on (time bucket + group dims) — a full outer join on
    the bucket keys. Spark equivalent of the reference's hash-key merge."""
    return reduce(lambda a, b: a.join(b, on=list(on), how="full_outer"), dfs)


def compute_ratio(
    df: DataFrame,
    *,
    numerator: str,
    denominator: str,
    on_groups: Sequence[str] = (),
    bucket_col: str = "__timestamp",
    mode: str = "per_group",
    alias: str = "ratio",
) -> DataFrame:
    """Ratio series (clickhouse/index.ts:377-448; modes types.ts:1266-1267).

    per_group:       ratio = num / den row-wise.
    share_of_total:  denominator = per-bucket total of *denominator* across
                     all groups (window sum partitioned by bucket).
    """
    num = F.col(numerator).cast("double")
    if mode == "share_of_total":
        den = F.sum(F.col(denominator).cast("double")).over(
            Window.partitionBy(bucket_col)
        )
    elif mode == "per_group":
        den = F.col(denominator).cast("double")
    else:
        raise ValueError(f"unknown ratio mode {mode!r}")
    ratio = F.when(den != 0, num / den)
    return df.withColumn(alias, ratio)


def previous_period(
    df: DataFrame, *, bucket_col: str = "__timestamp", offset_seconds: int = 0
) -> DataFrame:
    """Previous-period overlay: shift buckets forward so the prior window
    aligns with the current one (ChartUtils.tsx previous-period offset)."""
    return df.withColumn(
        bucket_col,
        F.timestamp_seconds(F.unix_timestamp(F.col(bucket_col)) + offset_seconds),
    )
