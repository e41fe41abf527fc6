"""Correlated-series search — rank every series by Pearson correlation of
its bucketed time profile against a query series ("what moved with this
metric?" — the related-metrics exploration the reference's chart UX points
at with correlated charts, computed engine-side here).

Scale shape: one bucket aggregation over the scan (map-side combinable),
the query series' buckets broadcast (one row per bucket), one aggregate
per candidate series — two shuffles total, candidate count never
materializes pairwise data beyond (series, 5 moments).

Determinism across engines (the oracle-gate requirement): per-bucket
values and all five moment sums accumulate as EXACT decimals (sums of
decimal(18,6) and of their exact decimal(37,12) products — no float
partial-sum order dependence), and only the final Pearson formula runs in
double, as one fixed-order scalar expression over correctly-rounded
inputs. ``corr()`` aggregates in either engine would NOT hash-match: their
co-moment accumulation order is nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(18,6)"


def correlated_series(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key: Column | str,
    value_col: str = "value",
    query_key: str,
    granularity: str = "hour",
    k: int = 10,
    min_buckets: int = 3,
) -> DataFrame:
    """Top-k series by |Pearson correlation| with the ``query_key`` series.

    ``key`` is any Column/SQL expression naming a series; ``granularity``
    is a ``date_trunc`` unit. Buckets missing from either series are
    ignored (inner alignment). Returns (key, corr, n_buckets) with corr
    rounded to 4 decimals, ties broken by key; series with zero variance
    on the aligned buckets are dropped (undefined correlation).
    """
    key_c = F.expr(key) if isinstance(key, str) else key
    b = (
        df.groupBy(
            F.date_trunc(granularity, F.col(ts_col)).alias("__b"),
            key_c.alias("__k"),
        )
        # the outer cast back to decimal(18,6) keeps the later products
        # inside decimal(37,12) — EXACT; without it sum() widens to (28,6)
        # and the product's 57-digit precision gets lossily truncated.
        # Consequence: per-bucket sums must fit 12 integer digits (widen
        # _DEC for corpora with larger per-bucket magnitudes).
        .agg(F.sum(F.col(value_col).cast(_DEC)).cast(_DEC).alias("__v"))
    )
    q = b.where(F.col("__k") == query_key).select(
        "__b", F.col("__v").alias("__qv")
    )
    joined = b.where(F.col("__k") != query_key).join(F.broadcast(q), on="__b")
    agg = joined.groupBy("__k").agg(
        F.count("*").alias("n"),
        F.sum("__v").cast("double").alias("sx"),
        F.sum("__qv").cast("double").alias("sy"),
        F.sum(F.col("__v") * F.col("__qv")).cast("double").alias("sxy"),
        F.sum(F.col("__v") * F.col("__v")).cast("double").alias("sxx"),
        F.sum(F.col("__qv") * F.col("__qv")).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    var_term = (n * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        n * F.col("syy") - F.col("sy") * F.col("sy")
    )
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(var_term)
    return (
        agg.where((F.col("n") >= min_buckets) & (var_term > 0))
        .select(
            F.col("__k").alias("key"),
            F.round(corr, 4).alias("corr"),
            F.col("n").alias("n_buckets"),
        )
        # TakeOrderedAndProject: per-partition top-k, driver merges k rows
        .orderBy(F.abs(F.col("corr")).desc(), F.col("key").asc())
        .limit(k)
    )
