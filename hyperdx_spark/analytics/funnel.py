"""Funnel + cohort-retention analytics.

ClickHouse exposes ``windowFunnel`` / ``retention`` aggregate combinators
(www.clickhouse.com docs; the reference's product-analytics neighbors use
them constantly). Spark has no native equivalent, but both are expressible
as JVM-side array folds over per-key sorted event lists — no Python in the
hot path.

* :func:`window_funnel` — per key, the deepest funnel level reachable such
  that steps 1..L occur in order and all within ``window_s`` seconds of the
  chain's step-1 event (ClickHouse windowFunnel default, non-strict mode:
  other events may interleave).
* :func:`retention_cohorts` — users bucketed by first-activity period x
  activity-offset periods (the classic retention triangle).

Scale shape: one shuffle on the key for collect_list; the fold runs inside
whole-stage codegen-adjacent HOF evaluation per group. Per-key event lists
are bounded by the funnel window in practice — pre-filter the input to the
analysis range before calling.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _step_expr(step_conditions: Sequence[Column]) -> Column:
    """1-based step index of an event, 0 if it matches no step."""
    out = F.lit(0)
    for i, cond in enumerate(reversed(step_conditions)):
        out = F.when(cond, F.lit(len(step_conditions) - i)).otherwise(out)
    return out


def window_funnel(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    ts_col: str,
    step_conditions: Sequence[Column],
    window_s: int,
) -> DataFrame:
    """ClickHouse ``windowFunnel(window)(ts, c1, c2, ...)`` semantics.

    Returns one row per key: (key_cols..., level) where level is the
    longest prefix of steps completed in order within ``window_s`` of the
    chain's first step. The fold keeps, per level k, the step-1 timestamp
    of the most recent chain reaching k: a step-1 event restarts level 1;
    a step-k event promotes the level-(k-1) chain if it's inside the
    window. Single aggregate() pass over the per-key sorted events.
    """
    n = len(step_conditions)
    if n == 0:
        raise ValueError("window_funnel needs at least one step condition")
    events = df.select(
        *key_cols,
        # cast: tolerate TIMESTAMP_NTZ inputs (NTZ->LTZ is a no-op in the
        # engine's UTC session; unix_micros only accepts TIMESTAMP)
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__t"),
        _step_expr(step_conditions).alias("__s"),
    ).where(F.col("__s") > 0)
    per_key = events.groupBy(*key_cols).agg(
        F.array_sort(F.collect_list(F.struct("__t", "__s"))).alias("__ev")
    )
    w_us = int(window_s) * 1_000_000
    # state: array of n chain-start times (micros), -1 = level not reached;
    # n is a Python int, so the merged state is built with explicit
    # per-level expressions (no column-indexed indirection)
    init = F.array_repeat(F.lit(-1).cast("long"), n)

    def merge(acc, e):
        t, s = e.getField("__t"), e.getField("__s")
        levels = [
            # step 1 (re)starts a chain — keep the LATEST start
            F.when(s == 1, t).otherwise(acc.getItem(0))
        ]
        for k in range(1, n):
            prev = acc.getItem(k - 1)
            levels.append(
                # step k+1 promotes a live level-k chain inside the window
                F.when(
                    (s == k + 1) & (prev != -1) & (t - prev <= w_us), prev
                ).otherwise(acc.getItem(k))
            )
        return F.array(*levels)

    fold = F.aggregate(F.col("__ev"), init, merge)
    # levels are reached in order, so count of set slots == deepest level
    level = F.size(F.filter(fold, lambda s: s != -1))
    return per_key.select(*key_cols, level.alias("level"))


def retention_cohorts(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Retention triangle: (cohort, offset, n_active) where cohort is the
    key's first active period and offset counts periods since it.

    Each key's cohort is computed in the same pass as its activity via
    ``min() OVER (PARTITION BY key)`` — a single shuffle keyed by ``key_col``.
    (A broadcast of the per-key firsts table would OOM executors at 10^8+
    distinct keys, so no broadcast hint here; the per-key frame scales with
    the key cardinality, not the data size.)
    """
    from pyspark.sql import Window

    pt = F.date_trunc(period, F.col(ts_col))
    per = {"week": 7 * 86400, "day": 86400, "month": None}[period]
    joined = df.select(key_col, pt.alias("__p")).withColumn(
        "__cohort", F.min("__p").over(Window.partitionBy(key_col))
    )
    if period == "month":
        offset = (F.month("__p") - F.month("__cohort")) + 12 * (
            F.year("__p") - F.year("__cohort")
        )
    else:
        offset = (
            (F.unix_timestamp("__p") - F.unix_timestamp("__cohort")) / per
        ).cast("int")
    return (
        joined.select(key_col, F.col("__cohort").alias("cohort"), offset.alias("offset"))
        .distinct()
        .groupBy("cohort", "offset")
        .agg(F.count_distinct(key_col).alias("n_active"))
    )
