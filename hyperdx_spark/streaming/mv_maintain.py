"""Streaming materialized-view maintenance (AggregatingMergeTree parity).

The reference's MVs are maintained by ClickHouse on INSERT: every inserted
block is aggregated into a *part* of partial states, and parts are merged
lazily (background merges / ``OPTIMIZE FINAL``); reads merge whatever parts
exist (`-State` / `-Merge` combinators, materializedViews.ts:225-275).

This module is the Structured-Streaming analogue over the same rollup model
as :mod:`hyperdx_spark.mv`:

* :func:`maintain_rollup` — ``foreachBatch`` sink: each micro-batch is
  aggregated with :func:`hyperdx_spark.mv.rollup_dataframe` and written as
  its own *part* under ``mv.path/__batch=<id>/``. Because the read path
  re-merges states per key (compile.py ``*_merge`` aggregates), duplicate
  (bucket, dims) rows across parts are correct by construction — the exact
  AggregatingMergeTree read contract.
* Idempotent exactly-once materialization: the part directory is keyed by
  the micro-batch id and written with ``mode("overwrite")``, so a retried
  batch replaces its own part instead of double-counting (the standard
  idempotent-``foreachBatch`` pattern; on a real cluster a transactional
  table format would subsume this).
* :func:`compact_rollup` — ``OPTIMIZE TABLE ... FINAL`` analogue: re-merges
  all parts into one state row per (bucket, dims) and atomically swaps the
  rollup directory. Run it when the part count grows (reads stay correct
  without it; it only bounds read-side merge fan-in).

Scale shape: each micro-batch shuffles once on (bucket, dims) — the same
partial-aggregation shuffle a batch rollup does, sized by the batch not the
table. Compaction is one shuffle over the rollup (itself ~|buckets x dims|,
orders of magnitude smaller than the raw table). Partition pruning on
``__bucket_date`` is preserved: every part keeps the same second-level
partitioning, and the ``__batch`` level is dropped at read time.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hyperdx_spark.mv import MVConfig, rollup_dataframe

SEED_BATCH_ID = -1


def _part_path(mv: MVConfig, batch_id: int) -> str:
    return os.path.join(mv.path, f"__batch={int(batch_id)}")


def batch_writer(mv: MVConfig, ts_expr: str) -> Callable[[DataFrame, int], None]:
    """The ``foreachBatch`` function: aggregate one micro-batch into partial
    states and (over)write its part directory."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = rollup_dataframe(batch_df, mv, ts_expr)
        out = out.withColumn(
            "__bucket_date", F.to_date(F.col(mv.timestamp_column))
        )
        out.write.mode("overwrite").partitionBy("__bucket_date").parquet(
            _part_path(mv, batch_id)
        )

    return _write


def seed_rollup(base: DataFrame, mv: MVConfig, ts_expr: str) -> None:
    """Backfill the historical table as the seed part (``__batch=-1``) so a
    stream can take over maintenance from there."""
    batch_writer(mv, ts_expr)(base, SEED_BATCH_ID)


def maintain_rollup(
    stream_df: DataFrame,
    mv: MVConfig,
    ts_expr: str,
    checkpoint: str,
    **trigger,
):
    """Start the maintenance query on *stream_df* (a streaming DataFrame of
    raw rows, e.g. the OTLP ingest output). Returns the StreamingQuery.

    ``trigger`` kwargs pass through to ``.trigger()`` (default
    ``availableNow=True`` for drain-and-stop semantics)."""
    if not trigger:
        trigger = {"availableNow": True}
    return (
        stream_df.writeStream.foreachBatch(batch_writer(mv, ts_expr))
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )


def merged_rollup(df: DataFrame, mv: MVConfig) -> DataFrame:
    """Re-merge partial-state rows to one row per (bucket, dims) — the state
    x state merge for every agg kind (state x raw-row merges live in
    compile.py's ``*_merge`` read path)."""
    key_names = [mv.timestamp_column] + list(mv.dimension_columns)
    aggs = []
    quantile_cols = []
    for ac in mv.aggregated_columns:
        c = F.col(ac.mv_column)
        if ac.agg_fn in ("count", "sum"):
            aggs.append(F.sum(c).alias(ac.mv_column))
        elif ac.agg_fn == "min":
            aggs.append(F.min(c).alias(ac.mv_column))
        elif ac.agg_fn == "max":
            aggs.append(F.max(c).alias(ac.mv_column))
        elif ac.agg_fn == "avg":
            aggs.append(
                F.struct(
                    F.sum(c.getField("sum")).alias("sum"),
                    F.sum(c.getField("cnt")).alias("cnt"),
                ).alias(ac.mv_column)
            )
        elif ac.agg_fn == "count_distinct":
            aggs.append(F.hll_union_agg(c).alias(ac.mv_column))
        elif ac.agg_fn == "quantile":
            quantile_cols.append(ac)
        else:  # pragma: no cover - rollup_dataframe already rejects these
            raise ValueError(f"aggFn {ac.agg_fn!r} has no mergeable state")
    if not aggs:
        aggs = [F.sum("__rollup_rows").alias("__rollup_rows")]
    out = df.groupBy(*[F.col(k) for k in key_names]).agg(*aggs)
    for ac in quantile_cols:
        # merge map<qvalue,count> states: per-key sum of counts, rebuilt as a
        # sorted entries map; groups whose state is NULL everywhere come back
        # via the null-safe left join (same pattern as the build side)
        q = (
            df.select(*key_names, F.explode(F.map_entries(ac.mv_column)).alias("__e"))
            .groupBy(*key_names, F.col("__e.key").alias("__qv"))
            .agg(F.sum("__e.value").alias("__qc"))
            .groupBy(*[F.col(k) for k in key_names])
            .agg(
                F.map_from_entries(
                    F.sort_array(F.collect_list(F.struct("__qv", "__qc")))
                ).alias(ac.mv_column)
            )
        )
        q = q.select(
            *[F.col(k).alias(f"__qk_{i}") for i, k in enumerate(key_names)],
            ac.mv_column,
        )
        cond = None
        for i, k in enumerate(key_names):
            c = out[k].eqNullSafe(q[f"__qk_{i}"])
            cond = c if cond is None else (cond & c)
        out = out.join(q, cond, "left").drop(
            *[f"__qk_{i}" for i in range(len(key_names))]
        )
    return out


def compact_rollup(spark: SparkSession, mv: MVConfig) -> None:
    """``OPTIMIZE FINAL``: collapse all parts into a single ``__batch=-1``
    part and atomically swap it in. Quiesce the maintenance stream first (or
    use a transactional table format on a real cluster); a retried batch
    after compaction still lands in its own ``__batch=<id>`` part, so
    correctness is unaffected either way."""
    merged = merged_rollup(spark.read.parquet(mv.path), mv)
    merged = merged.withColumn(
        "__bucket_date", F.to_date(F.col(mv.timestamp_column))
    ).withColumn("__batch", F.lit(SEED_BATCH_ID))
    staging = mv.path.rstrip("/") + ".compacting"
    old = mv.path.rstrip("/") + ".precompact"
    shutil.rmtree(staging, ignore_errors=True)
    merged.write.mode("overwrite").partitionBy("__batch", "__bucket_date").parquet(
        staging
    )
    os.rename(mv.path, old)
    os.rename(staging, mv.path)
    shutil.rmtree(old)
