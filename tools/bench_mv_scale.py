"""Empirical scale measurement for streaming MV maintenance (VERDICT r7 #6
— the one streaming path without a SCALE.md row).

Streams the sf events table through the real maintenance pipeline
(``readStream`` over a multi-file parquet staging dir → ``maintain_rollup``
foreachBatch → per-micro-batch partial-state parts) and reports:

* **throughput** — records/s end-to-end across the trigger train (each
  micro-batch pays the same one (bucket, dims) shuffle a batch rollup does,
  sized by the batch not the table);
* **state boundedness** — the maintenance "state" is the rollup parts on
  disk, not a state store (foreachBatch is stateless). Reported as part
  count, total part rows, merged rows, and bytes. The key claim: merged
  rows ≈ |buckets × dims| is set by the TIME RANGE and dimension
  cardinality, so it stays ~flat across sf decades while raw rows grow
  10× — the same bound that makes AggregatingMergeTree MVs viable;
* **stream == batch equivalence at scale** — ``merged_rollup`` over the
  streamed parts vs ``rollup_dataframe`` over the same raw rows directly:
  key-set equality, exact count/quantile-map equality, and max abs
  difference on the IEEE-reassociated double sums (pytest
  ``test_stream_maintained_equals_batch_rollup`` asserts the same at unit
  scale; here it is measured at sf1/sf10).

MV shape: dims=[event_type], 1-hour buckets, count/sum/avg/quantile(value)
— the full mergeable-state family including the map-typed quantile state.

Usage: python tools/bench_mv_scale.py <sf_dir> [cpus] [n_files] [files_per_trigger]
Prints one JSON line:
{"sf_dir": ..., "mv_maintain": {...}, "equivalence": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hyperdx_spark import get_spark  # noqa: E402
from hyperdx_spark.io import load_table  # noqa: E402
from hyperdx_spark.mv import AggregatedColumn, MVConfig, rollup_dataframe  # noqa: E402
from hyperdx_spark.streaming.mv_maintain import (  # noqa: E402
    maintain_rollup,
    merged_rollup,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _mv(path: str) -> MVConfig:
    return MVConfig(
        path=path,
        dimension_columns=["event_type"],
        min_granularity="1 hour",
        timestamp_column="bucket_ts",
        aggregated_columns=[
            AggregatedColumn("count", "cnt_state"),
            AggregatedColumn("sum", "sum_value", source_column="value"),
            AggregatedColumn("avg", "avg_value", source_column="value"),
            AggregatedColumn("quantile", "q_value", source_column="value"),
        ],
    )


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    per_trigger = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    spark = get_spark("mv-scale", cpus=cpus)
    work = tempfile.mkdtemp(prefix="mv_scale_")
    results: dict = {"sf_dir": sf_dir}

    # stage the events table as n_files parquet files so availableNow +
    # maxFilesPerTrigger yields a real trigger train
    staging = os.path.join(work, "staging")
    ev = load_table(spark, sf_dir, "events")
    n_records = ev.count()
    ev.repartition(n_files).write.mode("overwrite").parquet(staging)

    mv = _mv(os.path.join(work, "rollup"))
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(per_trigger))
        .parquet(staging)
    )
    t0 = time.time()
    q = maintain_rollup(
        stream, mv, "ts", checkpoint=os.path.join(work, "ckpt")
    )
    q.awaitTermination()
    wall = time.time() - t0
    triggers = [p for p in q.recentProgress if p["numInputRows"] > 0]

    parts = [d for d in os.listdir(mv.path) if d.startswith("__batch=")]
    all_parts = spark.read.parquet(mv.path)
    part_rows = all_parts.count()
    merged = merged_rollup(all_parts.drop("__bucket_date", "__batch"), mv)
    merged_rows = merged.count()
    results["mv_maintain"] = {
        "records": n_records,
        "wall_s": round(wall, 2),
        "records_per_s": int(n_records / wall),
        "triggers": len(triggers),
        "parts": len(parts),
        "part_rows": part_rows,
        "merged_rows": merged_rows,
        "rollup_bytes": _dir_bytes(mv.path),
    }
    print(f"mv_maintain: {results['mv_maintain']}", file=sys.stderr)

    # stream-maintained (parts re-merged) vs batch rollup_dataframe over
    # the same raw rows: joined per-key comparison, counted JVM-side
    batch = rollup_dataframe(ev, mv, "ts")
    keys = ["bucket_ts", "event_type"]
    j = merged.alias("s").join(batch.alias("b"), on=keys, how="full_outer")
    cmp = j.select(
        F.count(F.lit(1)).alias("keys"),
        F.sum(
            (F.col("s.cnt_state").isNull() | F.col("b.cnt_state").isNull())
            .cast("long")
        ).alias("key_mismatch"),
        F.sum(
            (F.col("s.cnt_state") != F.col("b.cnt_state")).cast("long")
        ).alias("cnt_mismatch"),
        F.sum(
            (
                F.col("s.avg_value.cnt") != F.col("b.avg_value.cnt")
            ).cast("long")
        ).alias("avgcnt_mismatch"),
        F.sum(
            (
                F.sort_array(F.map_entries(F.col("s.q_value")))
                != F.sort_array(F.map_entries(F.col("b.q_value")))
            ).cast("long")
        ).alias("qmap_mismatch"),
        F.max(F.abs(F.col("s.sum_value") - F.col("b.sum_value"))).alias(
            "max_abs_sum_diff"
        ),
        F.max(F.abs(F.col("s.avg_value.sum") - F.col("b.avg_value.sum"))).alias(
            "max_abs_avgsum_diff"
        ),
    ).collect()[0]
    results["equivalence"] = {
        "keys": cmp["keys"],
        "key_mismatch": cmp["key_mismatch"],
        "cnt_mismatch": cmp["cnt_mismatch"],
        "avgcnt_mismatch": cmp["avgcnt_mismatch"],
        "qmap_mismatch": cmp["qmap_mismatch"],
        "max_abs_sum_diff": float(cmp["max_abs_sum_diff"]),
        "max_abs_avgsum_diff": float(cmp["max_abs_avgsum_diff"]),
    }
    assert cmp["key_mismatch"] == 0 and cmp["cnt_mismatch"] == 0
    assert cmp["avgcnt_mismatch"] == 0 and cmp["qmap_mismatch"] == 0
    # IEEE reassociation bound on the double sums (exact ints elsewhere)
    assert cmp["max_abs_sum_diff"] < 1e-6 * max(n_records, 1)
    print(f"equivalence: {results['equivalence']}", file=sys.stderr)

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
