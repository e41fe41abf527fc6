"""Scale measurement for mine_patterns_distributed (VERDICT r12 #2).

Three claims to pin:

1. WALL TIME is linear in corpus rows across the sf1 -> sf10 decade (the
   clustering pass is embarrassingly parallel mapInPandas; nothing
   superlinear hides in the merge).
2. The DRIVER-MERGE INPUT is bounded by clusters x buckets, not rows —
   ASSERTED from the instrumented merge_stats, not assumed:
   totals_rows <= partitions x distinct templates, and
   bucket_rows <= totals_rows x distinct trend buckets.
3. TEMPLATE/COUNT AGREEMENT with the sampled miner (the reference's
   10k-sample shape, drain/mine-patterns.ts:14-17) on an overlapping slice
   small enough that the sample covers every row: identical template set,
   identical exact counts.

Usage: python tools/bench_drain_scale.py [sf_dirs...]
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from hyperdx_spark import get_spark
from hyperdx_spark.analytics import drain

DIRS = sys.argv[1:] or ["/root/repo/.scale/sf1", "/root/repo/.scale/sf10"]


def bodies(spark, sf_dir):
    """The q_log_patterns body construction: 5 event types x 7 user mods x
    integer-valued durations — realistic template/parameter structure."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        F.concat(
            F.col("event_type"), F.lit(" user "),
            (F.col("user_id") % 7).cast("string"),
            F.lit(" took "), F.floor("value").cast("string"), F.lit(" ms"),
        ).alias("body"),
        "ts",
    )


def main() -> None:
    spark = get_spark("bench-drain", cpus=32)
    out = {}
    for sf_dir in DIRS:
        df = bodies(spark, sf_dir)
        n = df.count()
        n_parts = df.rdd.getNumPartitions()

        stats: dict = {}
        t0 = time.monotonic()
        groups = drain.mine_patterns_distributed(
            df, text_col="body", ts_col="ts", merge_stats=stats
        )
        wall_s = round(time.monotonic() - t0, 2)

        # claim 2: the driver fan-in is templates x buckets, NOT rows and
        # NOT partitions (the pre-aggregation shuffle folds executor counts)
        assert stats["totals_rows"] == stats["distinct_templates"], stats
        assert stats["bucket_rows"] <= (
            stats["totals_rows"] * stats["distinct_buckets"]
        ), stats
        assert stats["merge_rows"] <= stats["distinct_templates"] * (
            1 + stats["distinct_buckets"]
        ), (stats, n_parts)

        # exact-count invariant: distributed counts sum to the corpus
        assert sum(g.estimated_count for g in groups) == n

        out[sf_dir.rsplit("/", 1)[-1]] = {
            "rows": n,
            "partitions": n_parts,
            "wall_s": wall_s,
            "groups": len(groups),
            **stats,
        }

    # claim 3: agreement with the sampled miner on a slice the 10k sample
    # fully covers (sample == population -> both miners are exact)
    sf_dir = DIRS[0]
    df = bodies(spark, sf_dir)
    lo, hi, n_all = df.agg(
        F.min("ts"), F.max("ts"), F.count("*")
    ).collect()[0]
    span_min = max((hi - lo).total_seconds() / 60.0, 1.0)
    mins = max(1, int(9000 / (n_all / span_min)))
    slice_df = df.where(
        F.col("ts") < F.lit(lo).cast("timestamp") + F.expr(f"INTERVAL {mins} MINUTES")
    )
    n_slice = slice_df.count()
    # sample == population makes the sampled miner exact (multiplier 1);
    # event rates are bursty, so size the sample to the measured slice
    assert 0 < n_slice <= 50000, n_slice
    sampled = drain.mine_patterns(
        slice_df, text_col="body", sample_size=n_slice
    )
    dist = drain.mine_patterns_distributed(slice_df, text_col="body")
    s_map = {g.pattern: g.estimated_count for g in sampled}
    d_map = {g.pattern: g.estimated_count for g in dist}
    assert s_map == d_map, (s_map, d_map)
    out["agreement"] = {"slice_rows": n_slice, "templates": len(s_map)}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
