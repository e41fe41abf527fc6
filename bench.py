"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Timing model mirrors the reference's BenchmarkPage (3 iterations, cache-cold
first run discarded is NOT done here — we report best-of-2 per query after a
JVM warm-up query, which approximates steady-state wall-clock the way
`system.query_log` medians do; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

HEADLINE = [
    "q_search",
    "q_timeseries_error_5m",
    "q_multi_agg",
    "q_conditional_agg",
    "q_series_limit",
    "q_gauge_last",
    "q_counter_rate",
    "q_heatmap",
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q5ish",
    "q_top_customers",
    "q_text_stats",
    "q_dedup_exact",
    "q_minhash_lsh",
    "q_ann_cosine",
]


def materialize(df) -> None:
    """Force full execution without driver-side row transfer."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("hyperdx-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Box-load context (VERDICT r8 #4): two rounds of driver-bench drift
    # (+23% cumulative) that same-session replays contradicted — record
    # load average + wall timestamps + per-query cold runs so a drifted
    # number can be attributed to box contention instead of relitigated.
    env = {
        "ts_start": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "cpus": int(cpus),
    }

    # HEADLINE names bind to module-level functions (not the consolidated
    # registry) so per-query timings stay comparable across rounds even as
    # registry entries merge/rename. One throwaway warm-up query first
    # (JVM/codegen/page-cache warm) — its time is recorded, not counted.
    t0 = time.perf_counter()
    materialize(entrymod.q_tpch_q1(spark, sf_dir).limit(1))
    env["warmup_s"] = round(time.perf_counter() - t0, 3)

    # best-of-3: this box's run-to-run noise is ±50%+ (documented in
    # SCALE.md); single bad runs have shown 10x outliers on the
    # shuffle-heavy queries, and two samples are not enough to shed them
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        fn = getattr(entrymod, name)
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            if i == 0:
                cold[name] = round(dt, 3)
            best = min(best, dt)
        timings[name] = round(best, 3)

    env["ts_end"] = time.strftime("%Y-%m-%dT%H:%M:%S%z")
    env["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_cold": cold,
                "cold_total": round(sum(cold.values()), 3),
                "env": env,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
