"""Scale measurement for the trace tools (traces.py, r13).

Claims to pin:

1. ``trace_breakdown`` is one distinct + one broadcast semi join + one
   partial-aggregated groupBy — wall time scan-linear across the
   sf1 -> sf10 decade; its driver result is bounded by top_n.
2. ``trace_waterfall`` for ONE trace stays flat: the pushed trace-id
   filter prunes the scan, and the driver only ever holds that trace's
   spans (<= max_spans).
3. (r14, VERDICT r13 #2) With ns-precision ALL-DISTINCT durations the
   ``exact=False`` path (``percentile_approx``, bounded t-digest-style
   state) stays scan-linear across the decade, while the exact
   ``percentile`` path's per-group distinct-value map grows with input —
   both are timed on a ``dur_hc`` column that is unique per span.

The span forest derives from events exactly like the q_trace_waterfall
gate fixture (trace = user_id % K, binary-heap parent tree), written
once per sf dir.

Usage: python tools/bench_trace_scale.py [sf_dirs...]
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time
from datetime import datetime

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from hyperdx_spark import get_spark, traces
from hyperdx_spark.model import Source

DIRS = sys.argv[1:] or ["/root/repo/.scale/sf1", "/root/repo/.scale/sf10"]
N_TRACES = 5000  # bounded trace cardinality, like real tenant workloads


def build_spans(spark, sf_dir: str, out_dir: str) -> None:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("trace").orderBy("event_id")
    base = (
        ev.select(
            (F.col("user_id") % N_TRACES).cast("long").alias("trace"),
            "event_id", "value", "event_type",
        )
        .withColumn("idx", F.row_number().over(w).cast("long"))
    )
    spans = base.select(
        F.concat(F.col("trace").cast("string"), F.lit("-"),
                 F.col("idx").cast("string")).alias("span_id"),
        F.when(F.col("idx") == 1, F.lit("")).otherwise(
            F.concat(F.col("trace").cast("string"), F.lit("-"),
                     (F.col("idx") / 2).cast("long").cast("string"))
        ).alias("parent_span_id"),
        F.col("trace").cast("string").alias("trace_id"),
        (F.lit(datetime(2024, 1, 1)).cast("timestamp")
         + F.make_interval(secs=(F.col("trace") * 100 + F.col("idx"))
                           .cast("double"))).alias("ts"),
        F.floor("value").cast("double").alias("dur"),
        # ns-precision all-distinct durations: value in ms + a unique
        # event_id epsilon — no two spans share a dur_hc, the worst case
        # for exact-percentile aggregation state
        (F.col("value") * 1e6 + F.col("event_id")).alias("dur_hc"),
        F.col("event_type").alias("service"),
        F.concat(F.lit("op"), (F.col("idx") % 5).cast("string")).alias("name"),
        F.lit("STATUS_CODE_OK").alias("status_code"),
    )
    spans.write.mode("overwrite").parquet(f"{out_dir}/spans.parquet")


def main() -> None:
    spark = get_spark("bench-trace", cpus=32)
    src = Source(
        table="spans", kind="trace", timestamp_value_expression="ts",
        trace_id_expression="trace_id", span_id_expression="span_id",
        parent_span_id_expression="parent_span_id",
        span_name_expression="name", service_name_expression="service",
        duration_expression="dur", duration_precision=3,
        status_code_expression="status_code",
    )
    rng = (datetime(2024, 1, 1), datetime(2024, 2, 1))
    res = {}
    for sf_dir in DIRS:
        tag = sf_dir.rsplit("/", 1)[-1]
        out_dir = f"/root/repo/.scale/trace_{tag}"
        build_spans(spark, sf_dir, out_dir)
        n = spark.read.parquet(f"{out_dir}/spans.parquet").count()

        t0 = time.monotonic()
        bd = traces.trace_breakdown(
            spark, src, out_dir, parent_filter_sql="name = 'op1'",
            date_range=rng, top_n=20,
        ).collect()
        bd_s = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        wf = traces.trace_waterfall(
            spark, src, out_dir, trace_id="7", max_spans=2000
        )
        wf_s = round(time.monotonic() - t0, 2)

        # high-cardinality durations: exact vs approx percentile state
        import dataclasses

        src_hc = dataclasses.replace(src, duration_expression="dur_hc")
        t0 = time.monotonic()
        traces.trace_breakdown(
            spark, src_hc, out_dir, parent_filter_sql="name = 'op1'",
            date_range=rng, top_n=20, exact=True,
        ).collect()
        hc_exact_s = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        traces.trace_breakdown(
            spark, src_hc, out_dir, parent_filter_sql="name = 'op1'",
            date_range=rng, top_n=20, exact=False,
        ).collect()
        hc_approx_s = round(time.monotonic() - t0, 2)

        res[tag] = {
            "spans": n,
            "breakdown_s": bd_s,
            "breakdown_rows": len(bd),
            "waterfall_s": wf_s,
            "waterfall_spans": len(wf["spans"]) if wf else 0,
            "hc_exact_s": hc_exact_s,
            "hc_approx_s": hc_approx_s,
        }
    print(json.dumps({"trace_tools": res}))


if __name__ == "__main__":
    main()
