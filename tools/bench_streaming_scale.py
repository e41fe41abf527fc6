"""Empirical scale measurement for the streaming tier (VERDICT r5 #3) —
the batch operators have two decades of SCALE.md ratios; this gives the
write path and the stateful alert machine the same treatment.

Measured:

* **OTLP ingest throughput** — synthesize sf-proportional OTLP/JSON
  ExportLogsServiceRequest lines from the events table (the collector
  file-exporter shape the reference's write path emits,
  ``docker/otel-collector/``), then run the real pipeline
  ``read_otlp_stream → parse_otlp_logs → write_ingest`` with
  ``availableNow`` and report records/s end-to-end (JSON parse, explode,
  attr-map, date-partitioned parquet sink, checkpoint).
* **Micro-batch latency** — the same pipeline with
  ``maxFilesPerTrigger=1``; per-trigger ``triggerExecution`` durations
  from the query progress log (avg / max over the trigger train).
* **Alert-state boundedness** — ``alert_state_stream`` over S series ×
  W windows; the state store must hold exactly S rows (one streak struct
  per series) REGARDLESS of W — the O(|series|) claim in
  ``stateful.py``'s docstring, read back from
  ``lastProgress.stateOperators`` instead of asserted from prose. Run at
  two window depths to show state does not grow with event volume.

Usage: python tools/bench_streaming_scale.py <sf_dir> [cpus]
Prints one JSON line:
{"sf_dir": ..., "ingest": {...}, "latency": {...}, "alert_state": {...}}
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
from hyperdx_spark.streaming.ingest import (  # noqa: E402
    parse_otlp_logs,
    read_otlp_stream,
    write_ingest,
)


def _otlp_lines(spark, sf_dir: str, out_dir: str, n_files: int) -> int:
    """Events → one OTLP/JSON request line per event (JVM-side to_json —
    no driver loop), written as n_files text files. Returns record count."""
    ev = load_table(spark, sf_dir, "events")
    sval = lambda c: F.struct(c.alias("stringValue"))  # noqa: E731
    kv = lambda k, v: F.struct(F.lit(k).alias("key"), sval(v).alias("value"))  # noqa: E731
    record = F.struct(
        (F.unix_micros("ts") * 1000).cast("string").alias("timeUnixNano"),
        F.upper("event_type").alias("severityText"),
        F.concat_ws(" ", "event_type", "props").alias("body_str"),
    )
    payload = F.struct(
        F.array(
            F.struct(
                F.struct(
                    F.array(kv("service.name", F.col("event_type"))).alias(
                        "attributes"
                    )
                ).alias("resource"),
                F.array(
                    F.struct(
                        F.struct(F.lit("gen").alias("name")).alias("scope"),
                        F.array(
                            F.struct(
                                record["timeUnixNano"].alias("timeUnixNano"),
                                record["severityText"].alias("severityText"),
                                F.struct(
                                    record["body_str"].alias("stringValue")
                                ).alias("body"),
                                F.array(
                                    kv("user", F.col("user_id").cast("string")),
                                    kv("value", F.col("value").cast("string")),
                                ).alias("attributes"),
                            )
                        ).alias("logRecords"),
                    )
                ).alias("scopeLogs"),
            )
        ).alias("resourceLogs")
    )
    n = ev.count()
    ev.select(F.to_json(payload).alias("value")).repartition(n_files).write.mode(
        "overwrite"
    ).text(out_dir)
    return n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("streaming-scale", cpus=cpus)
    work = tempfile.mkdtemp(prefix="stream_scale_")
    results: dict = {"sf_dir": sf_dir}

    # ---- ingest throughput (availableNow over the full line set)
    lines_dir = os.path.join(work, "lines")
    n_records = _otlp_lines(spark, sf_dir, lines_dir, n_files=cpus)
    sink = os.path.join(work, "sink")
    ckpt = os.path.join(work, "ckpt")
    t0 = time.time()
    q = write_ingest(
        parse_otlp_logs(read_otlp_stream(spark, lines_dir)),
        sink,
        ckpt,
        available_now=True,
    )
    q.awaitTermination()
    wall = time.time() - t0
    written = spark.read.parquet(sink).count()
    assert written == n_records, (written, n_records)
    results["ingest"] = {
        "records": n_records,
        "wall_s": round(wall, 2),
        "records_per_s": int(n_records / wall),
    }
    print(f"ingest: {n_records} recs in {wall:.1f}s "
          f"({results['ingest']['records_per_s']}/s)", file=sys.stderr)

    # ---- micro-batch latency (1 file per trigger over a 16-file subset)
    sub_dir = os.path.join(work, "lines_sub")
    os.makedirs(sub_dir)
    files = sorted(
        f for f in os.listdir(lines_dir) if f.endswith(".txt")
    )[:16]
    for f in files:
        shutil.copy(os.path.join(lines_dir, f), os.path.join(sub_dir, f))
    q = write_ingest(
        parse_otlp_logs(
            read_otlp_stream(spark, sub_dir, max_files_per_trigger=1)
        ),
        os.path.join(work, "sink2"),
        os.path.join(work, "ckpt2"),
        available_now=True,
    )
    q.awaitTermination()
    durs = [
        p["durationMs"]["triggerExecution"]
        for p in q.recentProgress
        if p["numInputRows"] > 0
    ]
    results["latency"] = {
        "triggers": len(durs),
        "avg_ms": int(sum(durs) / max(len(durs), 1)),
        "max_ms": max(durs) if durs else 0,
    }
    print(f"latency: {results['latency']}", file=sys.stderr)

    # ---- alert-state boundedness: S series, two window depths
    from hyperdx_spark.alerts import AlertConfig
    from hyperdx_spark.streaming.stateful import alert_state_stream

    S = 10_000
    state_rows = {}
    for tag, windows in (("w20", 20), ("w40", 40)):
        seed = os.path.join(work, f"agg_{tag}")
        agg = spark.range(S * windows).select(
            F.concat(F.lit("svc-"), (F.col("id") % S).cast("string")).alias(
                "service"
            ),
            F.timestamp_seconds(
                1704067200 + (F.col("id") / S).cast("long") * 60
            ).alias("__timestamp"),
            (F.col("id") % 100).cast("double").alias("value"),
        )
        agg.coalesce(4).write.mode("overwrite").parquet(seed)
        stream = spark.readStream.schema(
            "service string, __timestamp timestamp, value double"
        ).parquet(seed)
        out = alert_state_stream(
            stream,
            AlertConfig(threshold=50, num_consecutive_windows=3),
            group_cols=["service"],
        )
        qn = f"alert_scale_{tag}"
        q = (
            out.writeStream.format("noop")
            .option(
                "checkpointLocation", os.path.join(work, f"ckpt_{tag}")
            )
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        so = q.lastProgress["stateOperators"][0]
        state_rows[tag] = {
            "series": S,
            "windows": windows,
            "state_rows": so["numRowsTotal"],
            "state_bytes": so["memoryUsedBytes"],
        }
        print(f"alert_state {tag}: {state_rows[tag]}", file=sys.stderr)
    # state is O(|series|): identical row count at 2x the window depth
    assert state_rows["w20"]["state_rows"] == S
    assert state_rows["w40"]["state_rows"] == S
    results["alert_state"] = state_rows

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
