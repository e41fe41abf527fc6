"""OTLP → storage ingest writer (the sink half of §2.1).

The reference ingests via an OTel collector whose ClickHouse exporter writes
``otel_logs`` / ``otel_traces`` tables; the app then points log/trace sources
at those columns (role expressions in ``types.ts:1813-1892`` — Timestamp,
Body, SeverityText, TraceId/SpanId, ServiceName, ResourceAttributes,
LogAttributes). Here the same pipeline is a Structured Streaming job:

    raw OTLP/JSON lines (the collector's file exporter shape)
      → ``parse_otlp_logs``  (from_json + explode, all JVM-side)
      → ``write_ingest``     (partitioned parquet sink + checkpoint)

and the written table is immediately queryable by ``ChartConfig`` with the
standard log-source role expressions.

Scale shape: JSON parsing is ``from_json`` inside whole-stage codegen (no
Python); each micro-batch appends date-partitioned parquet so downstream
time filters prune partitions; exactly-once comes from the streaming
checkpoint + file-sink transaction log.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# OTLP/JSON AnyValue — only the scalar branches (nested kvlist/array values
# are kept as their JSON string form by from_json's permissive parse)
_ANY_VALUE = StructType(
    [
        StructField("stringValue", StringType()),
        StructField("intValue", StringType()),  # OTLP JSON encodes int64 as string
        StructField("doubleValue", StringType()),
        StructField("boolValue", StringType()),
    ]
)

_KEY_VALUE = StructType(
    [StructField("key", StringType()), StructField("value", _ANY_VALUE)]
)

_LOG_RECORD = StructType(
    [
        StructField("timeUnixNano", StringType()),
        StructField("observedTimeUnixNano", StringType()),
        StructField("severityText", StringType()),
        StructField("severityNumber", LongType()),
        StructField("traceId", StringType()),
        StructField("spanId", StringType()),
        StructField("body", _ANY_VALUE),
        StructField("attributes", ArrayType(_KEY_VALUE)),
    ]
)

OTLP_LOGS_SCHEMA = StructType(
    [
        StructField(
            "resourceLogs",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "resource",
                            StructType(
                                [StructField("attributes", ArrayType(_KEY_VALUE))]
                            ),
                        ),
                        StructField(
                            "scopeLogs",
                            ArrayType(
                                StructType(
                                    [
                                        StructField(
                                            "scope",
                                            StructType(
                                                [StructField("name", StringType())]
                                            ),
                                        ),
                                        StructField(
                                            "logRecords", ArrayType(_LOG_RECORD)
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def _attr_map(attrs: Column) -> Column:
    """[{key, value{...}}] -> map<string,string> with scalar coercion."""
    entry = lambda kv: F.struct(  # noqa: E731
        kv.getField("key").alias("key"),
        F.coalesce(
            kv.getField("value").getField("stringValue"),
            kv.getField("value").getField("intValue"),
            kv.getField("value").getField("doubleValue"),
            kv.getField("value").getField("boolValue"),
        ).alias("value"),
    )
    return F.when(
        attrs.isNotNull(), F.map_from_entries(F.transform(attrs, entry))
    ).otherwise(F.create_map().cast("map<string,string>"))


def corrupt_otlp_lines(df: DataFrame, payload_col: str = "value") -> DataFrame:
    """Dead-letter view: the raw lines ``parse_otlp_logs`` would silently
    drop (unparseable JSON, or JSON without a resourceLogs envelope —
    from_json's permissive mode nulls both and the explode swallows them).
    Run it against the same source as the parser (file sources replay
    cheaply) and sink it next to the parsed table so ingest loss is
    OBSERVED, not silent: an exporter-version schema drift shows up as a
    dead-letter rate, not a mystery gap in the charts."""
    raw = F.col(payload_col).cast("string")
    parsed = F.from_json(raw, OTLP_LOGS_SCHEMA)
    return (
        df.select(
            raw.alias("raw_line"),
            parsed["resourceLogs"].isNull().alias("__bad"),
        )
        # coalesce so a NULL payload stays in the dead-letter view:
        # trim(NULL) != '' is NULL, which where() treats as false — that
        # would leave one class of ingest loss unobserved (ADVICE r4)
        .where(F.col("__bad") & (F.coalesce(F.trim(F.col("raw_line")), F.lit("x")) != ""))
        .drop("__bad")
    )


def parse_otlp_logs(df: DataFrame, payload_col: str = "value") -> DataFrame:
    """Parse OTLP/JSON ExportLogsServiceRequest lines into the storage
    schema (otel_logs analogue). Works on batch and streaming DataFrames —
    every step is a built-in expression (from_json / explode / transform).
    Lines that don't parse vanish at the explode; pair with
    :func:`corrupt_otlp_lines` for the dead-letter stream."""
    parsed = df.select(
        F.from_json(F.col(payload_col).cast("string"), OTLP_LOGS_SCHEMA).alias("r")
    )
    rl = parsed.select(F.explode("r.resourceLogs").alias("rl"))
    sl = rl.select(
        _attr_map(F.col("rl.resource.attributes")).alias("resource_attributes"),
        F.explode("rl.scopeLogs").alias("sl"),
    )
    rec = sl.select(
        "resource_attributes",
        F.col("sl.scope.name").alias("scope_name"),
        F.explode("sl.logRecords").alias("lr"),
    )
    # BIGINT `div` keeps the ns→us arithmetic exact end to end: epoch nanos
    # (~1.7e18) exceed double's 2^53 exact range, so float division would land
    # a few percent of microsecond timestamps 1us off.
    ts_us = F.expr("CAST(lr.timeUnixNano AS BIGINT) div 1000")
    obs_us = F.expr(
        "coalesce(CAST(lr.observedTimeUnixNano AS BIGINT),"
        " CAST(lr.timeUnixNano AS BIGINT)) div 1000"
    )
    return rec.select(
        F.timestamp_micros(ts_us).alias("ts"),
        F.timestamp_micros(obs_us).alias("observed_ts"),
        F.coalesce(F.col("lr.severityText"), F.lit("")).alias("severity_text"),
        F.coalesce(F.col("lr.severityNumber"), F.lit(0)).alias("severity_number"),
        F.coalesce(F.col("lr.traceId"), F.lit("")).alias("trace_id"),
        F.coalesce(F.col("lr.spanId"), F.lit("")).alias("span_id"),
        F.coalesce(
            F.col("lr.body.stringValue"),
            F.col("lr.body.intValue"),
            F.col("lr.body.doubleValue"),
            F.col("lr.body.boolValue"),
            F.lit(""),
        ).alias("body"),
        F.coalesce(
            F.element_at(F.col("resource_attributes"), "service.name"), F.lit("")
        ).alias("service_name"),
        "resource_attributes",
        "scope_name",
        _attr_map(F.col("lr.attributes")).alias("log_attributes"),
    )


def write_ingest(
    df: DataFrame,
    path: str,
    checkpoint: str,
    *,
    available_now: bool = False,
    trigger_seconds: Optional[int] = None,
):
    """Append the parsed stream as date-partitioned parquet (the storage
    layout every reader in this engine time-prunes on). Returns the
    StreamingQuery; exactly-once via checkpoint + file-sink log."""
    out = df.withColumn("__ingest_date", F.to_date("ts"))
    writer = (
        out.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("__ingest_date")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def read_otlp_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: Optional[int] = None
) -> DataFrame:
    """Stream raw OTLP/JSON line files from the collector drop directory."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
