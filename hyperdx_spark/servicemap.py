"""Service-map aggregation over trace spans (APM dependency graph).

Reference: ``packages/app/src/hooks/useServiceMap.tsx:28-192`` — two CTEs
over the trace source (server-ish spans: kind Server/Consumer/
SPAN_KIND_SERVER/SPAN_KIND_CONSUMER; client-ish spans: Client/Producer/...),
a LEFT JOIN ``server.traceId = client.traceId AND server.parentSpanId =
client.spanId`` (left so uninstrumented callers still yield nodes),
self-loop edges dropped, then one GROUPING SETS pass producing BOTH
per-edge rows (server, client) and rolled-up per-service node rows
(server) with ``GROUPING()`` flagging which is which; aggregates are
``count(*) * samplingFactor``, ``countIf(status='Error') * samplingFactor``
and one ``quantiles(0.5,0.95,0.99)(duration)`` sketch.

Spark mapping:
* trace sampling (``cityHash64(traceId) %% N = 0``) becomes a pushed-down
  filter on a deterministic hash (``xxhash64`` — same role, different hash;
  nothing persists the hash value) or any caller-supplied predicate. It is
  applied BEFORE the join, so the shuffle moves only the sampled traces —
  at 100 TB the sample predicate is the difference between joining a few
  percent of spans and joining everything.
* the self-join shuffles both sides on (trace_id, span linkage); the two
  sides are co-partitioned by construction (same key), so AQE plans a
  single exchange per side and can split skewed traces.
* GROUPING SETS maps 1:1 to ``DataFrame.groupingSets`` + ``F.grouping`` —
  edge and node rows in one aggregation pass over the joined output, same
  as the reference's single scan.
* ``quantiles(...)`` (one reservoir for all three levels) maps to
  ``percentile_approx(duration, array(...))`` (one t-digest for all three);
  ``exact=True`` switches to exact ``percentile`` for oracle comparisons.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SERVER_KINDS = ("Server", "Consumer", "SPAN_KIND_SERVER", "SPAN_KIND_CONSUMER")
CLIENT_KINDS = ("Client", "Producer", "SPAN_KIND_CLIENT", "SPAN_KIND_PRODUCER")


def service_map(
    spans: DataFrame,
    *,
    trace_id: str = "trace_id",
    span_id: str = "span_id",
    parent_span_id: str = "parent_span_id",
    service: str = "service",
    kind: str = "kind",
    status_code: str = "status_code",
    duration: Optional[str] = "duration",
    sampling_factor: int = 1,
    sample_predicate: Optional[Column] = None,
    quantile_levels: Sequence[float] = (0.5, 0.95, 0.99),
    exact: bool = False,
    service_names: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Build the service-map relation: one row per (server service, client
    service) edge plus one rolled-up node row per server service.

    Output: ``server_service, client_service, is_node_level, request_count,
    error_count[, p50, p95, p99]`` (percentile columns only when *duration*
    is set — useServiceMap's optional durationExpression).
    """
    if sampling_factor > 1 and sample_predicate is None:
        sample_predicate = F.pmod(F.xxhash64(F.col(trace_id)), F.lit(sampling_factor)) == 0
    if sample_predicate is not None:
        spans = spans.where(sample_predicate)

    base_cols = [
        F.col(trace_id).alias("__trace"),
        F.col(span_id).alias("__span"),
        F.col(parent_span_id).alias("__parent"),
        F.col(service).alias("__service"),
        F.col(status_code).alias("__status"),
    ]
    if duration is not None:
        base_cols.append(F.col(duration).cast("double").alias("__duration"))
    server = spans.where(F.col(kind).isin(*SERVER_KINDS)).select(*base_cols)
    client = spans.where(F.col(kind).isin(*CLIENT_KINDS)).select(
        F.col(trace_id).alias("__c_trace"),
        F.col(span_id).alias("__c_span"),
        F.col(service).alias("client_service"),
    )

    joined = server.join(
        client,
        (server["__trace"] == client["__c_trace"])
        & (server["__parent"] == client["__c_span"]),
        "left",
    ).where(
        F.col("client_service").isNull()
        | (F.col("__service") != F.col("client_service"))
    )
    if service_names:
        joined = joined.where(
            F.col("__service").isin(*service_names)
            | F.col("client_service").isin(*service_names)
        )
    joined = joined.select(
        F.col("__service").alias("server_service"),
        "client_service",
        "__status",
        *(["__duration"] if duration is not None else []),
    )

    m = F.lit(int(sampling_factor))
    aggs = [
        (F.count(F.lit(1)) * m).alias("request_count"),
        (F.count_if(F.col("__status") == "Error") * m).alias("error_count"),
    ]
    if duration is not None:
        levels = list(quantile_levels)
        if exact:
            q = F.expr(
                "percentile(__duration, array("
                + ", ".join(repr(v) for v in levels)
                + "))"
            )
        else:
            q = F.percentile_approx(
                "__duration", F.array(*[F.lit(v) for v in levels]), F.lit(10000)
            )
        aggs.append(q.alias("__q"))

    out = joined.groupingSets(
        [["server_service", "client_service"], ["server_service"]],
        "server_service",
        "client_service",
    ).agg(F.grouping("client_service").cast("boolean").alias("is_node_level"), *aggs)
    if duration is not None:
        for i, lv in enumerate(quantile_levels):
            out = out.withColumn(
                f"p{round(lv * 100)}", F.col("__q").getItem(i)
            )
        out = out.drop("__q")
    return out


def aggregate_service_map(rows) -> dict:
    """Client-side fold of the grouped rows into per-service stats
    (useServiceMap.tsx aggregateServiceMapData:240-312): node-level rows
    fill ``incoming``; edge rows fill ``incoming_by_client`` and bump the
    client's ``outgoing`` — pure presentation, runs on the collected result.
    """
    services: dict[str, dict] = {}

    def ensure(name):
        return services.setdefault(
            name,
            {"incoming": None, "incoming_by_client": {}, "outgoing": 0},
        )

    def stats(row):
        rc = row["request_count"]
        ec = row["error_count"]
        return {
            "total_requests": rc,
            "error_count": ec,
            "error_percentage": (ec / rc * 100.0) if rc else 0.0,
            "p50": row.get("p50", 0),
            "p95": row.get("p95", 0),
            "p99": row.get("p99", 0),
        }

    for row in rows:
        row = row.asDict() if hasattr(row, "asDict") else dict(row)
        svc = ensure(row["server_service"])
        if row["is_node_level"]:
            svc["incoming"] = stats(row)
        elif row["client_service"] is not None:
            svc["incoming_by_client"][row["client_service"]] = stats(row)
            ensure(row["client_service"])["outgoing"] += row["request_count"]
    return services
