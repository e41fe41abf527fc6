"""Trace waterfall + top-time-consuming-operations breakdown.

Parity targets: the MCP trace tools —
``packages/api/src/mcp/tools/trace/waterfall.ts`` (single trace as a
pre-ordered parent/child tree: pick a TraceId by ``slowest`` /
``first_error`` / ``most_recent``, fetch every span, DFS with
timestamp-ordered siblings, correlated logs) and
``packages/api/src/mcp/tools/trace/breakdown.ts``
(``clickstack_trace_top_time_consuming_operations``: distinct parent
TraceIds matching a SQL filter → aggregate every OTHER span in those
traces by (service, operation), ranked by total time — the
ServiceDashboardEndpointPerformanceChart pattern).

Spark shapes: the picker and the breakdown are DataFrame plans (the
breakdown's parent→children step is a broadcast-able semi join on the
trace id, bounded by ``max_parent_traces``); only the ONE picked trace's
spans are collected (bounded by ``max_spans`` ≤ 2000, the reference's
own cap) for the driver-side DFS — a single trace is a UI-sized object,
never a distributed one.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.chcompat import translate_expr
from .io import load_table
from .model import ChartConfig, SelectCol, Source


def duration_divisor(precision: int) -> float:
    """waterfall.ts:160-165: stored-duration → ms divisor. precision is
    the decimal digits of a second in the stored value (9 = ns → 1e6,
    6 = µs → 1e3, 3 = already ms → 1)."""
    return float(10 ** max(0, precision - 3))


def build_pre_order_tree(spans: Sequence[dict]) -> list[dict]:
    """waterfall.ts:126-158 buildPreOrderTree: spans whose parentSpanId is
    absent from the result set are roots (the actual root's '' parent, or
    a truncation cut); every sibling level sorts by timestamp; pre-order
    DFS annotates depth. Pure function over collected span dicts."""
    ids_in_result = {s["spanId"] for s in spans}
    children_by_parent: dict[str, list[dict]] = {}
    roots: list[dict] = []
    for s in spans:
        if s["parentSpanId"] not in ids_in_result:
            roots.append(s)
            continue
        children_by_parent.setdefault(s["parentSpanId"], []).append(s)

    def ts_key(s: dict):
        # the reference compares the timestamp STRINGS (ISO order ==
        # chronological); JS sort is stable, so ties keep fetch order
        return str(s["timestamp"])

    roots.sort(key=ts_key)
    for lst in children_by_parent.values():
        lst.sort(key=ts_key)

    ordered: list[dict] = []
    # iterative pre-order DFS: a 2000-span linear retry chain must not
    # blow Python's recursion limit
    stack = [(r, 0) for r in reversed(roots)]
    while stack:
        span, depth = stack.pop()
        ordered.append({**span, "depth": depth})
        for c in reversed(children_by_parent.get(span["spanId"], ())):
            stack.append((c, depth + 1))
    return ordered


def pick_trace(
    spark: SparkSession,
    source: Source,
    sf_dir: str,
    *,
    date_range,
    pick_filter: str = "",
    pick_filter_language: str = "lucene",
    pick_by: str = "slowest",
) -> Optional[str]:
    """waterfall.ts step 1 (:268-362): choose ONE TraceId — group the
    filtered window by the trace id and order by the pick mode
    (slowest = max(duration) DESC, first_error = min(ts) ASC with the
    STATUS_CODE_ERROR condition composed into the filter, most_recent =
    max(ts) DESC), LIMIT 1."""
    from .compile import compile_chart_config

    effective_filter = pick_filter
    effective_language = pick_filter_language
    if pick_by == "first_error":
        status = source.status_code_expression or "''"
        err = f"{status} = 'STATUS_CODE_ERROR'"
        if effective_filter and effective_language == "sql":
            effective_filter = f"({effective_filter}) AND ({err})"
        elif effective_filter:  # lucene composition (waterfall.ts:283-291)
            effective_filter = (
                f"({effective_filter}) AND StatusCode:STATUS_CODE_ERROR"
            )
            effective_language = "lucene"
        else:
            effective_filter, effective_language = err, "sql"

    dur, ts = source.duration_expression, source.timestamp_value_expression
    order_by = (
        f"max({dur}) DESC"
        if pick_by == "slowest"
        else f"min({ts}) ASC" if pick_by == "first_error" else f"max({ts}) DESC"
    )
    cfg = ChartConfig(
        source=source,
        select=[SelectCol(agg_fn="count", alias="span_count")],
        where=effective_filter,
        where_language=effective_language,
        group_by=[source.trace_id_expression],
        order_by=order_by,
        limit=1,
        date_range=date_range,
    )
    rows = compile_chart_config(spark, cfg, sf_dir=sf_dir).collect()
    if not rows:
        return None
    row = rows[0].asDict()
    # the grouped trace-id column carries the expression as its name
    # (waterfall.ts:352-360); locate it by stripping the non-data keys
    for k, v in row.items():
        if k not in ("span_count", "__timestamp") and v is not None:
            return str(v)
    return None


def _span_projection(source: Source, df: DataFrame) -> DataFrame:
    divisor = duration_divisor(source.duration_precision)
    e = translate_expr
    cols = [
        F.expr(e(source.span_id_expression)).cast("string").alias("spanId"),
        F.expr(e(source.parent_span_id_expression)).cast("string").alias(
            "parentSpanId"
        ),
        F.expr(e(source.service_name_expression or "''")).alias("serviceName"),
        F.expr(e(source.span_name_expression or "''")).alias("spanName"),
        F.expr(e(source.span_kind_expression or "''")).alias("spanKind"),
        (F.expr(e(source.duration_expression)) / F.lit(divisor)).alias(
            "durationMs"
        ),
        F.expr(e(source.status_code_expression or "''")).alias("statusCode"),
        F.expr(e(source.status_message_expression or "''")).alias(
            "statusMessage"
        ),
        F.expr(e(source.timestamp_value_expression)).alias("timestamp"),
    ]
    if source.event_attributes_expression:
        cols.append(
            F.expr(e(source.event_attributes_expression)).alias(
                "spanAttributes"
            )
        )
    return df.select(*cols)


def fetch_trace_spans(
    spark: SparkSession,
    source: Source,
    sf_dir: str,
    trace_id: str,
    *,
    max_spans: int = 500,
) -> tuple[list[dict], bool]:
    """waterfall.ts step 2 (:366-420): every span of ONE trace, projected
    to the semantic roles, ordered by timestamp, LIMIT max_spans+1 to
    detect truncation. Returns (span dicts, truncated) — a bounded
    collect by construction (≤ 2000 rows, the reference's cap)."""
    df = load_table(spark, sf_dir, source.table)
    tid = F.expr(translate_expr(source.trace_id_expression)).cast("string")
    spans = (
        _span_projection(source, df.where(tid == F.lit(trace_id)))
        .orderBy("timestamp")
        .limit(max_spans + 1)
    )
    rows = [r.asDict() for r in spans.collect()]
    truncated = len(rows) > max_spans
    return (rows[:max_spans] if truncated else rows), truncated


def trace_waterfall(
    spark: SparkSession,
    source: Source,
    sf_dir: str,
    *,
    trace_id: Optional[str] = None,
    date_range=None,
    pick_filter: str = "",
    pick_filter_language: str = "lucene",
    pick_by: str = "slowest",
    max_spans: int = 500,
    log_source: Optional[Source] = None,
    max_logs: int = 100,
) -> Optional[dict]:
    """The full tool (waterfall.ts registerTraceWaterfall): pick (unless a
    TraceId was given), fetch, DFS-order, summarize, and optionally inline
    correlated log rows sharing the TraceId. Returns
    ``{trace_id, spans, truncated, summary, logs?, logs_truncated?}`` or
    None when nothing matched."""
    if trace_id is None:
        if date_range is None:
            raise ValueError("date_range is required when auto-picking")
        trace_id = pick_trace(
            spark, source, sf_dir,
            date_range=date_range,
            pick_filter=pick_filter,
            pick_filter_language=pick_filter_language,
            pick_by=pick_by,
        )
        if trace_id is None:
            return None
    spans, truncated = fetch_trace_spans(
        spark, source, sf_dir, trace_id, max_spans=max_spans
    )
    if not spans:
        return None
    tree = build_pre_order_tree(spans)
    root = next((s for s in tree if s["depth"] == 0), tree[0])
    out = {
        "trace_id": trace_id,
        "spans": tree,
        "truncated": truncated,
        "summary": {
            "span_count": len(tree),
            "root_span": root["spanName"],
            "root_service": root["serviceName"],
            # JS Math.max coerces a null duration to 0 — match it rather
            # than letting one malformed span crash the summary
            "total_duration_ms": max(
                (s["durationMs"] or 0.0) for s in spans
            ),
        },
    }
    if log_source is not None and log_source.trace_id_expression:
        ldf = load_table(spark, sf_dir, log_source.table)
        e = translate_expr
        ltid = F.expr(e(log_source.trace_id_expression)).cast("string")
        logs = (
            ldf.where(ltid == F.lit(trace_id))
            .select(
                F.expr(e(log_source.timestamp_value_expression)).alias(
                    "timestamp"
                ),
                F.expr(
                    e(log_source.severity_text_expression or "''")
                ).alias("severityText"),
                F.expr(e(log_source.body_expression or "''")).alias("body"),
                F.expr(
                    e(log_source.service_name_expression or "''")
                ).alias("serviceName"),
                F.expr(e(log_source.span_id_expression or "''")).cast(
                    "string"
                ).alias("spanId"),
            )
            .orderBy("timestamp")
            .limit(max_logs + 1)
        )
        lrows = [r.asDict() for r in logs.collect()]
        out["logs_truncated"] = len(lrows) > max_logs
        out["logs"] = lrows[:max_logs]
    return out


def trace_breakdown(
    spark: SparkSession,
    source: Source,
    sf_dir: str,
    *,
    parent_filter_sql: str,
    date_range,
    min_parent_duration_ms: Optional[float] = None,
    top_n: int = 20,
    max_parent_traces: int = 100_000,
    widen_seconds: int = 60,
    exact: bool = True,
) -> DataFrame:
    """breakdown.ts's two-stage plan as DataFrames: (1) DISTINCT parent
    TraceIds matching ``parent_filter_sql`` in the window (optionally
    duration-gated; capped at ``max_parent_traces``), (2) aggregate every
    span of those traces EXCEPT the parent-filter rows by
    (service, operation) — total/calls/in_parents/p50/p99, total DESC,
    LIMIT top_n. The child window widens ±60 s to catch children
    straddling the parent sampling window (breakdown.ts:245-249).

    Scale: stage 1 is one distinct over the pushed filter; stage 2 is a
    semi join on the trace id (broadcast when the parent set is small, the
    common triage case) + one partial-aggregated groupBy whose state is
    the (service, operation) domain.

    ``exact``: Spark's exact ``percentile`` buffers a per-group map of
    DISTINCT duration values; with ns-precision durations nearly every
    value is distinct, so the p50/p99 state grows with input size.  The
    reference's ClickHouse ``quantile`` (breakdown.ts:229-230) is itself
    reservoir-SAMPLING-based, so approximate percentiles are within its
    contract — pass ``exact=False`` at 100 TB to switch to
    ``percentile_approx`` (bounded t-digest-style state per group), the
    same escape hatch as ``heatmap.exact_bounds``.  The default stays
    exact so the small-sf DuckDB gate oracle (``quantile_cont``) matches
    bit-for-bit."""
    from datetime import timedelta

    e = translate_expr
    divisor = duration_divisor(source.duration_precision)
    start, end = date_range
    ts = F.expr(e(source.timestamp_value_expression))
    tid = F.expr(e(source.trace_id_expression)).cast("string")
    dur = F.expr(e(source.duration_expression))
    parent_cond = F.expr(e(parent_filter_sql))

    df = load_table(
        spark, sf_dir, source.table,
        time_filter=(source.timestamp_value_expression,
                     start - timedelta(seconds=widen_seconds),
                     end + timedelta(seconds=widen_seconds)),
    )
    parents = (
        df.where((ts >= F.lit(start)) & (ts <= F.lit(end)) & parent_cond)
    )
    if min_parent_duration_ms is not None:
        # stored duration is divisor x ms (breakdown.ts:255-258)
        parents = parents.where(
            dur >= F.lit(min_parent_duration_ms * divisor)
        )
    parent_traces = (
        parents.select(tid.alias("_trace_id")).distinct()
        .limit(max_parent_traces)
    )
    children = (
        df.where(~parent_cond)
        .withColumn("_trace_id", tid)
        .join(F.broadcast(parent_traces), on="_trace_id", how="left_semi")
    )
    pct = "percentile" if exact else "percentile_approx"
    return (
        children.groupBy(
            F.expr(e(source.service_name_expression or "''")).alias("service"),
            F.expr(e(source.span_name_expression or "''")).alias("operation"),
        )
        .agg(
            (F.sum(dur) / F.lit(divisor)).alias("total_time_ms"),
            F.count("*").alias("calls"),
            F.count_distinct(tid).alias("in_parents"),
            (F.expr(
                f"{pct}({e(source.duration_expression)}, 0.5)"
            ) / F.lit(divisor)).alias("p50_ms"),
            (F.expr(
                f"{pct}({e(source.duration_expression)}, 0.99)"
            ) / F.lit(divisor)).alias("p99_ms"),
        )
        .orderBy(F.desc("total_time_ms"))
        .limit(top_n)
    )
