"""Session-replay correlation — the session-list query.

Mirrors ``packages/app/src/sessions.ts:93-260`` (useSessions): sessions are
trace events carrying a ``rum.sessionId`` resource attribute, aggregated per
(session id [, service]) into activity/error/recording counters with the
session's time extent; the default view keeps sessions with user activity or
a replay recording, newest-last-activity first. When the user supplies a
search, the reference instead keeps sessions whose id also appears among
"sessions with recordings" (session source) or "sessions with user activity"
(trace source, record-init/visibility spans) — here two distinct-id branches
semi-joined against the capped session list.

Scale shape: one groupBy on the session key produces the bounded (<= limit)
session list; each correlation branch is a distinct-ids aggregate
semi-joined broadcast-side, so the big trace table is never reshuffled for
the correlation.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hyperdx_spark.compile import compile_chart_config
from hyperdx_spark.model import ChartConfig, QuerySettings, SelectCol, Source, SqlFilter


@dataclass
class SessionSpec:
    """Role expressions for the session list (sessions.ts:93-172)."""

    session_id_expr: str  # SQL expr for the session id (rum.sessionId analogue)
    exists_condition: str  # lucene condition selecting rows that carry an id
    interaction_condition: str  # lucene: `component:"user-interaction"` analogue
    error_condition: str  # lucene: `statusCode:error` analogue
    recording_condition: str  # lucene: `spanName:"record init"` analogue
    # `spanName='record init' OR spanName='visibility'` analogue, used by the
    # user-search branch to keep only sessions with real user activity
    activity_condition: Optional[str] = None


def session_list(
    spark: SparkSession,
    trace_source: Source,
    spec: SessionSpec,
    date_range: tuple[datetime, datetime],
    *,
    where: Optional[str] = None,
    where_language: str = "lucene",
    session_source: Optional[Source] = None,
    session_id_expr_session: Optional[str] = None,
    sf_dir: Optional[str] = None,
    limit: int = 500,
    settings: Optional[QuerySettings] = None,
) -> DataFrame:
    """The session list DataFrame: one row per session with
    (sessionId, minTimestamp, maxTimestamp, sessionCount, interactionCount,
    errorCount, recordingCount)."""
    ts = trace_source.timestamp_value_expression
    cfg = ChartConfig(
        source=trace_source,
        select=[
            SelectCol(value_expression=f"MIN({ts})", alias="minTimestamp"),
            SelectCol(value_expression=f"MAX({ts})", alias="maxTimestamp"),
            SelectCol(agg_fn="count", alias="sessionCount"),
            SelectCol(
                agg_fn="count",
                agg_condition=spec.interaction_condition,
                alias="interactionCount",
            ),
            SelectCol(
                agg_fn="count", agg_condition=spec.error_condition, alias="errorCount"
            ),
            SelectCol(
                agg_fn="count",
                agg_condition=spec.recording_condition,
                alias="recordingCount",
            ),
        ],
        where=spec.exists_condition,
        where_language="lucene",
        filters=[SqlFilter(condition=where, type=where_language)] if where else [],
        group_by=[spec.session_id_expr],
        # default view: only sessions with user activity or a recording
        # (sessions.ts:236-239); an explicit user search skips the HAVING
        having=None if where else "interactionCount > 0 OR recordingCount > 0",
        order_by="maxTimestamp DESC",
        limit=limit,
        date_range=date_range,
    )
    out = compile_chart_config(spark, cfg, sf_dir=sf_dir, settings=settings)
    key = (
        spec.session_id_expr
        if spec.session_id_expr in out.columns
        else "__group_0"
    )
    out = out.withColumnRenamed(key, "sessionId")
    if not where:
        return out

    # user-search branch (sessions.ts:243-257): keep sessions that also have
    # a replay recording or real user activity
    def _distinct_ids(source: Source, id_expr: str, cond: Optional[str]) -> DataFrame:
        # the count column forces the aggregate path (a lone None-aggFn
        # select would compile as a global aggregate projection)
        sub = ChartConfig(
            source=source,
            select=[
                SelectCol(value_expression=f"MAX({id_expr})", alias="sessionId"),
                SelectCol(agg_fn="count", alias="__cnt"),
            ],
            where=cond or "",
            where_language="lucene",
            group_by=[id_expr],
            select_group_by=False,
            date_range=date_range,
        )
        out = compile_chart_config(spark, sub, sf_dir=sf_dir, settings=settings)
        return out.select("sessionId")

    branches = []
    if session_source is not None:
        branches.append(
            _distinct_ids(
                session_source,
                session_id_expr_session or spec.session_id_expr,
                None,
            )
        )
    if spec.activity_condition:
        branches.append(
            _distinct_ids(trace_source, spec.session_id_expr, spec.activity_condition)
        )
    if not branches:
        return out
    keep = branches[0]
    for b in branches[1:]:
        keep = keep.unionByName(b)
    keep = keep.distinct()
    # the session list is bounded by `limit`; the ids side is a distinct
    # aggregate — broadcast it so the (already tiny) list never reshuffles
    return out.join(F.broadcast(keep), on="sessionId", how="left_semi")
