"""Session-replay correlation (sessions.ts:93-260 analogue)."""

from datetime import datetime

from hyperdx_spark.sessions import SessionSpec, session_list

RANGE = (datetime(2024, 1, 1), datetime(2024, 2, 1))


def _spec():
    return SessionSpec(
        session_id_expr="user_id",
        exists_condition="user_id:*",
        interaction_condition='event_type:"click"',
        error_condition='event_type:"error"',
        recording_condition='event_type:"purchase"',
        activity_condition='event_type:"purchase"',
    )


def test_session_list_default_having(spark, sf_dir, events_source):
    out = session_list(spark, events_source, _spec(), RANGE, sf_dir=sf_dir, limit=10)
    rows = out.collect()
    assert 0 < len(rows) <= 10
    assert set(out.columns) == {
        "sessionId", "minTimestamp", "maxTimestamp", "sessionCount",
        "interactionCount", "errorCount", "recordingCount",
    }
    # HAVING: every kept session has interactions or recordings
    assert all(r["interactionCount"] > 0 or r["recordingCount"] > 0 for r in rows)
    # newest-last-activity first
    maxes = [r["maxTimestamp"] for r in rows]
    assert maxes == sorted(maxes, reverse=True)
    assert all(r["minTimestamp"] <= r["maxTimestamp"] for r in rows)


def test_session_list_rum_shaped_fixture(spark, sf_dir):
    """rum.sessionId-shaped source: the session id lives in a map-typed
    resource_attributes column under a DOTTED key, span roles are real span
    names, and the (user, day) key gives skew where the default-view HAVING
    genuinely filters (sessions.ts:93-199 shape)."""
    import __spark_entry__ as entry
    from hyperdx_spark.model import Source
    from pyspark.sql import functions as F

    entry._rum_spans(spark, sf_dir)
    out = session_list(
        spark, entry._rum_src(), entry._session_spec(), RANGE,
        sf_dir=sf_dir, limit=10_000,
    )
    rows = out.collect()
    assert rows
    # HAVING holds on every kept row
    assert all(r["interactionCount"] > 0 or r["recordingCount"] > 0 for r in rows)
    # the fixture has skew: interaction-only AND recording-only sessions both
    # exist, and some sessions were dropped by the HAVING
    assert any(r["interactionCount"] > 0 and r["recordingCount"] == 0 for r in rows)
    assert any(r["interactionCount"] == 0 and r["recordingCount"] > 0 for r in rows)
    all_sessions = (
        spark.table("rum_spans")
        .where("ts >= timestamp'2024-01-01' AND ts <= timestamp'2024-02-01'")
        .select(F.expr("resource_attributes['rum.sessionId']").alias("sid"))
        .where("sid IS NOT NULL").distinct().count()
    )
    assert all_sessions > len(rows)  # HAVING dropped some sessions
    # dual-branch search: recordings session-source + activity condition
    filt = session_list(
        spark, entry._rum_src(), entry._session_spec(), RANGE,
        where="duration >= 95", where_language="sql",
        session_source=Source(table="rum_recordings",
                              timestamp_value_expression="ts"),
        sf_dir=sf_dir, limit=10_000,
    ).collect()
    assert filt
    keep_ok = {
        r["sid"]
        for r in spark.table("rum_spans")
        .where("span_name IN ('record init', 'visibility')")
        .select(F.expr("resource_attributes['rum.sessionId']").alias("sid"))
        .distinct().collect()
    }
    assert all(r["sessionId"] in keep_ok for r in filt)


def test_session_list_search_branch_semi_join(spark, sf_dir, events_source):
    # search branch drops HAVING and keeps only sessions with activity
    out = session_list(
        spark, events_source, _spec(), RANGE,
        where="value >= 99", where_language="sql", sf_dir=sf_dir, limit=100,
    ).collect()
    assert out  # matches exist
    # every kept session must have a purchase (activity condition) somewhere
    from hyperdx_spark.io import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events", time_filter=("ts", *RANGE))
    with_purchase = {
        r["user_id"]
        for r in ev.where(F.col("event_type") == "purchase").select("user_id").distinct().collect()
    }
    assert all(r["sessionId"] in with_purchase for r in out)
