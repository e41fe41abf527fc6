"""window_funnel (ClickHouse windowFunnel parity) + retention cohorts:
hand-computable cases plus a Python reference implementation over real
testdata events."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from hyperdx_spark.analytics.funnel import retention_cohorts, window_funnel

T0 = datetime(2024, 1, 1)


def _funnel(spark, rows, window_s=3600, n_steps=3):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, ev string")
    conds = [F.col("ev") == s for s in ["view", "cart", "buy"][:n_steps]]
    out = window_funnel(
        df, key_cols=["user_id"], ts_col="ts",
        step_conditions=conds, window_s=window_s,
    )
    return {r["user_id"]: r["level"] for r in out.collect()}


def test_funnel_levels(spark):
    rows = [
        # user 1: full ordered chain within the hour -> 3
        (1, T0, "view"), (1, T0 + timedelta(minutes=10), "cart"),
        (1, T0 + timedelta(minutes=20), "buy"),
        # user 2: cart before view -> only level 1 (view restarts)
        (2, T0, "cart"), (2, T0 + timedelta(minutes=5), "view"),
        # user 3: view ... cart outside the window -> 1
        (3, T0, "view"), (3, T0 + timedelta(hours=2), "cart"),
        # user 4: interleaved noise events don't break the chain (non-strict)
        (4, T0, "view"), (4, T0 + timedelta(minutes=1), "other"),
        (4, T0 + timedelta(minutes=2), "cart"),
        # user 5: a LATER view restarts; buy chains off the new start
        (5, T0, "view"), (5, T0 + timedelta(minutes=50), "view"),
        (5, T0 + timedelta(minutes=55), "cart"),
        (5, T0 + timedelta(minutes=70), "buy"),
    ]
    got = _funnel(spark, rows)
    assert got == {1: 3, 2: 1, 3: 1, 4: 2, 5: 3}


def test_funnel_window_measured_from_chain_start(spark):
    # cart at +50m (inside), buy at +70m: outside 1h of the view start -> 2
    rows = [
        (1, T0, "view"),
        (1, T0 + timedelta(minutes=50), "cart"),
        (1, T0 + timedelta(minutes=70), "buy"),
    ]
    assert _funnel(spark, rows) == {1: 2}


def _py_funnel(events, steps, window_s):
    """Reference fold identical in spirit, independent in code."""
    start = [None] * len(steps)
    for t, s in sorted(events):
        if s == 1:
            start[0] = t
        elif start[s - 2] is not None and (t - start[s - 2]).total_seconds() <= window_s:
            start[s - 1] = start[s - 2]
    return sum(1 for x in start if x is not None)


def test_funnel_against_python_reference_on_testdata(spark, sf_dir):
    from hyperdx_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    steps = ["view", "click", "purchase"]
    conds = [F.col("event_type") == s for s in steps]
    out = window_funnel(
        ev, key_cols=["user_id"], ts_col="ts",
        step_conditions=conds, window_s=86400,
    )
    got = {r["user_id"]: r["level"] for r in out.collect()}
    rows = ev.select("user_id", "ts", "event_type").collect()
    per_user = {}
    for r in rows:
        s = steps.index(r["event_type"]) + 1 if r["event_type"] in steps else 0
        if s:
            per_user.setdefault(r["user_id"], []).append((r["ts"], s))
    want = {u: _py_funnel(evs, steps, 86400) for u, evs in per_user.items()}
    assert got == want and len(got) > 10


def test_retention_cohorts(spark):
    rows = [
        (1, T0), (1, T0 + timedelta(days=7)), (1, T0 + timedelta(days=14)),
        (2, T0), (2, T0 + timedelta(days=14)),
        (3, T0 + timedelta(days=7)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = retention_cohorts(df, key_col="user_id", ts_col="ts", period="week")
    got = {(r["cohort"].day, r["offset"]): r["n_active"] for r in out.collect()}
    # weeks truncate to Mondays: Jan 1 2024 IS a Monday
    assert got == {(1, 0): 2, (1, 1): 1, (1, 2): 2, (8, 0): 1}


def test_retention_against_duckdb(spark, sf_dir):
    import duckdb

    from hyperdx_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    out = retention_cohorts(ev, key_col="user_id", ts_col="ts", period="day")
    got = sorted(
        (r["cohort"].strftime("%Y-%m-%d"), r["offset"], r["n_active"])
        for r in out.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(
        (str(c)[:10], int(o), int(n))
        for c, o, n in con.execute(
            """
            WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort
                       FROM events GROUP BY 1),
            a AS (SELECT DISTINCT e.user_id, f.cohort,
                         date_diff('day', f.cohort, date_trunc('day', e.ts)) AS off
                  FROM events e JOIN f USING (user_id))
            SELECT cohort, off, count(DISTINCT user_id) FROM a GROUP BY 1, 2
            """
        ).fetchall()
    )
    assert got == want and len(got) > 5
