"""Scale measurement for the streaming alert->notify composition (r12).

`stream_alert_notifications` holds one integer streak per (alert, group)
on the driver and renders notifications per fired bucket. Two claims:

1. Driver state is exactly |groups| entries regardless of window depth
   (asserted from the streaks dict via the harness's wrapper).
2. Rendering throughput: the per-notification cost (two Handlebars-subset
   renders + directive extraction + webhook resolution + sha256 event and
   idempotency ids) supports thousands of fired buckets per second —
   far above any real alert fan-out (the reference renders per cron tick
   per alert).

Usage: python tools/bench_notify_scale.py [n_groups ...]
Prints one JSON line per group count; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from datetime import datetime, timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyperdx_spark import get_spark  # noqa: E402
from hyperdx_spark.alerts import AlertConfig  # noqa: E402
from hyperdx_spark.streaming import stream_alert_notifications  # noqa: E402
from hyperdx_spark.webhooks import build_title  # noqa: E402

WINDOWS = 24
WEBHOOKS = {
    "wh-slack-1": {"id": "wh-slack-1", "name": "slack-alerts",
                   "service": "slack", "url": "https://hooks.example/slack"},
    "wh-gen-1": {"id": "wh-gen-1", "name": "generic-alerts",
                 "service": "generic", "url": "https://hooks.example/gen"},
}


def run(spark, n_groups: int) -> dict:
    base = datetime(2024, 1, 1)
    # two consecutive breaching buckets per 4-window cycle (w%4 in 1,2):
    # with num_consecutive_windows=2 the second breach fires, so each
    # group fires exactly WINDOWS/4 ALERTs
    rows = [
        (f"svc-{g}", base + timedelta(hours=w),
         100.0 if w % 4 in (1, 2) else 1.0)
        for g in range(n_groups)
        for w in range(WINDOWS)
    ]
    seed = tempfile.mkdtemp(prefix="notify_scale_")
    spark.createDataFrame(
        rows, "service string, __timestamp timestamp, value double"
    ).coalesce(4).write.mode("overwrite").parquet(seed)
    stream = (
        spark.readStream.schema(
            "service string, __timestamp timestamp, value double"
        ).parquet(seed)
    )
    cfg = AlertConfig(threshold=50, num_consecutive_windows=2)
    fired: list = []
    state: dict = {}
    t0 = time.monotonic()
    q = stream_alert_notifications(
        stream,
        cfg,
        on_notify=fired.append,
        state_out=state,
        notify_kwargs=dict(
            title=lambda v: build_title("errors", v),
            hdx_link="https://hdx.example/s/1",
            alert_id="alert-1",
            webhooks_by_id=WEBHOOKS,
            channel_type="webhook",
            webhook_id="wh-slack-1",
            source="saved_search",
            template="sev:high @webhook-generic ",
        ),
        bucket_duration=timedelta(hours=1),
        group_cols=["service"],
        trigger_available_now=True,
    )
    q.awaitTermination(600)
    wall = time.monotonic() - t0
    # one ALERT per 4-window cycle per group (second consecutive breach)
    expected = n_groups * (WINDOWS // 4)
    assert len(fired) == expected, (len(fired), expected)
    assert all(len(d["requests"]) == 2 for d in fired[:100])
    # claim 1: driver state is exactly one streak per group, never rows
    assert len(state["streaks"]) == n_groups, len(state["streaks"])
    return {
        "groups": n_groups,
        "windows": WINDOWS,
        "notifications": len(fired),
        "wall_s": round(wall, 2),
        "notifications_per_s": round(len(fired) / wall, 1),
    }


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [1000, 10000]
    spark = get_spark("bench-notify", cpus=32)
    out = [run(spark, n) for n in counts]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
