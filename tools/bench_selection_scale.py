"""Scale measurement for the heatmap-selection outlier/inlier split
(analytics.event_deltas.delta_selection_split, r13).

Claims to pin:

1. The NON-AGGREGATE split is a row-local filter + TakeOrderedAndProject
   (no global sort, no join): wall time is scan-linear across the
   sf1 -> sf10 decade.
2. The AGGREGATE split's extra state is the broadcast AggregatedTimestamps
   side, bounded by the DISTINCT bucketed timestamps inside the selection
   box — independent of row count (a fixed x-range has a fixed number of
   minutes). Decade growth stays scan-shaped, not join-shaped.
3. Both sides return exactly sample_size rows (the fixed-limit stable
   sample standing in for the ClickHouse PartIds/indexHint pruning).

Usage: python tools/bench_selection_scale.py [sf_dirs...]
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time
from datetime import datetime

sys.path.insert(0, "/root/repo")

from hyperdx_spark import get_spark
from hyperdx_spark.analytics.event_deltas import delta_selection_split

DIRS = sys.argv[1:] or ["/root/repo/.scale/sf1", "/root/repo/.scale/sf10"]
BOX = (datetime(2024, 1, 5), datetime(2024, 1, 20), 20.0, 60.0)


def run(df, value_expr, ts_expr="ts"):
    t0 = time.monotonic()
    out, inl = delta_selection_split(
        df, timestamp_expr=ts_expr, value_expr=value_expr, box=BOX,
        id_col="event_id",
    )
    n_out, n_in = out.count(), inl.count()
    return round(time.monotonic() - t0, 2), n_out, n_in


def main() -> None:
    spark = get_spark("bench-selection", cpus=32)
    warm = spark.read.parquet(f"{DIRS[0]}/events.parquet").limit(50_000)
    run(warm, "value")
    res = {}
    for sf_dir in DIRS:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        n = ev.count()
        plain_s, po, pi = run(ev, "value")
        # minute-bucketed aggregate: the broadcast side is bounded by the
        # box's minute count (15 days = 21,600 minutes) at EVERY sf
        agg_s, ao, ai = run(ev, "avg(value)", ts_expr="toStartOfMinute(ts)")
        res[sf_dir.rsplit("/", 1)[-1]] = {
            "rows": n,
            "plain_s": plain_s,
            "plain_sampled": [po, pi],
            "agg_s": agg_s,
            "agg_sampled": [ao, ai],
        }
    print(json.dumps({"selection_split": res}))


if __name__ == "__main__":
    main()
