"""Scale measurement for DSIR importance resampling (pipeline/dsir.py, r14).

Claims to pin across the sf1 -> sf10 decade:

1. ``dsir_fit`` is two map-side-combined groupBys over <= ``buckets`` keys
   plus broadcast-joined domain/count frames — scan-linear wall time, state
   bounded by ``buckets`` regardless of corpus size.
2. ``dsir_weights`` is one broadcast lambda join + ONE partial-aggregated
   groupBy on the doc id — the shuffle ships per-partition partials, never
   n-gram rows, so wall time tracks the scan.
3. ``dsir_resample`` is a TakeOrderedAndProject top-k: driver result is k
   rows at any corpus size.

Usage: python tools/bench_dsir_scale.py [sf_dirs...]
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hyperdx_spark import get_spark  # noqa: E402
from hyperdx_spark.io import ensure_min_parallelism, load_table  # noqa: E402
from hyperdx_spark.pipeline import dsir  # noqa: E402

DIRS = sys.argv[1:] or ["/root/repo/.scale/sf1", "/root/repo/.scale/sf10"]
BUCKETS = 8192  # production-shaped feature space (the gate uses 64)


def main() -> None:
    spark = get_spark("bench-dsir", cpus=32)
    res = {}
    for sf_dir in DIRS:
        tag = sf_dir.rsplit("/", 1)[-1]
        # single-row-group parquet delivers 1-2 scan partitions; widen so
        # the row-local n-gram explode uses every core (the q_text_stats
        # lesson — featurization is partition-count-bound, not data-bound)
        docs = ensure_min_parallelism(
            load_table(spark, sf_dir, "documents").select("doc_id", "text")
        )
        target = docs.where(F.col("doc_id") % 17 == 0)
        n = docs.count()

        t0 = time.monotonic()
        lam = dsir.dsir_fit(target, docs, buckets=BUCKETS)
        lam_rows = lam.collect()  # buckets rows — bounded driver result
        fit_s = round(time.monotonic() - t0, 2)
        lam_cached = spark.createDataFrame(lam_rows, lam.schema)

        t0 = time.monotonic()
        w = dsir.dsir_weights(docs, lam_cached, buckets=BUCKETS)
        w.write.format("noop").mode("overwrite").save()
        weight_s = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        sel = dsir.dsir_resample(w, 1000).collect()
        sel_s = round(time.monotonic() - t0, 2)

        res[tag] = {
            "docs": n,
            "fit_s": fit_s,
            "weight_s": weight_s,
            "resample_s": sel_s,
            "selected": len(sel),
        }
    print(json.dumps({"dsir": res, "buckets": BUCKETS}))


if __name__ == "__main__":
    main()
