"""Scale measurement for the trainable quality classifier (r11).

Two claims to pin:

1. TRAINING's numpy fit is bounded by the sample, not the corpus; the
   distributed part is one linear TakeOrdered scan per class (grows with
   corpus bytes but never shuffles — measured 12.4 s -> 29.0 s across the
   decade, i.e. 2.3x on 10x data, scan-dominated).
2. SCORING is one row-local pass, linear in corpus bytes, for BOTH
   serving paths: the folded-literal Column path (k <= 1024) and the
   Arrow worker (k > 1024).

Classes for timing are synthetic (even/odd doc_id) — the cost profile
depends on text bytes and k, not on label quality.

Usage: python tools/bench_quality_scale.py [sf_dirs...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from hyperdx_spark import get_spark
from hyperdx_spark.pipeline import quality

DIRS = sys.argv[1:] or ["/root/repo/.scale/sf1", "/root/repo/.scale/sf10"]


def main() -> None:
    spark = get_spark("bench-quality", cpus=32)
    out = {}
    for sf_dir in DIRS:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        n = docs.count()
        pos = docs.where(F.col("doc_id") % 2 == 0)
        neg = docs.where(F.col("doc_id") % 2 == 1)

        t0 = time.monotonic()
        w, b = quality.train_quality_classifier(
            pos, neg, num_features=4096, sample_per_class=5000, iters=200
        )
        train_s = round(time.monotonic() - t0, 2)

        w64 = [float((i * 37) % 21 - 10) for i in range(64)]
        t0 = time.monotonic()
        quality.quality_filter(docs, w64, 0.0, method="column").write.format(
            "noop"
        ).mode("overwrite").save()
        col_s = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        quality.quality_filter(docs, w64, 0.0, method="arrow").write.format(
            "noop"
        ).mode("overwrite").save()
        arrow64_s = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        quality.quality_filter(docs, w, b).write.format("noop").mode(
            "overwrite"
        ).save()
        arrow_s = round(time.monotonic() - t0, 2)

        out[sf_dir] = {
            "n_docs": n,
            "train_s_k4096_5k_per_class": train_s,
            "score_column_k64_s": col_s,
            "score_arrow_k64_s": arrow64_s,
            "score_arrow_k4096_s": arrow_s,
        }
        print(json.dumps({sf_dir: out[sf_dir]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
