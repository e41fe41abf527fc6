"""Scale measurement for CCNet-style perplexity filtering
(pipeline/perplexity.py, r14).

Claims to pin across the sf1 -> sf10 decade:

1. ``bigram_lm_fit`` is two map-side-combined groupBys over OBSERVED
   bigram/context keys — wall time scan-linear, state bounded by the
   observed vocabulary (synthetic docs: bounded), never V².
2. ``perplexity_score`` is a row-local bigram explode + two broadcast
   joins + ONE partial-aggregated groupBy on the doc id.
3. ``perplexity_filter`` adds only a row-local integer comparison and a
   broadcast semi join of the kept ids.

Usage: python tools/bench_perplexity_scale.py [sf_dirs...]
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
from hyperdx_spark.pipeline import perplexity as ppl  # noqa: E402

DIRS = sys.argv[1:] or ["/root/repo/.scale/sf1", "/root/repo/.scale/sf10"]
VOCAB = 65536


def main() -> None:
    spark = get_spark("bench-ppl", cpus=32)
    res = {}
    for sf_dir in DIRS:
        tag = sf_dir.rsplit("/", 1)[-1]
        docs = ensure_min_parallelism(
            load_table(spark, sf_dir, "documents").select("doc_id", "text")
        )
        target = docs.where(F.col("doc_id") % 17 == 0)
        n = docs.count()

        t0 = time.monotonic()
        lm = ppl.bigram_lm_fit(target, vocab=VOCAB)
        # pin the (sparse) LM tables so the fit runs once, like production
        bi = lm["bigrams"].collect()
        un = lm["unigrams"].collect()
        fit_s = round(time.monotonic() - t0, 2)
        lm_cached = {
            "bigrams": spark.createDataFrame(bi, lm["bigrams"].schema),
            "unigrams": spark.createDataFrame(un, lm["unigrams"].schema),
            "vocab": VOCAB, "seed": 0,
        }

        t0 = time.monotonic()
        s = ppl.perplexity_score(docs, lm_cached)
        s.write.format("noop").mode("overwrite").save()
        score_s = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        kept = ppl.perplexity_filter(docs, lm_cached, 8.0).count()
        filt_s = round(time.monotonic() - t0, 2)

        res[tag] = {
            "docs": n,
            "lm_bigrams": len(bi),
            "lm_unigrams": len(un),
            "fit_s": fit_s,
            "score_s": score_s,
            "filter_s": filt_s,
            "kept": kept,
        }
    print(json.dumps({"perplexity": res, "vocab": VOCAB}))


if __name__ == "__main__":
    main()
