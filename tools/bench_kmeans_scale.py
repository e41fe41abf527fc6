"""Scale measurement for deterministic fixed-point k-means
(pipeline/clustering.py, r14).

Claims to pin across the sf1 -> sf10 decade:

1. ``kmeans_fit`` wall time is scan-linear per Lloyd iteration — the
   assignment is row-local (centroid literals ride the plan) and the
   update shuffle carries at most k x dim (cluster, dim) partials.
2. The farthest-first init is k-1 top-1 jobs — corpus-size-linear, never
   quadratic.
3. ``kmeans_assign`` + within-cluster exhaustive pairing (the
   SemDeDup-paper shape) stays bounded by the sum of squared cluster
   sizes, never the global N².

4. (r15) k-means‖ init (Bahmani'12, ``method="parallel"``) is
   O(rounds) distributed passes REGARDLESS of k — at k=256 it must not
   cost 256 sequential jobs like farthest-first would, and its seeds
   must be at least as good (SSE <= hash init after the same Lloyd
   budget).

Usage: python tools/bench_kmeans_scale.py [sf_dirs...]
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyperdx_spark import get_spark  # noqa: E402
from hyperdx_spark.io import ensure_min_parallelism, load_table  # noqa: E402
from hyperdx_spark.pipeline import clustering  # noqa: E402

DIRS = sys.argv[1:] or ["/root/repo/.scale/sf1", "/root/repo/.scale/sf10"]
K = 16
K_PAR = 256
ITERS = 3


def main() -> None:
    spark = get_spark("bench-kmeans", cpus=32)
    res = {}
    for sf_dir in DIRS:
        tag = sf_dir.rsplit("/", 1)[-1]
        emb = ensure_min_parallelism(load_table(spark, sf_dir, "embeddings"))
        n = emb.count()

        t0 = time.monotonic()
        cents = clustering.kmeans_init(emb, K)
        init_s = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        for _ in range(ITERS):
            cents = clustering.kmeans_update(emb, cents)
        fit_s = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        assigned = clustering.kmeans_assign(emb, cents, method="arrow")
        sizes = {
            r["cluster"]: r["n"]
            for r in assigned.groupBy("cluster").count()
            .withColumnRenamed("count", "n").collect()
        }
        assign_s = round(time.monotonic() - t0, 2)
        sse = clustering.kmeans_sse(emb, cents)

        # r15: D4 diversification over the fitted clusters — one window
        # shuffle partitioned by cluster
        t0 = time.monotonic()
        d4_kept = clustering.drop_prototypical(emb, cents, 0.25).count()
        d4_s = round(time.monotonic() - t0, 2)

        # r15: k-means|| at large k — O(rounds) passes, not O(k) jobs
        t0 = time.monotonic()
        par = clustering.kmeans_init(emb, K_PAR, method="parallel")
        par_init_s = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        par = clustering.kmeans_update(emb, par)
        par_iter_s = round(time.monotonic() - t0, 2)
        sse_par = clustering.kmeans_sse(emb, par)
        hsh = clustering.kmeans_init(emb, K_PAR, method="hash")
        hsh = clustering.kmeans_update(emb, hsh)
        sse_hash = clustering.kmeans_sse(emb, hsh)

        res[tag] = {
            "vectors": n,
            "init_s": init_s,
            "fit_s_3iters": fit_s,
            "assign_s": assign_s,
            "clusters_nonempty": len(sizes),
            "max_cluster": max(sizes.values()),
            "sse": sse,
            "d4_s": d4_s,
            "d4_kept": d4_kept,
            "par_init_s_k256": par_init_s,
            "par_iter_s_k256": par_iter_s,
            "sse_par_k256": sse_par,
            "sse_hash_k256": sse_hash,
            "par_vs_hash_sse_ratio": round(sse_par / max(sse_hash, 1), 4),
        }
    print(json.dumps(
        {"kmeans": res, "k": K, "k_parallel": K_PAR, "iterations": ITERS}
    ))


if __name__ == "__main__":
    main()
