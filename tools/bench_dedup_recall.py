"""Measured recall for the PRODUCTION near-dup configurations
(pipeline/similarity.py), r15 — closes the r14 verdict's loop: the
correctness gate exercises the provably-exact ``exhaustive`` configs, so
the banded / k-means-blocked paths' recall was guarded only by the
``lsh_expected_recall`` geometry warning.  This harness measures it.

Method: plant known near-duplicate pairs at controlled cosines.  For a
corpus vector v and target cosine s, the partner is
``|v| * (s*u + sqrt(1-s^2)*w)`` with u = v/|v| and w a deterministic unit
vector orthogonal to u — cos(v, partner) = s exactly (up to float eps).
Then run the production configs and count how many planted pairs each
reports:

* **banded LSH** (``cosine_pairs`` with a near-dup geometry, 128 planes x
  8 bands => r=16): recall at each tier vs the Charikar'02 prediction
  ``1-(1-p^r)^b`` — the measurement validates the formula the
  ``min_expected_recall`` guard relies on.
* **SemDeDup blocked** (k-means‖ clusters + within-cluster exhaustive
  pairs): a planted pair is found iff both endpoints land in the same
  cluster (within a cluster the pair join is provably exhaustive —
  pytest-pinned), so blocked recall == same-cluster fraction; measured at
  SemDeDup-realistic k = N/100, which only the r15 ``parallel`` init makes
  feasible (farthest-first would be k sequential jobs).

Usage: python tools/bench_dedup_recall.py [sf_dirs...]
Prints one JSON line; paste into SCALE.md's "banded recall" table.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hyperdx_spark import get_spark  # noqa: E402
from hyperdx_spark.io import ensure_min_parallelism, load_table  # noqa: E402
from hyperdx_spark.pipeline import clustering, similarity  # noqa: E402
from hyperdx_spark.pipeline.sampling import sample_key  # noqa: E402

DIRS = sys.argv[1:] or ["/root/repo/.scale/sf1", "/root/repo/.scale/sf10"]
TIERS = (0.75, 0.85, 0.95)
PER_TIER = 300
# near-dup production geometry: r=16 rows/band keeps buckets tiny at
# 200k+ rows (2^16 bucket space per band) — precision-heavy by design,
# which is exactly what the measurement should show at the low tiers
NUM_PLANES, BANDS = 128, 8
THRESHOLD = 0.7


def plant_pairs(spark, emb_df, tiers=TIERS, per_tier=PER_TIER, *, seed=7):
    """Append one synthetic partner at each target cosine for a
    deterministic sample of corpus vectors.  Returns
    ``(augmented_df, {tier: [(base_id, partner_id), ...]})``; partner ids
    start above max(vec_id), so planted pairs are (base, partner) in
    id_a < id_b order."""
    import numpy as np

    need = per_tier * len(tiers)
    base = (
        emb_df.select("vec_id", "embedding")
        .orderBy(sample_key("vec_id", seed), "vec_id")
        .limit(need * 2)  # headroom for zero-norm skips
        .collect()
    )
    max_id = emb_df.agg(F.max("vec_id")).collect()[0][0]
    next_id = int(max_id) + 1
    rows, planted = [], {t: [] for t in tiers}
    it = iter(base)
    for t in tiers:
        got = 0
        while got < per_tier:
            row = next(it)
            v = np.asarray(row["embedding"], dtype=np.float64)
            nv = float(np.linalg.norm(v))
            if nv == 0.0:
                continue
            u = v / nv
            # deterministic reference orthogonalized against u
            r = np.array(
                [math.sin(row["vec_id"] * 97.0 + j * 13.0) for j in range(len(v))]
            )
            w = r - float(r @ u) * u
            nw = float(np.linalg.norm(w))
            if nw < 1e-9:
                continue
            p = nv * (t * u + math.sqrt(1.0 - t * t) * (w / nw))
            rows.append((next_id, [float(x) for x in p]))
            planted[t].append((int(row["vec_id"]), next_id))
            next_id += 1
            got += 1
    aug = emb_df.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    )
    return aug, planted


def measure_recall(pairs_df, planted, spark):
    """Fraction of each tier's planted (id_a, id_b) pairs present in the
    operator's output — one semi-join per tier, no pair collect."""
    out = {}
    for t, pp in planted.items():
        exp = spark.createDataFrame(pp, "id_a long, id_b long")
        found = pairs_df.join(exp, on=["id_a", "id_b"], how="left_semi").count()
        out[t] = round(found / len(pp), 4)
    return out


def main() -> None:
    spark = get_spark("bench-dedup-recall", cpus=32)
    res = {}
    for sf_dir in DIRS:
        tag = sf_dir.rsplit("/", 1)[-1]
        emb = ensure_min_parallelism(load_table(spark, sf_dir, "embeddings"))
        n = emb.count()
        aug, planted = plant_pairs(spark, emb)
        aug = aug.persist()
        aug.count()

        # banded production path — min_expected_recall=None is the
        # explicit, documented trade: this geometry is precision-heavy at
        # the 0.75 tier and the whole point is to MEASURE that
        t0 = time.monotonic()
        banded = similarity.cosine_pairs(
            aug, id_col="vec_id", threshold=THRESHOLD,
            num_planes=NUM_PLANES, bands=BANDS,
            min_expected_recall=None,
        )
        banded_recall = measure_recall(banded, planted, spark)
        banded_s = round(time.monotonic() - t0, 2)
        predicted = {
            t: round(similarity.lsh_expected_recall(t, NUM_PLANES, BANDS), 4)
            for t in TIERS
        }

        # SemDeDup blocked path at realistic k = N/100 (k-means‖ init)
        k = max(16, n // 100)
        t0 = time.monotonic()
        cents = clustering.kmeans_fit(
            aug, k, iterations=3, init="parallel"
        )
        assigned = clustering.kmeans_assign(
            aug, cents, method="arrow", cluster_col="cluster"
        ).select("vec_id", "cluster").persist()
        assigned.count()
        fit_s = round(time.monotonic() - t0, 2)
        # blocked recall == same-cluster fraction: within a cluster the
        # exhaustive pair join has recall 1 (pytest-pinned), and every
        # planted pair is above THRESHOLD by construction
        t0 = time.monotonic()
        a = assigned.withColumnsRenamed({"vec_id": "id_a", "cluster": "ca"})
        b = assigned.withColumnsRenamed({"vec_id": "id_b", "cluster": "cb"})
        blocked_recall = {}
        for t, pp in planted.items():
            exp = spark.createDataFrame(pp, "id_a long, id_b long")
            same = (
                exp.join(F.broadcast(a), on="id_a")
                .join(F.broadcast(b), on="id_b")
                .where(F.col("ca") == F.col("cb"))
                .count()
            )
            blocked_recall[t] = round(same / len(pp), 4)
        blocked_s = round(time.monotonic() - t0, 2)
        assigned.unpersist()
        aug.unpersist()

        res[tag] = {
            "vectors": n,
            "banded_recall": banded_recall,
            "banded_predicted": predicted,
            "banded_s": banded_s,
            "blocked_k": k,
            "blocked_recall": blocked_recall,
            "blocked_fit_s": fit_s,
            "blocked_measure_s": blocked_s,
        }
    print(json.dumps({
        "dedup_recall": res,
        "geometry": {"num_planes": NUM_PLANES, "bands": BANDS,
                     "threshold": THRESHOLD},
        "per_tier_pairs": PER_TIER,
    }))


if __name__ == "__main__":
    main()
