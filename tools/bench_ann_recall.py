"""Measured recall@k for every approximate ANN QUERY path against the
brute-force ground truth (r16 follow-on to ``bench_dedup_recall.py``,
which closed the same gap for the near-dup PAIR paths).

The pair tier's recall is now measured against planted ground truth at
every production geometry; the top-k retrieval tier — ``cosine_topk_lsh``
banding, ``cosine_topk_ivf`` partial probe, ``cosine_topk_pq`` ADC+refine,
and the persisted IVF-PQ index — still carried only the small-fixture
pytest floors (``test_relational_extra.py``).  This harness measures
recall@k of each path's production-default knobs on the distinct-content
synth fixtures, with knob sweeps for the two that trade scan fraction
for recall (IVF ``nprobe``, PQ ``refine``), so the 100 TB knob table can
cite measured curves instead of FAISS folklore.

Ground truth is :func:`similarity.cosine_topk` (exact, recall provably
1); recall@k = |approx top-k ∩ exact top-k| / k, averaged over a
deterministic ``sample_key`` query sample.  Both sides use the same
(desc cos, asc match_id) tie-break, so the comparison is exact.

Usage: python tools/bench_ann_recall.py [sf_dirs...]
Prints one JSON line; paste into SCALE.md's "ANN retrieval recall" table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hyperdx_spark import get_spark  # noqa: E402
from hyperdx_spark.io import ensure_min_parallelism, load_table  # noqa: E402
from hyperdx_spark.pipeline import similarity  # noqa: E402
from hyperdx_spark.pipeline.sampling import sample_key  # noqa: E402

DIRS = sys.argv[1:] or [
    "/root/repo/.scale/synth_sf1",
    "/root/repo/.scale/synth_sf10",
]
N_QUERIES = 64
K = 10
SEED = 11


def _truth_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.select("query_id", "match_id").collect():
        out.setdefault(r["query_id"], set()).add(r["match_id"])
    return out


def _recall(truth: dict[int, set[int]], approx_df) -> float:
    got = _truth_sets(approx_df)
    vals = [
        len(t & got.get(q, set())) / len(t) for q, t in truth.items() if t
    ]
    return round(sum(vals) / len(vals), 4)


def measure_dir(spark, sf_dir: str, *, sweep: bool = False) -> dict:
    emb = (
        ensure_min_parallelism(load_table(spark, sf_dir, "embeddings"))
        .select("vec_id", "embedding")
        .persist()
    )
    n = emb.count()
    queries = (
        emb.orderBy(sample_key("vec_id", SEED), "vec_id")
        .limit(N_QUERIES)
        .persist()
    )
    queries.count()

    res: dict = {"sf_dir": sf_dir, "n": n, "k": K, "n_queries": N_QUERIES}
    try:
        t0 = time.monotonic()
        truth = _truth_sets(
            similarity.cosine_topk(emb, queries, k=K)
        )
        res["brute_s"] = round(time.monotonic() - t0, 2)

        # LSH banding at the cosine_topk_lsh defaults (16 planes x 4
        # bands, r=4 — recall-heavy: a 0.9-cosine neighbor collides with
        # p≈0.98 per the Charikar bound, but top-k neighbors on a real
        # corpus span a range of cosines, which is what this measures)
        t0 = time.monotonic()
        res["lsh_recall"] = _recall(
            truth,
            similarity.cosine_topk_lsh(emb, queries, k=K),
        )
        res["lsh_s"] = round(time.monotonic() - t0, 2)

        # IVF at the production shape nlist ~ sqrt(N) (knob-table row),
        # probing 1/4 of the lists
        nlist = max(16, int(n ** 0.5))
        nprobe = max(1, nlist // 4)
        t0 = time.monotonic()
        res["ivf_recall"] = _recall(
            truth,
            similarity.cosine_topk_ivf(
                emb, queries, k=K, nlist=nlist, nprobe=nprobe
            ),
        )
        res["ivf_s"] = round(time.monotonic() - t0, 2)
        res["ivf_nlist"], res["ivf_nprobe"] = nlist, nprobe

        # PQ at the defaults (m=8 x 16 codes over dim 64, refine=50)
        t0 = time.monotonic()
        res["pq_recall"] = _recall(
            truth,
            similarity.cosine_topk_pq(emb, queries, k=K),
        )
        res["pq_s"] = round(time.monotonic() - t0, 2)

        # persisted IVF-PQ index at the same coarse shape — residual
        # (IVFADC, the default) vs raw-vector encoding: once at the
        # operator defaults, once at the production corner
        # (codes=256 = 8-bit books, refine = 20·k)
        for tag, residual, codes, refine in (
            ("ivfpq", True, 16, 50),
            ("ivfpq_raw", False, 16, 50),
            ("ivfpq_prod", True, 256, 200),
            ("ivfpq_prod_raw", False, 256, 200),
        ):
            path = tempfile.mkdtemp(prefix="annrecall_")
            try:
                t0 = time.monotonic()
                similarity.build_ivfpq_index(
                    emb, path, nlist=nlist, codes=codes, residual=residual
                )
                res[f"{tag}_build_s"] = round(time.monotonic() - t0, 2)
                t0 = time.monotonic()
                res[f"{tag}_recall"] = _recall(
                    truth,
                    similarity.query_ivfpq_index(
                        spark, path, queries, k=K, nprobe=nprobe,
                        refine=refine,
                    ),
                )
                res[f"{tag}_s"] = round(time.monotonic() - t0, 2)
            finally:
                shutil.rmtree(path, ignore_errors=True)

        if sweep:
            # the two scan-fraction knobs, swept so the knob table can
            # cite a measured recall curve
            res["ivf_nprobe_sweep"] = {
                p: _recall(
                    truth,
                    similarity.cosine_topk_ivf(
                        emb, queries, k=K, nlist=nlist, nprobe=p
                    ),
                )
                for p in (1, 2, nprobe, nlist // 2)
            }
            res["pq_refine_sweep"] = {
                r: _recall(
                    truth,
                    similarity.cosine_topk_pq(emb, queries, k=K, refine=r),
                )
                for r in (K, 25, 50, 200)
            }
            # the other PQ recall lever: codebook size (bits per
            # subspace). 16 codes = 4 bits is the operator default; FAISS
            # practice is 256 (8 bits) — measure what each buys at the
            # default refine
            res["pq_codes_sweep"] = {
                c: _recall(
                    truth,
                    similarity.cosine_topk_pq(emb, queries, k=K, codes=c),
                )
                for c in (64, 256)
            }
            # full IVF-PQ encoding x codes x refine matrix: residual
            # (IVFADC) vs raw at both codebook sizes and both refine
            # depths — the measured basis for the knob-table guidance
            matrix = {}
            for residual in (True, False):
                for c in (16, 256):
                    path = tempfile.mkdtemp(prefix="annrecall_")
                    try:
                        similarity.build_ivfpq_index(
                            emb, path, nlist=nlist, codes=c,
                            residual=residual,
                        )
                        for r in (50, 200):
                            key = (
                                f"{'res' if residual else 'raw'}"
                                f"_codes{c}_refine{r}"
                            )
                            matrix[key] = _recall(
                                truth,
                                similarity.query_ivfpq_index(
                                    spark, path, queries, k=K,
                                    nprobe=nprobe, refine=r,
                                ),
                            )
                    finally:
                        shutil.rmtree(path, ignore_errors=True)
            res["ivfpq_matrix"] = matrix
    finally:
        queries.unpersist()
        emb.unpersist()
    return res


def main() -> None:
    spark = get_spark("bench-ann-recall", cpus=32)
    out = [
        measure_dir(spark, d, sweep=(i == 0)) for i, d in enumerate(DIRS)
    ]
    print(json.dumps({"ann_recall": out}))


if __name__ == "__main__":
    main()
