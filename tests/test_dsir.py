"""DSIR importance resampling (pipeline/dsir.py — Xie et al. 2023, public
method): Spark plans vs the pure-Python reference implementation, plan-shape
checks, and the engine-portability invariants the gate oracle relies on."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hyperdx_spark.pipeline import dsir

BUCKETS = 32

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the five boxing wizards jump quickly",
    "sphinx of black quartz judge my vow",
    "how vexingly quick daft zebras jump",
    "the quick onyx goblin jumps over the lazy dwarf",
    "",
    "THE the The tHe",
    "a b c d e f g h i j",
    "lorem ipsum dolor sit amet consectetur adipiscing elit",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_bucket_counts_match_python(spark, docs):
    got = {
        r["bucket"]: r["cnt"]
        for r in dsir.bucket_counts(docs, buckets=BUCKETS).collect()
    }
    want: dict[int, int] = {}
    for t in TEXTS:
        for g in dsir.py_grams(t):
            b = dsir.py_bucket(g, BUCKETS)
            want[b] = want.get(b, 0) + 1
    assert got == want


def test_fit_and_weights_match_python(spark, docs):
    target = docs.where(F.col("doc_id") % 3 == 0)
    lam = dsir.dsir_fit(target, docs, buckets=BUCKETS)
    got_lam = {r["bucket"]: r["lam_fp"] for r in lam.collect()}
    want_lam = dsir.py_fit(
        [t for i, t in enumerate(TEXTS) if i % 3 == 0], TEXTS,
        buckets=BUCKETS,
    )
    assert got_lam == dict(enumerate(want_lam))
    w = dsir.dsir_weights(docs, lam, buckets=BUCKETS)
    got_w = {r["doc_id"]: r["dsir_lw_fp"] for r in w.collect()}
    want_w = {
        i: dsir.py_weight(t, want_lam, buckets=BUCKETS)
        for i, t in enumerate(TEXTS)
    }
    assert got_w == want_w
    # the empty document survives with weight exactly 0
    assert got_w[6] == 0


def test_lambda_table_is_dense_and_sums_like_a_distribution(spark, docs):
    lam = dsir.dsir_fit(docs, docs, buckets=BUCKETS).collect()
    assert sorted(r["bucket"] for r in lam) == list(range(BUCKETS))
    # target == raw -> every log ratio is exactly ln(1) = 0
    assert all(r["lam_fp"] == 0 for r in lam)


def test_resample_is_gumbel_topk_of_python_keys(spark, docs):
    target = docs.where(F.col("doc_id") % 3 == 0)
    lam_rows = dsir.py_fit(
        [t for i, t in enumerate(TEXTS) if i % 3 == 0], TEXTS,
        buckets=BUCKETS,
    )
    w = dsir.dsir_weights(
        docs, dsir.dsir_fit(target, docs, buckets=BUCKETS), buckets=BUCKETS
    )
    got = [
        (r["doc_id"], r["dsir_rank"])
        for r in dsir.dsir_resample(w, 4, seed=13).collect()
    ]

    def py_key(i: int) -> float:
        import hashlib

        h = int(
            hashlib.md5(f"{i}:13".encode()).hexdigest()[:15], 16
        )
        u = (h + 1.0) / (16.0**15 + 1.0)
        lw = dsir.py_weight(TEXTS[i], lam_rows, buckets=BUCKETS) / dsir.LAM_SCALE
        return lw + -math.log(-math.log(u))

    want = sorted(range(len(TEXTS)), key=py_key, reverse=True)[:4]
    assert [d for d, _ in got] == want
    assert [rk for _, rk in got] == [1, 2, 3, 4]


def test_select_end_to_end_and_temperature(spark, docs):
    target = docs.where(F.col("doc_id") % 3 == 0)
    out = dsir.dsir_select(docs, target, 3, buckets=BUCKETS)
    rows = out.collect()
    assert len(rows) == 3
    assert {"dsir_lw_fp", "dsir_rank"} <= set(out.columns)
    # temperature -> 0 approaches argmax-by-weight: with a huge inverse
    # temperature the top-1 must be the max-weight doc
    w = dsir.dsir_weights(
        docs, dsir.dsir_fit(target, docs, buckets=BUCKETS), buckets=BUCKETS
    )
    top = dsir.dsir_resample(w, 1, temperature=1e-9).collect()[0]
    best = max(w.collect(), key=lambda r: r["dsir_lw_fp"])
    assert top["doc_id"] == best["doc_id"]


def test_weights_partitioning_invariant(spark, docs):
    """The weight of a document must not depend on how the corpus is
    partitioned (row-local featurization + partial-agg sum)."""
    target = docs.where(F.col("doc_id") % 3 == 0)
    lam = dsir.dsir_fit(target, docs, buckets=BUCKETS)
    a = dsir.dsir_weights(docs.repartition(7), lam, buckets=BUCKETS)
    b = dsir.dsir_weights(docs.coalesce(1), lam, buckets=BUCKETS)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_plan_shapes(spark, docs):
    target = docs.where(F.col("doc_id") % 3 == 0)
    lam = dsir.dsir_fit(target, docs, buckets=BUCKETS)
    w = dsir.dsir_weights(docs, lam, buckets=BUCKETS)
    wp = w._jdf.queryExecution().executedPlan().toString()
    # the lambda join is broadcast, never a sort-merge shuffle join
    assert "BroadcastHashJoin" in wp and "SortMergeJoin" not in wp
    # partial aggregation before the doc-id shuffle
    assert "partial_sum" in wp
    sel = dsir.dsir_resample(w, 5)
    sp = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in sp


def test_ngram_orders(spark, docs):
    """n=1 is unigrams only; n=3 adds trigrams — counts match Python."""
    for n in (1, 3):
        got = {
            r["bucket"]: r["cnt"]
            for r in dsir.bucket_counts(docs, buckets=BUCKETS, n=n).collect()
        }
        want: dict[int, int] = {}
        for t in TEXTS:
            for g in dsir.py_grams(t, n):
                b = dsir.py_bucket(g, BUCKETS)
                want[b] = want.get(b, 0) + 1
        assert got == want
