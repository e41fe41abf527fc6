"""CCNet-style perplexity filtering (pipeline/perplexity.py — Wenzek et al.
2019, public method): hashed bigram LM vs the pure-Python reference, the
exact integer filter decision, and plan-shape checks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hyperdx_spark.pipeline import perplexity as ppl

VOCAB = 128

TARGET = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog",
    "the cat and the dog sat",
]
RAW = [
    "the cat sat on the mat",          # in-distribution
    "the dog sat on the mat",          # near
    "zxqv wkrp jjft bbnm qqrs",        # garbage
    "cat",                             # 1 token: no bigrams
    "",                                # empty
    "the the the the the",             # degenerate repeat
]


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TARGET)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(RAW)], "doc_id long, text string"
    )


def test_fit_counts_match_python(spark, target):
    lm = ppl.bigram_lm_fit(target, vocab=VOCAB)
    c2, c1 = ppl.py_fit(TARGET, vocab=VOCAB)
    got2 = {
        (r["b1"], r["b2"]): r["c2"] for r in lm["bigrams"].collect()
    }
    got1 = {r["b1"]: r["c1"] for r in lm["unigrams"].collect()}
    assert got2 == c2
    assert got1 == c1
    # the conditional rows sum to their context count exactly
    for b1, c in c1.items():
        assert sum(v for (x, _), v in c2.items() if x == b1) == c


def test_scores_match_python_and_empty_docs_survive(spark, target, raw):
    lm = ppl.bigram_lm_fit(target, vocab=VOCAB)
    got = {
        r["doc_id"]: (r["lp_fp"], r["n_bigrams"])
        for r in ppl.perplexity_score(raw, lm).collect()
    }
    c2, c1 = ppl.py_fit(TARGET, vocab=VOCAB)
    want = {
        i: ppl.py_score(t, c2, c1, vocab=VOCAB) for i, t in enumerate(RAW)
    }
    assert got == want
    assert got[3] == (0, 0) and got[4] == (0, 0)  # no-bigram docs: zero rows


def test_filter_is_exact_integer_decision(spark, target, raw):
    lm = ppl.bigram_lm_fit(target, vocab=VOCAB)
    c2, c1 = ppl.py_fit(TARGET, vocab=VOCAB)
    # threshold between the in-distribution docs and the garbage doc
    nlls = {}
    for i, t in enumerate(RAW):
        lp_fp, n = ppl.py_score(t, c2, c1, vocab=VOCAB)
        if n:
            nlls[i] = -lp_fp / ppl.LAM_SCALE / n
    assert nlls[0] < nlls[2]  # target-like beats garbage
    thr = (nlls[0] + nlls[2]) / 2
    kept = {
        r["doc_id"]
        for r in ppl.perplexity_filter(raw, lm, thr).collect()
    }
    want = {i for i, v in nlls.items() if v <= thr} | {3, 4}  # keep_empty
    assert kept == want
    dropped = {
        r["doc_id"]
        for r in ppl.perplexity_filter(
            raw, lm, thr, keep_empty=False
        ).collect()
    }
    assert dropped == want - {3, 4}


def test_avg_nll_projection(spark, target, raw):
    lm = ppl.bigram_lm_fit(target, vocab=VOCAB)
    out = {
        r["doc_id"]: r
        for r in ppl.avg_nll_nats(ppl.perplexity_score(raw, lm)).collect()
    }
    c2, c1 = ppl.py_fit(TARGET, vocab=VOCAB)
    lp_fp, n = ppl.py_score(RAW[0], c2, c1, vocab=VOCAB)
    assert out[0]["avg_nll"] == pytest.approx(-lp_fp / ppl.LAM_SCALE / n)
    assert out[0]["perplexity"] == pytest.approx(math.exp(-lp_fp / ppl.LAM_SCALE / n))
    assert out[4]["avg_nll"] == 0.0 and out[4]["perplexity"] == 1.0


def test_partitioning_invariant(spark, target, raw):
    lm = ppl.bigram_lm_fit(target, vocab=VOCAB)
    a = ppl.perplexity_score(raw.repartition(5), lm)
    b = ppl.perplexity_score(raw.coalesce(1), lm)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_plan_shapes(spark, target, raw):
    lm = ppl.bigram_lm_fit(target, vocab=VOCAB)
    s = ppl.perplexity_score(raw, lm)
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "partial_sum" in plan
    f = ppl.perplexity_filter(raw, lm, 5.0)
    fp = f._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in fp
