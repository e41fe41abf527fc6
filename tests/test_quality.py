"""Trainable quality classifier (pipeline/quality.py) — fasttext/CCNet-style
seed filtering: engine-portable hashed features, deterministic numpy
training, row-local scoring (Column and Arrow paths value-equal)."""

import hashlib
import math

import duckdb
import pytest

from pyspark.sql import functions as F

from hyperdx_spark.pipeline import quality


def _py_bucket(token: str, k: int) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:4], 16) % k


def _py_score(text: str, weights, bias: float) -> float:
    toks = [t for t in __import__("re").split(r"[^a-z0-9]+", text.lower()) if t]
    z = bias + (
        sum(weights[_py_bucket(t, len(weights))] for t in toks) / len(toks)
        if toks
        else 0.0
    )
    return 1.0 / (1.0 + math.exp(-z))


def test_hashed_buckets_match_duckdb_and_python(spark):
    rows = [("the quick brown fox",), ("jumps over 42 lazy dogs",)]
    df = spark.createDataFrame(rows, "text string")
    got = [
        list(r["b"])
        for r in df.select(
            quality.hashed_feature_buckets("text", num_features=64).alias("b")
        ).collect()
    ]
    want = [[_py_bucket(t, 64) for t in text.lower().split()] for (text,) in rows]
    assert got == want
    duck = duckdb.sql(
        "SELECT list_transform("
        "  list_filter(string_split_regex(lower(text), '[^a-zA-Z0-9]+'), t -> t != ''),"
        "  t -> ('0x' || substr(md5(t), 1, 4))::INTEGER % 64) AS b "
        "FROM (VALUES ('the quick brown fox'), ('jumps over 42 lazy dogs')) v(text)"
    ).fetchall()
    assert [list(r[0]) for r in duck] == want


def test_linear_score_column_path_matches_reference(spark):
    weights = [float((b * 37) % 21 - 10) for b in range(64)]
    rows = [("alpha beta gamma",), ("the and of",), ("",), (None,)]
    df = spark.createDataFrame(rows, "text string")
    got = [
        r["s"]
        for r in df.select(
            quality.linear_quality_score(
                "text", weights, -0.25, method="column"
            ).alias("s")
        ).collect()
    ]
    for g, (text,) in zip(got, rows):
        want = _py_score(text or "", weights, -0.25)
        assert abs(g - want) < 1e-12
    # empty / null docs score exactly sigmoid(bias)
    assert abs(got[2] - 1.0 / (1.0 + math.exp(0.25))) < 1e-12
    assert got[2] == got[3]


def test_linear_score_arrow_path_equals_column_semantics(spark):
    # the default (arrow) worker must match the driver-side reference
    # exactly (same hash, same mean, same sigmoid) at any k
    k = 2048
    weights = [float((b * 13) % 9 - 4) for b in range(k)]
    rows = [("some text with tokens",), ("zzz qqq",), ("",)]
    df = spark.createDataFrame(rows, "text string")
    got = [
        r["s"]
        for r in df.select(
            quality.linear_quality_score("text", weights, 0.5).alias("s")
        ).collect()
    ]
    for g, (text,) in zip(got, rows):
        assert abs(g - _py_score(text, weights, 0.5)) < 1e-12


def test_score_method_dispatch(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("a b",)], "text string")
    w64 = [float(i % 5 - 2) for i in range(64)]
    # column and arrow agree bit-for-bit at small k
    col_v = df.select(
        quality.linear_quality_score("text", w64, 0.1, method="column").alias("s")
    ).collect()[0]["s"]
    arr_v = df.select(
        quality.linear_quality_score("text", w64, 0.1, method="arrow").alias("s")
    ).collect()[0]["s"]
    assert abs(col_v - arr_v) < 1e-12
    # the column spelling refuses weight vectors too large to fold
    with _pytest.raises(ValueError):
        quality.linear_quality_score("text", [0.0] * 2048, 0.0, method="column")
    with _pytest.raises(ValueError):
        quality.linear_quality_score("text", w64, 0.0, method="nope")


def test_train_separates_synthetic_classes(spark):
    # positive docs draw from a "clean" vocabulary, negative from a noisy
    # one; a linear hashed model must separate them nearly perfectly
    pos_vocab = ["science", "history", "theory", "evidence", "journal"]
    neg_vocab = ["click", "free", "winner", "xxx", "casino"]
    pos_rows = [
        (" ".join(pos_vocab[(i + j) % 5] for j in range(8)),) for i in range(80)
    ]
    neg_rows = [
        (" ".join(neg_vocab[(i * 3 + j) % 5] for j in range(8)),) for i in range(80)
    ]
    pos = spark.createDataFrame(pos_rows, "text string")
    neg = spark.createDataFrame(neg_rows, "text string")
    w, b = quality.train_quality_classifier(
        pos, neg, num_features=256, sample_per_class=80, iters=200
    )
    # determinism: retraining yields bit-identical weights
    w2, b2 = quality.train_quality_classifier(
        pos, neg, num_features=256, sample_per_class=80, iters=200
    )
    assert w == w2 and b == b2

    scored_pos = pos.select(quality.linear_quality_score("text", w, b).alias("s"))
    scored_neg = neg.select(quality.linear_quality_score("text", w, b).alias("s"))
    acc_pos = scored_pos.where(F.col("s") >= 0.5).count() / 80
    acc_neg = scored_neg.where(F.col("s") < 0.5).count() / 80
    assert acc_pos >= 0.95 and acc_neg >= 0.95

    # quality_filter keeps the clean class and drops the noisy one
    mixed = pos.withColumn("label", F.lit(1)).unionByName(
        neg.withColumn("label", F.lit(0))
    )
    kept = quality.quality_filter(mixed, w, b, threshold=0.5)
    labels = [r["label"] for r in kept.collect()]
    assert sum(labels) / len(labels) >= 0.95
    assert "quality_score" in kept.columns
    # score_col=None drops the helper column
    assert "quality_score" not in quality.quality_filter(
        mixed, w, b, score_col=None
    ).columns


def test_train_requires_both_classes(spark):
    df = spark.createDataFrame([("text",)], "text string")
    empty = spark.createDataFrame([], "text string")
    with pytest.raises(ValueError):
        quality.train_quality_classifier(df, empty, num_features=16)


def test_quality_filter_plan_is_row_local(spark):
    # the serving path must add no Exchange: scan -> filter, nothing else
    df = spark.createDataFrame([("a b c",), ("d e f",)], "text string")
    out = quality.quality_filter(df, [1.0] * 64, 0.0, score_col=None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_num_features_hash_range_guard(spark):
    # the 16-bit md5-prefix hash can't reach buckets past 65536 — refuse
    import pytest as _pytest

    df = spark.createDataFrame([("a",)], "text string")
    with _pytest.raises(ValueError, match="16-bit"):
        quality.hashed_feature_buckets("text", num_features=1 << 17)
    # the boundary itself is fine
    quality.hashed_feature_buckets("text", num_features=1 << 16)
