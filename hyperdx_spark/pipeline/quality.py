"""Trainable linear quality classifier — the fasttext-style seed filter of
CCNet (Wenzek'19 §4.3) / DCLM (Li'24 §4.2): train a cheap linear model on
"good" seed text vs raw crawl, score every document, keep the top.

The reference platform has no counterpart (this is pipeline tier, like
dedup/sampling); the design is Spark-first:

* features are hashed token buckets computed ENGINE-PORTABLY — bucket =
  ``int(md5(token)[:4], 16) % num_features`` — so scoring is replayable in
  any SQL engine (the driver's DuckDB oracle included) and training/serving
  skew is structurally impossible;
* training collects a BOUNDED, deterministically-chosen sample per class
  (seed corpora are small by construction — CCNet trains its filter on
  Wikipedia-sized seeds) and fits full-batch logistic regression in numpy:
  order-independent gradients + fixed iterations = bit-reproducible
  weights;
* scoring is row-local (no shuffle): a small weight vector rides the plan
  as a folded array literal, a large one ships inside an Arrow worker.
  Either way 100 TB scores in one pass over the text.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hyperdx_spark.pipeline.text import tokens

# above this many features the folded-literal lookup array stops being a
# reasonable plan constant; the column path refuses and callers use arrow
_COLUMN_PATH_MAX_FEATURES = 1024


# the engine-portable hash reads 4 hex chars = 16 bits; more features than
# that would leave buckets silently unreachable, so refuse loudly
MAX_NUM_FEATURES = 1 << 16


def _check_num_features(k: int) -> None:
    if not 1 <= k <= MAX_NUM_FEATURES:
        raise ValueError(
            f"num_features must be in [1, {MAX_NUM_FEATURES}] (the 16-bit"
            f" md5-prefix hash cannot reach buckets past that), got {k}"
        )


def _bucket(token: Column, num_features: int) -> Column:
    """md5-prefix hash bucket, identical in Spark and DuckDB:
    ``conv(substring(md5(t), 1, 4), 16, 10) % k`` == DuckDB
    ``('0x' || substr(md5(t), 1, 4))::INTEGER % k``."""
    h = F.conv(F.substring(F.md5(token), 1, 4), 16, 10).cast("int")
    return h % F.lit(num_features)


def hashed_feature_buckets(
    col: Column | str, *, num_features: int = 4096
) -> Column:
    """Per-document array of hashed token buckets (one entry per token,
    duplicates preserved — the count information lives in repetition)."""
    _check_num_features(num_features)
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(tokens(c), lambda t: _bucket(t, num_features))


def linear_quality_score(
    col: Column | str,
    weights: Sequence[float],
    bias: float,
    *,
    method: str = "auto",
) -> Column:
    """sigmoid(bias + mean token-bucket weight) as a row-local Column.

    Mean (not sum) matches the training features (bucket counts normalized
    by token count), so a long document is not automatically "higher
    quality". Empty documents score ``sigmoid(bias)``.

    ``method``: ``"arrow"`` scores in an Arrow worker with the numpy
    weight vector shipped in the closure — the measured fast path (the
    ``"column"`` spelling's per-token HOF aggregate is interpreted, not
    codegen'd: 9x slower at sf10 even with a 64-weight folded literal,
    tools/bench_quality_scale.py). ``"column"`` is pure Spark SQL over
    the engine-portable md5 buckets — the spelling any SQL engine (and
    the driver's DuckDB oracle) can replay verbatim. ``"auto"`` picks
    arrow except for weight vectors too large to fold when a caller
    explicitly asked for column. Both paths are value-equal
    (pytest-pinned to 1e-12)."""
    c = F.col(col) if isinstance(col, str) else col
    k = len(weights)
    if method not in ("auto", "arrow", "column"):
        raise ValueError(f"unknown scoring method: {method!r}")
    if method == "column" and k > _COLUMN_PATH_MAX_FEATURES:
        raise ValueError(
            f"column path folds the weights into the plan; {k} features"
            f" exceed the {_COLUMN_PATH_MAX_FEATURES} cap — use arrow"
        )
    if method == "column":
        w = F.array(*[F.lit(float(x)) for x in weights])
        buckets = hashed_feature_buckets(c, num_features=k)
        total = F.aggregate(
            buckets,
            F.lit(0.0),
            lambda acc, b: acc + F.element_at(w, b + F.lit(1)),
        )
        n = F.size(buckets)
        z = F.lit(float(bias)) + F.when(n > 0, total / n).otherwise(F.lit(0.0))
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    wv = np.asarray(list(weights), dtype=np.float64)
    b0 = float(bias)

    def _score(s):
        import hashlib
        import re as _re

        split = _re.compile(r"[^a-z0-9]+")
        # Zipf-shaped token streams: the per-batch weight cache turns a
        # million md5 calls into a few thousand (the bpe worker pattern)
        cache: dict = {}
        k = len(wv)

        def weight_of(t: str) -> float:
            w = cache.get(t)
            if w is None:
                h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:4], 16)
                w = wv[h % k]
                cache[t] = w
            return w

        def one(text) -> float:
            if text is None:
                z = b0
            else:
                toks = [t for t in split.split(str(text).lower()) if t]
                if not toks:
                    z = b0
                else:
                    z = b0 + sum(map(weight_of, toks)) / len(toks)
            return 1.0 / (1.0 + np.exp(-z))

        return s.map(one)

    return pandas_udf(_score, "double")(c)


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    *,
    text_col: str = "text",
    num_features: int = 4096,
    sample_per_class: int = 10_000,
    iters: int = 300,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> tuple[list[float], float]:
    """Fit the seed filter: deterministic per-class sample (ordered by
    ``md5(text)`` — engine-portable, content-addressed), bucket arrays
    computed IN SPARK (the exact serving featurizer), then full-batch
    logistic regression in numpy. Returns ``(weights, bias)``.

    Scale shape: the distributed work is one LINEAR scan per class (the
    deterministic sample is a TakeOrdered top-K by content hash — no
    shuffle, but the scan itself grows with the class corpus; seed
    corpora are small by construction). The driver then holds
    ``sample_per_class × 2`` rows of a k-wide matrix and the numpy fit is
    constant-time in the corpus — the 100 TB pass is the SCORING."""
    import numpy as np

    def _sample(df: DataFrame):
        rows = (
            df.select(
                hashed_feature_buckets(text_col, num_features=num_features).alias(
                    "__b"
                ),
                F.md5(F.col(text_col)).alias("__o"),
            )
            .orderBy("__o")
            .limit(sample_per_class)
            .collect()
        )
        return [r["__b"] for r in rows]

    pos, neg = _sample(positive), _sample(negative)
    n = len(pos) + len(neg)
    if n == 0 or not pos or not neg:
        raise ValueError("both classes need at least one sampled document")
    X = np.zeros((n, num_features), dtype=np.float64)
    y = np.zeros(n, dtype=np.float64)
    for i, buckets in enumerate(pos + neg):
        y[i] = 1.0 if i < len(pos) else 0.0
        if buckets:
            np.add.at(X[i], np.asarray(buckets, dtype=np.int64), 1.0)
            X[i] /= len(buckets)

    w = np.zeros(num_features, dtype=np.float64)
    b = 0.0
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * ((X.T @ g) / n + l2 * w)
        b -= lr * float(g.mean())
    return [float(x) for x in w], float(b)


def quality_filter(
    df: DataFrame,
    weights: Sequence[float],
    bias: float,
    *,
    text_col: str = "text",
    threshold: float = 0.5,
    score_col: Optional[str] = "quality_score",
    method: str = "auto",
) -> DataFrame:
    """Keep documents scoring >= *threshold*; optionally retain the score
    column. Row-local — composes with dedup/sampling without a shuffle."""
    scored = df.withColumn(
        score_col or "__q",
        linear_quality_score(text_col, weights, bias, method=method),
    )
    out = scored.where(F.col(score_col or "__q") >= F.lit(float(threshold)))
    return out if score_col else out.drop("__q")
