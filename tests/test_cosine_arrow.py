"""score_pairs_arrow must be an EXACT twin of the Column-form cosine.

The r16 Arrow pair scorer replays dot()/norm()'s left-to-right IEEE fold
column-by-column over the stacked batch, so every produced double must be
bit-identical to the interpreted higher-order expression — including the
awkward corners: NULL vectors, NULL elements (zip_with propagation),
ragged pairs (zip_with padding), zero / underflow-zero norms (Spark's
NULL-on-zero-divisor doubles), NaN elements (a VALUE that passes
``cos >= t`` filters), infinities, float32 inputs (cast-before-multiply),
and empty vectors.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from hyperdx_spark.pipeline.similarity import cosine, score_pairs_arrow


def _eq_cell(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return repr(a) == repr(b)
    return a == b


def _compare(spark, rows, vec_type="array<double>"):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)],
        f"pid long, __va {vec_type}, __vb {vec_type}",
    ).coalesce(2)
    col_form = df.withColumn(
        "cos", cosine(F.col("__va"), F.col("__vb"))
    ).select("pid", "cos")
    arrow_form = score_pairs_arrow(df).select("pid", "cos")
    want = {r.pid: r.cos for r in col_form.collect()}
    got = {r.pid: r.cos for r in arrow_form.collect()}
    assert want.keys() == got.keys()
    bad = {
        p: (want[p], got[p]) for p in want if not _eq_cell(want[p], got[p])
    }
    assert not bad, f"cells diverge: {bad}"


def _rand_vec(rng, dim, pool):
    return [rng.choice(pool) for _ in range(dim)]


def test_cosine_arrow_exact_on_normal_vectors(spark):
    rng = random.Random(0xC05)
    rows = []
    for _ in range(300):
        dim = rng.choice([1, 2, 3, 7, 64])
        rows.append((
            [rng.gauss(0, 10) for _ in range(dim)],
            [rng.gauss(0, 10) for _ in range(dim)],
        ))
    _compare(spark, rows)


def test_cosine_arrow_exact_on_edge_values(spark):
    rng = random.Random(0xBEEF)
    pool = [
        0.0, -0.0, 1.0, -1.0, 1e-200, -1e-200, 1e200, -1e200,
        float("inf"), float("-inf"), float("nan"), 1e-320, 5.5, -3.25,
    ]
    rows = []
    for _ in range(300):
        dim = rng.choice([1, 2, 4, 8])
        rows.append((_rand_vec(rng, dim, pool), _rand_vec(rng, dim, pool)))
    # deterministic underflow corner: norms underflow to 0 while the dot
    # survives -> the Column form's 0-divisor NULL must be mirrored
    rows.append(([1e-200, 0.0], [1e200, 0.0]))
    rows.append(([1e-162] * 4, [1e-162] * 4))
    _compare(spark, rows)


def test_cosine_arrow_null_ragged_empty_contract(spark):
    rows = [
        (None, [1.0, 2.0]),            # NULL vector
        ([1.0, 2.0], None),
        (None, None),
        ([1.0, None], [1.0, 2.0]),     # NULL element
        ([None, None], [None, None]),
        ([1.0], [1.0, 2.0]),           # ragged (zip_with pads with NULL)
        ([1.0, 2.0, 3.0], [1.0, 2.0]),
        ([], []),                      # empty: 0.0 / 0.0 divisor -> NULL
        ([0.0, 0.0], [1.0, 2.0]),      # zero norm -> NULL divisor
        ([float("nan"), 1.0], [1.0, 1.0]),  # NaN is a VALUE, not NULL
        ([1.0, 2.0], [1.0, 2.0]),
    ]
    _compare(spark, rows)


def test_cosine_arrow_float32_cast_before_multiply(spark):
    rng = random.Random(0xF32)
    rows = []
    for _ in range(200):
        dim = rng.choice([1, 3, 64])
        rows.append((
            [rng.gauss(0, 3) for _ in range(dim)],
            [rng.gauss(0, 3) for _ in range(dim)],
        ))
    _compare(spark, rows, vec_type="array<float>")


def test_cosine_arrow_nan_passes_threshold_filter_like_column(spark):
    # Spark orders NaN greatest: a NaN cos passes `cos >= t` in BOTH forms
    df = spark.createDataFrame(
        [(1, [float("nan"), 1.0], [1.0, 1.0]), (2, [1.0, 0.0], [1.0, 0.0])],
        "pid long, __va array<double>, __vb array<double>",
    )
    col_pids = sorted(
        r.pid
        for r in df.withColumn("cos", cosine(F.col("__va"), F.col("__vb")))
        .where(F.col("cos") >= 0.5)
        .collect()
    )
    arrow_pids = sorted(
        r.pid
        for r in score_pairs_arrow(df).where(F.col("cos") >= 0.5).collect()
    )
    assert col_pids == arrow_pids == [1, 2]
