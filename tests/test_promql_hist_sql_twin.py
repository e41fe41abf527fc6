"""SQL-fragment twins of the former Column-built native-histogram helpers.

r16 optimization: promql's native-histogram expression trees are now built
as Spark-SQL TEXT (one parse RPC) instead of Column-by-Column py4j calls
(~2 ms per op; a single histogram_fraction construction was ~3,000 RPCs).
These tests keep the ORIGINAL Column builders as the reference twin and
assert the SQL fragments evaluate bit-identically on a fixture that covers
every branch: empty bucket arrays, shift 0 pass-through, real downscale
merges, disjoint/overlapping pair ranges, and out-of-range element lookups.

The composed paths (rate / sum / avg / binop / quantile / stdvar /
fraction) stay pinned by tests/test_promql_native_hist.py golden values and
the strict q_promql_features oracle gate.
"""

from pyspark.sql import Column, functions as F

from hyperdx_spark.promql import (
    _sql_h_buckets,
    _sql_h_down,
    _sql_h_elem,
    _sql_h_pair,
    _sql_h_struct,
)

# ---------------------------------------------------------------------------
# The pre-r16 Column builders, verbatim (the reference twin).
# ---------------------------------------------------------------------------


def _col_h_elem(cnt: Column, off: Column, i: Column) -> Column:
    return F.when(
        (i >= off) & (i <= off + F.size(cnt) - 1),
        F.element_at(cnt, (i - off + 1).cast("int")),
    ).otherwise(F.lit(0.0))


def _col_h_down(cnt: Column, off: Column, shift: Column) -> tuple:
    div = F.pow(F.lit(2.0), shift.cast("double"))
    noff = F.floor(off.cast("double") / div).cast("long")
    last = off.cast("long") + F.size(cnt) - 1
    nlast = F.floor(last.cast("double") / div).cast("long")
    merged = F.transform(
        F.sequence(noff, nlast),
        lambda j: F.aggregate(
            F.zip_with(
                cnt,
                F.sequence(off.cast("long"), off.cast("long") + F.size(cnt) - 1),
                lambda c, i: F.when(
                    F.floor(i.cast("double") / div).cast("long") == j, c
                ).otherwise(F.lit(0.0)),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )
    empty = F.array().cast("array<double>")
    return (
        F.when(F.size(cnt) == 0, F.lit(0).cast("long")).otherwise(
            F.when(shift == 0, off.cast("long")).otherwise(noff)
        ),
        F.when(F.size(cnt) == 0, empty).otherwise(
            F.when(shift == 0, cnt).otherwise(merged)
        ),
    )


def _col_h_pair(a_off, a_cnt, b_off, b_cnt, op) -> tuple:
    a_ne, b_ne = F.size(a_cnt) > 0, F.size(b_cnt) > 0
    a_last = a_off + F.size(a_cnt) - 1
    b_last = b_off + F.size(b_cnt) - 1
    lo = (
        F.when(a_ne & b_ne, F.least(a_off, b_off))
        .when(a_ne, a_off)
        .otherwise(b_off)
    ).cast("long")
    hi = (
        F.when(a_ne & b_ne, F.greatest(a_last, b_last))
        .when(a_ne, a_last)
        .otherwise(b_last)
    ).cast("long")
    cnts = F.when(~a_ne & ~b_ne, F.array().cast("array<double>")).otherwise(
        F.transform(
            F.sequence(lo, hi),
            lambda i: op(_col_h_elem(a_cnt, a_off, i), _col_h_elem(b_cnt, b_off, i)),
        )
    )
    return F.when(~a_ne & ~b_ne, F.lit(0).cast("long")).otherwise(lo), cnts


def _col_h_buckets(h: Column, zero_lower: Column, zero_upper: Column) -> Column:
    invs = F.pow(F.lit(2.0), -h["schema"].cast("double"))

    def bound(i: Column) -> Column:
        return F.pow(F.lit(2.0), i.cast("double") * invs)

    bkt = "array<struct<lower:double,upper:double,cnt:double>>"
    negs = F.when(F.size(h["neg_counts"]) == 0, F.array().cast(bkt)).otherwise(
        F.transform(
            F.sequence(
                h["neg_offset"].cast("long") + F.size(h["neg_counts"]) - 1,
                h["neg_offset"].cast("long"),
                F.lit(-1),
            ),
            lambda i: F.struct(
                (-bound(i + 1)).alias("lower"),
                (-bound(i)).alias("upper"),
                _col_h_elem(h["neg_counts"], h["neg_offset"], i).alias("cnt"),
            ),
        )
    )
    zero = F.array(
        F.struct(
            zero_lower.alias("lower"),
            zero_upper.alias("upper"),
            h["zero_count"].alias("cnt"),
        )
    )
    poss = F.when(F.size(h["pos_counts"]) == 0, F.array().cast(bkt)).otherwise(
        F.transform(
            F.sequence(
                h["pos_offset"].cast("long"),
                h["pos_offset"].cast("long") + F.size(h["pos_counts"]) - 1,
            ),
            lambda i: F.struct(
                bound(i).alias("lower"),
                bound(i + 1).alias("upper"),
                _col_h_elem(h["pos_counts"], h["pos_offset"], i).alias("cnt"),
            ),
        )
    )
    return F.concat(negs, zero, poss)


# ---------------------------------------------------------------------------
# Fixture: dense bucket rows covering the edge branches.
# ---------------------------------------------------------------------------

ROWS_DDL = "off int, cnt array<double>, boff int, bcnt array<double>, shift int"
ROWS = [
    (0, [1.0, 2.0, 3.0], 0, [5.0], 0),          # shift-0 pass-through
    (3, [1.0, 2.0, 3.0, 4.0], -1, [2.0, 7.0], 1),  # real downscale, overlap
    (-5, [0.5, 0.0, 1.5], 2, [1.0, 1.0], 2),    # negative offsets, disjoint
    (0, [], 4, [9.0], 3),                        # left empty
    (7, [4.0], 0, [], 1),                        # right empty
    (0, [], 0, [], 2),                           # both empty
    (-3, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0], 0, [1.0], 2),
]

HIST_DDL = (
    "struct<schema:int, zero_count:double, zero_threshold:double, "
    "count:double, sum:double, pos_offset:int, pos_counts:array<double>, "
    "neg_offset:int, neg_counts:array<double>>"
)
HROWS = [
    {"schema": 0, "zero_count": 2.0, "zero_threshold": 2.0 ** -128,
     "count": 8.0, "sum": 13.5, "pos_offset": 0, "pos_counts": [1.0, 2.0],
     "neg_offset": -1, "neg_counts": [3.0]},
    {"schema": 1, "zero_count": 0.0, "zero_threshold": 0.25,
     "count": 4.0, "sum": 9.0, "pos_offset": -2, "pos_counts": [4.0],
     "neg_offset": 0, "neg_counts": []},
    {"schema": -1, "zero_count": 1.0, "zero_threshold": 2.0 ** -128,
     "count": 1.0, "sum": 0.0, "pos_offset": 0, "pos_counts": [],
     "neg_offset": 2, "neg_counts": [1.0, 0.0, 2.0]},
    {"schema": 0, "zero_count": 0.0, "zero_threshold": 2.0 ** -128,
     "count": 0.0, "sum": 0.0, "pos_offset": 0, "pos_counts": [],
     "neg_offset": 0, "neg_counts": []},
]


def _rows_df(spark):
    return spark.createDataFrame(ROWS, ROWS_DDL)


def _assert_same(df, col_expr, sql_text):
    got = df.select(
        col_expr.alias("ref"), F.expr(sql_text).alias("new")
    ).collect()
    for r in got:
        assert r["ref"] == r["new"], (r["ref"], r["new"])


def test_h_elem_twin(spark):
    df = _rows_df(spark)
    for i in (-6, -1, 0, 1, 3, 9):
        _assert_same(
            df,
            _col_h_elem(F.col("cnt"), F.col("off"), F.lit(i).cast("long")),
            _sql_h_elem("cnt", "off", f"CAST({i} AS BIGINT)"),
        )


def test_h_down_twin(spark):
    df = _rows_df(spark)
    ro, rc = _col_h_down(F.col("cnt"), F.col("off"), F.col("shift"))
    so, sc = _sql_h_down("cnt", "off", "shift")
    _assert_same(df, ro, so)
    _assert_same(df, rc, sc)


def test_h_pair_twin(spark):
    df = _rows_df(spark)
    for pyop, sqlop in ((lambda x, y: x + y, "+"), (lambda x, y: x - y, "-")):
        ro, rc = _col_h_pair(
            F.col("off").cast("long"), F.col("cnt"),
            F.col("boff").cast("long"), F.col("bcnt"), pyop,
        )
        so, sc = _sql_h_pair(
            "CAST(off AS BIGINT)", "cnt", "CAST(boff AS BIGINT)", "bcnt", sqlop
        )
        _assert_same(df, ro, so)
        _assert_same(df, rc, sc)


def test_h_struct_twin(spark):
    df = _rows_df(spark)
    ref = F.struct(
        F.lit(1).cast("int").alias("schema"),
        F.lit(0.5).cast("double").alias("zero_count"),
        F.lit(2.0 ** -128).cast("double").alias("zero_threshold"),
        F.col("off").cast("double").alias("count"),
        F.lit(3.25).cast("double").alias("sum"),
        F.col("boff").cast("int").alias("pos_offset"),
        F.col("cnt").cast("array<double>").alias("pos_counts"),
        F.lit(0).cast("int").alias("neg_offset"),
        F.col("bcnt").cast("array<double>").alias("neg_counts"),
    )
    new = _sql_h_struct(
        "1", "0.5D", f"{2.0 ** -128!r}D", "off", "3.25D",
        "boff", "cnt", "0", "bcnt",
    )
    _assert_same(df, ref, new)


def test_h_buckets_twin(spark):
    df = spark.createDataFrame([(h,) for h in HROWS], f"__hist {HIST_DDL}")
    h = F.col("__hist")
    variants = [
        # quantile zero bounds
        (
            F.when(F.size(h["neg_counts"]) > 0, -h["zero_threshold"]).otherwise(
                F.lit(0.0)
            ),
            h["zero_threshold"],
            "CASE WHEN size(__hist.neg_counts) > 0 "
            "THEN -__hist.zero_threshold ELSE 0.0D END",
            "__hist.zero_threshold",
        ),
        # stdvar zero bounds
        (
            -h["zero_threshold"],
            h["zero_threshold"],
            "-__hist.zero_threshold",
            "__hist.zero_threshold",
        ),
        # fraction zero bounds
        (
            F.when(
                (F.size(h["neg_counts"]) == 0) & (F.size(h["pos_counts"]) > 0),
                F.lit(0.0),
            ).otherwise(-h["zero_threshold"]),
            F.when(
                (F.size(h["pos_counts"]) == 0) & (F.size(h["neg_counts"]) > 0),
                F.lit(0.0),
            ).otherwise(h["zero_threshold"]),
            "CASE WHEN size(__hist.neg_counts) = 0 "
            "AND size(__hist.pos_counts) > 0 THEN 0.0D "
            "ELSE -__hist.zero_threshold END",
            "CASE WHEN size(__hist.pos_counts) = 0 "
            "AND size(__hist.neg_counts) > 0 THEN 0.0D "
            "ELSE __hist.zero_threshold END",
        ),
    ]
    for ref_lo, ref_up, sql_lo, sql_up in variants:
        _assert_same(
            df,
            _col_h_buckets(h, ref_lo, ref_up),
            _sql_h_buckets("__hist", sql_lo, sql_up),
        )
