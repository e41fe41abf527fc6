"""Full-output twin of the pre-r16 Column-built exp_histogram_quantile.

r16 optimization: metrics.exp_histogram_quantile was the heaviest remaining
query constructor (2141 py4j RPCs ≈ 2.1 s of pure driver latency before any
job ran).  The engine now builds the identical expression trees as Spark-SQL
text staged through selectExpr projections.  This test keeps the ORIGINAL
Column implementation verbatim as the reference twin and asserts the two
produce bit-identical output (floats compared by repr) over fixtures that
cover every branch: cumulative first-point / start==ts / start-change /
count-decrease resets, offset shifts both directions on alignment, mixed
scales (downscale merge), negative buckets, empty sides, the zero bucket,
delta temporality, group_cols, and multiple time buckets.

The composed paths stay pinned by tests/test_metrics.py golden values and
the strict q_exp_histogram oracle gate.
"""

from datetime import datetime
from typing import Optional, Sequence

import pytest
from pyspark.sql import Column, DataFrame, Window, functions as F

from hyperdx_spark import metrics
from hyperdx_spark.metrics import _bucket, exp_histogram_quantile

# ---------------------------------------------------------------------------
# The pre-r16 Column implementation, verbatim (the reference twin).
# ---------------------------------------------------------------------------


def _empty_longs() -> Column:
    return F.array().cast("array<bigint>")


def _index_range(off: Column, counts: Column) -> Column:
    return F.when(
        F.size(counts) > 0,
        F.sequence(off.cast("long"), off.cast("long") + F.size(counts) - 1),
    ).otherwise(_empty_longs())


def _resize(arr: Column, n: Column) -> Column:
    padded = F.concat(
        arr, F.array_repeat(F.lit(0).cast("bigint"), F.greatest(n - F.size(arr), F.lit(0)))
    )
    return F.slice(padded, 1, n)


def _downscale(counts: Column, off: Column, divisor: Column, norm_off: Column) -> Column:
    last = off + F.size(counts) - 1
    norm_last = F.floor(last.cast("double") / divisor).cast("long")
    return F.when(F.size(counts) == 0, _empty_longs()).otherwise(
        F.transform(
            F.sequence(norm_off, norm_last),
            lambda j: F.aggregate(
                F.zip_with(
                    counts,
                    F.sequence(off.cast("long"), off.cast("long") + F.size(counts) - 1),
                    lambda c, i: F.when(
                        F.floor(i.cast("double") / divisor).cast("long") == j, c
                    ).otherwise(F.lit(0)),
                ),
                F.lit(0).cast("bigint"),
                lambda a, x: a + x,
            ),
        )
    )


def exp_histogram_quantile_columns(
    df: DataFrame,
    *,
    ts: str,
    start_ts: str,
    scale: str,
    zero_count: str,
    pos_offset: str,
    pos_counts: str,
    neg_offset: str,
    neg_counts: str,
    series_cols: Sequence[str],
    bucket_seconds: int,
    level: float,
    group_cols: Sequence[str] = (),
    temporality_col: Optional[str] = None,
    bucket_alias: str = "__timestamp",
    value_alias: str = "p",
) -> DataFrame:
    gcols = list(group_cols)
    min_scale = df.agg(F.min(F.col(scale)).alias("__min_scale"))
    d = df.crossJoin(F.broadcast(min_scale))
    shift = (F.col(scale) - F.col("__min_scale")).cast("int")
    d = d.withColumn("__div", F.pow(F.lit(2.0), shift).cast("long"))
    for side, off_c, cnt_c in (
        ("pos", pos_offset, pos_counts),
        ("neg", neg_offset, neg_counts),
    ):
        norm_off = F.floor(
            F.col(off_c).cast("double") / F.col("__div")
        ).cast("long")
        d = d.withColumn(f"__{side}_off", norm_off).withColumn(
            f"__{side}_cnt",
            F.when(F.col("__div") == 1, F.col(cnt_c).cast("array<bigint>")).otherwise(
                _downscale(
                    F.col(cnt_c).cast("array<bigint>"),
                    F.col(off_c).cast("long"),
                    F.col("__div"),
                    norm_off,
                )
            ),
        )
    d = d.select(
        F.col(ts).alias("__ts"),
        F.col(start_ts).alias("__start"),
        F.col("__min_scale").alias("__scale"),
        F.col(zero_count).cast("long").alias("__zero"),
        "__pos_off",
        "__pos_cnt",
        "__neg_off",
        "__neg_cnt",
        *[F.col(c) for c in dict.fromkeys([*series_cols, *gcols])],
        (
            F.col(temporality_col) if temporality_col is not None else F.lit(2)
        ).alias("__temp"),
    )

    w = Window.partitionBy(*[F.col(c) for c in series_cols]).orderBy("__ts")
    cum = d.where(F.col("__temp") == 2)
    for side in ("pos", "neg"):
        cur_cnt, cur_off = F.col(f"__{side}_cnt"), F.col(f"__{side}_off")
        prev_cnt = F.lag(cur_cnt, 1).over(w)
        prev_off = F.lag(cur_off, 1).over(w)
        cum = (
            cum.withColumn(f"__{side}_prev", prev_cnt)
            .withColumn(f"__{side}_prev_off", prev_off)
        )
    cum = (
        cum.withColumn("__prev_zero", F.lag(F.col("__zero"), 1).over(w))
        .withColumn("__prev_start", F.lag(F.col("__start"), 1).over(w))
        .withColumn("__is_first", F.lag(F.col("__ts"), 1).over(w).isNull())
    )
    for side in ("pos", "neg"):
        cur_cnt, cur_off = F.col(f"__{side}_cnt"), F.col(f"__{side}_off")
        prev_cnt = F.coalesce(F.col(f"__{side}_prev"), _empty_longs())
        prev_off = F.coalesce(F.col(f"__{side}_prev_off"), cur_off)
        aligned = _resize(
            F.concat(
                F.array_repeat(
                    F.lit(0).cast("bigint"),
                    F.greatest(
                        (prev_off - cur_off).cast("int"), F.lit(0)
                    ),
                ),
                F.slice(
                    prev_cnt,
                    (F.lit(1) + F.greatest((cur_off - prev_off).cast("int"), F.lit(0))),
                    F.greatest(F.size(prev_cnt), F.lit(1)),
                ),
            ),
            F.size(cur_cnt),
        )
        cum = cum.withColumn(f"__{side}_aligned", aligned)
    for side in ("pos", "neg"):
        cur_cnt = F.col(f"__{side}_cnt")
        aligned = F.col(f"__{side}_aligned")
        prev_cnt = F.coalesce(F.col(f"__{side}_prev"), _empty_longs())
        deltas = F.zip_with(cur_cnt, aligned, lambda a, b: a - b)
        asum = lambda c: F.aggregate(c, F.lit(0).cast("bigint"), lambda a, x: a + x)  # noqa: E731
        decreased = (
            F.coalesce(F.array_min(deltas) < 0, F.lit(False))
            | (asum(prev_cnt) > asum(aligned))
        )
        cum = cum.withColumn(f"__{side}_deltas", deltas).withColumn(
            f"__{side}_decreased", decreased
        )
    use_zero = F.col("__is_first") | (F.col("__start") == F.col("__ts"))
    use_current = ~use_zero & (
        (F.col("__start") != F.col("__prev_start"))
        | (F.col("__zero") < F.col("__prev_zero"))
        | F.col("__pos_decreased")
        | F.col("__neg_decreased")
    )
    use_current = F.coalesce(use_current, F.lit(True))

    def _branch(side: str) -> "tuple[Column, Column]":
        idxs = F.when(use_zero, _empty_longs()).otherwise(
            _index_range(F.col(f"__{side}_off"), F.col(f"__{side}_cnt"))
        )
        cnts = (
            F.when(use_zero, _empty_longs())
            .when(use_current, F.col(f"__{side}_cnt"))
            .otherwise(F.col(f"__{side}_deltas"))
        )
        return idxs, cnts

    pos_i, pos_c = _branch("pos")
    neg_i, neg_c = _branch("neg")
    cum_out = cum.select(
        "__ts",
        "__scale",
        *gcols,
        F.when(use_zero, F.lit(0))
        .when(use_current, F.col("__zero"))
        .otherwise(F.col("__zero") - F.col("__prev_zero"))
        .alias("__zero_d"),
        pos_i.alias("__pos_i"),
        pos_c.alias("__pos_c"),
        neg_i.alias("__neg_i"),
        neg_c.alias("__neg_c"),
    )

    delta_out = d.where(F.col("__temp") == 1).select(
        "__ts",
        "__scale",
        *gcols,
        F.col("__zero").alias("__zero_d"),
        _index_range(F.col("__pos_off"), F.col("__pos_cnt")).alias("__pos_i"),
        F.col("__pos_cnt").alias("__pos_c"),
        _index_range(F.col("__neg_off"), F.col("__neg_cnt")).alias("__neg_i"),
        F.col("__neg_cnt").alias("__neg_c"),
    )
    unioned = cum_out.unionByName(delta_out)

    b = _bucket(F.col("__ts"), bucket_seconds).alias(bucket_alias)
    entries = F.concat(
        F.array(F.struct(F.lit(0).alias("side"), F.lit(0).cast("long").alias("idx"), F.col("__zero_d").cast("long").alias("cnt"))),
        F.zip_with(
            F.col("__pos_i"),
            F.col("__pos_c"),
            lambda i, c: F.struct(
                F.lit(1).alias("side"), i.alias("idx"), c.cast("long").alias("cnt")
            ),
        ),
        F.zip_with(
            F.col("__neg_i"),
            F.col("__neg_c"),
            lambda i, c: F.struct(
                F.lit(-1).alias("side"), i.alias("idx"), c.cast("long").alias("cnt")
            ),
        ),
    )
    exploded = unioned.select(
        b, *gcols, F.col("__scale"), F.explode(entries).alias("__e")
    )
    summed = exploded.groupBy(
        bucket_alias, *gcols, F.col("__e.side").alias("__side"), F.col("__e.idx").alias("__idx")
    ).agg(F.sum("__e.cnt").alias("__cnt"), F.first("__scale").alias("__scale"))

    assembled = summed.groupBy(bucket_alias, *gcols).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("__side").alias("s"),
                    (F.col("__side") * F.col("__idx")).alias("k"),
                    F.col("__idx").alias("idx"),
                    F.col("__cnt").alias("cnt"),
                )
            )
        ).alias("__b"),
        F.first("__scale").alias("__scale"),
    )
    counts = F.transform(F.col("__b"), lambda s: s["cnt"].cast("double"))
    assembled = assembled.withColumn("__counts", counts)
    assembled = assembled.withColumn(
        "__cum",
        F.expr(
            "transform(__counts, (x, i) -> aggregate(slice(__counts, 1, i + 1),"
            " CAST(0.0 AS DOUBLE), (a, c) -> a + c))"
        ),
    )
    total = F.element_at("__cum", -1)
    rank = F.lit(level) * total
    assembled = assembled.withColumn("__rank", rank).withColumn("__total", total)
    sel = F.expr(
        "array_position(zip_with(__cum, __counts, (c, n) -> n > 0 AND c >= __rank), true)"
    )
    assembled = (
        assembled.withColumn("__i", sel)
        .where((F.col("__total") > 0) & (F.col("__i") > 0))
        .withColumn("__sel", F.element_at("__b", F.col("__i").cast("int")))
        .withColumn(
            "__cum_before",
            F.when(F.col("__i") <= 1, F.lit(0.0)).otherwise(
                F.element_at("__cum", (F.col("__i") - 1).cast("int"))
            ),
        )
    )
    frac = (F.col("__rank") - F.col("__cum_before")) / F.element_at(
        "__counts", F.col("__i").cast("int")
    )
    sel_side = F.col("__sel.s")
    sel_idx = F.col("__sel.idx").cast("double")
    inv_scale = F.pow(F.lit(2.0), -F.col("__scale").cast("double"))
    value = (
        F.when(sel_side < 0, -F.pow(F.lit(2.0), (sel_idx + 1 - frac) * inv_scale))
        .when(sel_side > 0, F.pow(F.lit(2.0), (sel_idx + frac) * inv_scale))
        .otherwise(F.lit(0.0))
    )
    return assembled.select(bucket_alias, *gcols, value.alias(value_alias))


# ---------------------------------------------------------------------------
# Fixtures
# ---------------------------------------------------------------------------

SCHEMA = (
    "ts timestamp, st timestamp, sid string, grp string, scale int, "
    "zero long, pos_off long, pos array<long>, neg_off long, neg array<long>, "
    "temp int"
)


def _t(m):
    return datetime(2024, 1, 1, 0, m)


# covers: first point, start==ts, start change, count decrease, offset
# shifts both directions, mixed scales, negative buckets, empty sides,
# multiple series/groups/time buckets, delta rows in the same frame
RICH_ROWS = [
    # cumulative series "a" (scale 1 -> downscaled), grp x
    (_t(1), _t(0), "a", "x", 1, 0, 2, [1, 3], 0, [], 2),        # first point
    (_t(2), _t(0), "a", "x", 1, 1, 2, [2, 4], 0, [], 2),        # +zero, increments
    (_t(3), _t(3), "a", "x", 1, 1, 2, [9, 9], 0, [], 2),        # start == ts
    (_t(4), _t(3), "a", "x", 1, 2, 1, [1, 2, 5], 0, [1], 2),    # start changed
    (_t(5), _t(3), "a", "x", 1, 2, 2, [3, 6], 0, [1], 2),       # offset shift up
    (_t(6), _t(3), "a", "x", 1, 1, 2, [3, 6], 0, [1], 2),       # zero decreased
    # cumulative series "b" at scale 0, grp y, negative side active
    (_t(1), _t(0), "b", "y", 0, 5, -2, [7, 0, 2], -1, [4, 4], 2),
    (_t(2), _t(0), "b", "y", 0, 5, -3, [1, 8, 0, 2], -1, [4, 5], 2),  # off down
    (_t(3), _t(0), "b", "y", 0, 6, -3, [1, 7, 0, 2], -1, [4, 5], 2),  # count dec
    # scale 2 series "c": 4-bucket downscale merge, empty neg
    (_t(2), _t(0), "c", "x", 2, 0, 3, [1, 1, 1, 1, 2], 0, [], 2),
    (_t(4), _t(0), "c", "x", 2, 0, 3, [2, 1, 1, 2, 2], 0, [], 2),
    # delta rows in the same frame (temp=1), incl. empty both sides
    (_t(1), _t(1), "d", "y", 0, 3, 0, [5, 1], 2, [2], 1),
    (_t(2), _t(2), "d", "y", 0, 0, 0, [], 0, [], 1),
    # second hour bucket
    (datetime(2024, 1, 1, 1, 5), _t(0), "a", "x", 1, 3, 2, [4, 6], 0, [2], 2),
    (datetime(2024, 1, 1, 1, 6), _t(0), "b", "y", 0, 7, -3, [1, 9, 0, 3], -1, [5, 5], 2),
]

KW = dict(
    ts="ts", start_ts="st", scale="scale", zero_count="zero",
    pos_offset="pos_off", pos_counts="pos", neg_offset="neg_off",
    neg_counts="neg", series_cols=["sid"], bucket_seconds=3600,
)


def _assert_twin(df, **kw):
    kw = {**KW, **kw}
    ref = exp_histogram_quantile_columns(df, **kw).collect()
    new = exp_histogram_quantile(df, **kw).collect()

    def canon(rows):
        return sorted(
            tuple(repr(float(v)) if isinstance(v, float) else v for v in r)
            for r in rows
        )

    assert canon(ref) == canon(new), (canon(ref), canon(new))
    assert len(ref) > 0  # fixture must actually exercise the pipeline


@pytest.mark.parametrize("level", [0.25, 0.483, 0.5, 0.99])
def test_rich_fixture_twin(spark, level):
    df = spark.createDataFrame(RICH_ROWS, SCHEMA)
    _assert_twin(df, level=level, temporality_col="temp")


def test_rich_fixture_group_cols_twin(spark):
    df = spark.createDataFrame(RICH_ROWS, SCHEMA)
    _assert_twin(
        df, level=0.5, temporality_col="temp",
        series_cols=["sid", "grp"], group_cols=["grp"],
    )


def test_rich_fixture_default_temporality_twin(spark):
    # temporality_col=None -> every row treated as cumulative
    df = spark.createDataFrame(RICH_ROWS, SCHEMA)
    _assert_twin(df, level=0.75, temporality_col=None)


def test_rich_fixture_aliases_twin(spark):
    df = spark.createDataFrame(RICH_ROWS, SCHEMA)
    _assert_twin(
        df, level=0.5, temporality_col="temp",
        bucket_alias="bkt", value_alias="quantile_v",
    )
