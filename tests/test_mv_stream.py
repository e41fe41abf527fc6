"""Streaming MV maintenance (streaming/mv_maintain.py): micro-batch parts of
partial states must answer queries identically to the raw table, retried
batches must not double-count, and compaction must shrink parts without
changing answers — the AggregatingMergeTree insert/merge/OPTIMIZE contract
(materializedViews.ts:225-275 semantics, re-expressed on Structured
Streaming)."""

import uuid
from datetime import datetime, timedelta

import pytest

from hyperdx_spark.compile import QuerySettings, compile_chart_config
from hyperdx_spark.model import ChartConfig, SelectCol, Source
from hyperdx_spark.mv import AggregatedColumn, MVConfig, compile_with_mv
from hyperdx_spark.streaming.mv_maintain import (
    batch_writer,
    compact_rollup,
    maintain_rollup,
    seed_rollup,
)

T0 = datetime(2024, 1, 1)
EXACT = QuerySettings(approx_quantiles=False)
SCHEMA = "ts timestamp, event_type string, value double, user_id long"


def _mk_rows(day, n, et):
    return [
        (T0 + timedelta(days=day, minutes=7 * i), et, float((i * 13) % 50), i % 5)
        for i in range(n)
    ]


def _mv(path):
    return MVConfig(
        path=path,
        dimension_columns=["event_type"],
        min_granularity="1 hour",
        timestamp_column="bucket_ts",
        aggregated_columns=[
            AggregatedColumn("count", "cnt_state"),
            AggregatedColumn("sum", "sum_value", source_column="value"),
            AggregatedColumn("avg", "avg_value", source_column="value"),
            AggregatedColumn("quantile", "q_value", source_column="value"),
        ],
    )


def _cfg():
    return ChartConfig(
        source=Source(table="events", timestamp_value_expression="ts"),
        select=[
            SelectCol(agg_fn="count", alias="cnt"),
            SelectCol(agg_fn="sum", value_expression="value", alias="sum_v"),
            SelectCol(agg_fn="avg", value_expression="value", alias="avg_v"),
            SelectCol(agg_fn="quantile", value_expression="value", alias="p50",
                      level=0.5),
        ],
        group_by=["event_type"],
        granularity="1 day",
        date_range=(T0, T0 + timedelta(days=4)),
    )


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        for r in df.select(*cols).collect()
    )


@pytest.fixture()
def maintained(spark, tmp_path):
    """Seed part + two streamed micro-batches -> (mv, raw DataFrame)."""
    raw_dir = str(tmp_path / "raw")
    seed = _mk_rows(0, 40, "view") + _mk_rows(0, 10, "error")
    b1 = _mk_rows(1, 30, "view") + _mk_rows(1, 20, "click")
    b2 = _mk_rows(2, 25, "error")
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(raw_dir + "/f1")
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(raw_dir + "/f2")

    mv = _mv(str(tmp_path / "rollup"))
    seed_rollup(spark.createDataFrame(seed, SCHEMA), mv, "ts")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(raw_dir)
    )
    q = maintain_rollup(
        stream, mv, "ts",
        checkpoint=str(tmp_path / ("ckpt_" + uuid.uuid4().hex[:6])),
    )
    q.awaitTermination(300)
    raw = spark.createDataFrame(seed + b1 + b2, SCHEMA)
    return mv, raw


def test_stream_maintained_rollup_matches_raw(spark, maintained):
    mv, raw = maintained
    df_mv, expl = compile_with_mv(spark, _cfg(), [mv], df=raw, settings=EXACT)
    assert expl[0].success, expl[0].errors
    df_raw = compile_chart_config(spark, _cfg(), df=raw, settings=EXACT)
    assert _rows(df_mv) == _rows(df_raw)


def test_retried_batch_is_idempotent(spark, maintained):
    mv, raw = maintained
    # replay micro-batch 1's rows under the SAME batch id — the part dir is
    # overwritten, not appended, so totals must not change
    replay = spark.createDataFrame(_mk_rows(1, 30, "view") + _mk_rows(1, 20, "click"), SCHEMA)
    before = _rows(compile_with_mv(spark, _cfg(), [mv], df=raw, settings=EXACT)[0])
    batch_writer(mv, "ts")(replay, 0)
    batch_writer(mv, "ts")(replay, 0)
    after = _rows(compile_with_mv(spark, _cfg(), [mv], df=raw, settings=EXACT)[0])
    assert before == after


def test_compaction_shrinks_parts_and_preserves_answers(spark, maintained):
    import glob
    import os

    mv, raw = maintained
    before = _rows(compile_with_mv(spark, _cfg(), [mv], df=raw, settings=EXACT)[0])
    n_parts_before = len(
        {p for p in glob.glob(os.path.join(mv.path, "__batch=*"))}
    )
    assert n_parts_before == 3  # seed + 2 micro-batches
    compact_rollup(spark, mv)
    n_parts_after = len(
        {p for p in glob.glob(os.path.join(mv.path, "__batch=*"))}
    )
    assert n_parts_after == 1
    after = _rows(compile_with_mv(spark, _cfg(), [mv], df=raw, settings=EXACT)[0])
    assert before == after
    # one state row per (bucket, dims) after OPTIMIZE FINAL
    rollup = spark.read.parquet(mv.path)
    keys = rollup.select("bucket_ts", "event_type")
    assert keys.count() == keys.distinct().count()


def test_stream_maintained_equals_batch_rollup(spark, maintained):
    """VERDICT r7 #6: the stream-maintained rollup, re-merged across its
    micro-batch parts, must equal running the batch rollup_dataframe over
    the same raw rows DIRECTLY — state-level equivalence, not just equal
    query answers. Doubles are compared at 1e-6 (partial-per-part then
    merge reassociates IEEE sums); counts and quantile maps are exact."""
    from hyperdx_spark.mv import rollup_dataframe
    from hyperdx_spark.streaming.mv_maintain import merged_rollup

    mv, raw = maintained

    def canon(df):
        rows = {}
        for r in df.collect():
            key = (r["bucket_ts"], r["event_type"])
            assert key not in rows  # one state row per (bucket, dims)
            rows[key] = (
                r["cnt_state"],
                round(r["sum_value"], 6),
                round(r["avg_value"]["sum"], 6),
                r["avg_value"]["cnt"],
                tuple(sorted(r["q_value"].items())),
            )
        return rows

    streamed = canon(
        merged_rollup(
            spark.read.parquet(mv.path).drop("__bucket_date", "__batch"), mv
        )
    )
    batch = canon(rollup_dataframe(raw, mv, "ts"))
    assert streamed == batch
