"""Incremental dedup (pipeline/incremental.py): the new-batch-vs-store
loop must classify exactly like a full recompute, the store join must not
reshuffle the store side (bucketed layout), and appends must keep the
loop consistent across cycles."""

import pytest
from pyspark.sql import functions as F

from hyperdx_spark.pipeline import incremental as inc
from hyperdx_spark.pipeline.dedup import drop_exact_duplicates


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def exact_store(spark):
    seed = _df(spark, [
        (1, "the quick brown fox"),
        (2, "jumps over the lazy dog"),
        (3, "the quick brown fox"),      # seed-internal dup -> keeper 1
        (4, "unique seed content here"),
    ])
    inc.build_exact_store(seed, "inc_store", buckets=4)
    yield seed
    spark.sql("DROP TABLE IF EXISTS inc_store")


def test_exact_incremental_classification(spark, exact_store):
    batch = _df(spark, [
        (10, "the quick brown fox"),     # dup of store keeper 1
        (11, "brand new document"),      # novel
        (12, "another brand new doc"),   # novel
        (13, "another brand new doc"),   # in-batch dup of 12
        (14, "jumps over the lazy dog"), # dup of store keeper 2
    ])
    got = {
        r["doc_id"]: (r["status"], r["dup_of"])
        for r in inc.dedup_exact_against_store(batch, spark, "inc_store").collect()
    }
    assert got == {
        10: ("store_dup", 1),
        11: ("novel", None),
        12: ("novel", None),
        13: ("batch_dup", 12),
        14: ("store_dup", 2),
    }
    # incremental survivors == full-recompute survivors (id sets)
    full = drop_exact_duplicates(exact_store.unionByName(batch))
    keep_full = {r["doc_id"] for r in full.collect()}
    keep_inc = {1, 2, 4} | {d for d, (s, _) in got.items() if s == "novel"}
    assert keep_inc == keep_full


def test_exact_append_cycle(spark, exact_store):
    b1 = _df(spark, [(11, "brand new document"), (12, "another one")])
    c1 = inc.dedup_exact_against_store(b1, spark, "inc_store")
    inc.append_novel_to_store(c1, "inc_store")
    # the next cycle sees the previous batch's content as store dups,
    # keyed to the FIRST batch's ids
    b2 = _df(spark, [(20, "brand new document"), (21, "still newer")])
    got = {
        r["doc_id"]: (r["status"], r["dup_of"])
        for r in inc.dedup_exact_against_store(b2, spark, "inc_store").collect()
    }
    assert got == {20: ("store_dup", 11), 21: ("novel", None)}


def test_store_side_never_reshuffles(spark, exact_store):
    """The point of the bucketed layout: with broadcast off, the
    incremental join's store branch reads its buckets in place — fewer
    Exchanges than the identical join against a plain (non-bucketed) copy
    of the same store."""
    batch = _df(spark, [(30, "x"), (31, "y")])
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            inc.dedup_exact_against_store(batch, spark, "inc_store")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the only Exchanges belong to the BATCH side (the fp window and
        # the probe re-shard into the store's bucket layout); the store's
        # scan feeds the SortMergeJoin directly, bucket-per-file
        assert "inc_store" in plan and "SortMergeJoin" in plan
        assert plan.count("Exchange") <= 2, plan
        # splitting the plan at the store's scan: nothing below it
        # exchanges (the store branch is the plan tail after its FileScan)
        store_scan = plan.rindex("inc_store")
        assert "Exchange" not in plan[store_scan:], plan[store_scan:]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


@pytest.fixture()
def minhash_store(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the wide green field toward the river bank every morning"
    )
    seed = _df(spark, [
        (1, base),
        (2, "completely different text about spark query planning and "
            "distributed shuffle joins at terabyte scale for analytics"),
    ])
    inc.build_minhash_store(seed, "inc_mh", buckets=4)
    yield base
    spark.sql("DROP TABLE IF EXISTS inc_mh")


def test_minhash_incremental_probe_and_append(spark, minhash_store):
    base = minhash_store
    batch = _df(spark, [
        (10, base + " with a tiny mutated tail"),   # near-dup of store #1
        (11, "totally unrelated content on gardening tools and seasonal "
             "vegetable planting schedules for temperate climates"),
    ])
    pairs = {
        (r["id"], r["store_id"]): r["est_jaccard"]
        for r in inc.neardup_against_store(
            batch, spark, "inc_mh", threshold=0.5
        ).collect()
    }
    assert (10, 1) in pairs and pairs[(10, 1)] >= 0.5
    assert all(i != 11 for i, _ in pairs)
    # append the batch; a near-dup of doc 10 now hits BOTH 1 and 10
    inc.append_minhash_to_store(batch, "inc_mh")
    b2 = _df(spark, [(20, base + " with a tiny mutated tail indeed")])
    hits = {
        r["store_id"]
        for r in inc.neardup_against_store(
            b2, spark, "inc_mh", threshold=0.5
        ).collect()
    }
    assert {1, 10} <= hits


def test_compact_exact_store(spark, exact_store):
    """Compaction collapses per-append files to one row per fp and keeps
    answers identical (keeper attribution preserved through the rewrite)."""
    b1 = _df(spark, [(11, "brand new document")])
    inc.append_novel_to_store(
        inc.dedup_exact_against_store(b1, spark, "inc_store"), "inc_store"
    )
    before = sorted(map(tuple, spark.table("inc_store").collect()))
    inc.compact_exact_store(spark, "inc_store")
    after = sorted(map(tuple, spark.table("inc_store").collect()))
    assert after == before  # one row per fp already; content unchanged
    # the compacted table still classifies and still accepts appends
    got = {
        r["doc_id"]: (r["status"], r["dup_of"])
        for r in inc.dedup_exact_against_store(
            _df(spark, [(30, "brand new document"), (31, "even newer")]),
            spark, "inc_store",
        ).collect()
    }
    assert got == {30: ("store_dup", 11), 31: ("novel", None)}
    inc.append_novel_to_store(
        inc.dedup_exact_against_store(
            _df(spark, [(31, "even newer")]), spark, "inc_store"
        ),
        "inc_store",
    )
    assert spark.table("inc_store").where("keep_id = 31").count() == 1
