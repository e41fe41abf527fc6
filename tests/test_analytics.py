"""Tests for client-side analytics operators: Drain pattern mining and
event deltas (SURVEY §2.11)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hyperdx_spark.analytics import drain as drain_mod
from hyperdx_spark.analytics import event_deltas as ed
from hyperdx_spark.analytics.drain import Drain


# ---------------------------------------------------------------- drain core


def test_drain_clusters_parametrize_numbers():
    d = Drain()
    msgs = [
        "connected to 10.0.0.1 port 8080",
        "connected to 10.0.0.2 port 9090",
        "connected to 10.0.0.3 port 8080",
        "disk failure on /dev/sda1",
    ]
    for m in msgs:
        d.add_log_message(m)
    templates = sorted(c.template() for c in d.clusters.values())
    assert "connected to <*> port <*>" in templates
    assert len(d.clusters) == 2
    big = max(d.clusters.values(), key=lambda c: c.size)
    assert big.size == 3


def test_drain_similarity_threshold_splits():
    d = Drain(sim_th=0.8)
    d.add_log_message("user alice logged in")
    d.add_log_message("user bob logged out")  # 2/4 sim < 0.8 -> new cluster
    assert len(d.clusters) == 2


def test_drain_match_exact_and_wildcard():
    d = Drain()
    d.add_log_message("job 123 finished in 5 ms")
    d.add_log_message("job 456 finished in 9 ms")
    m = d.match("job 999 finished in 1 ms", full_search="fallback")
    assert m is not None and m.template() == "job <*> finished in <*> ms"
    assert d.match("completely different text") is None


def test_drain_length_partitioning():
    d = Drain()
    d.add_log_message("a b c")
    d.add_log_message("a b c d")
    assert len(d.clusters) == 2  # token count is the first tree level


def test_flatten_body():
    assert drain_mod.flatten_body("a\nb   c\t d ") == "a b c d"


# ---------------------------------------------------------------- mining


def test_mine_patterns_spark(spark):
    rows = [(f"request {i} served in {i % 7} ms",) for i in range(200)] + [
        ("cache miss for key alpha",)
    ] * 30
    df = spark.createDataFrame(rows, "body string")
    patterns = drain_mod.mine_patterns(df, text_col="body", sample_size=1000)
    assert patterns[0].pattern == "request <*> served in <*> ms"
    assert patterns[0].sample_count == 200
    assert patterns[0].estimated_count == 200
    assert patterns[1].sample_count == 30


def test_mine_patterns_estimated_counts(spark):
    rows = [("worker 1 started",)] * 50
    df = spark.createDataFrame(rows, "body string")
    # sample 10 of 50 -> multiplier 5
    patterns = drain_mod.mine_patterns(
        df, text_col="body", sample_size=10, total_count=50
    )
    assert patterns[0].sample_count == 10
    assert patterns[0].estimated_count == 50


def test_mine_patterns_distributed(spark):
    rows = [(f"request {i} served in {i % 7} ms",) for i in range(300)] + [
        ("disk failure on /dev/sda",)
    ] * 40
    df = spark.createDataFrame(rows, "body string").repartition(8)
    patterns = drain_mod.mine_patterns_distributed(df, text_col="body")
    assert patterns[0].sample_count == 300  # exact counts survive the merge
    total = sum(p.sample_count for p in patterns)
    assert total == 340


# ---------------------------------------------------------------- deltas


def test_comparison_score_pure():
    # identical proportional distributions score 0
    assert ed.compute_comparison_score({"a": 10, "b": 10}, {"a": 5, "b": 5}) == 0
    # fully divergent distributions score 100
    assert ed.compute_comparison_score({"a": 10}, {"b": 10}) == 100
    # single-group with one value scores 0
    assert ed.compute_comparison_score({"a": 7}, {}) == 0
    assert ed.compute_comparison_score({}, {}) == 0


def test_semantic_boost():
    assert ed.semantic_boost("SpanAttributes.http.method") == 1
    assert ed.semantic_boost("error") == 1
    assert ed.semantic_boost("foo.bar") == 0


def test_rank_properties_spark(spark):
    rows = []
    # 'culprit' differs completely between groups; 'same' is identical
    for i in range(40):
        rows.append((True, {"culprit": "x", "same": str(i % 2)}))
    for i in range(40):
        rows.append((False, {"culprit": "y", "same": str(i % 2)}))
    df = spark.createDataFrame(rows, "t boolean, props map<string,string>")
    out = ed.rank_properties(
        df, target=F.col("t"), properties=F.col("props")
    ).collect()
    by_key = {r["key"]: r for r in out}
    assert by_key["culprit"]["base_score"] == pytest.approx(100.0)
    assert by_key["same"]["base_score"] == pytest.approx(0.0)
    assert out[0]["key"] == "culprit"


def test_rank_properties_high_cardinality_hidden(spark):
    rows = [(i < 30, {"uid": f"u{i}"}) for i in range(60)]
    df = spark.createDataFrame(rows, "t boolean, props map<string,string>")
    out = ed.rank_properties(df, target=F.col("t"), properties=F.col("props")).collect()
    r = out[0]
    assert r["hidden"] and r["hidden_reason"] == "high_cardinality"


def test_rank_properties_id_denylist(spark):
    rows = [(i < 10, {"traceId": "t" + str(i % 3)}) for i in range(20)]
    df = spark.createDataFrame(rows, "t boolean, props map<string,string>")
    out = ed.rank_properties(df, target=F.col("t"), properties=F.col("props")).collect()
    assert out[0]["hidden_reason"] == "denylist"


def test_correlated_series_basic(spark):
    """Pearson top-k: constructed series with known correlations — y=2x is
    +1, y=-x is -1, constant series drops (zero variance), short series
    drops (min_buckets)."""
    from datetime import datetime, timedelta

    from hyperdx_spark.analytics.series_corr import correlated_series

    t0 = datetime(2024, 1, 1)
    rows = []
    for h in range(6):
        ts = t0 + timedelta(hours=h)
        base = float(h + 1)
        rows += [("q", ts, base), ("pos", ts, 2 * base), ("neg", ts, -base),
                 ("flat", ts, 5.0)]
    rows += [("short", t0, 1.0), ("short", t0 + timedelta(hours=1), 2.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {
        r["key"]: (r["corr"], r["n_buckets"])
        for r in correlated_series(
            df, key="k", query_key="q", granularity="hour", k=10
        ).collect()
    }
    assert out["pos"] == (1.0, 6) and out["neg"] == (-1.0, 6)
    assert "flat" not in out and "short" not in out and "q" not in out


def test_drain_reference_sshd_sequence_verbatim():
    """The reference's own drain.test.ts 'test_add_log_message' case,
    replayed line-for-line: per-entry templates and total cluster size
    must match its expected output exactly."""
    from hyperdx_spark.analytics.drain import Drain

    entries = [
        "Dec 10 07:07:38 LabSZ sshd[24206]: input_userauth_request: invalid user test9 [preauth]",
        "Dec 10 07:08:28 LabSZ sshd[24208]: input_userauth_request: invalid user webmaster [preauth]",
        "Dec 10 09:12:32 LabSZ sshd[24490]: Failed password for invalid user ftpuser from 0.0.0.0 port 62891 ssh2",
        "Dec 10 09:12:35 LabSZ sshd[24492]: Failed password for invalid user pi from 0.0.0.0 port 49289 ssh2",
        "Dec 10 09:12:44 LabSZ sshd[24501]: Failed password for invalid user ftpuser from 0.0.0.0 port 60836 ssh2",
        "Dec 10 07:28:03 LabSZ sshd[24245]: input_userauth_request: invalid user pgadmin [preauth]",
    ]
    expected = [
        "Dec 10 07:07:38 LabSZ sshd[24206]: input_userauth_request: invalid user test9 [preauth]",
        "Dec 10 <*> LabSZ <*> input_userauth_request: invalid user <*> [preauth]",
        "Dec 10 09:12:32 LabSZ sshd[24490]: Failed password for invalid user ftpuser from 0.0.0.0 port 62891 ssh2",
        "Dec 10 <*> LabSZ <*> Failed password for invalid user <*> from 0.0.0.0 port <*> ssh2",
        "Dec 10 <*> LabSZ <*> Failed password for invalid user <*> from 0.0.0.0 port <*> ssh2",
        "Dec 10 <*> LabSZ <*> input_userauth_request: invalid user <*> [preauth]",
    ]
    model = Drain()
    got = []
    for e in entries:
        cluster, _change = model.add_log_message(e)
        got.append(" ".join(cluster.template_tokens))
    assert got == expected
    assert sum(c.size for c in model.clusters.values()) == 6


def _drain_run(model, entries):
    got = []
    for e in entries:
        cluster, _change = model.add_log_message(e)
        got.append(" ".join(cluster.template_tokens))
    return got


def test_drain_max_clusters_reference_twin():
    """drain.test.ts 'test_max_clusters': cap 1 — every new format evicts
    the previous cluster, so the final live total size is 1."""
    from hyperdx_spark.analytics.drain import Drain

    model = Drain(4, 0.4, 100, max_clusters=1)
    entries = ["A format 1", "A format 2", "B format 1", "B format 2", "A format 3"]
    expected = ["A format 1", "A format <*>", "B format 1", "B format <*>", "A format 3"]
    assert _drain_run(model, entries) == expected
    assert model.total_cluster_size() == 1


def test_drain_max_clusters_lru_multiple_leaf_nodes_reference_twin():
    """drain.test.ts 'test_max_clusters_lru_multiple_leaf_nodes': cap 2
    with touch-on-match LRU. The final total_cluster_size discriminates
    LRU-with-touch (4: clusters 'B A *' size 3 + 'A A A' size 1 survive)
    from insertion-order FIFO (3: the touched 'B A *' would be evicted)."""
    from hyperdx_spark.analytics.drain import Drain

    model = Drain(4, 0.4, 100, max_clusters=2, param_str="*")
    entries = ["A A A", "A A B", "B A A", "B A B", "C A A", "C A B", "B A A", "A A A"]
    expected = ["A A A", "A A *", "B A A", "B A *", "C A A", "C A *", "B A *", "A A A"]
    assert _drain_run(model, entries) == expected
    assert model.total_cluster_size() == 4


def test_drain_max_clusters_lru_single_leaf_node_reference_twin():
    """drain.test.ts 'test_max_clusters_lru_single_leaf_node': same LRU
    sequence but all entries share the first-token tree path."""
    from hyperdx_spark.analytics.drain import Drain

    model = Drain(4, 0.4, 100, max_clusters=2, param_str="*")
    entries = ["A A A", "A A B", "A B A", "A B B", "A C A", "A C B", "A B A", "A A A"]
    expected = ["A A A", "A A *", "A B A", "A B *", "A C A", "A C *", "A B *", "A A A"]
    assert _drain_run(model, entries) == expected


def test_drain_add_shorter_than_depth_message_reference_twin():
    """drain.test.ts 'test_add_shorter_than_depth_message'."""
    from hyperdx_spark.analytics.drain import Drain

    model = Drain(4)
    _c, change = model.add_log_message("hello")
    assert change == "cluster_created"
    _c, change = model.add_log_message("hello")
    assert change == "none"
    _c, change = model.add_log_message("otherword")
    assert change == "cluster_created"
    assert model.cluster_count == 2


def test_drain_sim_75_reference_twin():
    """drain.test.ts 'test_add_log_message_sim_75': at 0.75 similarity the
    two input_userauth templates stay separate."""
    from hyperdx_spark.analytics.drain import Drain

    entries = [
        "Dec 10 07:07:38 LabSZ sshd[24206]: input_userauth_request: invalid user test9 [preauth]",
        "Dec 10 07:08:28 LabSZ sshd[24208]: input_userauth_request: invalid user webmaster [preauth]",
        "Dec 10 09:12:32 LabSZ sshd[24490]: Failed password for invalid user ftpuser from 0.0.0.0 port 62891 ssh2",
        "Dec 10 09:12:35 LabSZ sshd[24492]: Failed password for invalid user pi from 0.0.0.0 port 49289 ssh2",
        "Dec 10 09:12:44 LabSZ sshd[24501]: Failed password for invalid user ftpuser from 0.0.0.0 port 60836 ssh2",
        "Dec 10 07:28:03 LabSZ sshd[24245]: input_userauth_request: invalid user pgadmin [preauth]",
    ]
    expected = [
        entries[0],
        entries[1],
        entries[2],
        "Dec 10 <*> LabSZ <*> Failed password for invalid user <*> from 0.0.0.0 port <*> ssh2",
        "Dec 10 <*> LabSZ <*> Failed password for invalid user <*> from 0.0.0.0 port <*> ssh2",
        entries[5],
    ]
    model = Drain(4, 0.75, 100)
    assert _drain_run(model, entries) == expected


def test_drain_match_only_reference_twin():
    """drain.test.ts 'test_match_only': exact-template match with params
    wildcarded; non-trained shapes return None."""
    from hyperdx_spark.analytics.drain import Drain

    model = Drain()
    model.add_log_message("aa aa aa")
    model.add_log_message("aa aa bb")
    model.add_log_message("aa aa cc")
    model.add_log_message("xx yy zz")
    assert model.match("aa aa tt").cluster_id == 1
    assert model.match("xx yy zz").cluster_id == 2
    assert model.match("xx yy rr") is None
    assert model.match("nothing") is None


def test_drain_create_template_reference_twin():
    """drain.test.ts 'test_create_template'."""
    import pytest as _pytest

    from hyperdx_spark.analytics.drain import Drain

    model = Drain(4, 0.4, 100, None, [], "*")
    assert model.create_template(["aa", "bb", "dd"], ["aa", "bb", "cc"]) == [
        "aa", "bb", "*",
    ]
    assert model.create_template(["aa", "bb", "dd"], ["aa", "bb", "dd"]) == [
        "aa", "bb", "dd",
    ]
    with _pytest.raises(ValueError):
        model.create_template(["aa", "bb", "dd"], ["aa"])


def test_template_miner_masking_reference_twin():
    """drain.test.ts TemplateMiner 'add_log_message with masking': custom
    mask prefix/suffix and IP/NUM instructions cluster both connects."""
    from hyperdx_spark.analytics.drain import TemplateMiner

    miner = TemplateMiner(
        masking_instructions=[
            (
                r"((?<=[^A-Za-z0-9])|^)(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})((?=[^A-Za-z0-9])|$)",
                "IP",
            ),
            (r"((?<=[^A-Za-z0-9])|^)([\-\+]?\d+)((?=[^A-Za-z0-9])|$)", "NUM"),
        ],
        mask_prefix="<:",
        mask_suffix=":>",
    )
    result = miner.add_log_message("connected to 10.0.0.1")
    assert result["change_type"] == "cluster_created"
    assert result["cluster_id"] == 1
    assert "<:IP:>" in result["template_mined"]
    result = miner.add_log_message("connected to 192.168.0.1")
    assert result["change_type"] == "none"
    assert result["cluster_id"] == 1


def test_template_miner_match_after_training_reference_twin():
    """drain.test.ts TemplateMiner 'match after training'."""
    from hyperdx_spark.analytics.drain import TemplateMiner

    miner = TemplateMiner()
    miner.add_log_message("user alice logged in")
    miner.add_log_message("user bob logged in")
    assert miner.match("user charlie logged in").cluster_id == 1
    assert miner.match("something completely different") is None


def test_template_miner_extract_parameters_reference_twin():
    """drain.test.ts TemplateMiner 'extract_parameters' + value checks."""
    from hyperdx_spark.analytics.drain import TemplateMiner

    miner = TemplateMiner(
        masking_instructions=[
            (r"((?<=[^A-Za-z0-9])|^)([\-\+]?\d+)((?=[^A-Za-z0-9])|$)", "NUM"),
        ]
    )
    miner.add_log_message("user johndoe logged in 11 minutes ago")
    miner.add_log_message("user janedoe logged in 5 minutes ago")
    result = miner.add_log_message("user bob logged in 3 minutes ago")
    params = miner.extract_parameters(
        result["template_mined"], "user bob logged in 3 minutes ago", False
    )
    assert params is not None and len(params) > 0
    # left-to-right order with values: the wildcarded user then the number
    assert ("bob", "*") in params and ("3", "NUM") in params
    assert params.index(("bob", "*")) < params.index(("3", "NUM"))
    # exact matching: the NUM slot must satisfy the instruction pattern
    exact = miner.extract_parameters(
        result["template_mined"], "user eve logged in 7 minutes ago", True
    )
    assert ("7", "NUM") in exact
    assert (
        miner.extract_parameters(
            result["template_mined"], "completely different text", True
        )
        is None
    )


def test_mine_patterns_distributed_merge_input_is_bounded(spark):
    """The driver fan-in is templates x (1 + trend buckets) — the
    (template, bucket) pre-aggregation folds partition multiplicity before
    the collect (r12; the 100 TB property the scale harness re-asserts)."""
    from datetime import datetime, timedelta

    from hyperdx_spark.analytics.drain import mine_patterns_distributed

    base = datetime(2024, 1, 1)
    rows = [
        (f"job j{i % 4} finished in {i} ms", base + timedelta(hours=i % 6))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "body string, ts timestamp").repartition(8)
    stats: dict = {}
    groups = mine_patterns_distributed(
        df, text_col="body", ts_col="ts", merge_stats=stats
    )
    assert sum(g.estimated_count for g in groups) == 600
    assert stats["totals_rows"] == stats["distinct_templates"]
    assert stats["bucket_rows"] <= stats["totals_rows"] * stats["distinct_buckets"]
    assert stats["merge_rows"] <= stats["distinct_templates"] * (
        1 + stats["distinct_buckets"]
    )
    # 8 partitions never multiply the fan-in: with one merged template and
    # 6 observed hourly buckets the input is a handful of rows, not 8x
    assert stats["distinct_buckets"] == 6
    assert stats["merge_rows"] <= stats["distinct_templates"] * 7


def test_template_miner_exact_vs_lazy_discriminates():
    """The two extraction modes genuinely differ (template-miner.ts:138-146):
    exact matching compiles the INSTRUCTION pattern into the capture group,
    so a slot value that doesn't satisfy it is a non-match (None); lazy
    wildcard mode (`.+?`) extracts it anyway. This is the pair the gate's
    tmparam part runs in both modes ('x'/'z')."""
    from hyperdx_spark.analytics.drain import TemplateMiner

    miner = TemplateMiner(masking_instructions=[(r"\d+", "NUM")])
    miner.add_log_message("request took 11 ms")
    tpl = miner.match("request took 42 ms").template()
    assert tpl == "request took <NUM> ms"
    # non-numeric slot: exact mode refuses, lazy mode extracts
    assert miner.extract_parameters(tpl, "request took fast ms", True) is None
    lazy = miner.extract_parameters(tpl, "request took fast ms", False)
    assert lazy == [("fast", "NUM")]


def test_drain_evicted_empty_token_cluster_does_not_crash():
    """A stale evicted id dangling in the empty-token tree node must
    degrade to no-match (Drain3 LRUCache.get-None semantics), not raise."""
    from hyperdx_spark.analytics.drain import Drain

    model = Drain(4, 0.4, 100, max_clusters=1)
    model.add_log_message("")               # cluster 1 at root['0']
    model.add_log_message("alpha beta gamma")  # evicts cluster 1
    cluster, change = model.add_log_message("")  # stale id 1 in the tree
    assert change == "cluster_created" and cluster.cluster_id == 3


def test_drain_match_never_touches_lru():
    """Reads go through peek (lru-cache.ts:33-38; drain.ts:352,361): a
    match() hit must NOT refresh recency — the peeked cluster is still the
    LRU head and gets evicted by the next insert."""
    from hyperdx_spark.analytics.drain import Drain

    model = Drain(4, 0.4, 100, max_clusters=2, param_str="*")
    model.add_log_message("A A A")  # cluster 1
    model.add_log_message("B B B")  # cluster 2
    assert model.match("A A A").cluster_id == 1  # peek only
    model.add_log_message("C C C")  # evicts cluster 1 despite the match()
    assert model.match("A A A") is None
    assert model.match("B B B").cluster_id == 2


# ---- eventDeltas helper twins (eventDeltas.test.ts:12-108) -------------------


def test_flatten_data():
    from hyperdx_spark.analytics.event_deltas import flatten_data

    assert flatten_data({"a": {"b": {"c": 1}}}) == {"a.b.c": 1}
    assert flatten_data({"arr": ["x", "y"]}) == {"arr[0]": "x", "arr[1]": "y"}
    out = flatten_data({"empty": {}})
    assert out["empty"] == {}
    assert flatten_data({"e": []}) == {"e": []}
    assert flatten_data({"a": [{"b": 1}]}) == {"a[0].b": 1}


def test_is_denylisted_type_aware():
    from hyperdx_spark.analytics.event_deltas import (
        get_base_column_name,
        is_denylisted,
        strip_type_wrappers,
    )

    cols = [
        ("TraceId", "String"),
        ("Body", "String"),
        ("Events.Timestamp", "Array(DateTime64(9))"),
        ("CountId", "UInt64"),
        ("SpanIds", "Array(LowCardinality(String))"),
    ]
    assert is_denylisted("TraceId", cols)
    assert not is_denylisted("Body", cols)  # non-Id String column
    assert is_denylisted("Events.Timestamp[0]", cols)  # per-index timestamp
    assert not is_denylisted("CountId", cols)  # Id suffix but numeric type
    assert not is_denylisted("Unknown.Id", cols)  # no meta entry
    # Array(String) elements ending in Id are flagged... when named *Id
    assert not is_denylisted("SpanIds", cols)  # 'Ids' doesn't match (Id|ID)$
    assert strip_type_wrappers("LowCardinality(Nullable(String))") == "String"
    assert get_base_column_name("Events.Attributes[0].spanId") is None
    assert get_base_column_name("a.b[3]") == "a.b"
    assert get_base_column_name("a.b") == "a.b"


_TRACE_COLUMN_META = [
    ("Timestamp", "DateTime64(9)"),
    ("TraceId", "String"),
    ("SpanId", "String"),
    ("ParentSpanId", "String"),
    ("ResourceAttributes", "Map(String, String)"),
    ("SpanAttributes", "Map(String, String)"),
    ("Events.Timestamp", "Array(DateTime64(9))"),
    ("Events.Name", "Array(String)"),
    ("Events.Attributes", "Array(Map(String, String))"),
    ("Links.TraceId", "Array(String)"),
    ("Links.SpanId", "Array(String)"),
    ("Links.Timestamp", "Array(DateTime64(9))"),
    ("Links.Attributes", "Array(Map(String, String))"),
]


def test_field_classification_reference_matrix():
    """deltaChartFieldClassification.test.ts walked case by case against the
    eventDeltas.ts:137-183 twins (the describes not already pinned by
    test_is_denylisted_type_aware)."""
    from hyperdx_spark.analytics.event_deltas import (
        get_base_column_name,
        is_denylisted,
        is_id_field,
        is_timestamp_array_field,
        strip_type_wrappers,
    )

    meta = _TRACE_COLUMN_META
    # getBaseColumnName
    assert get_base_column_name("TraceId") == "TraceId"
    assert (
        get_base_column_name("SpanAttributes.http.method")
        == "SpanAttributes.http.method"
    )
    assert get_base_column_name("Events.Name[0]") == "Events.Name"
    assert get_base_column_name("Links.TraceId[5]") == "Links.TraceId"
    assert get_base_column_name("Events[0][1]") is None  # malformed
    # stripTypeWrappers
    assert strip_type_wrappers("LowCardinality(String)") == "String"
    assert strip_type_wrappers("Nullable(String)") == "String"
    assert strip_type_wrappers("String") == "String"
    assert strip_type_wrappers("Array(String)") == "Array(String)"
    # isIdField: String and Array(String) elements/references ending Id/ID
    assert is_id_field("TraceId", meta)
    assert is_id_field("SpanId", meta)
    assert is_id_field("ParentSpanId", meta)
    assert is_id_field("Links.TraceId[0]", meta)
    assert is_id_field("Links.SpanId[0]", meta)
    assert is_id_field("Links.TraceId[5]", meta)
    assert is_id_field("Links.TraceId", meta)  # plain array reference
    assert not is_id_field("Timestamp", meta)
    assert not is_id_field("Events.Name[0]", meta)
    assert not is_id_field("MyMapId", [("MyMapId", "Map(String, String)")])
    assert not is_id_field("Events.Attributes[0].spanId", meta)  # sub-key
    assert not is_id_field("UnknownId", meta)
    assert not is_id_field("TraceId", [])
    # isTimestampArrayField
    assert is_timestamp_array_field("Events.Timestamp[0]", meta)
    assert is_timestamp_array_field("Events.Timestamp[23]", meta)
    assert is_timestamp_array_field("Links.Timestamp[0]", meta)
    assert is_timestamp_array_field("Events.Timestamp", meta)  # plain ref
    assert not is_timestamp_array_field("Events.Name[0]", meta)
    assert not is_timestamp_array_field("Links.TraceId[0]", meta)
    assert not is_timestamp_array_field("Timestamp", meta)  # non-array
    assert not is_timestamp_array_field("Unknown.Timestamp[0]", meta)
    assert is_timestamp_array_field(
        "MyTimestamps[0]", [("MyTimestamps", "Array(DateTime64(9, 'UTC'))")]
    )
    # isDenylisted composition
    assert is_denylisted("TraceId", meta)
    assert is_denylisted("Links.TraceId[0]", meta)
    assert is_denylisted("Events.Timestamp[0]", meta)
    assert is_denylisted("Links.Timestamp[3]", meta)
    assert not is_denylisted("ResourceAttributes.service.name", meta)
    assert not is_denylisted("SpanAttributes.http.method", meta)
    assert not is_denylisted("Events.Name[0]", meta)


def test_is_high_cardinality_reference_matrix():
    """deltaChartFieldClassification.test.ts isHighCardinality describe —
    the pure twin of eventDeltas.ts:189-223 (min-of-groups uniqueness,
    <=20 combined samples always visible, single-group fallback)."""
    from hyperdx_spark.analytics.event_deltas import is_high_cardinality

    # all-unique outliers, no inliers -> hidden
    hc = {f"value-{i}": 0.1 for i in range(1000)}
    assert is_high_cardinality("TraceId", {"TraceId": hc}, {}, {"TraceId": 1000}, {})
    # low cardinality -> visible
    lo = {"GET": 80, "POST": 20}
    assert not is_high_cardinality(
        "http.method", {"http.method": lo}, {}, {"http.method": 1000}, {}
    )
    # min of both groups: low-card outliers keep the field visible even
    # when the inlier side is all-unique
    hi_in = {f"v{i}": 0.2 for i in range(500)}
    assert not is_high_cardinality(
        "method", {"method": lo}, {"method": hi_in},
        {"method": 1000}, {"method": 500},
    )
    # BOTH groups high-cardinality -> hidden
    mk = lambda n: {f"v{i}": 100 / n for i in range(n)}
    assert is_high_cardinality(
        "url", {"url": mk(500)}, {"url": mk(400)}, {"url": 500}, {"url": 400}
    )
    # combined sample size <= 20 -> always visible
    small = {f"v{i}": 10 for i in range(10)}
    assert not is_high_cardinality(
        "field", {"field": small}, {}, {"field": 10}, {"field": 10}
    )
    # single-group uniqueness when the other group has no data
    uniq = {f"v{i}": 1 for i in range(100)}
    assert is_high_cardinality("id", {"id": uniq}, {}, {"id": 100}, {})
    # absent from both groups -> never hidden
    assert not is_high_cardinality("unknownField", {}, {}, {}, {})


def test_property_statistics_and_pure_rank_reference_twin():
    """common-utils eventDeltas.test.ts getPropertyStatistics +
    rankProperties describes — the pure driver-side composition
    (eventDeltas.ts:62-114, 354-409)."""
    from hyperdx_spark.analytics.event_deltas import (
        get_property_statistics,
        rank_properties_rows,
    )

    # only keys reaching MIN_PROPERTY_OCCURENCES (5) get value stats
    data = [
        {"always": "yes", "sometimes": "present"} if i < 4 else {"always": "yes"}
        for i in range(10)
    ]
    stats = get_property_statistics(data)
    assert "always" in stats["value_occurrences"]
    assert "sometimes" not in stats["value_occurrences"]
    # per-value counts (second pass recounts ALL rows)
    stats = get_property_statistics(
        [{"kind": "A" if i < 6 else "B"} for i in range(10)]
    )
    assert stats["value_occurrences"]["kind"] == {"A": 6, "B": 4}
    assert stats["property_occurrences"]["kind"] == 10
    assert stats["percentage_occurrences"]["kind"]["A"] == 60.0

    # rankProperties: most differentiating property first
    target = [
        {"Severity": "ERROR", "Region": ["us", "eu", "ap"][i % 3]}
        for i in range(50)
    ]
    baseline = [
        {"Severity": "INFO", "Region": ["us", "eu", "ap"][i % 3]}
        for i in range(50)
    ]
    meta = [("Severity", "String"), ("Region", "String")]
    result = rank_properties_rows(target, baseline, meta)
    assert result["ranked"][0]["key"] == "Severity"
    assert result["ranked"][0]["score"] > 50

    # Id columns hidden via denylist
    target = [
        {"TraceId": f"t{i}", "Service": "a" if i % 2 == 0 else "b"}
        for i in range(30)
    ]
    baseline = [
        {"TraceId": f"t{100 + i}", "Service": "a" if i % 4 == 0 else "b"}
        for i in range(30)
    ]
    meta = [("TraceId", "String"), ("Service", "String")]
    result = rank_properties_rows(target, baseline, meta)
    entry = next(p for p in result["ranked"] if p["key"] == "TraceId")
    assert entry["hidden"] and entry["hidden_reason"] == "denylist"


def test_pure_rank_matches_distributed_rank(spark):
    """The pure rank_properties_rows and the distributed rank_properties
    must agree on scores/hidden for the same data — the reference runs ONE
    algorithm in two places (MCP server vs app); the repo runs the pure
    twin driver-side and the JVM expression engine-side."""
    from hyperdx_spark.analytics.event_deltas import (
        rank_properties,
        rank_properties_rows,
    )

    rows = [
        (i < 40, {"Severity": "ERROR" if i < 40 else "INFO",
                  "Region": ["us", "eu", "ap"][i % 3]})
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "t boolean, props map<string,string>")
    dist = {
        r["key"]: (round(r["base_score"], 6), r["hidden"])
        for r in rank_properties(
            df, target=F.col("t"), properties=F.col("props")
        ).collect()
    }
    pure = rank_properties_rows(
        [p for t, p in rows if t],
        [p for t, p in rows if not t],
        [("Severity", "String"), ("Region", "String")],
    )
    pure_m = {
        p["key"]: (round(p["base_score"], 6), p["hidden"])
        for p in pure["ranked"]
    }
    assert dist == pure_m


def test_is_aggregate_function_reference_rule():
    """ChartUtils.tsx:273-380: case-insensitive 'name(' substring over the
    ClickHouse aggregate list."""
    from hyperdx_spark.analytics.event_deltas import is_aggregate_function as a

    assert a("avg(duration)") and a("AVG(duration)") and a("quantile(0.5)(d)")
    assert a("toFloat64(countIf(x > 1))")  # nested call still matches
    assert not a("duration") and not a("Duration + 1")
    assert not a("counter")     # no paren -> not a call
    assert not a("counter(x)")  # 'count(' is NOT a substring of 'counter('
    # the reference's permissive substring rule matches inside longer
    # names ('myavg(' contains 'avg('); pin it so the port never "fixes" it
    assert a("myavg(x)")


def test_selection_split_condition_and_gating():
    """DBDeltaChart.tsx:68-196 — selection-mode gating (all four coords)
    and the outlier/inlier SQL condition pair."""
    from hyperdx_spark.analytics.event_deltas import (
        has_heatmap_selection,
        selection_split_condition,
    )

    assert has_heatmap_selection(1, 2, 3, 4)
    assert not has_heatmap_selection(None, 2, 3, 4)
    assert not has_heatmap_selection(1, 2, None, 4)
    assert not has_heatmap_selection(None, None, None, None)

    box = (100, 200, 5, 50)
    out = selection_split_condition("ts", "duration", box, is_outlier=True)
    assert out == "(duration) >= 5 AND (duration) <= 50 AND ts >= 100 AND ts <= 200"
    inl = selection_split_condition("ts", "duration", box, is_outlier=False)
    assert inl == f"NOT ({out})"
    # aggregate value expressions filter on the timestamp range only
    aout = selection_split_condition("ts", "avg(duration)", box, is_outlier=True)
    assert aout == "ts >= 100 AND ts <= 200"
    ainl = selection_split_condition("ts", "avg(duration)", box, is_outlier=False)
    assert ainl == "NOT (ts >= 100 AND ts <= 200)"


def test_delta_selection_split_executed(spark):
    """delta_selection_split over a synthetic frame: the non-aggregate box
    partitions rows exactly; the aggregate variant selects WHOLE
    timestamps whose in-range aggregate lands in the y-range (a ts with
    values 10 and 90 averages 50: both rows are outliers even though
    neither value is individually in range — the AggregatedTimestamps
    HAVING semantics)."""
    from datetime import datetime as dt

    from hyperdx_spark.analytics.event_deltas import delta_selection_split

    rows = [
        (1, dt(2024, 1, 1, 0, 0), 10.0),
        (2, dt(2024, 1, 1, 0, 0), 90.0),   # same ts as row 1: avg 50
        (3, dt(2024, 1, 1, 0, 5), 45.0),   # alone: avg 45, in range
        (4, dt(2024, 1, 1, 0, 10), 90.0),  # alone: avg 90, out of range
        (5, dt(2024, 1, 2, 0, 0), 45.0),   # outside the x range
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, value double")
    box = (dt(2024, 1, 1), dt(2024, 1, 1, 12), 40.0, 60.0)

    out, inl = delta_selection_split(
        df, timestamp_expr="ts", value_expr="value", box=box, id_col="id"
    )
    assert {r["id"] for r in out.collect()} == {3}
    assert {r["id"] for r in inl.collect()} == {1, 2, 4, 5}

    out, inl = delta_selection_split(
        df, timestamp_expr="ts", value_expr="avg(value)", box=box, id_col="id"
    )
    assert {r["id"] for r in out.collect()} == {1, 2, 3}
    assert {r["id"] for r in inl.collect()} == {5}
    # row 4's ts is in the x-range but its aggregate misses the y-range:
    # excluded from BOTH sides, exactly like the reference's
    # ts-NOT-between AND ts-NOT-IN inlier condition


def test_sampling_helpers_reference_matrix():
    """deltaChartSampling.test.ts walked case by case
    (eventDeltas.ts:296-317 twins)."""
    from hyperdx_spark.analytics.event_deltas import (
        MAX_SAMPLE_SIZE,
        MIN_SAMPLE_SIZE,
        SAMPLE_RATIO,
        SAMPLE_SIZE,
        compute_effective_sample_size as cess,
        get_stable_sample_expression as gsse,
    )

    assert gsse("SpanId") == "cityHash64(SpanId)"
    assert gsse("my_span_id") == "cityHash64(my_span_id)"
    assert gsse(None) == "rand()"
    assert gsse("") == "rand()"  # empty string is falsy, like undefined

    assert cess(0) == SAMPLE_SIZE        # fallback
    assert cess(-1) == SAMPLE_SIZE
    assert cess(100) == MIN_SAMPLE_SIZE  # small datasets
    r = cess(200_000)
    assert r == 2000 and MIN_SAMPLE_SIZE < r < MAX_SAMPLE_SIZE
    assert cess(10_000_000) == MAX_SAMPLE_SIZE
    assert cess(100_000) == 1000         # exact 1% in the valid range
    # IEEE-754 parity: Math.ceil(2900 * 0.01) is 30, not 29
    import math

    assert cess(2_900 * 100) == math.ceil(290_000 * SAMPLE_RATIO)


def test_scoring_reference_matrix():
    """deltaChartScoring.test.ts cases not already pinned by
    test_compute_comparison_score / test_compute_entropy_score /
    test_semantic_boost."""
    from hyperdx_spark.analytics.event_deltas import (
        compute_comparison_score as ccs,
        compute_entropy_score as e,
        semantic_boost as sb,
    )

    # identical proportions at different sample sizes -> ~0
    assert abs(ccs({"GET": 80, "POST": 20}, {"GET": 40, "POST": 10})) < 1e-9
    # strongly different proportions -> high
    assert ccs({"error": 90, "ok": 10}, {"error": 10, "ok": 90}) > 70
    # multi-value with no comparison group IS informative: max normalized pct
    assert ccs({"error": 80, "ok": 20}, {}) == 80
    # normalization by group sum: sample size does not change the score
    s_small = ccs({"GET": 8, "POST": 2}, {"GET": 50, "POST": 50})
    s_large = ccs({"GET": 800, "POST": 200}, {"GET": 50, "POST": 50})
    assert abs(s_small - s_large) < 0.05
    # entropy corners from the reference file
    assert e({"only": 100}) == 0
    assert abs(e({"a": 33.33, "b": 33.33, "c": 33.34})) < 0.01
    assert e({"ok": 99, "error": 1}) > 0.5
    assert e({"a": 95, "b": 5}) > e({"a": 60, "b": 40})
    power = {"v1": 50, "v2": 25, "v3": 12, "v4": 6, "v5": 4, "v6": 2, "v7": 1}
    assert 0.1 < e(power) < 1
    # semanticBoost: well-known OTel attrs, case-insensitive
    assert sb("ResourceAttributes.service.name") == 1
    assert sb("SpanAttributes.http.method") == 1
    assert sb("SpanAttributes.http.status_code") == 1
    assert sb("SpanAttributes.error") == 1
    assert sb("SpanAttributes.custom.field") == 0
    assert sb("TraceId") == 0
    assert sb("ResourceAttributes.Service.Name") == 1
    assert sb("SpanAttributes.HTTP.METHOD") == 1


def test_mine_patterns_arrow_sample_path_parity(spark):
    """r17: the string/no-ts sample transfer goes through Arrow with
    lazily built Row samples — outputs (patterns, counts, samples as Row
    objects with __fields__, NULL-text handling) must match the legacy
    collect() path bit for bit."""
    from pyspark.sql import Row

    rows = [(f"request {i} served in {i % 7} ms",) for i in range(40)] + [
        (None,),  # NULL text -> flatten_body("") empty-token cluster
        ("cache miss for key alpha",),
    ] * 3
    df = spark.createDataFrame(rows, "body string")
    arrow = drain_mod.mine_patterns(df, text_col="body", sample_size=1000)

    # legacy path: force it by making toArrow raise (the impl's fallback)
    import pyspark.sql.classic.dataframe as _cdf

    orig = _cdf.DataFrame.toArrow
    try:
        def _boom(self):
            raise RuntimeError("forced legacy path")
        _cdf.DataFrame.toArrow = _boom
        legacy = drain_mod.mine_patterns(df, text_col="body", sample_size=1000)
    finally:
        _cdf.DataFrame.toArrow = orig

    # sample Rows: genuine Row objects, field name preserved
    for p in arrow:
        for s in p.samples:
            assert isinstance(s, Row)
            assert s.__fields__ == ["body"]
    assert [(p.id, p.pattern, p.sample_count, p.estimated_count, p.trend,
             p.samples) for p in arrow] == [
        (p.id, p.pattern, p.sample_count, p.estimated_count, p.trend,
         p.samples) for p in legacy
    ]


def test_mine_patterns_zero_total_multiplier_one(spark):
    # mine-patterns.ts:175-176: totalCount 0 -> sampleMultiplier 1
    df = spark.createDataFrame([("worker 1 started",)] * 10, "body string")
    patterns = drain_mod.mine_patterns(df, text_col="body", total_count=0)
    assert patterns[0].sample_count == 10
    assert patterns[0].estimated_count == 10  # x1, not x0


def test_mine_patterns_estimated_count_floor_and_max_samples_default(spark):
    """mine-patterns.test.ts:159-211,302-324: estimatedCount floors at 1
    via Math.max even when the multiplier rounds it to 0, and maxSamples
    defaults to 5."""
    df = spark.createDataFrame(
        [(f"job {i} finished",) for i in range(8)], "body string"
    )
    # a rare cluster under a FRACTIONAL multiplier (< 0.5 per sample)
    # still reports at least 1 estimated occurrence
    one = spark.createDataFrame([("solo line here",)], "body string")
    patterns = drain_mod.mine_patterns(
        one.unionByName(df), text_col="body", total_count=0, sample_size=9
    )
    assert all(p.estimated_count >= 1 for p in patterns)
    # default samples cap is 5 (mine-patterns.ts maxSamples default)
    patterns = drain_mod.mine_patterns(df, text_col="body", total_count=8)
    assert len(patterns[0].samples) == 5


def test_mine_patterns_trend_spine(spark):
    """mine-patterns.test.ts:212-267: with a date range, trend buckets
    zero-fill the whole range, stay within [start, end), scale by the
    multiplier, and null timestamps fall back to the range start."""
    from datetime import datetime

    start = datetime(2024, 1, 1, 0, 0, 0)
    end = datetime(2024, 1, 1, 1, 0, 0)
    df = spark.createDataFrame(
        [("event", datetime(2024, 1, 1, 0, 15)), ("event", datetime(2024, 1, 1, 0, 45))],
        "body string, ts timestamp",
    )
    patterns = drain_mod.mine_patterns(
        df, text_col="body", ts_col="ts", total_count=2,
        date_range=(start, end), trend_buckets=4,
    )
    assert len(patterns) == 1
    trend = patterns[0].trend
    assert len(trend) > 0
    for b, _c in trend:
        assert start.timestamp() <= b < end.timestamp()
    assert sum(c for _b, c in trend) == 2
    assert any(c == 0 for _b, c in trend)  # zero-filled spine

    # multiplier scales the bucket counts (1 sample, totalCount 100)
    one = spark.createDataFrame(
        [("event", datetime(2024, 1, 1, 0, 15))], "body string, ts timestamp"
    )
    p = drain_mod.mine_patterns(
        one, text_col="body", ts_col="ts", total_count=100,
        date_range=(start, end), trend_buckets=4,
    )[0]
    assert max(c for _b, c in p.trend) == 100

    # null timestamp falls back to the range start
    nulls = spark.createDataFrame(
        [("no timestamp", None)], "body string, ts timestamp"
    )
    p = drain_mod.mine_patterns(
        nulls, text_col="body", ts_col="ts", total_count=1,
        date_range=(start, end), trend_buckets=4,
    )[0]
    first_bucket = p.trend[0]
    assert first_bucket[1] == 1


def test_mine_patterns_masking(spark):
    """drain/masking.ts LogMasker semantics: masked values cluster as one
    token; default = no instructions."""
    from hyperdx_spark.analytics.drain import apply_masking

    assert apply_masking("ip 10.0.0.1 here", [(r"\d+\.\d+\.\d+\.\d+", "IP")]) \
        == "ip <IP> here"
    # ordered application
    assert apply_masking(
        "user a@b.com from 10.0.0.1",
        [(r"[\w.]+@[\w.]+", "EMAIL"), (r"\d+\.\d+\.\d+\.\d+", "IP")],
    ) == "user <EMAIL> from <IP>"
    rows = [(f"conn from 10.0.0.{i} accepted",) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "body string")
    # without masking the numeric-token parametrizer already collapses these
    # (digit tokens); with an IP mask the template names the mask instead
    masked = drain_mod.mine_patterns(
        df, text_col="body", masking=[(r"\d+\.\d+\.\d+\.\d+", "IP")]
    )
    assert masked[0].pattern == "conn from <IP> accepted"
    assert masked[0].sample_count == 29


def test_mine_patterns_distributed_trends_and_samples_match_driver(spark):
    """r11: the scale path emits the sampled miner's full output shape.
    On ONE partition with the sample covering every row (multiplier 1) the
    distributed result must equal mine_patterns exactly — templates,
    counts, zero-filled trend spines, and bounded sample lines."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows = []
    for i in range(120):
        rows.append((f"request {i} served in {i % 7} ms", base + timedelta(minutes=7 * i)))
    for i in range(30):
        rows.append(("disk failure on /dev/sda", base + timedelta(hours=9, minutes=i)))
    rows.append(("orphan line without timestamp", None))
    df = spark.createDataFrame(rows, "body string, ts timestamp").coalesce(1)
    rng = (base, base + timedelta(days=1))

    driver = drain_mod.mine_patterns(
        df, text_col="body", ts_col="ts", total_count=len(rows),
        sample_size=10_000, date_range=rng, max_samples=3,
    )
    dist = drain_mod.mine_patterns_distributed(
        df, text_col="body", ts_col="ts", date_range=rng, max_samples=3,
    )
    assert [p.pattern for p in dist] == [p.pattern for p in driver]
    assert [p.sample_count for p in dist] == [p.sample_count for p in driver]
    assert [p.estimated_count for p in dist] == [p.estimated_count for p in driver]
    assert [p.trend for p in dist] == [p.trend for p in driver]
    for d, v in zip(dist, driver):
        assert d.samples == [r["body"] for r in v.samples]
    # the null-ts row landed in the range-start bucket of its cluster
    orphan = next(p for p in dist if "orphan" in p.pattern)
    assert orphan.trend[0][1] == 1


def test_mine_patterns_distributed_trend_sums_across_partitions(spark):
    """Bucket counts shipped per partition must sum exactly: per-cluster
    trend totals equal the cluster count regardless of partitioning."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows = [
        (f"request {i} served in {i % 7} ms", base + timedelta(minutes=11 * i))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "body string, ts timestamp").repartition(8)
    out = drain_mod.mine_patterns_distributed(df, text_col="body", ts_col="ts")
    assert sum(p.sample_count for p in out) == 200
    for p in out:
        assert sum(n for _b, n in p.trend) == p.sample_count
        assert 0 < len(p.samples) <= 5
    # noise_threshold drops the dominant cluster on exact fractions
    quiet = drain_mod.mine_patterns_distributed(
        df, text_col="body", ts_col="ts", noise_threshold=0.5
    )
    assert all(p.sample_count / 200 <= 0.5 for p in quiet)


def test_mine_patterns_distributed_masking(spark):
    rows = [(f"conn from 10.0.0.{i} accepted",) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "body string").repartition(4)
    out = drain_mod.mine_patterns_distributed(
        df, text_col="body", masking=[(r"\d+\.\d+\.\d+\.\d+", "IP")]
    )
    assert out[0].pattern == "conn from <IP> accepted"
    assert out[0].sample_count == 39


def test_delta_chart_top_n_aggregation_reference_twin():
    """deltaChartUtils.test.ts applyTopNAggregation — the adaptive Other
    bucket (at most 8 shown in full; beyond that, top 6 + 'Other (N)')."""
    from hyperdx_spark.analytics.event_deltas import (
        MAX_CHART_VALUES,
        MAX_CHART_VALUES_UPPER,
        apply_top_n_aggregation,
        merge_value_statistics_maps,
    )

    def make(names):
        return [
            {"name": n, "outlierCount": 100 - i, "inlierCount": 5}
            for i, n in enumerate(names)
        ]

    assert (MAX_CHART_VALUES, MAX_CHART_VALUES_UPPER) == (6, 8)
    assert apply_top_n_aggregation(make("abc")) == make("abc")
    assert apply_top_n_aggregation(make("abcdef")) == make("abcdef")
    # adaptive window: 7 and 8 values render in full, no Other bucket
    assert apply_top_n_aggregation(make("abcdefg")) == make("abcdefg")
    assert not any(
        d.get("isOther") for d in apply_top_n_aggregation(make("abcdefgh"))
    )
    # 9 values: top 6 + Other (3)
    out = apply_top_n_aggregation(make("abcdefghi"))
    assert len(out) == 7 and out[-1]["isOther"] and out[-1]["name"] == "Other (3)"
    top = [d["name"] for d in out[:6]]
    assert "a" in top and "b" in top and "i" not in top
    # Other accumulates BOTH counts from every dropped value
    data = [
        {"name": "a", "outlierCount": 50, "inlierCount": 50},
        {"name": "b", "outlierCount": 40, "inlierCount": 40},
        {"name": "c", "outlierCount": 30, "inlierCount": 30},
        {"name": "d", "outlierCount": 20, "inlierCount": 20},
        {"name": "e", "outlierCount": 10, "inlierCount": 10},
        {"name": "f", "outlierCount": 5, "inlierCount": 5},
        {"name": "g", "outlierCount": 4, "inlierCount": 4},
        {"name": "h", "outlierCount": 3, "inlierCount": 3},
        {"name": "i", "outlierCount": 3, "inlierCount": 2},
        {"name": "j", "outlierCount": 1, "inlierCount": 1},
        {"name": "k", "outlierCount": 0, "inlierCount": 1},
        {"name": "l", "outlierCount": 0, "inlierCount": 0},
    ]
    other = apply_top_n_aggregation(data)[-1]
    assert (other["outlierCount"], other["inlierCount"]) == (11, 11)
    assert apply_top_n_aggregation(make("abcdefghijk"))[-1]["name"] == "Other (5)"
    # merge: union of names sorted, missing sides default 0
    merged = merge_value_statistics_maps({"b": 2, "a": 1}, {"b": 3, "c": 4})
    assert merged == [
        {"name": "a", "outlierCount": 1, "inlierCount": 0},
        {"name": "b", "outlierCount": 2, "inlierCount": 3},
        {"name": "c", "outlierCount": 0, "inlierCount": 4},
    ]


def test_flattened_key_to_sql_expression():
    """deltaChartUtils.ts:131-188 — flattened keys back to SQL accessors,
    0-based JS array indices to 1-based."""
    from hyperdx_spark.analytics.event_deltas import (
        flattened_key_to_filter_key,
        flattened_key_to_sql_expression as f,
    )

    meta = [
        {"name": "ResourceAttributes", "type": "Map(String, String)"},
        {"name": "Events.Attributes", "type": "Array(Map(String, String))"},
        {"name": "Body", "type": "String"},
    ]
    assert f("ResourceAttributes.service.name", meta) == (
        "ResourceAttributes['service.name']"
    )
    assert f("Events.Attributes[0].message.type", meta) == (
        "Events.Attributes[1]['message.type']"
    )
    assert f("Body", meta) == "Body"
    assert f("Unknown.key", meta) == "Unknown.key"
    # quotes in the key are doubled for the SQL literal
    assert f("ResourceAttributes.o'brien", meta) == (
        "ResourceAttributes['o''brien']"
    )
    assert flattened_key_to_filter_key(
        "ResourceAttributes.k8s.pod.name", meta
    ) == "ResourceAttributes['k8s.pod.name']"
    # deltaChartFilterKeys.test.ts remainder: 1-based increment on any
    # index, non-map nested columns unchanged, wrapped Map types, empty
    # meta, Array(Map) quote escaping, non-Map filter keys unchanged
    meta2 = meta + [{"name": "Events.Name", "type": "Array(String)"},
                    {"name": "Timestamp", "type": "DateTime64(9)"}]
    assert f("Events.Attributes[4].key", meta2) == "Events.Attributes[5]['key']"
    assert f("Events.Name[0]", meta2) == "Events.Name[0]"
    assert f(
        "LogAttributes.level",
        [{"name": "LogAttributes", "type": "LowCardinality(Map(String, String))"}],
    ) == "LogAttributes['level']"
    assert f("ResourceAttributes.service.name", []) == (
        "ResourceAttributes.service.name"
    )
    assert f("Events.Attributes[0].it's.key", meta2) == (
        "Events.Attributes[1]['it''s.key']"
    )
    assert flattened_key_to_filter_key(
        "ResourceAttributes.service.instance.id", meta2
    ) == "ResourceAttributes['service.instance.id']"
    assert flattened_key_to_filter_key("Timestamp", meta2) == "Timestamp"
    assert flattened_key_to_filter_key("Body", meta2) == "Body"


def test_compute_entropy_score():
    """deltaChartUtils.ts:204-230 — 1 - normalized Shannon entropy."""
    from hyperdx_spark.analytics.event_deltas import compute_entropy_score as e

    assert e({}) == 0.0
    assert e({"a": 100}) == 0.0
    assert e({"a": 50, "b": 50}) == 0.0          # perfectly uniform
    assert e({"a": 0, "b": 0}) == 0.0            # zero total
    assert 0 < e({"a": 90, "b": 10}) < 1          # dominant value among few
    assert e({"a": 99, "b": 0.5, "c": 0.5}) > e({"a": 50, "b": 25, "c": 25})


def test_infra_correlations_reference_twin():
    """infraCorrelations.test.ts — detect-attribute gating (non-null, not
    truthy), render order, built-in identity."""
    from hyperdx_spark.analytics.infra import (
        INFRA_CORRELATIONS,
        get_active_infra_correlations as g,
        infra_metric_query,
    )

    assert [c.title for c in g({"k8s.pod.uid": "pod-abc"})] == ["Pod"]
    assert [c.title for c in g({"k8s.node.name": "node-1"})] == ["Node"]
    assert [c.title for c in g(
        {"k8s.pod.uid": "pod-abc", "k8s.node.name": "node-1"}
    )] == ["Pod", "Node"]
    assert g({}) == []
    assert g({"host.name": "web-1", "service.name": "api"}) == []
    assert g(None) == []
    # != null, not truthiness: explicit None is absent, '' / 0 are present
    assert g({"k8s.pod.uid": None}) == []
    assert [c.title for c in g({"k8s.pod.uid": ""})] == ["Pod"]

    pod, node = INFRA_CORRELATIONS
    assert (pod.detect_attribute, pod.correlate_attribute,
            pod.field_prefix) == ("k8s.pod.uid", "k8s.pod.uid", "k8s.pod.")
    assert pod.timeline_query_attribute == "k8s.pod.uid"
    assert node.timeline_query_attribute is None  # timeline is Pod-only
    for c in INFRA_CORRELATIONS:
        assert [(ch.card_test_id, ch.field) for ch in c.charts] == [
            ("cpu-usage-card", "cpu.utilization"),
            ("memory-usage-card", "memory.usage"),
            ("disk-usage-card", "filesystem.available"),
        ]
    # the metric query pair DBInfraPanel issues
    metric, where = infra_metric_query(pod, pod.charts[0], "pod-abc")
    assert metric == "k8s.pod.cpu.utilization - Gauge"
    assert where == 'k8s.pod.uid:"pod-abc"'


# ---------------------------------------------------------------------------
# reconstructTemplate twins (app Patterns/__tests__/reconstructTemplate.test.ts)
# ---------------------------------------------------------------------------

def test_reconstruct_template_empty_template_returns_original():
    from hyperdx_spark.analytics.drain import reconstruct_template

    assert reconstruct_template("hello world", "") == "hello world"


def test_reconstruct_template_json_separators():
    from hyperdx_spark.analytics.drain import reconstruct_template

    assert reconstruct_template(
        '{"hostname":"foo","pid":12345,"time":1700000000}',
        "hostname foo pid <*> time <*>",
    ) == '{"hostname":"foo","pid":<*>,"time":<*>}'


def test_reconstruct_template_ch_map_separators():
    from hyperdx_spark.analytics.drain import reconstruct_template

    assert reconstruct_template(
        "{'hostname':'Aarons-MacBook-Pro.local','pid':12345,'time':1700000000}",
        "hostname Aarons MacBook Pro local pid <*> time <*>",
    ) == "{'hostname':'Aarons-MacBook-Pro.local','pid':<*>,'time':<*>}"


def test_reconstruct_template_key_value_separators():
    from hyperdx_spark.analytics.drain import reconstruct_template

    assert reconstruct_template(
        "level=info msg=hello user_id=42", "level info msg hello user id <*>"
    ) == "level=info msg=hello user_id=<*>"


def test_reconstruct_template_keeps_original_when_template_short():
    from hyperdx_spark.analytics.drain import reconstruct_template

    assert reconstruct_template(
        "alpha beta gamma delta", "alpha beta"
    ) == "alpha beta gamma delta"


def test_reconstruct_template_preserves_edge_separators():
    from hyperdx_spark.analytics.drain import reconstruct_template

    assert reconstruct_template(
        "[INFO] hello world", "INFO hello world"
    ) == "[INFO] hello world"


def test_reconstruct_template_collapses_whitespace():
    from hyperdx_spark.analytics.drain import reconstruct_template

    assert reconstruct_template(
        'Error:\n  message: "failed"\n  code: 500',
        "Error message failed code <*>",
    ) == 'Error: message: "failed" code: <*>'
    assert reconstruct_template("foo\n\n\nbar", "foo bar") == "foo bar"
    assert reconstruct_template("foo\tbar", "foo bar") == "foo bar"


def test_reconstruct_template_pairs_with_miner():
    """End-to-end with the ported miner configured like the patterns UI
    (usePatterns.tsx:55-65: drain_extra_delimiters = punctuation): a mined
    template re-injected into one of its own sample rows restores the
    original separators."""
    import string

    from hyperdx_spark.analytics.drain import TemplateMiner, reconstruct_template

    logs = [f"level=info msg=hello user_id={i}" for i in (11, 22, 33)]
    tm = TemplateMiner(extra_delimiters=list(string.punctuation))
    result = None
    for line in logs:
        result = tm.add_log_message(line)
    assert result["template_mined"] == "level info msg hello user id <*>"
    assert reconstruct_template(
        logs[-1], result["template_mined"]
    ) == "level=info msg=hello user_id=<*>"


def test_strip_field_clause_reference_matrix():
    """KubernetesFilters.test.ts stripFieldClause walked."""
    from hyperdx_spark.analytics.infra import strip_field_clause as s

    ra = "ResourceAttributes"
    q = ('ResourceAttributes.k8s.cluster.name:"prod"'
         ' ResourceAttributes.k8s.namespace.name:"api" error')
    assert s(q, ra, "k8s.namespace.name") == (
        'ResourceAttributes.k8s.cluster.name:"prod" error'
    )
    assert s('ResourceAttributes.k8s.cluster.name:"prod"', ra,
             "k8s.cluster.name") == ""
    q = 'ResourceAttributes.k8s.cluster.name:"prod"'
    assert s(q, ra, "k8s.namespace.name") == q
    # a sibling field sharing a path prefix is untouched
    q = ('ResourceAttributes.k8s.pod.name:"a"'
         ' ResourceAttributes.k8s.pod.uid:"b"')
    assert s(q, ra, "k8s.pod.name") == 'ResourceAttributes.k8s.pod.uid:"b"'
    # dots are literal, not regex wildcards; metacharacters never throw
    q = 'ResourceAttributesXk8sXpodXname:"a"'
    assert s(q, ra, "k8s.pod.name") == q
    assert s("foo", "attr(", "k8s.pod.name") == "foo"


def test_resolve_comparison_click_reference_matrix():
    """PropertyComparisonChart.test.ts resolveComparisonClick walked."""
    from hyperdx_spark.display import resolve_comparison_click as r

    rows = [{"name": "GET /a"}, {"name": "GET /b"},
            {"name": "Other", "isOther": True}]
    assert r("GET /a", rows, None) == "GET /a"
    assert r(None, rows, "GET /a") is None
    assert r("Other", rows, None) is None
    assert r("missing", rows, None) is None
    assert r("GET /a", rows, "GET /a") is None  # toggle off
    assert r("GET /b", rows, "GET /a") == "GET /b"
