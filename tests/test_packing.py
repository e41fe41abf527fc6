"""Sequence packing (pipeline/packing.py): concat-and-chunk must cover
every token exactly once with full sequences (DuckDB window oracle
replays the exact rows); FFD must match an independent reference, never
overfill a pack, and stay deterministic."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hyperdx_spark.pipeline.packing import pack_ffd, pack_sequences, pack_stats

SEQ = 128


def _docs_df(spark, tokens, num_shards=4):
    rows = [(i, t) for i, t in enumerate(tokens)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long"), num_shards


def test_pack_sequences_matches_duckdb_oracle(spark):
    import duckdb

    tokens = [37, 500, 1, 128, 129, 127, 64, 64, 64, 300, 12, 1000, 5]
    df, shards = _docs_df(spark, tokens)
    got = sorted(
        tuple(r)
        for r in pack_sequences(
            df, SEQ, num_shards=shards
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {t})" for i, t in enumerate(tokens))
        + ") v(doc_id, n_tokens)"
    )
    # shard must replay Spark's xxhash64 — fetch it from Spark (the hash
    # itself is the engine's determinism primitive, not under test here)
    shard_map = {
        r["doc_id"]: r["shard"]
        for r in spark.createDataFrame(
            [(i,) for i in range(len(tokens))], "doc_id long"
        )
        .selectExpr("doc_id", f"pmod(xxhash64(doc_id), {shards}) AS shard")
        .collect()
    }
    con.sql(
        "CREATE TABLE sh AS SELECT * FROM (VALUES "
        + ", ".join(f"({d}, {s})" for d, s in shard_map.items())
        + ") v(doc_id, shard)"
    )
    want = sorted(
        tuple(r)
        for r in con.sql(f"""
        WITH c AS (
          SELECT sh.shard, docs.doc_id, docs.n_tokens,
                 sum(docs.n_tokens) OVER (PARTITION BY sh.shard
                     ORDER BY docs.doc_id) - docs.n_tokens AS s,
                 sum(docs.n_tokens) OVER (PARTITION BY sh.shard
                     ORDER BY docs.doc_id) AS e
          FROM docs JOIN sh USING (doc_id) WHERE docs.n_tokens > 0),
        x AS (
          SELECT shard, doc_id, s, e,
                 unnest(generate_series((s // {SEQ})::BIGINT,
                                        ((e - 1) // {SEQ})::BIGINT)) AS seq_id
          FROM c)
        SELECT shard, doc_id, seq_id,
               greatest(s, seq_id * {SEQ}) - s AS doc_tok_begin,
               least(e, (seq_id + 1) * {SEQ}) - s AS doc_tok_end,
               greatest(s, seq_id * {SEQ}) - seq_id * {SEQ} AS seq_off
        FROM x
        """).fetchall()
    )
    assert got == want


def test_pack_sequences_covers_tokens_exactly(spark):
    tokens = [1, 2, 3, 127, 128, 129, 1000, 50, 50, 50, 7]
    df, shards = _docs_df(spark, tokens)
    packed = pack_sequences(df, SEQ, num_shards=shards)
    rows = packed.collect()
    # per doc: fragments tile [0, n_tokens) without gaps or overlap
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["doc_tok_begin"], r["doc_tok_end"])
        )
    for d, spans in by_doc.items():
        spans.sort()
        assert spans[0][0] == 0
        assert spans[-1][1] == tokens[d]
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 == b0
    assert set(by_doc) == {i for i, t in enumerate(tokens) if t > 0}
    # per sequence: exactly SEQ tokens except each shard's last sequence
    stats = {
        (r["shard"], r["seq_id"]): r["n_tokens"]
        for r in pack_stats(packed, SEQ).collect()
    }
    last = {}
    for (sh, sq) in stats:
        last[sh] = max(last.get(sh, -1), sq)
    for (sh, sq), n in stats.items():
        if sq != last[sh]:
            assert n == SEQ, (sh, sq, n)
        else:
            assert 0 < n <= SEQ


def _ref_ffd(items, cap):
    """Independent FFD reference: items = [(doc_id, tokens)] of ONE shard."""
    order = sorted(items, key=lambda x: (-x[1], x[0]))
    packs = []  # remainders
    out = {}
    for did, toks in order:
        if toks <= 0:
            continue
        if toks > cap:
            out[did] = (len(packs), True)
            packs.append(0)
            continue
        for pid, rem in enumerate(packs):
            if rem >= toks:
                packs[pid] = rem - toks
                out[did] = (pid, False)
                break
        else:
            out[did] = (len(packs), False)
            packs.append(cap - toks)
    return out


def test_pack_ffd_matches_reference_and_caps(spark):
    tokens = [100, 28, 28, 28, 120, 8, 8, 200, 64, 64, 1, 127, 128]
    df, shards = _docs_df(spark, tokens)
    rows = pack_ffd(df, SEQ, num_shards=shards).collect()
    shard_of = {r["doc_id"]: r["shard"] for r in rows}
    per_shard: dict = {}
    for i, t in enumerate(tokens):
        if i in shard_of:
            per_shard.setdefault(shard_of[i], []).append((i, t))
    for sh, items in per_shard.items():
        want = _ref_ffd(items, SEQ)
        got = {
            r["doc_id"]: (r["pack_id"], r["oversize"])
            for r in rows
            if r["shard"] == sh
        }
        assert got == want, sh
    # cap invariant: non-oversize packs never exceed SEQ tokens
    fills: dict = {}
    for r in rows:
        key = (r["shard"], r["pack_id"])
        fills.setdefault(key, [0, False])
        fills[key][0] += r["n_tokens"]
        fills[key][1] = fills[key][1] or r["oversize"]
    for (sh, pid), (n, over) in fills.items():
        assert over or n <= SEQ, (sh, pid, n)
    # determinism
    again = pack_ffd(df, SEQ, num_shards=shards).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=0, max_value=300), min_size=1,
                max_size=40))
def test_fuzz_packing_invariants(spark, tokens):
    df, shards = _docs_df(spark, tokens, num_shards=3)
    packed = pack_sequences(df, 97, num_shards=shards).collect()
    total = sum(
        r["doc_tok_end"] - r["doc_tok_begin"] for r in packed
    )
    assert total == sum(t for t in tokens if t > 0)
    for r in packed:
        assert 0 <= r["seq_off"] < 97
        assert 0 < r["doc_tok_end"] - r["doc_tok_begin"] <= 97
    ffd = pack_ffd(df, 97, num_shards=shards).collect()
    assert {r["doc_id"] for r in ffd} == {
        i for i, t in enumerate(tokens) if t > 0
    }


def test_first_fit_tree_equals_linear_scan():
    """_FirstFitTree must pick EXACTLY the pack a naive linear first-fit
    scan picks, across thousands of random placements (the r8 'weak'
    rewrite changes cost, never output)."""
    import random

    from hyperdx_spark.pipeline.packing import _FirstFitTree

    rng = random.Random(7)
    for trial in range(20):
        cap = rng.randint(50, 4000)
        sizes = sorted(
            (rng.randint(1, cap) for _ in range(rng.randint(1, 3000))),
            reverse=True,
        )
        tree = _FirstFitTree()
        naive: list = []
        for s in sizes:
            want = next((i for i, r in enumerate(naive) if r >= s), -1)
            got = tree.find_first(s)
            assert got == want, (trial, s)
            if want >= 0:
                naive[want] -= s
                tree.take(want, s)
            else:
                naive.append(cap - s)
                assert tree.add_bin(cap - s) == len(naive) - 1


def test_pack_ffd_string_ids(spark):
    df = spark.createDataFrame(
        [(f"doc-{i:03d}", t) for i, t in enumerate([100, 28, 120, 8, 200, 64])],
        "doc_id string, n_tokens long",
    )
    rows = pack_ffd(df, SEQ, num_shards=2).collect()
    assert {r["doc_id"] for r in rows} == {f"doc-{i:03d}" for i in range(6)}
    assert all(isinstance(r["doc_id"], str) for r in rows)
    over = {r["doc_id"]: r["oversize"] for r in rows}
    assert over["doc-004"] and not over["doc-000"]


def test_pack_ffd_auto_shards(spark):
    # default num_shards derives from corpus size (floor 64): a small
    # corpus spreads over 64 hash shards, output covers every doc once
    df = spark.createDataFrame(
        [(i, 10 + i % 50) for i in range(500)], "doc_id long, n_tokens long"
    )
    rows = pack_ffd(df, SEQ).collect()
    assert len(rows) == 500
    assert len({r["shard"] for r in rows}) > 1
    assert max(r["shard"] for r in rows) < 64


def test_sequence_manifest(spark):
    """Manifest rows reassemble each sequence exactly: contiguous offsets,
    full coverage, spans ordered by in-sequence position."""
    tokens = [37, 500, 1, 128, 129, 127, 64, 64, 64, 300, 12, 1000, 5]
    df, shards = _docs_df(spark, tokens)
    packed = pack_sequences(df, SEQ, num_shards=shards)
    from hyperdx_spark.pipeline.packing import sequence_manifest

    man = sequence_manifest(packed).collect()
    assert sum(r["n_tokens"] for r in man) == sum(tokens)
    for r in man:
        spans = r["spans"]
        # offsets start at 0 and tile the sequence contiguously
        assert spans[0]["off"] == 0
        pos = 0
        for s in spans:
            assert s["off"] == pos
            assert 0 <= s["begin"] < s["end"]
            pos += s["end"] - s["begin"]
        assert pos == r["n_tokens"] <= SEQ


def test_sequence_manifest_adds_no_exchange(spark):
    """The manifest's groupBy(shard, seq_id) rides pack_sequences' window
    partitioning (hashpartitioning on shard) — zero Exchanges beyond the
    packing chain's own one (SCALE.md-audited; pinned here so a future
    edit that breaks the partitioning reuse regresses loudly)."""
    from hyperdx_spark.pipeline.packing import pack_sequences, sequence_manifest

    df = spark.createDataFrame(
        [(i, 1 + i % 7) for i in range(200)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(df, 16, num_shards=8)
    base_plan = packed._jdf.queryExecution().executedPlan().toString()
    man_plan = (
        sequence_manifest(packed)._jdf.queryExecution().executedPlan().toString()
    )
    assert base_plan.count("Exchange") == 1, base_plan
    assert man_plan.count("Exchange") == base_plan.count("Exchange"), man_plan
