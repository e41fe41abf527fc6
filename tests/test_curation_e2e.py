"""End-to-end curation pipeline composition: the stages a real training-data
run chains — normalize -> exact dedup -> near-dup (SemDeDup within k-means
clusters) -> quality gates (Gopher conjunction + perplexity) -> DSIR
selection -> sequence packing — proving the operator surfaces actually
compose (schemas line up, ids thread through) and the final packed output
is deterministic under repartitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hyperdx_spark.pipeline import (
    clustering,
    dedup,
    dsir,
    packing,
    perplexity,
    similarity,
    text,
    textnorm,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """120 synthetic docs: mojibake variants, exact dups (modulo
    normalization), a garbage tier, and a 'target-like' tier."""
    base = [
        "the quick brown fox jumps over the lazy caf\u00e9 dog again",
        "a steady stream of na\u00efve english sentences flows through here",
        "pack my box with five dozen liquor jugs for the r\u00e9sum\u00e9 trip",
        "the five boxing wizards jump quickly over the rivi\u00e8re",
    ]

    def body(i: int) -> str:
        # ~55 varied words so the Gopher word-count gate (>= 50) passes
        sents = " ".join(base[(i + j) % 4] for j in range(4))
        tail = (
            f"section {i % 24} discusses topic number {i % 24} in careful"
            " detail with extra notes about the method and its results"
        )
        return sents + " " + tail

    junk = ["zxqvt", "wkrpo", "jjftu", "bbnmi", "qqrsa", "vvwxe"]
    rows = []
    for i in range(120):
        t = body(i)
        if i % 10 == 7:
            # mojibake twin of the i-1 doc: IDENTICAL once repaired — the
            # accented original's UTF-8 bytes wrongly decoded as cp1252,
            # plus an NBSP for the whitespace-collapse pass
            t = body(i - 1).replace(" ", "\u00a0", 1)
            t = t.encode("utf-8").decode("cp1252")
        if i % 17 == 5 and i % 10 != 7:
            # garbage tier: long enough and stopword-sprinkled so it
            # PASSES Gopher (the perplexity gate is what must catch it).
            # Disjoint from the twin branch (doc 107 satisfies both
            # residues) and i-unique (the i tag) so no garbage doc is
            # accidentally exact-deduped away.
            t = " ".join(
                ("the " if j % 3 == 0 else "") + junk[(i + j) % 6]
                + str(j % 7)
                for j in range(55)
            ) + f" tag{i}"
        rows.append((i, t))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def embeddings(spark, corpus):
    """Deterministic 8-d embeddings with controlled geometry: two coarse
    families (clusters for k-means), distinct docs ~0.98 cosine apart
    (NOT near-dups at 0.999), and groups 2/3 of the doc_id % 24 cycle
    sharing ONE vector — true semantic duplicates with different text."""
    import hashlib

    def vec(key: str):
        h = hashlib.md5(key.encode()).digest()
        fam = [1.0, 0.0] if h[0] % 2 == 0 else [0.0, 1.0]
        tail = [((b % 64) / 64.0 - 0.5) * 1.5 for b in h[1:7]]
        return [10.0 * fam[0], 10.0 * fam[1]] + tail

    rows = []
    for r in corpus.collect():
        i = r["doc_id"]
        if i % 17 == 5:
            key = "garbage:" + r["text"]
        else:
            grp = i % 24
            key = f"grp:{2 if grp == 3 else grp}"  # 3 aliases onto 2
        rows.append((i, vec(key)))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_full_curation_chain(spark, corpus, embeddings):
    # 1. clean: mojibake repair + NFC + control/whitespace canonicalization.
    # Stage boundaries are localCheckpoint()ed: a real curation run
    # materializes between stages too — without it every action replays
    # the WHOLE upstream chain (Arrow UDFs included), and the iterative
    # connected-components pass multiplies that replay per iteration.
    cleaned = textnorm.normalize_for_dedup(corpus).localCheckpoint()
    # the mojibake twins now hash with their originals
    n_before = corpus.select("text").distinct().count()
    n_after = cleaned.select("text").distinct().count()
    assert n_after < n_before

    # 2. exact dedup over the CLEANED text (the composition textnorm's
    # docstring promises)
    deduped = dedup.drop_exact_duplicates(cleaned).localCheckpoint()
    assert deduped.count() == n_after
    # every mojibake twin lost to its lower-id original
    kept = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    assert all((i - 1) in kept or (i not in kept) for i in range(7, 120, 10))

    # 3. semantic near-dup: k-means clusters -> exhaustive pairs WITHIN
    # clusters -> SemDeDup keeper policy
    emb = embeddings.join(
        deduped.select(F.col("doc_id").alias("vec_id")), on="vec_id",
        how="left_semi",
    )
    cents = clustering.kmeans_fit(emb, 2, iterations=2)
    blocked = clustering.kmeans_assign(emb, cents)
    pairs = similarity.cosine_pairs(
        blocked, threshold=0.999, exhaustive=True, block_col="cluster"
    )
    scored = deduped.withColumn(
        "score", F.octet_length("text").cast("double")
    )
    sem_kept = dedup.drop_near_duplicates(
        scored, pairs.select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
        ), id_col="doc_id", score_col="score",
    ).localCheckpoint()
    # groups 2/3 share a vector: the semantic pass drops real docs
    assert 0 < sem_kept.count() < deduped.count()

    # 4. quality gates: Gopher conjunction + CCNet perplexity against a
    # target LM fit on the clean tier
    garbage = {i for i in range(120) if i % 17 == 5 and i % 10 != 7}
    sig = text.corpus_signals(sem_kept)
    gophered = sig.where(F.col("__sig.gopher_pass")).select(
        "doc_id", "text"
    ).localCheckpoint()
    target = gophered.where(F.col("doc_id") % 3 == 0)
    lm = perplexity.bigram_lm_fit(target, vocab=256)
    # the CCNet separation claim: every garbage doc scores strictly
    # worse (higher avg NLL) under the target LM than every clean doc
    nll = {
        r["doc_id"]: r["avg_nll"]
        for r in perplexity.avg_nll_nats(
            perplexity.perplexity_score(sem_kept, lm)
        ).collect()
    }
    clean_nll = [v for d, v in nll.items() if d not in garbage]
    junk_nll = [v for d, v in nll.items() if d in garbage]
    assert junk_nll and min(junk_nll) > max(clean_nll)
    thr = (max(clean_nll) + min(junk_nll)) / 2
    filtered = perplexity.perplexity_filter(
        gophered, lm, thr, keep_empty=False
    ).localCheckpoint()
    surviving = {r["doc_id"] for r in filtered.select("doc_id").collect()}
    assert surviving.isdisjoint(garbage)
    assert len(surviving) > 0

    # 5. DSIR selection toward the target distribution
    selected = dsir.dsir_select(
        filtered, target, 10, buckets=64, temperature=1.0
    )
    sel_rows = selected.collect()
    assert len(sel_rows) == 10
    assert {"dsir_lw_fp", "dsir_rank"} <= set(selected.columns)

    # 6. pack the survivors into fixed-length training sequences
    with_tokens = selected.select(
        "doc_id", text.token_count("text").alias("n_tokens")
    )
    packed = packing.pack_sequences(with_tokens, 32, num_shards=2)
    spans = packed.collect()
    total = sum(r["doc_tok_end"] - r["doc_tok_begin"] for r in spans)
    want_total = sum(r["n_tokens"] for r in with_tokens.collect())
    assert total == want_total  # every token covered exactly once

    # determinism: the whole chain under a different partitioning yields
    # the same selected ids and the same packed spans
    selected2 = dsir.dsir_select(
        filtered.repartition(7), target, 10, buckets=64, temperature=1.0
    )
    assert sorted(r["doc_id"] for r in sel_rows) == sorted(
        r["doc_id"] for r in selected2.collect()
    )
