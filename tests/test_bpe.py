"""Trainable BPE (pipeline/bpe.py): merge selection must equal an
independent pure-Python reference on the same corpus, encoding must obey
BPE invariants, and the distributed count must equal driver-side
re-encoding."""

import re

import pytest
from pyspark.sql import functions as F

from hyperdx_spark.pipeline import bpe
from hyperdx_spark.pipeline.bpe import PY_BPE_PRETOKEN_PATTERN as BPE_PRETOKEN_PATTERN

CORPUS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest newest lowest",
    "the quick brown fox the quick brown fox the the the",
]


def _ref_train(texts, num_merges):
    """Independent reference: textbook BPE over word frequencies."""
    pat = re.compile(BPE_PRETOKEN_PATTERN)
    words = {}
    for t in texts:
        for w in pat.findall(t):
            if w.strip():
                words[tuple(w)] = words.get(tuple(w), 0) + 1
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for sym, f in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        merges.append(best[0])
        out = {}
        for sym, f in words.items():
            new = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best[0]:
                    new.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            out[tuple(new)] = out.get(tuple(new), 0) + f
        words = out
    return merges


def test_train_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = bpe.train_bpe(df, 12)
    assert got == _ref_train(CORPUS, 12)
    assert len(got) > 4  # the corpus genuinely supports merges


def test_encode_invariants(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges = bpe.train_bpe(df, 10)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # a fully-merged training word round-trips to fewer symbols
    assert len(bpe.encode_word("newest", ranks)) < len("newest")
    # concatenation of encoded symbols reconstructs the word exactly
    for w in ("newest", "lowest", "quick", "zebra"):
        assert "".join(bpe.encode_word(w, ranks)) == w
    # more merges never increase a word's token count
    fewer = {tuple(p): i for i, p in enumerate(merges[:3])}
    for w in ("newest", "widest", "brown"):
        assert len(bpe.encode_word(w, ranks)) <= len(bpe.encode_word(w, fewer))


def test_distributed_count_equals_driver_encoding(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                               "doc_id long, text string")
    merges = bpe.train_bpe(df, 8)
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe.encode_token_count("text", merges).alias("n")
        ).collect()
    }
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    pat = re.compile(BPE_PRETOKEN_PATTERN)
    want = {
        i: sum(len(bpe.encode_word(w, ranks)) for w in pat.findall(t))
        for i, t in enumerate(CORPUS)
    }
    assert got == want
    # NULL text counts 0
    ndf = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert ndf.select(bpe.encode_token_count("text", merges).alias("n")) \
        .first()["n"] == 0


def test_word_frequencies_is_bounded_aggregation(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    wf = {r["word"]: r["freq"] for r in bpe.word_frequencies(df).collect()}
    assert wf[" low"] == 4 and wf["low"] == 1  # GPT-2 space-prefixed pieces
    assert wf[" the"] == 4 and wf["the"] == 1


def _naive_merges(word_freqs, num_merges, min_pair_freq=2):
    """The full-recount loop the incremental trainer must replicate exactly."""
    words = {}
    for w, f in word_freqs:
        words[tuple(w)] = words.get(tuple(w), 0) + f
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for sym, f in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        merges.append(best[0])
        words = {
            bpe._merge_word(sym, best[0]): f for sym, f in words.items()
        }
    return merges


def test_incremental_merge_loop_equals_naive_randomized():
    """Seeded random corpora, heavy tie pressure (tiny alphabet), several
    merge budgets and pair-frequency floors: the incremental heap loop must
    produce the exact naive merge list, including tie-breaks and the
    early-stop point."""
    import random

    rng = random.Random(20260815)
    for trial in range(8):
        alpha = "abcd" if trial % 2 == 0 else "abcdefgh"
        n_words = rng.randint(30, 200)
        wf = [
            (
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12))),
                rng.randint(1, 50),
            )
            for _ in range(n_words)
        ]
        for num_merges in (1, 7, 40, 10_000):
            for floor in (1, 2, 5):
                got = bpe._train_merges(wf, num_merges, min_pair_freq=floor)
                want = _naive_merges(wf, num_merges, min_pair_freq=floor)
                assert got == want, (trial, num_merges, floor)


def test_incremental_merge_loop_exhausts_cleanly():
    # merge budget far past exhaustion: every word collapses to one symbol
    wf = [("aaab", 10), ("ab", 3)]
    got = bpe._train_merges(wf, 100, min_pair_freq=1)
    assert got == _naive_merges(wf, 100, min_pair_freq=1)
    # all pairs consumed -> further merges impossible
    ranks = {p: i for i, p in enumerate(got)}
    assert bpe.encode_word("aaab", ranks) == ["aaab"]


def test_build_vocab_and_encode_ids(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges = bpe.train_bpe(df, 8)
    alphabet = bpe.corpus_alphabet(df)
    vocab = bpe.build_vocab(merges, alphabet)
    # singletons first, then one merged token per rank; ids dense from 0
    assert sorted(vocab.values()) == list(range(len(vocab)))
    for a, b in merges:
        assert a + b in vocab
    # ids round-trip to the encoded tokens, and their count matches
    # encode_token_count exactly
    inv = {i: t for t, i in vocab.items()}
    out = df.select(
        "text",
        bpe.encode_token_ids("text", merges, alphabet=alphabet).alias("ids"),
        bpe.encode_token_count("text", merges).alias("n"),
    ).collect()
    import re

    pat = re.compile(bpe.PY_BPE_PRETOKEN_PATTERN)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for r in out:
        assert len(r["ids"]) == r["n"]
        toks = [t for w in pat.findall(r["text"]) for t in bpe.encode_word(w, ranks)]
        decoded = [inv.get(i, "<unk>") for i in r["ids"]]
        assert decoded == toks
        assert "".join(decoded) == r["text"]  # lossless reconstruction
    # unknown characters map to unk_id
    zdf = spark.createDataFrame([("éxotic",)], "text string")
    ids = zdf.select(bpe.encode_token_ids("text", merges, unk_id=-1).alias("i")).first()["i"]
    assert -1 in ids
