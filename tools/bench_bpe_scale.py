"""Vocab-axis scale measurement for the BPE trainer (VERDICT r9 #2).

The corpus-size axis was measured in r9 (train FLAT sf1 -> sf10; the one
distributed pass bounds everything by distinct pre-tokens). This harness
measures the OTHER axis — vocab size — which the r9 full-recount loop
failed (O(merges x words x word-len): ~10^11 driver ops at a real
32k-merge vocab over the documented 1M-word cap).

Two measurements:

1. ``--corpus``: the natural sf10 table end-to-end (distributed pass +
   merge loop). The synthetic corpus has only ~490 distinct pre-tokens, so
   the merge loop exhausts early — this pins the distributed-pass cost.
2. ``--vocab`` (default): a seeded 1M-distinct-word Zipf table at the
   documented ``max_words`` cap, trained to 32,768 merges with
   ``_train_merges``. This is the operator's actual use-case shape. The
   incremental loop's work is bounded by total pair-delta updates
   (<= sum(word_len) touches over the whole run, INDEPENDENT of merge
   count), so 32k merges cost the same order as 200.

A 20k-word / 500-merge slice is replayed through the naive full-recount
loop to assert oracle equality inside the same run (the full 1M x 32k
naive replay is exactly the days-long computation being eliminated).

Usage: python tools/bench_bpe_scale.py [--corpus]
"""

from __future__ import annotations

import random
import string
import sys
import time

sys.path.insert(0, "/root/repo")

from hyperdx_spark.pipeline.bpe import _merge_word, _train_merges

N_WORDS = 1_000_000
N_MERGES = 32_768
SEED = 20260815


def synth_words(n: int, seed: int) -> list[tuple[str, int]]:
    """n DISTINCT pseudo-words with Zipf-ish frequencies: a hot head of
    short common stems and a long tail, like a real crawl's word table."""
    rng = random.Random(seed)
    alpha = string.ascii_lowercase
    seen: set[str] = set()
    out: list[tuple[str, int]] = []
    # head: short words over a small alphabet (dense pair collisions)
    while len(out) < n // 20:
        w = "".join(rng.choice(alpha[:8]) for _ in range(rng.randint(2, 6)))
        if w not in seen:
            seen.add(w)
            out.append((w, rng.randint(1_000, 100_000)))
    # tail: longer words over the full alphabet
    while len(out) < n:
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(4, 14)))
        if w not in seen:
            seen.add(w)
            out.append((w, rng.randint(1, 50)))
    return out


def naive_merges(word_freqs, num_merges, min_pair_freq=1):
    words: dict[tuple, int] = {}
    for w, f in word_freqs:
        words[tuple(w)] = words.get(tuple(w), 0) + f
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple, int] = {}
        for sym, f in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        merges.append(best[0])
        words = {_merge_word(s, best[0]): f for s, f in words.items()}
    return merges


def bench_vocab_axis() -> None:
    t0 = time.time()
    wf = synth_words(N_WORDS, SEED)
    print(f"synth table: {len(wf):,} distinct words in {time.time()-t0:.1f}s")

    t0 = time.time()
    merges = _train_merges(wf, N_MERGES, min_pair_freq=1)
    dt = time.time() - t0
    print(f"incremental train: {len(merges):,} merges over {len(wf):,} words "
          f"in {dt:.1f}s")

    # oracle equality on a slice where the naive loop is still tractable
    slice_wf = wf[:20_000]
    t0 = time.time()
    got = _train_merges(slice_wf, 500, min_pair_freq=1)
    t_inc = time.time() - t0
    t0 = time.time()
    want = naive_merges(slice_wf, 500, min_pair_freq=1)
    t_naive = time.time() - t0
    assert got == want, "incremental != naive on the 20k x 500 slice"
    print(f"oracle slice (20k words x 500 merges): EQUAL "
          f"(incremental {t_inc:.1f}s vs naive {t_naive:.1f}s, "
          f"{t_naive/max(t_inc,1e-9):.0f}x)")


def bench_corpus_axis() -> None:
    from hyperdx_spark.pipeline.bpe import train_bpe
    from hyperdx_spark.session import get_spark

    spark = get_spark("bpe_scale", cpus=32)
    df = spark.read.parquet("/root/repo/.scale/sf10/documents.parquet")
    t0 = time.time()
    merges = train_bpe(df, N_MERGES, min_pair_freq=1)
    print(f"sf10 end-to-end: {len(merges)} merges (pair space exhausts — "
          f"~490 distinct pre-tokens) in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    if "--corpus" in sys.argv:
        bench_corpus_axis()
    else:
        bench_vocab_axis()
