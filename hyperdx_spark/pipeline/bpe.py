"""Trainable byte-pair encoding — vocab training and encoding as corpus
operators.

Architecture follows how production tokenizer trainers actually scale
(e.g. the HuggingFace tokenizers pipeline): the 100 TB-shaped work is ONE
distributed pass that reduces the corpus to a (word, frequency) table —
every later step operates on that bounded table, never on raw text again.

* :func:`train_bpe` — distributed pre-token counting (explode + map-side
  combined groupBy over :data:`~hyperdx_spark.pipeline.text.BPE_PRETOKEN_PATTERN`
  pieces), then classic merge selection over the collected word-frequency
  table. The merge loop is O(vocab_size x distinct words) LOCAL work on a
  table capped by ``max_words`` (top by frequency) — the standard
  corpus-scale trick: distinct pre-tokens plateau in the low millions no
  matter how many petabytes feed them.
* :func:`encode_token_count` — distributed encoding with a trained merge
  list via an Arrow-batched worker; per-word results are memoized per
  batch, so the common Zipf-shaped batch does a few thousand real encodes
  for millions of words.

Determinism: merge ties break on (pair lexicographic) after frequency, so
the same corpus always yields the same vocab — the property that makes the
pure-Python oracle in tests exact.

The reference engine has no tokenizer training (observability store);
this extends the training-data tier (SURVEY §2 pipeline extensions)
alongside the BPE-ish regex counter in ``pipeline/text.py:177-205``.
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hyperdx_spark.pipeline.text import BPE_PRETOKEN_PATTERN

# Python-`re` twin of BPE_PRETOKEN_PATTERN (no \p{..} classes in stdlib
# re): letters = [^\W\d_] (unicode-aware), numbers = \d, symbols =
# non-word-or-underscore. Identical on ASCII and ordinary unicode text;
# the only drift is \p{N}'s Nl/No characters (Roman numerals etc.),
# which \d excludes — negligible for token-count estimation and pinned
# nowhere else (training words come from the JVM pattern).
PY_BPE_PRETOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?(?:[^\w\s]|_)+|\s+"
)


def word_frequencies(
    df: DataFrame,
    *,
    text_col: str = "text",
    lowercase: bool = False,
) -> DataFrame:
    """(word, freq) over the corpus — the one distributed pass BPE
    training needs. Explode + groupBy = map-side partial counts; the
    result is bounded by distinct pre-tokens, not corpus size."""
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    pieces = F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_PATTERN), F.lit(0))
    return (
        df.select(F.explode(pieces).alias("word"))
        .where(F.trim("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    out = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    num_merges: int,
    *,
    text_col: str = "text",
    lowercase: bool = False,
    min_word_freq: int = 1,
    max_words: int = 1_000_000,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the merge
    list in rank order (the entire trained state — encoding needs nothing
    else). ``max_words`` caps the driver-side table at the most frequent
    pre-tokens (rare-tail words contribute negligibly to pair counts);
    the cap is a TopK aggregation, never a global sort.
    """
    wf = word_frequencies(df, text_col=text_col, lowercase=lowercase)
    if min_word_freq > 1:
        wf = wf.where(F.col("freq") >= min_word_freq)
    rows = (
        wf.orderBy(F.col("freq").desc(), F.col("word"))
        .limit(int(max_words))  # TakeOrdered — no full sort/shuffle of the tail
        .collect()
    )
    return _train_merges(
        [(r["word"], int(r["freq"])) for r in rows],
        int(num_merges),
        min_pair_freq=min_pair_freq,
    )


def _train_merges(
    word_freqs: list[tuple[str, int]],
    num_merges: int,
    *,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """The merge-selection loop over a (word, freq) table, with INCREMENTAL
    pair-count maintenance — the standard trick production BPE trainers use
    (e.g. subword-nmt's learn_bpe): build the pair-frequency table and a
    pair -> {words containing it} inverted index ONCE, then per merge update
    counts only for the words the merged pair touches. Selection rides a
    max-heap with lazy invalidation (an entry is live iff its frequency
    matches the authoritative table; every count change pushes a fresh
    entry). A full recount per merge is O(merges x words x word-len) — days
    at a real 32k-merge vocab over the 1M-word cap; this is
    O(total-updates), dominated by the Zipf head's few thousand hot words.

    Selection order is EXACTLY the naive loop's: max frequency, ties ->
    lexicographically smallest pair (the heap key (-freq, pair) pops in that
    order). Distinct input words stay distinct under merging (a word's
    symbol tuple concatenates back to the word string), so per-word state
    never collides.
    """
    import heapq
    from collections import Counter, defaultdict

    # accumulate defensively (the distributed pass already emits distinct
    # words, so this is a straight copy)
    acc: dict[str, int] = {}
    for w, f in word_freqs:
        acc[w] = acc.get(w, 0) + f
    syms: list[tuple] = [tuple(w) for w in acc]
    freqs: list[int] = list(acc.values())

    pair_freq: dict[tuple, int] = {}
    where: defaultdict[tuple, set] = defaultdict(set)  # pair -> word ids
    for wid, (sym, f) in enumerate(zip(syms, freqs)):
        for p, c in Counter(zip(sym, sym[1:])).items():
            pair_freq[p] = pair_freq.get(p, 0) + c * f
            where[p].add(wid)

    heap = [(-f, p) for p, f in pair_freq.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        neg, pair = heapq.heappop(heap)
        cur = pair_freq.get(pair, 0)
        if -neg != cur:
            continue  # stale: a fresher entry was pushed when cur changed
        if cur < min_pair_freq:
            break  # live max is below the floor -> nothing better remains
        merges.append(pair)
        changed: set = set()
        for wid in where.pop(pair, ()):
            sym, f = syms[wid], freqs[wid]
            old = Counter(zip(sym, sym[1:]))
            new_sym = _merge_word(sym, pair)
            syms[wid] = new_sym
            new = Counter(zip(new_sym, new_sym[1:]))
            for p in old.keys() | new.keys():
                d = new.get(p, 0) - old.get(p, 0)
                if d:
                    pair_freq[p] = pair_freq.get(p, 0) + d * f
                    changed.add(p)
                if new.get(p, 0):
                    where[p].add(wid)
                elif old.get(p, 0):
                    where[p].discard(wid)
        pair_freq.pop(pair, None)
        changed.discard(pair)
        for p in changed:
            cur_p = pair_freq.get(p, 0)
            if cur_p > 0:
                heapq.heappush(heap, (-cur_p, p))
            else:
                pair_freq.pop(p, None)
                where.pop(p, None)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE pre-token with a trained merge-rank table (the standard
    lowest-rank-first merge loop)."""
    sym = tuple(word)
    while len(sym) > 1:
        best_rank, best_pair = None, None
        for a, b in zip(sym, sym[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        sym = _merge_word(sym, best_pair)
    return list(sym)


def encode_token_count(
    col: Column | str,
    merges: list[tuple[str, str]],
    *,
    lowercase: bool = False,
) -> Column:
    """Per-document token count under a trained BPE vocab — the real
    counterpart of the regex approximation in ``text.bpe_token_count``.

    Arrow-batched worker; a per-batch word cache turns the Zipf-shaped
    word stream into a few thousand real encodes per million words.
    """
    import re as _re

    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    pat = _re.compile(PY_BPE_PRETOKEN_PATTERN)

    def _count(s: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def doc_tokens(text) -> int:
            if text is None:
                return 0
            if lowercase:
                text = text.lower()
            n = 0
            for w in pat.findall(text):
                hit = cache.get(w)
                if hit is None:
                    hit = len(encode_word(w, ranks))
                    cache[w] = hit
                n += hit
            return n

        return s.map(doc_tokens)

    c = F.col(col) if isinstance(col, str) else col
    return pandas_udf(_count, "long")(c)


def corpus_alphabet(df: DataFrame, *, text_col: str = "text") -> list[str]:
    """Distinct characters of the corpus — the base-symbol tier of the
    vocab. One explode+distinct over single chars; bounded by the alphabet
    (hundreds-to-thousands of rows), not corpus size."""
    chars = (
        df.select(F.explode(F.split(F.col(text_col), "")).alias("c"))
        .where(F.col("c") != "")
        .distinct()
        .collect()
    )
    return sorted(r["c"] for r in chars)


def build_vocab(
    merges: list[tuple[str, str]],
    alphabet: "list[str] | None" = None,
) -> dict[str, int]:
    """Token -> id table for a trained merge list: base singletons first
    (the supplied *alphabet* — from :func:`corpus_alphabet` — unioned with
    every char of the merge parts; sorted, stable), then one merged token
    per rank in merge order — the standard BPE vocab construction. With an
    alphabet that covers the corpus, every encoded token has an id."""
    singles = {c for pair in merges for part in pair for c in part}
    if alphabet:
        singles |= set(alphabet)
    vocab: dict[str, int] = {c: i for i, c in enumerate(sorted(singles))}
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def encode_token_ids(
    col: Column | str,
    merges: list[tuple[str, str]],
    *,
    alphabet: "list[str] | None" = None,
    lowercase: bool = False,
    unk_id: int = -1,
) -> Column:
    """Per-document token-id arrays under a trained vocab — the trainer-
    facing output (`array<int>`), one Arrow-batched pass with the same
    per-batch word memoization as :func:`encode_token_count`. Characters
    outside the trained alphabet map to ``unk_id``.

    Scale shape: row-local (no shuffle); the vocab + merge ranks broadcast
    with the serialized UDF (a 32k-merge vocab is ~1 MB)."""
    import re as _re

    import pandas as pd  # noqa: F401  (pandas_udf type hints)
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    vocab = build_vocab(merges, alphabet)
    pat = _re.compile(PY_BPE_PRETOKEN_PATTERN)

    def _ids(s: "pd.Series") -> "pd.Series":
        cache: dict[str, list[int]] = {}

        def doc_ids(text):
            if text is None:
                return []
            if lowercase:
                text = text.lower()
            out: list[int] = []
            for w in pat.findall(text):
                hit = cache.get(w)
                if hit is None:
                    hit = [vocab.get(t, unk_id) for t in encode_word(w, ranks)]
                    cache[w] = hit
                out.extend(hit)
            return out

        return s.map(doc_ids)

    c = F.col(col) if isinstance(col, str) else col
    return pandas_udf(_ids, "array<int>")(c)
