"""Perplexity-based quality filtering (CCNet-style).

Public method: Wenzek et al. 2019, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data" — score each document by the
perplexity of a language model trained on a trusted target corpus, and
keep the low-perplexity (target-like) slice.  Here the LM is an
add-``alpha`` smoothed **hashed bigram model** (tokens hashed into a
``vocab`` bucket space with the engine-portable md5 key), which keeps the
whole chain exactly replayable by an independent engine:

* token/bigram bucketing uses the md5 hash (`sampling.py` trick);
* every log-probability is stored as ``floor(x * 1e6 + 0.5)`` of the IEEE
  double — integer micronats (see dsir.LAM_SCALE for why 1e6), so per-document totals are EXACT integer
  sums (the `dsir.py` pattern);
* the keep/drop decision compares ``sum_lp_fp >= threshold_lp_fp * n`` —
  an integer cross-multiplication, no float boundary anywhere.

Model::

    P(w2 | w1) = (c(w1, w2) + alpha) / (c(w1) + alpha * vocab)

per-document score = mean bigram log-prob (micronats); perplexity =
``exp(-mean)``.  Documents with fewer than 2 tokens have no bigrams and
score 0 (kept by any threshold below 0 — the CCNet head bucket).

Scale shapes (100 TB):

* fit = ONE map-side-combined groupBy over observed bigram keys plus one
  over unigram keys (sparse — bounded by observed vocabulary, not V²);
* scoring = row-local bigram explode -> two broadcast joins (bigram and
  unigram count tables) -> one partial-aggregated groupBy on the doc id;
* the filter itself is a row-local integer comparison after that one
  shuffle.

The observability reference (hyperdxio/hyperdx) has no curation surface;
this extends the LLM-pipeline tier alongside ``dsir.py`` / ``quality.py``.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dsir import LAM_SCALE, _tokens
from .dsir import gram_bucket as token_bucket  # same 60-bit md5 bucket —
# one definition keeps the three md5-bucket call sites (sampling, dsir,
# here) in sync with the oracle's substr(md5(...), 1, 15) replay

_KEY_DIGITS = 15


def _bigram_ids_of(ids: Column) -> Column:
    """Array of (b1, b2) structs for consecutive pairs of an ALREADY
    MATERIALIZED token-id array column.  ``ids`` must be a bound column:
    interpreted HOFs do no CSE, so an inlined transform-over-split
    expression would re-hash the whole document inside every
    ``element_at`` — O(len²) per doc (the dsir._grams_of lesson)."""
    idx = F.sequence(F.lit(1), F.size(ids) - 1)
    return F.when(
        F.size(ids) >= 2,
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(ids, i).alias("b1"),
                F.element_at(ids, i + 1).alias("b2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<b1:long,b2:long>>"))


def _bigram_rows(
    df: DataFrame, text_col: str, vocab: int, seed: int, extra: list[str]
):
    """``extra`` columns + exploded (b1, b2) bigram columns, with the
    token-id array bound to a real column first."""
    return (
        df.select(*extra, _tokens(F.col(text_col)).alias("__toks"))
        .select(
            *extra,
            F.transform(
                F.col("__toks"), lambda t: token_bucket(t, vocab, seed)
            ).alias("__ids"),
        )
        .select(
            *extra, F.explode(_bigram_ids_of(F.col("__ids"))).alias("bg")
        )
        .select(
            *extra, F.col("bg.b1").alias("b1"), F.col("bg.b2").alias("b2")
        )
    )


def bigram_lm_fit(
    df: DataFrame,
    text_col: str = "text",
    *,
    vocab: int = 65536,
    seed: int = 0,
) -> dict:
    """Fit the hashed bigram counts on the target corpus.

    Returns ``{"bigrams": DataFrame(b1, b2, c2), "unigrams":
    DataFrame(b1, c1), "vocab": vocab, "seed": seed}``.  Both frames are
    SPARSE (observed keys only) and map-side combined; the unigram count
    is over bigram LEFT contexts, so the conditional rows sum to c1
    exactly."""
    bg = _bigram_rows(df, text_col, vocab, seed, [])
    bigrams = bg.groupBy("b1", "b2").agg(F.count("*").alias("c2"))
    unigrams = bg.groupBy("b1").agg(F.count("*").alias("c1"))
    return {"bigrams": bigrams, "unigrams": unigrams,
            "vocab": vocab, "seed": seed}


def perplexity_score(
    df: DataFrame,
    lm: dict,
    text_col: str = "text",
    *,
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document bigram log-prob totals under the LM:
    ``(id, lp_fp long, n_bigrams long)`` where ``lp_fp`` is the exact integer
    sum of per-bigram ``floor(1e6 * ln P(w2|w1) + 0.5)`` micronats.

    Plan: row-local bigram ids -> broadcast join on (b1, b2) (left —
    unseen bigrams smooth to c2=0) -> broadcast join on b1 (left — unseen
    contexts smooth to c1=0) -> one partial-aggregated groupBy on the id,
    with a zero-row union so short documents survive."""
    vocab, seed = lm["vocab"], lm["seed"]
    bg = _bigram_rows(df, text_col, vocab, seed, [id_col])
    a = F.lit(float(alpha))
    av = F.lit(float(alpha * vocab))
    lp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + a)
        / (F.coalesce(F.col("c1"), F.lit(0)).cast("double") + av)
    )
    scored = (
        bg.join(F.broadcast(lm["bigrams"]), on=["b1", "b2"], how="left")
        .join(F.broadcast(lm["unigrams"]), on="b1", how="left")
        .select(
            id_col,
            F.floor(lp * F.lit(float(LAM_SCALE)) + F.lit(0.5))
            .cast("long")
            .alias("__lp_fp"),
            F.lit(1).cast("long").alias("__n"),
        )
    )
    zero = df.select(
        F.col(id_col),
        F.lit(0).cast("long").alias("__lp_fp"),
        F.lit(0).cast("long").alias("__n"),
    )
    return (
        zero.unionByName(scored)
        .groupBy(id_col)
        .agg(F.sum("__lp_fp").alias("lp_fp"), F.sum("__n").alias("n_bigrams"))
    )


def perplexity_filter(
    df: DataFrame,
    lm: dict,
    max_avg_nll: float,
    text_col: str = "text",
    *,
    id_col: str = "doc_id",
    alpha: float = 1.0,
    keep_empty: bool = True,
) -> DataFrame:
    """Keep documents whose mean bigram negative-log-likelihood is at most
    ``max_avg_nll`` nats (perplexity <= exp(max_avg_nll)).

    The comparison is the exact integer cross-multiplication
    ``-lp_fp <= threshold_lp_fp * n_bigrams`` with ``threshold_lp_fp =
    floor(max_avg_nll * 1e6 + 0.5)`` — no float division, so the decision
    replays bit-for-bit in an independent engine.  ``keep_empty`` routes
    the no-bigram documents (CCNet keeps judging them separately)."""
    # floor, not int(): int() truncates toward zero, which would be off by
    # one micronat vs a floor-based oracle replay for negative thresholds
    # (r14 advice) — everywhere else uses the floor(x*1e6+0.5) convention
    thr_fp = math.floor(max_avg_nll * LAM_SCALE + 0.5)
    scores = perplexity_score(df, lm, text_col, id_col=id_col, alpha=alpha)
    keep = F.when(F.col("n_bigrams") == 0, F.lit(bool(keep_empty))).otherwise(
        -F.col("lp_fp") <= F.lit(thr_fp) * F.col("n_bigrams")
    )
    kept = scores.where(keep).select(id_col)
    return df.join(F.broadcast(kept), on=id_col, how="left_semi")


def avg_nll_nats(scores: DataFrame) -> DataFrame:
    """Convenience projection: mean negative log-likelihood in nats and
    perplexity per document (floats — for ranking/report surfaces, not
    the exact gate path)."""
    nll = F.when(
        F.col("n_bigrams") > 0,
        -F.col("lp_fp").cast("double")
        / F.lit(float(LAM_SCALE))
        / F.col("n_bigrams").cast("double"),
    ).otherwise(F.lit(0.0))
    return scores.select(
        "*", nll.alias("avg_nll"), F.exp(nll).alias("perplexity")
    )


# --------------------------------------------------------------------------
# pure-Python reference (tests)
# --------------------------------------------------------------------------

def py_token_bucket(tok: str, vocab: int, seed: int = 0) -> int:
    import hashlib

    return int(
        hashlib.md5(f"{tok}:{seed}".encode()).hexdigest()[:_KEY_DIGITS], 16
    ) % vocab


def py_fit(texts, *, vocab: int, seed: int = 0):
    from .dsir import _py_tokens

    c2: dict[tuple[int, int], int] = {}
    c1: dict[int, int] = {}
    for t in texts:
        ids = [py_token_bucket(w, vocab, seed) for w in _py_tokens(t)]
        for x, y in zip(ids, ids[1:]):
            c2[(x, y)] = c2.get((x, y), 0) + 1
            c1[x] = c1.get(x, 0) + 1
    return c2, c1


def py_score(
    text: str, c2, c1, *, vocab: int, seed: int = 0, alpha: float = 1.0
) -> tuple[int, int]:
    import math

    from .dsir import _py_tokens

    ids = [py_token_bucket(w, vocab, seed) for w in _py_tokens(text)]
    lp_fp = 0
    n = 0
    for x, y in zip(ids, ids[1:]):
        p = (c2.get((x, y), 0) + alpha) / (c1.get(x, 0) + alpha * vocab)
        lp_fp += math.floor(math.log(p) * LAM_SCALE + 0.5)
        n += 1
    return lp_fp, n
