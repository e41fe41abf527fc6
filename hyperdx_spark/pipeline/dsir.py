"""DSIR-style data selection via importance resampling.

Public method: Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling" (NeurIPS) — select raw-corpus documents whose hashed
bag-of-n-gram distribution looks like a target corpus:

1. **Featurize**: unigrams + bigrams of the lower-cased alphanumeric
   tokenization, hashed into ``buckets`` slots.
2. **Fit**: bucket unigram/bigram distributions for the target and the raw
   corpus; per-bucket importance log-ratio
   ``lambda_b = ln(p_target(b)) - ln(p_raw(b))`` under add-``alpha``
   smoothing.
3. **Weight**: per-document log importance weight
   ``log w(x) = sum_b count_b(x) * lambda_b``.
4. **Resample**: Gumbel top-k on ``log w / temperature + G`` draws k
   documents with probability proportional to ``w^(1/temperature)`` without
   replacement.

Engine-portable determinism: the n-gram bucket AND the Gumbel uniform both
key off the md5 hex digest (`sampling.py` trick), and every log-ratio is
stored as ``floor(x * 1e6 + 0.5)`` of the IEEE double — integer micronats
(coarse enough that a 1-ulp ln() difference between libm implementations
essentially never crosses a rounding boundary).
IEEE multiply/floor are deterministic, so an independent engine (the DuckDB
gate oracle) reproduces weights EXACTLY as integer sums; only the final
Gumbel ordering touches floats, where ulp differences cannot flip ranks
separated by real noise.

Scale shapes (100 TB):

* featurization is row-local (split + slide + md5 bucket) — no shuffle,
  survives any partitioning;
* each fit distribution is ONE map-side-combined groupBy over at most
  ``buckets`` keys (the shuffle ships per-partition (bucket, partial)
  rows, never n-grams);
* weights: explode -> broadcast hash join against the ``buckets``-row
  lambda table -> per-doc partial-agg sum (again: the doc-id shuffle
  ships partials, bounded by docs-per-partition);
* resampling is a TakeOrderedAndProject top-k — no global sort.

Reference features: the observability reference (hyperdxio/hyperdx) has no
training-data curation surface; this operator extends the engine for the
LLM-pipeline tier alongside ``pipeline/dedup.py`` / ``sampling.py``.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: micronat scaling for the integer-exact log-ratio representation.
#: 1e6, not 1e9: the cross-engine replay floors ln() outputs, and ln is
#: only 1-ulp-reproducible across libms — at 1e6 the flake window per
#: value is ~4e-9 (vs ~4e-6 at 1e9) while micronat resolution is far
#: beyond any selection decision's needs.
LAM_SCALE = 1_000_000

_KEY_DIGITS = 15
_KEY_SPACE = float(16 ** _KEY_DIGITS)


def _tokens(text_col: Column) -> Column:
    """Lower-cased alphanumeric tokens (same tokenization as the DuckDB
    oracle's ``string_split_regex(lower(text), '[^a-zA-Z0-9]+')``)."""
    return F.filter(
        F.split(F.lower(text_col), "[^a-zA-Z0-9]+"), lambda t: t != ""
    )


def _grams_of(toks: Column, n: int) -> Column:
    """Unigrams plus space-joined k-grams for k = 2..n over an ALREADY
    MATERIALIZED token-array column.  ``toks`` must be a bound column,
    never the raw ``_tokens(...)`` expression: interpreted higher-order
    functions do no common-subexpression elimination, so an inlined
    split/filter expression would re-tokenize the document inside every
    ``element_at`` — O(len²) per doc (the r14 harness caught exactly
    this: the sf1 fit sat minutes in one stage until the array was bound
    once per row)."""
    parts = [toks]
    for k in range(2, n + 1):
        idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
        gram_k = F.when(
            F.size(toks) >= k,
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(k)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        parts.append(gram_k)
    return F.concat(*parts)


def _gram_rows(df: DataFrame, text_col: str, n: int, extra: list[str]):
    """``extra`` columns + one exploded gram column ``__g``, with the token
    array bound to a real column first (see :func:`_grams_of`)."""
    return df.select(
        *extra, _tokens(F.col(text_col)).alias("__toks")
    ).select(*extra, F.explode(_grams_of(F.col("__toks"), n)).alias("__g"))


def gram_bucket(gram: Column, buckets: int, seed: int = 0) -> Column:
    """Engine-portable hash bucket: first 60 bits of
    ``md5(gram ':' seed)`` modulo ``buckets`` (non-negative — the 60-bit
    value is always positive in a signed long)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", gram, F.lit(str(seed)))), 1, _KEY_DIGITS
        ),
        16,
        10,
    ).cast("long")
    return h % F.lit(buckets)


def bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    *,
    buckets: int = 8192,
    n: int = 2,
    seed: int = 0,
) -> DataFrame:
    """Corpus n-gram bucket distribution: ``(bucket long, cnt long)``.
    One map-side-combined groupBy over at most ``buckets`` keys."""
    g = _gram_rows(df, text_col, n, [])
    return (
        g.select(gram_bucket(F.col("__g"), buckets, seed).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_fit(
    target_df: DataFrame,
    raw_df: DataFrame,
    text_col: str = "text",
    *,
    buckets: int = 8192,
    n: int = 2,
    seed: int = 0,
    alpha: float = 1.0,
) -> DataFrame:
    """Fit the per-bucket importance log-ratios.

    Returns the dense ``buckets``-row frame ``(bucket long, lam_fp long)``
    where ``lam_fp = floor(1e6 * (ln p_target(b) - ln p_raw(b)) + 0.5)`` —
    integer micronats of the add-``alpha``-smoothed log-likelihood ratio.
    Both totals ride the plan as scalar aggregates (no driver round-trip);
    the result is ``buckets`` rows, always broadcast-joinable."""
    spark = target_df.sparkSession
    t = bucket_counts(target_df, text_col, buckets=buckets, n=n, seed=seed)
    r = bucket_counts(raw_df, text_col, buckets=buckets, n=n, seed=seed)
    dom = spark.range(buckets).select(F.col("id").alias("bucket"))
    t_tot = t.agg(F.sum("cnt")).withColumnRenamed("sum(cnt)", "__tt")
    r_tot = r.agg(F.sum("cnt")).withColumnRenamed("sum(cnt)", "__rt")
    joined = (
        dom.join(
            F.broadcast(t.withColumnRenamed("cnt", "__tc")),
            on="bucket", how="left",
        )
        .join(
            F.broadcast(r.withColumnRenamed("cnt", "__rc")),
            on="bucket", how="left",
        )
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
    )
    a = F.lit(float(alpha))
    b = F.lit(float(buckets))
    lam = F.log(
        (F.coalesce(F.col("__tc"), F.lit(0)).cast("double") + a)
        / (F.coalesce(F.col("__tt"), F.lit(0)).cast("double") + a * b)
    ) - F.log(
        (F.coalesce(F.col("__rc"), F.lit(0)).cast("double") + a)
        / (F.coalesce(F.col("__rt"), F.lit(0)).cast("double") + a * b)
    )
    return joined.select(
        "bucket",
        F.floor(lam * F.lit(float(LAM_SCALE)) + F.lit(0.5))
        .cast("long")
        .alias("lam_fp"),
    )


def dsir_weights(
    df: DataFrame,
    lam_df: DataFrame,
    text_col: str = "text",
    *,
    id_col: str = "doc_id",
    buckets: int = 8192,
    n: int = 2,
    seed: int = 0,
) -> DataFrame:
    """Per-document log importance weight: ``(id, dsir_lw_fp long)`` where
    ``dsir_lw_fp`` is the exact integer sum of the matched buckets' ``lam_fp``
    (micronats).  Documents with no tokens get weight 0.

    Plan: explode (row-local) -> broadcast join on the bucket -> union
    with a zero row per document (so empty documents survive WITHOUT a
    second full-width join on the id) -> ONE partial-aggregated groupBy
    on the id.  Exactly one shuffle, no sort-merge join anywhere."""
    g = _gram_rows(df, text_col, n, [id_col]).select(
        id_col, gram_bucket(F.col("__g"), buckets, seed).alias("bucket")
    )
    g_lam = g.join(F.broadcast(lam_df), on="bucket", how="inner").select(
        id_col, "lam_fp"
    )
    zero = df.select(F.col(id_col), F.lit(0).cast("long").alias("lam_fp"))
    return (
        zero.unionByName(g_lam)
        .groupBy(id_col)
        .agg(F.sum("lam_fp").alias("dsir_lw_fp"))
    )


def gumbel_key(
    id_col: str, *, seed: int = 13, lw_fp_col: str = "dsir_lw_fp",
    temperature: float = 1.0,
) -> Column:
    """The Gumbel top-k sort key ``log w / temperature + G`` with
    ``G = -ln(-ln(u))`` and ``u = (h + 1) / (16^15 + 1)`` from the
    engine-portable md5 key — reproducible across runs, partitionings,
    and engines."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col(id_col).cast("string"), F.lit(str(seed))
                )
            ),
            1,
            _KEY_DIGITS,
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(_KEY_SPACE + 1.0)
    g = -F.log(-F.log(u))
    lw = F.col(lw_fp_col).cast("double") / F.lit(float(LAM_SCALE))
    return lw / F.lit(float(temperature)) + g


def dsir_resample(
    weights_df: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    lw_fp_col: str = "dsir_lw_fp",
    seed: int = 13,
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel top-k resample: k rows drawn with probability proportional
    to ``w^(1/temperature)`` without replacement (Gumbel-max trick —
    public folklore result; see also Vieira 2014).  Returns
    ``(id, dsir_lw_fp, dsir_rank)`` ordered by the draw.

    Plan: TakeOrderedAndProject top-k (no global sort); the rank window
    runs over the k survivors only.  The id column is a secondary sort
    key in both the top-k and the rank window: a Gumbel-key tie is
    astronomically rare, but the module's contract is bit-for-bit
    cross-engine replay, so membership and rank must not be left to
    partition order even then (r14 advice)."""
    keyed = weights_df.withColumn(
        "__gk",
        gumbel_key(
            id_col, seed=seed, lw_fp_col=lw_fp_col, temperature=temperature
        ),
    )
    top = keyed.orderBy(F.desc("__gk"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("__gk"), F.asc(id_col))
    return top.withColumn("dsir_rank", F.row_number().over(w)).select(
        id_col, lw_fp_col, "dsir_rank"
    )


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame,
    k: int,
    text_col: str = "text",
    *,
    id_col: str = "doc_id",
    buckets: int = 8192,
    n: int = 2,
    seed: int = 0,
    alpha: float = 1.0,
    gumbel_seed: int = 13,
    temperature: float = 1.0,
    lam_df: Optional[DataFrame] = None,
) -> DataFrame:
    """End-to-end DSIR selection: fit (unless a pre-fit ``lam_df`` is
    passed), weight, Gumbel top-k.  Returns the selected raw rows joined
    with ``(dsir_lw_fp, dsir_rank)``."""
    if lam_df is None:
        lam_df = dsir_fit(
            target_df, raw_df, text_col,
            buckets=buckets, n=n, seed=seed, alpha=alpha,
        )
    w = dsir_weights(
        raw_df, lam_df, text_col,
        id_col=id_col, buckets=buckets, n=n, seed=seed,
    )
    sel = dsir_resample(
        w, k, id_col=id_col, seed=gumbel_seed, temperature=temperature
    )
    return raw_df.join(F.broadcast(sel), on=id_col, how="inner")


# --------------------------------------------------------------------------
# pure-Python reference (tests): the same algorithm over local lists
# --------------------------------------------------------------------------

def _py_tokens(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-zA-Z0-9]+", text.lower()) if t]


def py_grams(text: str, n: int = 2) -> list[str]:
    toks = _py_tokens(text)
    out = list(toks)
    for k in range(2, n + 1):
        out += [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return out


def py_bucket(gram: str, buckets: int, seed: int = 0) -> int:
    import hashlib

    h = hashlib.md5(f"{gram}:{seed}".encode()).hexdigest()
    return int(h[:_KEY_DIGITS], 16) % buckets


def py_fit(
    target_texts, raw_texts, *, buckets: int, n: int = 2, seed: int = 0,
    alpha: float = 1.0,
) -> list[int]:
    tc = [0] * buckets
    rc = [0] * buckets
    for t in target_texts:
        for g in py_grams(t, n):
            tc[py_bucket(g, buckets, seed)] += 1
    for t in raw_texts:
        for g in py_grams(t, n):
            rc[py_bucket(g, buckets, seed)] += 1
    tt, rt = sum(tc), sum(rc)
    out = []
    for b in range(buckets):
        lam = math.log((tc[b] + alpha) / (tt + alpha * buckets)) - math.log(
            (rc[b] + alpha) / (rt + alpha * buckets)
        )
        out.append(math.floor(lam * LAM_SCALE + 0.5))
    return out


def py_weight(
    text: str, lam_fp: list[int], *, buckets: int, n: int = 2, seed: int = 0
) -> int:
    return sum(lam_fp[py_bucket(g, buckets, seed)] for g in py_grams(text, n))
