"""Deterministic sampling operators for training-data curation.

A 100 TB-corpus pipeline needs *reproducible* subsampling: the same rows
must be selected on every run, on any cluster, and the selection must be
auditable by an independent engine. All operators here key off
``md5(id ":" seed)`` — a uniform, engine-portable hash (the hex digest is
bit-identical in Spark and DuckDB, so every operator is exactly
SQL-oracle-checkable; same trick as the simhash md5 token-hash variant in
``dedup.py``).

Scale shapes:

* ``hash_sample`` / ``train_holdout_split`` are pure row-local projections —
  zero shuffles, fully pushdown-friendly.
* ``stratified_sample`` is one ``row_number`` window shuffled on the strata
  key. A pathologically hot stratum serializes only its own sort; pre-thin
  giant strata with ``hash_sample`` first when n_per_stratum << stratum size.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 15 hex digits = 60 bits: fits a signed long exactly, and fraction
# thresholds stay integer-exact for any float fraction
_KEY_DIGITS = 15
_KEY_SPACE = 16 ** _KEY_DIGITS


def sample_key(id_col: str, seed: int = 42) -> Column:
    """Deterministic per-row sampling key: md5 of ``id ":" seed`` (hex).

    Lexicographic order on the hex digest == numeric order on the hash, and
    the digest is identical across engines — rank/threshold decisions made
    on it are reproducible and independently verifiable.
    """
    return F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed))))


def _key_bucket(key: Column) -> Column:
    """First 60 bits of the key as a long in [0, 16^15)."""
    return F.conv(F.substring(key, 1, _KEY_DIGITS), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, fraction: float, *, id_col: str, seed: int = 42
) -> DataFrame:
    """Deterministic Bernoulli-by-hash sample: keeps a row iff its sampling
    key falls below ``fraction`` of the key space. Row-local (no shuffle),
    stable across runs/partitionings, and composable: a 0.5 sample of a
    0.5 sample with different seeds is a ~0.25 sample in expectation
    (exact composition holds only when nesting thresholds under the SAME
    seed — independent keys make the product exact only on average)."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thr = int(fraction * _KEY_SPACE)
    return df.where(_key_bucket(sample_key(id_col, seed)) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    *,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen by smallest
    sampling key — a reproducible uniform draw without replacement per
    group (e.g. balance languages/sources in a training mix)."""
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    w = Window.partitionBy(*strata_cols).orderBy(F.col("__sk"), F.col(id_col))
    return (
        df.withColumn("__sk", sample_key(id_col, seed))
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n_per_stratum)
        .drop("__sk", "__rk")
    )


def train_holdout_split(
    df: DataFrame,
    holdout_fraction: float,
    *,
    id_col: str,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/holdout assignment as a column — the same id
    lands in the same split on every run and in every table it appears in
    (join-free leakage guard across derived datasets)."""
    if not (0.0 <= holdout_fraction <= 1.0):
        raise ValueError(f"holdout_fraction must be in [0, 1], got {holdout_fraction}")
    thr = int(holdout_fraction * _KEY_SPACE)
    bucket = _key_bucket(sample_key(id_col, seed))
    return df.withColumn(
        split_col, F.when(bucket < F.lit(thr), F.lit("holdout")).otherwise(F.lit("train"))
    )


def token_budget_mix(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    total_tokens: int,
    *,
    id_col: str,
    token_count_col: str,
    seed: int = 42,
    max_oversample: float = 1.0,
    allow_repeats: bool = False,
) -> DataFrame:
    """Mix sources into one corpus hitting a total token budget split by
    weight (the standard training-mix primitive: e.g. 60% web, 30% code,
    10% reference).

    Each source's share is ``total_tokens * weight / sum(weights)``; the
    source is ``hash_sample``d at ``share / its_token_count`` capped at
    ``max_oversample``. With ``allow_repeats=False`` (default) the cap is
    further clamped to 1.0 — an undersized source contributes everything
    it has ONCE. With ``allow_repeats=True``, an undersized source is
    EPOCHED the way real training mixes oversample small high-quality
    sources: ``floor(frac)`` full copies plus a hash-sampled fractional
    remainder, each copy tagged with an ``epoch`` column (0-based) so
    downstream shuffling/accounting can tell repeats apart. The only
    driver-side data is one (count, sum) row per source; every copy is
    the zero-shuffle hash filter, so the mix stays reproducible and
    cheap at corpus scale. Output adds ``source`` and ``epoch`` columns.
    """
    if sources.keys() != weights.keys():
        raise ValueError("sources and weights must have the same keys")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to > 0")
    parts = []
    for name, df in sources.items():
        have = df.agg(F.sum(F.col(token_count_col)).alias("t")).collect()[0]["t"] or 0
        share = total_tokens * (weights[name] / wsum)
        frac = min(share / have if have > 0 else 0.0, float(max_oversample))
        if not allow_repeats:
            # hash_sample rejects fractions > 1; "contributes everything it
            # has" is the documented ceiling when repeats are off
            frac = min(frac, 1.0)
        full_epochs = int(frac) if allow_repeats else 0
        for ep in range(full_epochs):
            parts.append(
                df.withColumn("source", F.lit(name))
                .withColumn("epoch", F.lit(ep))
            )
        remainder = frac - full_epochs
        if remainder > 0:
            # per-epoch seed: the fractional epoch draws an independent
            # subset rather than always repeating the same prefix rows
            picked = hash_sample(
                df, remainder, id_col=id_col, seed=seed + full_epochs
            )
            parts.append(
                picked.withColumn("source", F.lit(name))
                .withColumn("epoch", F.lit(full_epochs))
            )
    if not parts:
        raise ValueError("empty mix: every source sampled to zero")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def top_fraction_per_source(
    df: DataFrame,
    frac: float,
    *,
    score_col: str = "score",
    source_col: str = "source",
    exact: bool = False,
    relative_error: float = 0.001,
) -> DataFrame:
    """Keep the best-scoring *frac* of each source/domain (the RefinedWeb /
    FineWeb "top X% per domain by quality" curation step). Rows at or above
    their source's (1 − frac) score quantile survive, so slightly more than
    ``frac`` can be kept when scores tie at the cut.

    Scale shape: one per-source aggregation computes the cut (default
    ``percentile_approx`` — a fixed-size sketch per group, safe for a
    source with 10⁹ documents), the tiny (source, cut) frame broadcasts
    back onto the corpus scan, and the filter is row-local — no per-source
    sort, no window, no corpus shuffle. ``exact=True`` switches to the
    exact ``percentile`` aggregate (whole group materialized per source —
    only for modest sources / oracle tests; it is what a SQL replay with
    ``quantile_cont`` reproduces bit-for-bit).
    """
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    q = 1.0 - frac
    if exact:
        # backtick-quote the identifier so non-plain column names (spaces,
        # dots, keywords) work and can't inject expression text (ADVICE r4)
        quoted = "`" + score_col.replace("`", "``") + "`"
        cut_agg = F.expr(f"percentile({quoted}, {q!r})")
    else:
        acc = max(2, int(round(1.0 / relative_error)))
        cut_agg = F.percentile_approx(score_col, F.lit(q), F.lit(acc))
    cuts = df.groupBy(source_col).agg(cut_agg.alias("__cut"))
    return (
        df.join(F.broadcast(cuts), on=source_col)
        .where(F.col(score_col) >= F.col("__cut"))
        .drop("__cut")
    )


def deterministic_shuffle(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    seed: int = 42,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Reproducible global training-order shuffle: sort by the md5 sampling
    key (``sample_key``), so the same (corpus, seed) always yields the same
    example order and a different seed reshuffles — the step a training
    pipeline runs after packing. ONE range-partitioned sort (Spark samples
    split points, so the output partitions are balanced regardless of id
    skew); rank/order decisions are replayable by any engine that can md5.

    ``num_partitions`` pins the output file count for a subsequent write
    (e.g. shard files for a data loader); default leaves AQE in charge.
    """
    key = sample_key(id_col, seed)
    if num_partitions:
        return df.repartitionByRange(num_partitions, key).sortWithinPartitions(key)
    return df.orderBy(key)
