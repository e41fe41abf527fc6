"""URL-level corpus curation: canonicalization, host extraction, per-host
caps, and URL-exact dedup.

Web-corpus pipelines (RefinedWeb, C4, Gopher) dedup and cap by URL before
any content pass: the same page is crawled many times with varying
tracking params / fragments / scheme spellings, and a handful of hosts
otherwise dominate the mix. Everything here is a pure Spark-SQL column
program (regexp chains + one groupBy/window per operator), replayable by
a SQL oracle and whole-stage-codegen'd.

Reference context: the reference engine is an observability store with no
corpus-curation tier; this module is part of the training-data extensions
this repo adds (the r8 packing / incremental-store siblings).

Scale shape: ``canonicalize_url`` / ``url_host`` are row-local;
``dedup_by_url`` is one hash-shuffle on the canonical URL (exact-dedup
shape); ``cap_per_host`` is one shuffle on host + a per-host window —
mega-hosts make a skewed window partition, so the rank key is a hash
(uniform, no sort-key skew pile-up) and callers capping at small n on
pathological hosts can pre-thin with ``hash_sample`` first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# query params that never identify content — the common tracking families
_TRACKING_RE = r"(utm_[a-z]+|gclid|fbclid|msclkid|mc_[a-z]+|ref|igshid)"


def canonicalize_url(col: Column | str, *, sort_query: bool = False) -> Column:
    """Canonical form of a URL for identity comparisons.

    Lower-cases scheme+host, drops the scheme, a leading ``www.``, the
    scheme's OWN default port (``:80`` under http / no scheme, ``:443``
    under https — stripped before the scheme so ``http://site:443/x`` stays
    distinct from the plain page), the fragment, tracking query params
    (``utm_*``, ``gclid``, ``fbclid``, ...), an empty leftover ``?`` and a
    trailing slash — so ``HTTP://WWW.Site.com:80/a/?utm_source=x#top``
    equals ``site.com/a``.

    ``sort_query=True`` additionally orders the remaining query params
    byte-wise (``a?y=2&x=1`` == ``a?x=1&y=2`` — the same page under
    reordered params). Off by default: param order is occasionally
    significant to badly-behaved endpoints, and flipping it changes
    dedup identity, so callers opt in.
    """
    c = F.col(col) if isinstance(col, str) else col
    u = F.trim(c)
    # lower-case scheme+host only (path/query stay case-sensitive)
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([^/?#]*//)?[^/?#]*", 0)),
        F.regexp_replace(u, r"^([^/?#]*//)?[^/?#]*", ""),
    )
    # default-port strip BEFORE the scheme drop, matched to the scheme: a
    # bare `:(80|443)` strip after the scheme is gone would wrongly equate
    # http://site:443/x (nonstandard) with the plain page
    u = F.regexp_replace(u, r"^(http://[^/?#]*):80(?=[/?#]|$)", r"$1")
    u = F.regexp_replace(u, r"^(https://[^/?#]*):443(?=[/?#]|$)", r"$1")
    u = F.regexp_replace(u, r"^([^/?#:]+):80(?=[/?#]|$)", r"$1")  # schemeless -> http default
    u = F.regexp_replace(u, r"^https?://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"([?&])" + _TRACKING_RE + r"=[^&#]*", r"$1")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"/+$", "")
    if sort_query:
        qs = F.regexp_extract(u, r"\?(.*)$", 1)
        u = F.when(qs == "", u).otherwise(
            F.concat(
                F.regexp_extract(u, r"^([^?]*)", 1),
                F.lit("?"),
                F.array_join(F.array_sort(F.split(qs, "&")), "&"),
            )
        )
    return u


def url_host(col: Column | str) -> Column:
    """Host of a URL (no public-suffix registry in this container, so the
    full host is the grouping key; strip a leading ``www.``)."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.regexp_extract(F.lower(F.trim(c)), r"^(?:[a-z][a-z0-9+.-]*://)?(?:[^/?#@]*@)?([^/?#:]+)", 1)
    return F.regexp_replace(host, r"^www\.", "")


def dedup_by_url(
    df: DataFrame, *, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per canonical URL (min id — the earliest crawl), the
    standard pre-content dedup pass. One hash-shuffle on the canonical
    form; no pairwise work."""
    canon = canonicalize_url(url_col).alias("__canon")
    w = Window.partitionBy("__canon").orderBy(F.col(id_col).asc())
    return (
        df.select("*", canon)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__canon", "__rn")
    )


def cap_per_host(
    df: DataFrame,
    max_per_host: int,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep at most ``max_per_host`` documents per host, selected by a
    deterministic md5 rank (uniform across the host's pages, stable
    across runs — the ``hash_sample`` key family), ties broken by id."""
    if max_per_host <= 0:
        raise ValueError("max_per_host must be positive")
    host = url_host(url_col).alias("__host")
    rank_key = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))
    )
    w = Window.partitionBy("__host").orderBy(rank_key.asc(), F.col(id_col).asc())
    return (
        df.select("*", host)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_per_host)
        .drop("__host", "__rn")
    )
