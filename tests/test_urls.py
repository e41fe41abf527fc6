"""URL curation (pipeline/urls.py): canonicalization cases, host
extraction, URL-exact dedup vs a DuckDB replay, and the per-host cap's
determinism + cap invariant."""

import duckdb
import pytest
from pyspark.sql import functions as F

from hyperdx_spark.pipeline import urls

CANON_CASES = [
    ("HTTP://WWW.Site.com:80/a/?utm_source=x#top", "site.com/a"),
    ("https://site.com:443/a", "site.com/a"),
    ("https://site.com/a?", "site.com/a"),
    ("site.com/a/b/", "site.com/a/b"),
    ("https://www.site.com/a?id=3&utm_medium=m&x=1", "site.com/a?id=3&x=1"),
    ("https://site.com/a?utm_source=x&gclid=99", "site.com/a"),
    ("https://site.com/A/B", "site.com/A/B"),  # path case preserved
    ("HTTPS://SITE.COM/A/B", "site.com/A/B"),  # host lowered, path kept
    ("https://site.com/a#frag", "site.com/a"),
    ("https://sub.site.com:8080/x", "sub.site.com:8080/x"),  # non-default port kept
    ("https://site.com", "site.com"),
    ("https://site.com/", "site.com"),
    # default-port strip is scheme-matched (strip runs BEFORE the scheme
    # drop): :443 under http / :80 under https are NONSTANDARD and kept
    ("http://site.com:443/x", "site.com:443/x"),
    ("https://site.com:80/x", "site.com:80/x"),
    ("http://site.com:80/x", "site.com/x"),
    ("site.com:80/x", "site.com/x"),    # schemeless defaults to http
    ("site.com:443/x", "site.com:443/x"),
]

SORTED_QUERY_CASES = [
    ("https://site.com/a?y=2&x=1", "site.com/a?x=1&y=2"),
    ("https://site.com/a?x=1&y=2", "site.com/a?x=1&y=2"),
    ("https://site.com/a?b=2&utm_source=s&a=1#f", "site.com/a?a=1&b=2"),
    ("https://site.com/a", "site.com/a"),  # no query -> untouched
]


@pytest.mark.parametrize("raw,want", SORTED_QUERY_CASES)
def test_canonicalize_url_sorted_query(spark, raw, want):
    got = (
        spark.createDataFrame([(raw,)], "url string")
        .select(urls.canonicalize_url("url", sort_query=True).alias("c"))
        .first()["c"]
    )
    assert got == want, (raw, got, want)

HOST_CASES = [
    ("https://www.Site.com:8080/a/b?q=1", "site.com"),
    ("http://user:pw@host.io/x", "host.io"),
    ("site.com/a", "site.com"),
    ("https://sub.domain.org#f", "sub.domain.org"),
]


@pytest.mark.parametrize("raw,want", CANON_CASES)
def test_canonicalize_url(spark, raw, want):
    got = (
        spark.createDataFrame([(raw,)], "url string")
        .select(urls.canonicalize_url("url").alias("c"))
        .first()["c"]
    )
    assert got == want, (raw, got, want)


@pytest.mark.parametrize("raw,want", HOST_CASES)
def test_url_host(spark, raw, want):
    got = (
        spark.createDataFrame([(raw,)], "url string")
        .select(urls.url_host("url").alias("h"))
        .first()["h"]
    )
    assert got == want, (raw, got, want)


def _url_corpus(spark, n=300):
    # canon key = (host i%3, page i%10) -> 30 classes over 300 docs, so
    # every class has 10 colliding spellings (varying tracking + fragment)
    return spark.createDataFrame(
        [(i,
          f"https://www.host{i % 3}.com/page/{i % 10}"
          f"?utm_source=s{i}&id={i % 10}#sec{i}")
         for i in range(n)],
        "doc_id long, url string",
    )


def test_dedup_by_url_matches_duckdb(spark):
    """Canonical dedup keeps the min doc_id per (host, page, id-param) —
    replayed in DuckDB on the canonical key built with the same rules."""
    df = _url_corpus(spark)
    got = sorted(r["doc_id"] for r in urls.dedup_by_url(df).collect())
    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    want = sorted(
        r[0]
        for r in con.execute(
            """
            WITH c AS (
              SELECT doc_id,
                     'host' || (doc_id % 3)::VARCHAR || '.com/page/'
                       || (doc_id % 10)::VARCHAR || '?id='
                       || (doc_id % 10)::VARCHAR AS canon
              FROM t)
            SELECT min(doc_id) FROM c GROUP BY canon
            """
        ).fetchall()
    )
    con.close()
    assert got == want and len(got) == 30


def test_cap_per_host_invariants(spark):
    df = _url_corpus(spark)
    capped = urls.cap_per_host(df, 5)
    rows = capped.select(
        "doc_id", urls.url_host("url").alias("h")
    ).collect()
    per = {}
    for r in rows:
        per.setdefault(r["h"], []).append(r["doc_id"])
    assert set(per) == {f"host{i}.com" for i in range(3)}
    assert all(len(v) == 5 for v in per.values())
    # deterministic across runs
    again = sorted(r["doc_id"] for r in urls.cap_per_host(df, 5).collect())
    assert again == sorted(r["doc_id"] for r in rows)
    # cap larger than any host keeps everything
    assert urls.cap_per_host(df, 1000).count() == df.count()
    with pytest.raises(ValueError):
        urls.cap_per_host(df, 0)


def test_url_ops_single_exchange_plans(spark):
    """Scale shape: both URL operators are exactly ONE hash shuffle (on
    the canonical URL / the host) — the canonicalization itself is a
    row-local column program."""
    df = _url_corpus(spark)
    for out in (urls.dedup_by_url(df), urls.cap_per_host(df, 5)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
