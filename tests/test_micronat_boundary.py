"""Measured-empty micronat flake window (r14 verdict task #5).

`dsir.py` documents a ~4e-9 per-value flake window: the gate oracle
floors ``x * 1e6 + 0.5`` of an ``ln()`` output, and ln is only
1-ulp-reproducible across libms, so a value whose scaled fractional part
lands WITHIN 1 ulp of the .5 rounding boundary could floor differently
in Spark vs DuckDB.  Never observed — this test turns "assumed empty"
into "measured empty": it replays every fitted micronat input of the
gate configurations over the sf0.01 oracle fixture (and sf0.1 when
present) in pure Python and asserts each scaled value's fractional part
stays >= 1e-7 away from 0.5 (~25000 ulps of margin at these magnitudes).

If a regenerated fixture ever lands a value inside the margin, this test
names it — the fix is a new fixture seed, per the verdict's contract.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from hyperdx_spark.pipeline import dsir, perplexity

SF_DIRS = [d for d in ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
           if os.path.exists(os.path.join(d, "documents.parquet"))]

MARGIN = 1e-7  # distance from the 0.5 rounding boundary


def _texts(sf_dir):
    rows = duckdb.sql(
        "SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    return rows


def _boundary_dist(x: float) -> float:
    """Distance of x*1e6's fractional part from the 0.5 floor boundary."""
    frac = (x * dsir.LAM_SCALE) % 1.0
    return abs(frac - 0.5)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_dsir_lambda_micronats_clear_the_boundary(sf_dir):
    """Gate config: buckets=64, n=2, seed=0, alpha=1, target = doc_id%17==0
    (mirrors the q_dedup_all dsir parts)."""
    rows = _texts(sf_dir)
    buckets, alpha = 64, 1.0
    tc = [0] * buckets
    rc = [0] * buckets
    for doc_id, text in rows:
        for g in dsir.py_grams(text, 2):
            b = dsir.py_bucket(g, buckets, 0)
            rc[b] += 1
            if doc_id % 17 == 0:
                tc[b] += 1
    tt, rt = sum(tc), sum(rc)
    worst = 1.0
    for b in range(buckets):
        lam = math.log((tc[b] + alpha) / (tt + alpha * buckets)) - math.log(
            (rc[b] + alpha) / (rt + alpha * buckets)
        )
        worst = min(worst, _boundary_dist(lam))
    assert worst >= MARGIN, (
        f"a fitted DSIR lambda lands {worst:.2e} from the floor(x*1e6+0.5) "
        f"boundary at {sf_dir} — inside the cross-libm 1-ulp flake window; "
        "regenerate the fixture seed"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_perplexity_logprob_micronats_clear_the_boundary(sf_dir):
    """Gate config: vocab=128, alpha=1, LM fit on the doc_id%17==0 slice;
    every bigram log-prob the scorer can emit over the corpus is checked
    (mirrors the q_dedup_all ppl parts)."""
    rows = _texts(sf_dir)
    vocab, alpha = 128, 1.0
    c2, c1 = perplexity.py_fit(
        [t for d, t in rows if d % 17 == 0], vocab=vocab
    )
    seen: set[tuple[int, int]] = set()
    for _, text in rows:
        ids = [perplexity.py_token_bucket(w, vocab) for w in dsir._py_tokens(text)]
        seen.update(zip(ids, ids[1:]))
    worst = 1.0
    for x, y in seen:
        p = (c2.get((x, y), 0) + alpha) / (c1.get(x, 0) + alpha * vocab)
        worst = min(worst, _boundary_dist(math.log(p)))
    assert worst >= MARGIN, (
        f"a bigram log-prob lands {worst:.2e} from the floor(x*1e6+0.5) "
        f"boundary at {sf_dir} — inside the cross-libm 1-ulp flake window; "
        "regenerate the fixture seed"
    )
