"""The engine's eval memo: repeated subexpressions at the same evaluation
window return the SAME DataFrame object (one plan construction, and
byte-identical subtrees so Spark's runtime exchange reuse can fire), while
anything that differs — node shape, window, step, engine — misses the memo
and still evaluates correctly."""

from datetime import datetime

import pytest

from hyperdx_spark.promql import PromQLEngine, parse

from test_promql import _samples

T0 = datetime(2024, 1, 1, 0, 10)
T1 = datetime(2024, 1, 1, 0, 12)


@pytest.fixture(scope="module")
def engine(spark):
    return PromQLEngine(_samples(spark))


def test_same_query_same_window_shares_plan(spark, engine):
    a = engine.query_range(spark, 'http_requests_total{job="a"}', T0, T1, 60)
    b = engine.query_range(spark, 'http_requests_total{job="a"}', T0, T1, 60)
    assert a is b


def test_shared_subexpression_shares_inner_plan(spark, engine):
    # sum by (job)(rate(...)) is the shared inner of both outer queries: the
    # memo holds exactly one entry for it, keyed on its structural repr
    inner = "sum by (job) (rate(http_requests_total[5m]))"
    engine._eval_memo.clear()
    engine.query_range(spark, f"max({inner})", T0, T1, 60)
    n_after_first = len(engine._eval_memo)
    engine.query_range(spark, f"min({inner})", T0, T1, 60)
    # second query adds ONLY its own root node (inner + children all hit)
    assert len(engine._eval_memo) == n_after_first + 1


def test_different_window_misses_memo(spark, engine):
    a = engine.query_range(spark, "mem_bytes", T0, T1, 60)
    b = engine.query_range(spark, "mem_bytes", T0, T1, 120)
    c = engine.query_range(
        spark, "mem_bytes", T0, datetime(2024, 1, 1, 0, 13), 60
    )
    assert a is not b and a is not c


def test_memoized_results_still_correct(spark, engine):
    # evaluate through a warm memo and check values are the fixture's
    engine.query_range(spark, 'http_requests_total{job="a"}', T0, T1, 60)
    out = engine.query_range(
        spark, 'http_requests_total{job="a"}', T0, T1, 60
    ).collect()
    got = {(r["__step"].minute, r["job"]): r["value"] for r in out}
    assert got == {(10, "a"): 60.0, (11, "a"): 66.0, (12, "a"): 72.0}


def test_engines_do_not_share_memos(spark):
    e1 = PromQLEngine(_samples(spark))
    e2 = PromQLEngine(_samples(spark))
    a = e1.query_range(spark, "mem_bytes", T0, T1, 60)
    b = e2.query_range(spark, "mem_bytes", T0, T1, 60)
    assert a is not b


def test_unbound_eval_still_raises_for_scalar(spark):
    # test_parse_errors calls _eval unbound with self=None; the memo
    # wrapper must keep that contract (ValueError, not AttributeError)
    n = parse("1 + 2")
    with pytest.raises(ValueError):
        PromQLEngine._eval(None, None, n, None, None, None, None)
