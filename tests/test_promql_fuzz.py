"""Property-based fuzz of the PromQL pipeline (hypothesis):

1. arbitrary text never crashes the parser with anything but ValueError;
2. grammar-generated valid expressions parse AND evaluate to a DataFrame
   with the (__step, labels..., value) vector shape — evaluation may
   legitimately reject some shapes (e.g. many-to-many matching) with
   ValueError, but must never raise anything else or produce a frame
   without the vector columns.
"""

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hyperdx_spark.promql import PromQLEngine, parse

T0 = datetime(2024, 1, 1)

RANGE_FNS = [
    "rate", "increase", "delta", "irate", "idelta", "changes", "resets",
    "deriv", "avg_over_time", "min_over_time", "max_over_time",
    "sum_over_time", "count_over_time", "last_over_time",
    "stddev_over_time", "present_over_time",
]
AGG_OPS = ["sum", "avg", "min", "max", "count", "stddev", "stdvar", "group"]
MATH_FNS = ["abs", "ceil", "floor", "sqrt", "exp", "sgn", "sin", "tanh"]
BIN_OPS = ["+", "-", "*", "/", "%", "^"]


@st.composite
def promql_expr(draw, depth=0, experimental=False):
    kinds = (
        ["selector", "range_fn", "agg", "math", "binop_scalar", "topk"]
        if depth < 2
        else ["selector", "range_fn"]
    )
    if experimental and depth < 2:
        kinds = kinds + ["limitk", "limit_ratio"]
    kind = draw(st.sampled_from(kinds))
    metric = draw(st.sampled_from(["c", "g"]))
    sel = draw(
        st.sampled_from([metric, f'{metric}{{job="a"}}', f'{metric}{{job=~"a|b"}}'])
    )
    if kind == "selector":
        return sel
    if kind == "range_fn":
        fns = RANGE_FNS + (["mad_over_time"] if experimental else [])
        fn = draw(st.sampled_from(fns))
        win = draw(st.sampled_from(["5m", "10m", "1h"]))
        return f"{fn}({sel}[{win}])"
    inner = draw(promql_expr(depth=depth + 1, experimental=experimental))
    if kind == "agg":
        op = draw(st.sampled_from(AGG_OPS))
        clause = draw(st.sampled_from(["", " by (job)", " without (job)"]))
        return f"{op}{clause} ({inner})"
    if kind == "math":
        return f"{draw(st.sampled_from(MATH_FNS))}({inner})"
    if kind == "topk":
        return f"topk({draw(st.integers(1, 3))}, {inner})"
    if kind == "limitk":
        clause = draw(st.sampled_from(["", " by (job)"]))
        return f"limitk{clause}({draw(st.integers(1, 3))}, {inner})"
    if kind == "limit_ratio":
        r = draw(st.sampled_from(["0.3", "0.5", "1.0", "-0.5", "-1.0"]))
        return f"limit_ratio({r}, {inner})"
    op = draw(st.sampled_from(BIN_OPS))
    # r6: negative and Inf literals exercise the unary / literal lexing
    k = draw(st.sampled_from(["2", "0.5", "7", "-3", "Inf", "-Inf"]))
    form = draw(st.sampled_from(["v_op_k", "k_op_v", "neg"]))
    if form == "neg":
        return f"-({inner})"
    return f"{inner} {op} {k}" if form == "v_op_k" else f"{k} {op} {inner}"


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=40))
def test_parser_never_crashes_unexpectedly(s):
    for experimental in (False, True):
        try:
            parse(s, experimental=experimental)
        except ValueError:
            pass  # the only acceptable failure mode


@settings(max_examples=150, deadline=None)
@given(q=promql_expr())
def test_generated_expressions_parse(q):
    parse(q)  # grammar output must always be syntactically valid


@pytest.fixture(scope="module")
def fuzz_engine(spark):
    rows = []
    for m in range(0, 31):
        ts = T0 + timedelta(minutes=m)
        rows.append(("c", ts, float(m * 6), "a"))
        rows.append(("c", ts, float(m * 10 if m < 20 else (m - 20) * 10), "b"))
        rows.append(("g", ts, 100.0 + m, "a"))
    return PromQLEngine(
        spark.createDataFrame(
            rows, "`__name__` string, ts timestamp, value double, job string"
        )
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=promql_expr())
def test_generated_expressions_evaluate_to_vectors(spark, fuzz_engine, q):
    t = T0 + timedelta(minutes=30)
    try:
        out = fuzz_engine.query_range(spark, q, t, t, 60)
    except ValueError:
        return  # semantically rejected is fine; crashing is not
    assert "__step" in out.columns and "value" in out.columns
    rows = out.collect()
    for r in rows:
        assert r["value"] is None or isinstance(r["value"], float)


# experimental grammar (limitk / limit_ratio / mad_over_time) under the
# promql-experimental-functions opt-in (VERDICT r7 #7)

@settings(max_examples=100, deadline=None)
@given(q=promql_expr(experimental=True))
def test_experimental_grammar_parses(q):
    parse(q, experimental=True)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=promql_expr(experimental=True))
def test_experimental_expressions_evaluate_to_vectors(spark, exp_fuzz_engine, q):
    t = T0 + timedelta(minutes=30)
    try:
        out = exp_fuzz_engine.query_range(spark, q, t, t, 60)
    except ValueError:
        return
    assert "__step" in out.columns and "value" in out.columns
    for r in out.collect():
        assert r["value"] is None or isinstance(r["value"], float)


@pytest.fixture(scope="module")
def exp_fuzz_engine(spark):
    rows = []
    for m in range(0, 31):
        ts = T0 + timedelta(minutes=m)
        rows.append(("c", ts, float(m * 6), "a"))
        rows.append(("c", ts, float(m * 10 if m < 20 else (m - 20) * 10), "b"))
        rows.append(("g", ts, 100.0 + m, "a"))
    return PromQLEngine(
        spark.createDataFrame(
            rows, "`__name__` string, ts timestamp, value double, job string"
        ),
        experimental=True,
    )


# ---------------------------------------------------------------------------
# Native-histogram grammar (VERDICT r5 #2): histogram-valued inner
# expressions — selectors, rate/increase/delta, sum/avg merges, and the
# r6 arithmetic (h+h, h-h, scalar*h, h/scalar) — wrapped in a float-
# producing histogram function.
# ---------------------------------------------------------------------------

HIST_WRAPPERS = [
    "histogram_count({h})", "histogram_sum({h})", "histogram_avg({h})",
    "histogram_stddev({h})", "histogram_stdvar({h})",
    "histogram_quantile(0.9, {h})", "histogram_fraction(0, 4, {h})",
    "histogram_fraction(-2, 2, {h})",
]


@st.composite
def promql_hist_expr(draw, depth=0):
    """A histogram-VALUED expression (no float wrapper)."""
    kind = draw(
        st.sampled_from(
            ["selector", "range", "agg", "arith_scalar", "arith_vec"]
            if depth < 2
            else ["selector", "range"]
        )
    )
    sel = draw(st.sampled_from(["h", 'h{job="a"}', 'h{job=~"a|b"}']))
    if kind == "selector":
        return sel
    if kind == "range":
        fn = draw(st.sampled_from(["rate", "increase", "delta"]))
        win = draw(st.sampled_from(["5m", "10m", "1h"]))
        return f"{fn}({sel}[{win}])"
    if kind == "agg":
        op = draw(st.sampled_from(["sum", "avg"]))
        clause = draw(st.sampled_from(["", " by (job)", " without (job)"]))
        inner = draw(promql_hist_expr(depth=depth + 1))
        return f"{op}{clause} ({inner})"
    if kind == "arith_scalar":
        inner = draw(promql_hist_expr(depth=depth + 1))
        k = draw(st.sampled_from(["2", "0.5", "3"]))
        form = draw(st.sampled_from(["{k} * ({h})", "({h}) * {k}", "({h}) / {k}"]))
        return form.format(k=k, h=inner)
    # arith_vec: single-series operands so matching is one-to-one by
    # construction (many-to-many raises at action time by design — the
    # guard-path is covered by the unit tests, not the fuzz)
    op = draw(st.sampled_from(["+", "-"]))
    mod = draw(st.sampled_from(["ignoring(job) ", "on() "]))
    return f'h{{job="a"}} {op} {mod}h{{job="b"}}'


@settings(max_examples=120, deadline=None)
@given(q=promql_hist_expr())
def test_hist_grammar_parses(q):
    parse(f"histogram_count({q})")


@pytest.fixture(scope="module")
def hist_fuzz_engine(spark):
    def _hh(m, neg=False):
        return {
            "schema": 0 if not neg else 1,
            "zero_count": float(m),
            "zero_threshold": 2.0 ** -128,
            "count": float(3 * m),
            "sum": float(10 * m),
            "pos_offset": 0,
            "pos_counts": [float(m), float(m)],
            "neg_offset": 0,
            "neg_counts": [float(m)] if neg else [],
        }

    rows = []
    for m in range(0, 31):
        ts = T0 + timedelta(minutes=m)
        rows.append(("h", ts, None, "a", _hh(m)))
        rows.append(("h", ts, None, "b", _hh(2 * m, neg=True)))
    ddl = (
        "`__name__` string, ts timestamp, value double, job string, "
        "histogram struct<schema:int, zero_count:double, "
        "zero_threshold:double, count:double, sum:double, pos_offset:int, "
        "pos_counts:array<double>, neg_offset:int, neg_counts:array<double>>"
    )
    return PromQLEngine(spark.createDataFrame(rows, ddl))


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(h=promql_hist_expr(), w=st.sampled_from(HIST_WRAPPERS))
def test_hist_grammar_evaluates_to_vectors(spark, hist_fuzz_engine, h, w):
    q = w.format(h=h)
    t = T0 + timedelta(minutes=30)
    try:
        out = hist_fuzz_engine.query_range(spark, q, t, t, 60)
    except ValueError:
        return  # semantically rejected is fine; crashing is not
    assert "__step" in out.columns and "value" in out.columns
    for r in out.collect():
        assert r["value"] is None or isinstance(r["value"], float)
