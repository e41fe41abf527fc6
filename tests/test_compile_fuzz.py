"""Property-based fuzz of the ChartConfig compiler (hypothesis): random
builder configs — agg set, conditional aggs, group-by, granularity, having —
must match an INDEPENDENTLY rendered DuckDB SQL oracle on the same parquet
table, value for value.

This is the generative analogue of the reference's renderChartConfig
fixture tests (renderChartConfig.test.ts): instead of N hand-written
configs, the strategy space covers the cross-product of builder features,
and the oracle is a second from-scratch SQL rendering (not the compiler's
own output), so a shared bug can't cancel out.

Determinism: double sums/avgs are compared with relative tolerance — float
addition is not associative, and Spark's partial-aggregation order differs
from DuckDB's sequential scan, so ANY fixed rounding has boundary cases
(hypothesis found a day whose average straddled a .00005 edge: 42.5583 vs
42.5582). count/min/max/count_distinct are exact (EXACT settings disable
approx sketches); rows and columns are compared as sorted sets, so ORDER BY
never participates. (The driver-gated entries avoid the problem at the
source — exact decimal sums with one final double conversion; the generic
compile path keeps the reference's double semantics, hence tolerance here.)
"""

import math
import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hyperdx_spark.compile import compile_chart_config
from hyperdx_spark.model import ChartConfig, QuerySettings, SelectCol, Source

from conftest import SF_DIR

EXACT = QuerySettings(approx_quantiles=False, approx_count_distinct=False)
EVENTS = os.path.join(SF_DIR, "events.parquet")

AGG_FNS = ["count", "sum", "avg", "min", "max", "count_distinct"]
CONDS = [
    (None, None),
    ("event_type = 'error'", "event_type = 'error'"),
    ("value > 500", "value > 500"),
]
def _duck_agg(fn, cond):
    flt = f" FILTER ({cond})" if cond else ""
    if fn == "count":
        return f"count(1){flt}" if cond else "count(*)"
    if fn == "count_distinct":
        return f"count(DISTINCT user_id){flt}"
    if fn == "avg":
        # sum/count (not avg()) mirrors the compiler's null-gated average;
        # rounding happens in _canon on BOTH sides with the same Python
        # round(), so SQL-vs-Python tie-breaking can't diverge
        return f"sum(value){flt} / count(value){flt}"
    return f"{fn}(value){flt}"


@st.composite
def config(draw):
    idxs = draw(
        st.lists(st.sampled_from(range(len(AGG_FNS))), min_size=1, max_size=3,
                 unique=True)
    )
    conds = [draw(st.sampled_from(range(len(CONDS)))) for _ in idxs]
    group = draw(st.booleans())
    gran = draw(st.sampled_from([None, "1 day", "6 hour"]))
    having = draw(st.booleans()) and AGG_FNS[idxs[0]] == "count"
    return idxs, conds, group, gran, having


def _spark_cfg(idxs, conds, group, gran, having):
    select = [
        SelectCol(
            agg_fn=AGG_FNS[idx],
            value_expression=(
                None if AGG_FNS[idx] == "count"
                else "user_id" if AGG_FNS[idx] == "count_distinct"
                else "value"
            ),
            agg_condition_language="sql",
            agg_condition=CONDS[cidx][0],
            alias=f"a{i}",
        )
        for i, (idx, cidx) in enumerate(zip(idxs, conds))
    ]
    return ChartConfig(
        source=Source(table="events", timestamp_value_expression="ts"),
        select=select,
        group_by=["event_type"] if group else [],
        granularity=gran,
        having="a0 > 3" if having else None,
        having_language="sql",
    )


def _oracle_sql(idxs, conds, group, gran, having):
    cols = [
        f"{_duck_agg(AGG_FNS[idx], CONDS[cidx][1])} AS a{i}"
        for i, (idx, cidx) in enumerate(zip(idxs, conds))
    ]
    keys = []
    if gran:
        step = {"1 day": 86400, "6 hour": 21600}[gran]
        keys.append(
            f"make_timestamp((floor(epoch(ts))::BIGINT // {step}) * {step}"
            " * 1000000) AS __timestamp"
        )
    if group:
        keys.append("event_type")
    sql = f"SELECT {', '.join(keys + cols)} FROM events"
    # OR-of-aggConditions pushdown parity (renderChartConfig.ts:1165-1193):
    # when EVERY select carries a condition the compiler filters rows, so
    # groups with no matching rows disappear from the result
    pushed = [CONDS[c][1] for c in conds]
    if all(pushed):
        sql += " WHERE " + " OR ".join(f"({c})" for c in pushed)
    if keys:
        sql += f" GROUP BY {', '.join(str(i + 1) for i in range(len(keys)))}"
    if having:
        flt = f" FILTER ({CONDS[conds[0]][1]})" if CONDS[conds[0]][1] else ""
        base = f"count(1){flt}" if flt else "count(*)"
        sql += f" HAVING {base} > 3"
    return sql


def _canon(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(r[i] for i in order) for r in rows]
    # sort on a coarse float rounding so a last-ulp difference can't change
    # row order; the time/group keys lead the tuple and decide in practice
    return sorted(
        out,
        key=lambda t: tuple(
            repr(round(v, 2)) if isinstance(v, float) else repr(v) for v in t
        ),
    )


def _rows_equal(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if not math.isclose(va, vb, rel_tol=1e-9, abs_tol=1e-9):
                    return False
            elif va != vb:
                return False
    return True


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{EVENTS}')")
    yield con
    con.close()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cfg=config())
def test_compiled_config_matches_duckdb(spark, duck, cfg):
    out = compile_chart_config(spark, _spark_cfg(*cfg), sf_dir=SF_DIR,
                               settings=EXACT)
    got = _canon(out.columns, [tuple(r) for r in out.collect()])
    cur = duck.execute(_oracle_sql(*cfg))
    want = _canon([d[0] for d in cur.description], cur.fetchall())
    assert _rows_equal(got, want), (_oracle_sql(*cfg), got[:3], want[:3])


# ---------------------------------------------------------------------------
# Round-5 widened grammar (VERDICT r4 #8): CTEs, sample-weighted aggs,
# series-limit, and ratio mode in the random space. The gated entries cover
# fixed shapes; the fuzz is what catches interaction bugs between features.
# ---------------------------------------------------------------------------

from hyperdx_spark.model import SqlFilter  # noqa: E402
from hyperdx_spark.post import compute_ratio  # noqa: E402

W_EXPR = "1 + user_id % 3"
W_SQL = f"greatest(coalesce(try_cast(({W_EXPR}) AS BIGINT), 0), 1)"
EXT_AGGS = ["count", "sum", "avg"]
EXT_COND = "event_type = 'error'"


@st.composite
def config_ext(draw):
    use_cte = draw(st.booleans())
    weighted = draw(st.booleans())
    gran = draw(st.sampled_from([None, "1 day"]))
    aggs = draw(
        st.lists(st.sampled_from(EXT_AGGS), min_size=1, max_size=3)
    )
    cond1 = len(aggs) >= 2 and draw(st.booleans())
    series_n = draw(st.sampled_from([None, 1, 2]))
    ratio = None
    if len(aggs) >= 2:
        modes = [None, "per_group"] + (["share_of_total"] if gran else [])
        ratio = draw(st.sampled_from(modes))
    # display-shape rewrite (r10): pie reinterprets seriesLimit as LIMIT with
    # the injected first-value-DESC ordering; table drops granularity. Ratio
    # stays on the unconverted shape (the client computes it pre-conversion).
    display = None if ratio else draw(st.sampled_from([None, None, "table", "pie"]))
    return use_cte, weighted, gran, aggs, cond1, series_n, ratio, display


def _run_ext(spark, duck, use_cte, weighted, gran, aggs, cond1, series_n, ratio,
             display=None):
    src = Source(
        table="base" if use_cte else "events",
        timestamp_value_expression="ts",
        sample_rate_expression=W_EXPR if weighted else None,
    )
    ctes = []
    if use_cte:
        ctes = [(
            "base",
            ChartConfig(
                source=Source(table="events", timestamp_value_expression="ts"),
                select="ts, event_type, user_id, value",
                filters=[SqlFilter(condition="value > 100", type="sql")],
            ),
        )]
    select = [
        SelectCol(
            agg_fn=fn,
            value_expression=None if fn == "count" else "value",
            agg_condition=EXT_COND if (i == 1 and cond1) else None,
            agg_condition_language="sql",
            alias=f"a{i}",
        )
        for i, fn in enumerate(aggs)
    ]
    cfg = ChartConfig(
        source=src, ctes=ctes, select=select, group_by=["event_type"],
        granularity=gran, series_limit=series_n,
    )
    if display == "pie":
        from hyperdx_spark.display import convert_to_categorical_chart_config

        cfg = convert_to_categorical_chart_config(cfg)
    elif display == "table":
        from hyperdx_spark.display import convert_to_table_chart_config

        cfg = convert_to_table_chart_config(cfg)
    out = compile_chart_config(spark, cfg, sf_dir=SF_DIR, settings=EXACT)
    if ratio:
        out = compute_ratio(
            out, numerator="a0", denominator="a1", mode=ratio,
            bucket_col="__timestamp",
        )
    got = _canon(out.columns, [tuple(r) for r in out.collect()])

    # --- independent DuckDB rendering
    def agg_sql(i, fn):
        cond = EXT_COND if (i == 1 and cond1) else None
        flt = f" FILTER ({cond})" if cond else ""
        if fn == "count":
            inner = f"sum({W_SQL})" if weighted else (
                "count(1)" if cond else "count(*)"
            )
            return f"{inner}{flt} AS a{i}" if weighted or cond else f"{inner} AS a{i}"
        if fn == "sum":
            x = f"value * ({W_SQL})" if weighted else "value"
            return f"sum({x}){flt} AS a{i}"
        if weighted:
            return (
                f"(sum(value * ({W_SQL})){flt} / sum({W_SQL}){flt}) AS a{i}"
            )
        return f"(sum(value){flt} / count(value){flt}) AS a{i}"

    keys = []
    if gran and display is None:  # every display conversion drops granularity
        keys.append(
            "make_timestamp((floor(epoch(ts))::BIGINT // 86400) * 86400"
            " * 1000000) AS __timestamp"
        )
    keys.append("event_type")
    cols = [agg_sql(i, fn) for i, fn in enumerate(aggs)]
    frm = "base" if use_cte else "events"
    inner_sql = (
        f"SELECT {', '.join(keys + cols)} FROM {frm} GROUP BY "
        + ", ".join(str(i + 1) for i in range(len(keys)))
    )
    withs = []
    if use_cte:
        withs.append(
            "base AS (SELECT ts, event_type, user_id, value FROM events"
            " WHERE value > 100)"
        )
    withs.append(f"agg AS ({inner_sql})")
    sql = "WITH " + ", ".join(withs) + " SELECT * FROM agg"
    # the series cap only applies to granular charts (renderSeriesLimitCte
    # gates on isUsingGranularity, renderChartConfig.ts:1317-1333); the pie
    # conversion reinterprets it as a plain LIMIT with the injected
    # first-value-DESC + group-ASC ordering instead
    if display == "pie" and series_n:
        sql += f" ORDER BY a0 DESC NULLS LAST, event_type LIMIT {series_n}"
    elif display is None and series_n and gran:
        sql += (
            " WHERE event_type IN (SELECT event_type FROM agg"
            " GROUP BY event_type ORDER BY max(a0) DESC NULLS LAST,"
            f" event_type LIMIT {series_n})"
        )
    if ratio:
        if ratio == "per_group":
            den = "a1::DOUBLE"
        else:
            den = "sum(a1::DOUBLE) OVER (PARTITION BY __timestamp)"
        sql = (
            f"SELECT *, CASE WHEN {den} != 0 THEN a0::DOUBLE / {den} END"
            f" AS ratio FROM ({sql})"
        )
    cur = duck.execute(sql)
    want = _canon([d[0] for d in cur.description], cur.fetchall())
    assert _rows_equal(got, want), (sql, got[:3], want[:3])


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cfg=config_ext())
def test_compiled_ext_matches_duckdb(spark, duck, cfg):
    _run_ext(spark, duck, *cfg)


# deterministic proof the widened space includes each feature (the fuzz
# draws them randomly; these pin one case per feature through the same
# harness): CTE, sample-weighted family, series-limit, both ratio modes,
# and a kitchen-sink interaction case
@pytest.mark.parametrize(
    "case",
    [
        (True, False, "1 day", ["count", "sum"], False, None, None),
        (False, True, None, ["count", "sum", "avg"], True, None, None),
        (False, False, "1 day", ["count"], False, 2, None),
        (False, False, "1 day", ["count", "sum"], False, None, "per_group"),
        (False, False, "1 day", ["sum", "count"], False, None, "share_of_total"),
        (True, True, "1 day", ["avg", "sum"], True, 1, "share_of_total"),
        # r10 display conversions: pie seriesLimit->LIMIT w/ injected
        # ordering (weighted + conditional first agg), table drops gran
        (False, True, "1 day", ["count", "sum"], True, 2, None, "pie"),
        (True, False, "1 day", ["sum"], False, 1, None, "pie"),
        (False, False, "1 day", ["count", "avg"], False, None, None, "table"),
    ],
)
def test_compiled_ext_pinned_features(spark, duck, case):
    _run_ext(spark, duck, *case)
