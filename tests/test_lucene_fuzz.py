"""Property-based fuzz of the Lucene pipeline (hypothesis):

1. arbitrary text never crashes the parser with anything but ValueError;
2. structurally-valid generated queries serialize to SQL that Spark's
   analyzer accepts against the events schema (quote/escape injection in
   values must never produce malformed or semantics-escaping SQL).
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hyperdx_spark.lucene import parser
from hyperdx_spark.lucene.serializer import SearchQueryBuilder

# known schema fields + a JSON dot-path; unknown fields are intentionally
# excluded — they pass through as raw SQL and fail loudly at analysis
# (queryParser.ts:1752-1759 parity), which is the documented contract
FIELDS = ["event_type", "value", "user_id", "props.k", "ts"]
# values deliberately include SQL/regex/LIKE metacharacters and quotes
VALUES = st.one_of(
    st.text(min_size=1, max_size=12).filter(lambda s: s.strip()),
    st.sampled_from(
        ["err*", "100", "3.5", "a'b", 'a"b', "%_", "\\", "O'Neil", "x;--",
         "a(b)", "[1 TO 2]", "AND", "OR"]
    ),
)


@st.composite
def term(draw):
    field = draw(st.sampled_from(FIELDS))
    kind = draw(st.sampled_from(["contains", "quoted", "prefix", "range", "exists"]))
    v = draw(VALUES)
    v_tok = "".join(c for c in v if c not in ' ()[]{}:"') or "x"
    if kind == "quoted":
        safe = v.replace("\\", "").replace('"', "")
        return f'{field}:"{safe or "x"}"'
    if kind == "prefix":
        return f"{field}:>={draw(st.integers(0, 999))}"
    if kind == "range":
        lo, hi = sorted([draw(st.integers(0, 99)), draw(st.integers(0, 99))])
        return f"{field}:[{lo} TO {hi}]"
    if kind == "exists":
        return f"{field}:*"
    return f"{field}:{v_tok}"


@st.composite
def query(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        t = draw(term())
        return f"NOT {t}" if draw(st.booleans()) else t
    a = draw(query(depth=depth + 1))
    b = draw(query(depth=depth + 1))
    op = draw(st.sampled_from(["AND", "OR"]))
    q = f"{a} {op} {b}"
    return f"({q})" if draw(st.booleans()) else q


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_parser_never_crashes_unexpectedly(s):
    try:
        parser.parse(s)
    except ValueError:
        pass  # the only acceptable failure mode


@pytest.fixture(scope="module")
def builder(spark, sf_dir):
    from hyperdx_spark.io import load_table
    from hyperdx_spark.model import Source

    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("fuzz_events")
    src = Source(
        table="events",
        timestamp_value_expression="ts",
        implicit_column_expression="concat_ws(' ', event_type, props)",
    )
    return SearchQueryBuilder(ev.schema, src), spark


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=query())
def test_valid_queries_serialize_to_analyzable_sql(builder, q):
    b, spark = builder
    try:
        cond = b.build(q)
    except ValueError:
        return  # structurally rejected is fine; crashing is not
    # the serialized predicate must be analyzable Spark SQL — injection via
    # quotes/backslashes in values must never break out of the literal
    spark.sql(f"SELECT count(*) FROM fuzz_events WHERE {cond}").collect()


# colon/backslash/URL-heavy bare terms: the encodeSpecialTokens pre-pass
# (queryParser.ts:32-48, r9) must keep every one of these compiling to an
# analyzable body search — never an unknown-column reference
_COLONISH = st.one_of(
    st.sampled_from([
        "localhost:3000", "localhost:123456", "http://x:8080/y",
        "https://a.b/c?d=1", r"foo\:bar", r"a\\b", "svc:api:retry",
        "10.0.0.1:53", "err:code:5", r"\:lead", "trail:",
    ]),
    st.from_regex(r"[a-z]{1,6}:[0-9]{1,6}", fullmatch=True),
    st.from_regex(r"https?://[a-z]{1,5}(:[0-9]{1,4})?/[a-z]{0,4}",
                  fullmatch=True),
)


@settings(
    max_examples=80,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(t=_COLONISH)
def test_colon_terms_always_compile_and_run(builder, t):
    b, spark = builder
    try:
        cond = b.build(t)
    except ValueError:
        # structurally malformed (e.g. 'trail:' — a field with no value)
        # may reject like the reference's lucene grammar; never crash,
        # never emit unanalyzable SQL
        return
    spark.sql(f"SELECT count(*) FROM fuzz_events WHERE {cond}").collect()
