"""Shared JS Number()/String() quirk emulation (jsnum.py) — the fidelity
gaps the r12 review found (underscores, hex, small-magnitude printing)."""

from hyperdx_spark.jsnum import js_number, js_number_str


def test_js_number_quirks():
    assert js_number("") == 0.0
    assert js_number("  ") == 0.0
    assert js_number("1700000000.5") == 1700000000.5
    assert js_number("1e3") == 1000.0
    assert js_number("Infinity") == float("inf")
    assert js_number("-Infinity") == float("-inf")
    # JS parses radix literals; Python float() does not
    assert js_number("0x10") == 16.0
    assert js_number("0b101") == 5.0
    assert js_number("0o17") == 15.0
    # sign + radix literal is NaN in JS
    assert js_number("-0x10") is None
    # Python float() accepts these; JS Number() does NOT
    assert js_number("1_0") is None
    assert js_number("nan") is None
    assert js_number("not-a-number") is None
    # r12 review: JS only accepts EXACT 'Infinity'; numeric overflow IS inf
    assert js_number("inf") is None
    assert js_number("INFINITY") is None
    assert js_number("1e999") == float("inf")
    # an over-wide radix literal is Infinity, not an OverflowError crash
    assert js_number("0x" + "f" * 300) == float("inf")


def test_js_number_str_bands():
    # integers under 1e21 print bare
    assert js_number_str(42.0) == "42"
    assert js_number_str(-3.0) == "-3"
    assert js_number_str(0.5) == "0.5"
    # JS stays decimal down to 1e-6 where Python repr goes exponential
    assert js_number_str(1e-05) == "0.00001"
    assert js_number_str(1.5e-05) == "0.000015"
    assert js_number_str(1e-06) == "0.000001"
    # at 1e-7 JS flips to exponential WITHOUT zero-padding the exponent
    assert js_number_str(1e-07) == "1e-7"
    assert js_number_str(2.5e-07) == "2.5e-7"
    assert js_number_str(-2.5e-07) == "-2.5e-7"
    # big numbers keep the plus sign
    assert js_number_str(1e21) == "1e+21"
    assert js_number_str(1.5e21) == "1.5e+21"
    # shortest-round-trip digits above 2^53, like JS String(number)
    assert js_number_str(123456789123456789.0) == "123456789123456780"
    assert js_number_str(-0.0) == "0"
    assert js_number_str(float("nan")) == "NaN"
    assert js_number_str(float("inf")) == "Infinity"
    assert js_number_str(float("-inf")) == "-Infinity"


def test_shared_by_prom_and_facets():
    from hyperdx_spark.facets import merge_path
    from hyperdx_spark.promql import parse_api_duration, parse_api_timestamp

    # underscore numerics are NaN everywhere now: string subscript, and
    # the API parsers fall through to their error paths
    assert merge_path(["arr", "1_0"]) == "arr['1_0']"
    import pytest

    with pytest.raises(ValueError, match="Invalid duration"):
        parse_api_duration("1_0")
    with pytest.raises(ValueError, match="Invalid timestamp"):
        parse_api_timestamp("1_0")
    # hex parses like JS Number
    assert parse_api_timestamp("0x10") == 16.0


def test_js_number_str_round_trip_property():
    """String(number) is a shortest-ROUND-TRIP printer: parsing the printed
    form must recover the exact double, for every finite float."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.floats(allow_nan=False, allow_infinity=False))
    @settings(max_examples=400, deadline=None)
    def check(x):
        printed = js_number_str(x)
        assert float(printed) == x or (x == 0 and printed == "0")
        # the printed form is also JS-Number-parseable (no locale artifacts)
        assert js_number(printed) == (0.0 if x == 0 else x)

    check()


def test_facets_quoting_idempotent_property():
    """to_quoted_clickhouse_key_expression is idempotent for ANY key: a
    second pass over its own output never changes it (the reference pins
    one case; the property holds generally because quoted/bracket/function
    forms all short-circuit)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hyperdx_spark.facets import to_quoted_clickhouse_key_expression as f

    ident = st.text(
        alphabet=st.characters(
            whitelist_categories=("Ll", "Lu", "Nd"),
            whitelist_characters="_-. ",
        ),
        min_size=1,
        max_size=20,
    )

    @given(
        key=ident,
        known=st.sets(ident, max_size=3),
        also_known=st.booleans(),
    )
    @settings(max_examples=300, deadline=None)
    def check(key, known, also_known):
        cols = set(known) | ({key} if also_known else set())
        once = f(key, cols)
        assert f(once, cols) == once

    check()
