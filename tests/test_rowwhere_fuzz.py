"""Property fuzz for the r13 string surfaces (VERDICT r13 #4):
``rowwhere.sqlstring_escape`` / ``process_row_to_where_clause`` (escape
semantics + the md5 truncation boundary at exactly 512/513 UTF-16 units,
including surrogate pairs) and ``autocomplete.tokenize_at_cursor`` /
``find_matching_quote`` — the same hypothesis technique that hardened
facets/filters in r12.  No Spark session: all pure driver-side string
builders.
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hyperdx_spark.autocomplete import find_matching_quote, tokenize_at_cursor
from hyperdx_spark.rowwhere import (
    MAX_STRING_LENGTH,
    _utf16_len,
    process_row_to_where_clause,
    sqlstring_escape,
    sqlstring_escape_id,
)

# --------------------------------------------------------------------------
# sqlstring escape semantics
# --------------------------------------------------------------------------

_UNESCAPES = {
    "0": "\0", "b": "\b", "t": "\t", "n": "\n", "r": "\r",
    "Z": "\x1a", '"': '"', "'": "'", "\\": "\\",
}


def _unescape_literal(lit: str) -> str:
    """Inverse of the sqlstring string escape: strip the outer quotes and
    fold every backslash escape."""
    assert lit[0] == "'" and lit[-1] == "'"
    body = lit[1:-1]
    out, i = [], 0
    while i < len(body):
        if body[i] == "\\":
            assert i + 1 < len(body), "dangling backslash"
            out.append(_UNESCAPES[body[i + 1]])
            i += 2
        else:
            out.append(body[i])
            i += 1
    return "".join(out)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_escape_string_roundtrips(s):
    lit = sqlstring_escape(s)
    assert _unescape_literal(lit) == s


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_escape_string_never_leaks_a_bare_quote(s):
    """Injection safety: inside the literal every quote/backslash is
    consumed by a backslash escape — a SQL lexer scanning the literal can
    never terminate it early."""
    body = sqlstring_escape(s)[1:-1]
    i = 0
    while i < len(body):
        if body[i] == "\\":
            i += 2  # escape consumes the next char, whatever it is
            continue
        assert body[i] not in ("'", "\\")
        i += 1


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**53) + 1, max_value=2**53 - 1))
def test_escape_safe_integers_render_bare(n):
    assert sqlstring_escape(n) == str(n)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(st.text(max_size=20), st.integers(-1000, 1000),
                          st.booleans(), st.none()), max_size=6))
def test_escape_list_is_comma_join_of_elements(xs):
    assert sqlstring_escape(list(xs)) == ", ".join(
        sqlstring_escape(x) for x in xs
    )


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_escape_id_doubles_backticks_and_qualifies_dots(name):
    out = sqlstring_escape_id(name)
    assert out.startswith("`") and out.endswith("`")
    # inner content: no bare backtick (every ` becomes `` or `.`)
    inner = out[1:-1]
    i = 0
    while i < len(inner):
        if inner[i] == "`":
            assert i + 1 < len(inner) and inner[i + 1] in ("`", ".")
            i += 2
            if inner[i - 1] == ".":
                assert i < len(inner) and inner[i] == "`"
                i += 1
            continue
        i += 1


# --------------------------------------------------------------------------
# md5 truncation boundary: 512/513 UTF-16 units incl. surrogate pairs
# --------------------------------------------------------------------------

_CM = {"c": {"type": "String", "js_type": "string", "value_expr": "c"}}

# BMP chars are 1 UTF-16 unit, astral chars 2
_BMP = st.characters(max_codepoint=0xFFFF,
                     blacklist_categories=("Cs",))  # no lone surrogates
_ASTRAL = st.characters(min_codepoint=0x10000, max_codepoint=0x10FFF)


def _units(s: str) -> int:
    return len(s.encode("utf-16-le")) // 2


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=st.one_of(_BMP, _ASTRAL), max_size=600))
def test_md5_branch_taken_iff_over_512_utf16_units(s):
    assert _utf16_len(s) == _units(s)  # the JS length model itself
    out = process_row_to_where_clause({"c": s}, _CM)
    if _units(s) > MAX_STRING_LENGTH:
        assert out.startswith("lower(hex(MD5(leftUTF8(c, 1000))))=")
    else:
        assert out.startswith("c=")


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=_BMP, min_size=513, max_size=1600))
def test_md5_value_is_first_1000_utf16_units(s):
    """Independent model: slice 1000 UTF-16 units via utf-16-le bytes and
    md5 the UTF-8 re-encoding — must equal the literal in the clause."""
    out = process_row_to_where_clause({"c": s}, _CM)
    first_1000 = s.encode("utf-16-le")[:2000].decode("utf-16-le")
    want = hashlib.md5(first_1000.encode("utf-8")).hexdigest()
    assert out == f"lower(hex(MD5(leftUTF8(c, 1000))))='{want}'"


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=_BMP, min_size=999, max_size=999), _ASTRAL,
       st.text(alphabet=_BMP, min_size=1, max_size=50))
def test_substring_split_surrogate_raises_like_reference(prefix, astral, pad):
    """999 BMP units + one astral char puts the split at unit 1000 —
    substring(0, 1000) would leave a lone high surrogate, which the
    reference's crypto-js md5 cannot UTF-8 encode; mirrored as a raise."""
    s = prefix + astral + pad  # > 512 units -> md5 path; split at 1000
    with pytest.raises(ValueError, match="surrogate"):
        process_row_to_where_clause({"c": s}, _CM)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=_BMP, min_size=998, max_size=998), _ASTRAL,
       st.text(alphabet=_BMP, min_size=1, max_size=50))
def test_substring_pair_ending_exactly_at_1000_is_fine(prefix, astral, pad):
    """998 BMP units + one astral char = exactly 1000 units — the pair is
    NOT split, so the md5 path succeeds and hashes prefix+astral."""
    s = prefix + astral + pad
    out = process_row_to_where_clause({"c": s}, _CM)
    want = hashlib.md5((prefix + astral).encode("utf-8")).hexdigest()
    assert out.endswith(f"'{want}'")


def test_boundary_512_vs_513_exact():
    assert process_row_to_where_clause({"c": "x" * 512}, _CM).startswith("c=")
    assert process_row_to_where_clause({"c": "x" * 513}, _CM).startswith(
        "lower(hex(MD5(leftUTF8(c, 1000))))="
    )
    # astral chars count 2 units: 256 astral = 512 units (equality path),
    # 256 astral + 1 BMP = 513 (md5 path)
    astral = "\U0001F600"
    assert process_row_to_where_clause(
        {"c": astral * 256}, _CM
    ).startswith("c=")
    assert process_row_to_where_clause(
        {"c": astral * 256 + "x"}, _CM
    ).startswith("lower(hex(MD5(")


# --------------------------------------------------------------------------
# autocomplete tokenizer
# --------------------------------------------------------------------------

_QUERYISH = st.text(
    alphabet=st.sampled_from(list('abcXY_.:0 "\\\t') + ['"']), max_size=60
)


@settings(max_examples=400, deadline=None)
@given(_QUERYISH, st.data())
def test_tokens_rejoin_to_the_input(value, data):
    """Single-space split semantics: every char lands in exactly one token
    and every separator consumed exactly one space, so the tokens rejoin
    to the input verbatim — for ANY input, quoted or half-typed."""
    cursor = data.draw(st.integers(0, len(value)))
    out = tokenize_at_cursor(value, cursor)
    assert " ".join(out["tokens"]) == value
    assert out["token"] == out["tokens"][out["index"]]
    assert 0 <= out["index"] < len(out["tokens"])


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from("abc: ."), max_size=40), st.data())
def test_no_quotes_matches_plain_split(value, data):
    cursor = data.draw(st.integers(0, len(value)))
    out = tokenize_at_cursor(value, cursor)
    assert out["tokens"] == value.split(" ")


@settings(max_examples=300, deadline=None)
@given(_QUERYISH)
def test_find_matching_quote_returns_a_quote_or_minus_one(value):
    for i, ch in enumerate(value):
        if ch != '"':
            continue
        j = find_matching_quote(value, i)
        if j != -1:
            assert j > i and value[j] == '"'
            # the close is not escaped: even number of backslashes before
            k, bs = j - 1, 0
            while k > i and value[k] == "\\":
                bs += 1
                k -= 1
            assert bs % 2 == 0


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from('ab "'), max_size=40), st.data())
def test_closed_quote_regions_keep_their_spaces(value, data):
    """Every space inside a CLOSED quoted region stays inside one token:
    scan the value with find_matching_quote to find closed regions, then
    assert each region's text appears intact in some token."""
    cursor = data.draw(st.integers(0, len(value)))
    out = tokenize_at_cursor(value, cursor)
    i = 0
    while i < len(value):
        if value[i] == '"':
            j = find_matching_quote(value, i)
            if j != -1:
                region = value[i:j + 1]
                assert any(region in t for t in out["tokens"])
                i = j + 1
                continue
        i += 1
