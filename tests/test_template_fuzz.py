"""Hypothesis fuzz over the r11 string algorithms: the Handlebars-subset
renderer, external-action translation, and the bracket splitter. These are
pure functions — fuzz pins totality (no crashes/hangs), idempotence where
promised, and the structural invariants the ports rely on."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from hyperdx_spark.compile import split_and_trim_with_bracket
from hyperdx_spark.webhooks import (
    _NOTIFY_RE,
    extract_notify_directives,
    render_template,
    translate_external_actions,
)

# view values: strings, numbers, bools, None, shallow dicts. Strings are
# kept marker-free ('{{' excluded) because a value CONTAINING marker text
# legitimately passes through to the output verbatim (the untrusted-input
# guarantee) — the marker-absence assertions below are about the
# template's OWN markers being resolved.
_scalar = st.one_of(
    st.text(max_size=30).filter(lambda s: "{{" not in s),
    st.integers(-1000, 1000),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.booleans(),
    st.none(),
)
_view = st.dictionaries(
    st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True),
    st.one_of(_scalar, st.dictionaries(
        st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True), _scalar,
        max_size=3,
    )),
    max_size=5,
)

_path = st.from_regex(r"[a-z][a-z0-9_]{0,6}(\.[a-z][a-z0-9_]{0,6})?", fullmatch=True)
_literal = st.from_regex(r"[A-Za-z0-9 _.-]{0,12}", fullmatch=True)
_plain = st.from_regex(r"[^{}]{0,20}", fullmatch=True)


@st.composite
def _template(draw):
    """Well-formed templates from the supported grammar: plain text,
    {{var}}, {{{var}}}, #if / #if (eq ..) / #is_match blocks (non-nested),
    and notify markers."""
    parts = []
    for _ in range(draw(st.integers(1, 5))):
        kind = draw(st.integers(0, 6))
        if kind == 0:
            parts.append(draw(_plain))
        elif kind == 1:
            parts.append("{{" + draw(_path) + "}}")
        elif kind == 2:
            parts.append("{{{" + draw(_path) + "}}}")
        elif kind == 3:
            body = draw(_plain)
            alt = draw(_plain)
            parts.append(
                "{{#if " + draw(_path) + "}}" + body + "{{else}}" + alt + "{{/if}}"
            )
        elif kind == 4:
            a = draw(_path)
            b = '"' + draw(_literal) + '"'
            parts.append(
                "{{#if (eq " + a + " " + b + ")}}" + draw(_plain) + "{{/if}}"
            )
        elif kind == 5:
            parts.append(
                '{{#is_match "' + draw(_path) + '" "' + draw(_literal) + '"}}'
                + draw(_plain) + "{{/is_match}}"
            )
        else:
            parts.append(
                '{{__hdx_notify_channel__ channel="webhook" id="'
                + draw(_literal) + '"}}'
            )
    return "".join(parts)


@settings(max_examples=200, deadline=None)
@given(_template(), _view)
def test_render_template_total_and_marker_free(tpl, view):
    """Any grammar-valid template renders without raising, leaves no block
    markers or notify markers behind, and never leaks template syntax FROM
    substituted view values into further expansion (single-pass rule:
    rendering the OUTPUT as data-free text is stable for marker absence)."""
    for flag in (True, False):
        out = render_template(tpl, view, render_is_match=flag)
        assert "{{#" not in out and "{{/" not in out
        assert "__hdx_notify_channel__" not in out


@settings(max_examples=200, deadline=None)
@given(_template(), _view)
def test_extract_notify_directives_total_and_bounded(tpl, view):
    """Extraction never raises, returns only webhook-channel pairs from the
    template's own markers, and never MORE directives than markers."""
    out = extract_notify_directives(tpl, view)
    assert len(out) <= len(_NOTIFY_RE.findall(tpl))
    for channel, _id in out:
        assert channel == "webhook"


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=" \tabc@{}.-_123\n", max_size=40))
def test_translate_external_actions_total_and_idempotent_without_at(s):
    """Translation never raises; text without '@' is untouched; translated
    output re-translates without growth when ids contain no '@' (the
    marker text itself has no whitespace-@ sequence)."""
    out = translate_external_actions(s)
    if "@" not in s:
        assert out == s
    assert len(translate_external_actions(out)) >= len(out) - 1


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="ab,()[]'\" \\x", max_size=30))
def test_split_and_trim_with_bracket_invariants(s):
    """The splitter never raises; on inputs with no separators or brackets
    it returns the trimmed input (or nothing for blanks); segments never
    contain a top-level comma when the input is balanced and quote-free."""
    parts = split_and_trim_with_bracket(s)
    assert all(p == p.strip() and p != "" for p in parts)
    if not any(c in s for c in ",()[]'\""):
        assert parts == ([s.strip()] if s.strip() else [])
    # rejoining never loses non-whitespace content for bracket-free,
    # quote-free inputs (commas are separators, everything else survives)
    if not any(c in s for c in "()[]'\"\\"):
        assert "".join(parts).replace(" ", "") == re.sub(r"[,\s]", "", s)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=50), _view)
def test_render_template_arbitrary_text_never_hangs(s, view):
    """Arbitrary text (possibly with stray braces) either renders or
    raises the documented unsupported-block ValueError — nothing else."""
    try:
        render_template(s, view)
    except ValueError as e:
        assert "Unsupported Handlebars block" in str(e)
