"""Unicode normalization + mojibake repair (pipeline/textnorm.py)."""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from hyperdx_spark.pipeline import textnorm

CASES = [
    "Café naïve",        # decomposed accents -> NFC composes
    "ﬁne ① ＡBC",      # ligature fi, circled 1, fullwidth A
    "plain ascii",
    "",
    "tab\tand\nnewline\rkept",
    "bad\x00ctl\x1fchars\x85here",
    "  spaced  out  ",
    "CafÃ©",                          # utf-8 decoded as latin-1
    "Ã©Ã¨Ã§ double trouble",
    "naÃ¯ve rÃ©sumÃ©",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "doc_id long, text string"
    )


def test_nfc_nfkc_match_unicodedata(spark, docs):
    out = docs.select(
        "doc_id",
        textnorm.nfc_normalize("text").alias("nfc"),
        textnorm.nfkc_normalize("text").alias("nfkc"),
    ).collect()
    for r in out:
        src = CASES[r["doc_id"]]
        assert r["nfc"] == unicodedata.normalize("NFC", src)
        assert r["nfkc"] == unicodedata.normalize("NFKC", src)
    # NFKC folds the ligature/fullwidth case to plain letters
    folded = [r["nfkc"] for r in out if r["doc_id"] == 1][0]
    assert folded.startswith("fine")
    assert "ABC" in folded


def test_nfc_matches_duckdb_independent_engine(spark, docs):
    """The UDF against DuckDB's independent implementation of the same
    Unicode standard — the cross-engine check the gate part relies on."""
    import duckdb

    got = {
        r["doc_id"]: r["nfc"]
        for r in docs.select(
            "doc_id", textnorm.nfc_normalize("text").alias("nfc")
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(CASES):
        if "\x00" in t:
            # DuckDB's nfc_normalize truncates at NUL (C-string
            # semantics); the gate fixture strips controls first, so the
            # replay never sees one
            continue
        want = con.execute("SELECT nfc_normalize(?)", [t]).fetchone()[0]
        assert got[i] == want, (i, t)


def test_mojibake_repair_and_clean_text_untouched():
    f = textnorm.py_fix_mojibake
    assert f("CafÃ©") == "Café"
    assert f("naÃ¯ve rÃ©sumÃ©") == "naïve résumé"
    # double-encoded: two passes undo two layers
    double = "Café".encode("utf-8").decode("latin-1").encode("utf-8").decode("latin-1")
    assert f(double) == "Café"
    # clean text — including genuine accented prose — is untouched
    assert f("Café au lait") == "Café au lait"
    assert f("plain ascii") == "plain ascii"
    assert f("") == ""
    # non-latin text can't encode to cp1252/latin-1: untouched
    assert f("日本語のテキスト") == "日本語のテキスト"


def test_mojibake_column_matches_python(spark, docs):
    out = {
        r["doc_id"]: r["fx"]
        for r in docs.select(
            "doc_id", textnorm.fix_mojibake("text").alias("fx")
        ).collect()
    }
    for i, t in enumerate(CASES):
        assert out[i] == textnorm.py_fix_mojibake(t)


def test_control_and_whitespace_passes(spark, docs):
    out = {
        r["doc_id"]: (r["c"], r["w"])
        for r in docs.select(
            "doc_id",
            textnorm.strip_control_chars("text").alias("c"),
            textnorm.collapse_whitespace("text").alias("w"),
        ).collect()
    }
    # \x00/\x1f stripped; \x85 (NEL) is Unicode White_Space — KEPT as a
    # word boundary for the collapse pass (review r14: stripping it glued
    # adjacent words)
    assert out[5][0] == "badctlchars\x85here"
    assert out[4][0] == "tab\tand\nnewline\rkept"  # kept whitespace
    # VT/FF/NEL survive the strip and become word boundaries at collapse
    row = spark.range(1).select(
        textnorm.collapse_whitespace(
            textnorm.strip_control_chars(
                F.lit("page1\x0cpage2\x0bpage3\x85page4\x00page5")
            )
        ).alias("x")
    ).collect()[0]
    assert row["x"] == "page1 page2 page3 page4page5"
    assert out[6][1] == "spaced out"
    assert out[4][1] == "tab and newline kept"


def test_mojibake_properties_fuzz():
    """Pure-python hypothesis properties for the repair rule."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    f = textnorm.py_fix_mojibake

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=st.characters(max_codepoint=0x7F), max_size=80))
    def ascii_is_fixed_point(s):
        # pure ASCII round-trips losslessly at the SAME length, so the
        # strictly-shorter guard always rejects: identity
        assert f(s) == s

    @settings(max_examples=300, deadline=None)
    @given(st.text(min_size=1, max_size=40))
    def single_mojibake_layer_repairs(s):
        # corrupt: encode utf-8, decode cp1252 (skip when the bytes hit
        # one of cp1252's 5 holes); repair must recover s exactly when
        # corruption changed the string at all
        b = s.encode("utf-8")
        try:
            broken = b.decode("cp1252")
        except UnicodeDecodeError:
            return
        if broken == s:
            assert f(s) == s
        else:
            # repair undoes the corruption layer — landing on s, or on
            # f(s) when s is ITSELF mojibake-shaped (e.g. 'Ñ\x80' IS the
            # cp1252 rendering of UTF-8 'р'; no repairer can tell intent
            # from encoding — the same ambiguity ftfy resolves by
            # heuristic). Found by hypothesis.
            assert f(broken) in (s, f(s))

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=60))
    def idempotent_and_never_longer(s):
        out = f(s)
        assert len(out) <= len(s)
        assert f(out) == out

    ascii_is_fixed_point()
    single_mojibake_layer_repairs()
    idempotent_and_never_longer()


def test_normalize_for_dedup_composed(spark, docs):
    out = {
        r["doc_id"]: r["text"]
        for r in textnorm.normalize_for_dedup(docs).collect()
    }
    assert out[0] == "Café naïve"             # NFC composed
    assert out[7] == "Café"                   # mojibake repaired
    assert out[5] == "badctlchars here"       # controls stripped, NEL -> space
    assert out[6] == "spaced out"             # whitespace canonical
    assert out[2] == "plain ascii"
    # the point: visually-identical variants now hash identically
    a = unicodedata.normalize("NFD", "Café naïve")
    b = "CafÃ© naÃ¯ve"
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    vals = {r["text"] for r in textnorm.normalize_for_dedup(df).collect()}
    assert vals == {"Café naïve"}
