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
    assert out[5][0] == "badctlcharshere"
    assert out[4][0] == "tab\tand\nnewline\rkept"  # kept whitespace
    assert out[6][1] == "spaced out"
    assert out[4][1] == "tab and newline kept"


def test_normalize_for_dedup_composed(spark, docs):
    out = {
        r["doc_id"]: r["text"]
        for r in textnorm.normalize_for_dedup(docs).collect()
    }
    assert out[0] == "Café naïve"             # NFC composed
    assert out[7] == "Café"                   # mojibake repaired
    assert out[5] == "badctlcharshere"        # controls stripped
    assert out[6] == "spaced out"             # whitespace canonical
    assert out[2] == "plain ascii"
    # the point: visually-identical variants now hash identically
    a = unicodedata.normalize("NFD", "Café naïve")
    b = "CafÃ© naÃ¯ve"
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    vals = {r["text"] for r in textnorm.normalize_for_dedup(df).collect()}
    assert vals == {"Café naïve"}
