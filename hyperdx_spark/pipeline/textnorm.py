"""Unicode text normalization + encoding repair for corpus cleaning.

The cleaning stage every web-crawl curation pipeline runs before dedup /
filtering (cf. CCNet/C4/RefinedWeb preprocessing): canonical Unicode
forms so "é" and "e&#769;" hash identically, control-character stripping,
whitespace canonicalization, and mojibake repair (the core heuristic of
the public `ftfy` library: text that was UTF-8 but got decoded as
Latin-1/CP1252 round-trips back through the wrong codec).

All operators are row-local (zero shuffles, partition-agnostic):

* ``nfc_normalize`` / ``nfkc_normalize`` — Python ``unicodedata`` via an
  Arrow-batched pandas UDF (Spark has no builtin Unicode normalizer).
  NFC is independently checkable: DuckDB's ``nfc_normalize`` implements
  the same Unicode algorithm, so the gate hash-compares the UDF against
  an independent engine's implementation of the standard.
* ``fix_mojibake`` — bounded re-decode: while the text encodes losslessly
  to CP1252/Latin-1 AND those bytes decode as valid UTF-8 that is
  strictly shorter, undo one layer (at most ``max_passes``, default 2 —
  double-encoding is the wild failure mode; the strictly-shorter guard
  makes the loop provably terminating and a no-op on clean text).
* ``strip_control_chars`` / ``collapse_whitespace`` — single codegen'd
  JVM regex passes (no UDF).
* ``normalize_for_dedup`` — the composed cleaning pass whose output is
  what the dedup fingerprints should hash.
"""

from __future__ import annotations

import unicodedata
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: C0/C1 control chars EXCEPT the whitespace-class ones (\t \n \r, and
#: also \x0b vertical-tab, \x0c form-feed, \x85 NEL — all Unicode
#: White_Space): those are WORD BOUNDARIES, and stripping them before the
#: whitespace collapse would glue adjacent words ('page1\x0cpage2' ->
#: 'page1page2'); the collapse pass turns them into single spaces instead
_CONTROL_RE = r"[\x00-\x08\x0e-\x1f\x7f-\x84\x86-\x9f]"


def _norm_udf_col(col, form: str):
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("string")
    def norm(s):
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return norm(col)


def nfc_normalize(col) -> Column:
    """Unicode NFC (canonical composition) — Arrow-batched.  The DuckDB
    oracle replays it with its own ``nfc_normalize`` (same standard)."""
    return _norm_udf_col(F.col(col) if isinstance(col, str) else col, "NFC")


def nfkc_normalize(col) -> Column:
    """Unicode NFKC (compatibility composition: ligatures, full-width
    forms, superscripts fold to plain text — the aggressive dedup form)."""
    return _norm_udf_col(F.col(col) if isinstance(col, str) else col, "NFKC")


def py_fix_mojibake(s: str, max_passes: int = 2) -> str:
    """Pure reference: undo up to ``max_passes`` layers of
    UTF-8-bytes-decoded-as-CP1252 (falling back to Latin-1 for the 5
    CP1252 holes).  Only applies when the round-trip is lossless, valid
    UTF-8, and STRICTLY shorter (real mojibake always shrinks — every
    repaired char came from >= 2 wrongly-decoded chars), so clean text —
    including genuine Latin-1-looking prose — is untouched."""
    for _ in range(max_passes):
        try:
            b = s.encode("cp1252")
        except UnicodeEncodeError:
            try:
                b = s.encode("latin-1")
            except UnicodeEncodeError:
                return s
        try:
            fixed = b.decode("utf-8")
        except UnicodeDecodeError:
            return s
        if len(fixed) >= len(s):
            return s
        s = fixed
    return s


def fix_mojibake(col, max_passes: int = 2) -> Column:
    """ftfy-style encoding repair as an Arrow-batched column (see
    :func:`py_fix_mojibake` for the exact rule)."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("string")
    def fix(s):
        return s.map(
            lambda x: py_fix_mojibake(x, max_passes) if x is not None else None
        )

    return fix(F.col(col) if isinstance(col, str) else col)


def strip_control_chars(col) -> Column:
    """Drop non-whitespace C0/C1 control characters (tab/newline/CR/VT/
    FF/NEL survive for the collapse pass to treat as boundaries) — one
    codegen'd regex pass."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _CONTROL_RE, "")


def collapse_whitespace(col) -> Column:
    """Canonical whitespace: every run of Unicode whitespace (NBSP,
    em-space, ... — ``(?U)`` turns on Java's UNICODE_CHARACTER_CLASS;
    bare ``\\s`` is ASCII-only) becomes one space, ends trimmed — one
    codegen'd regex pass."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"(?U)\s+", " "))


def normalize_for_dedup(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: Optional[str] = None,
    form: str = "NFC",
    repair_encoding: bool = True,
) -> DataFrame:
    """The composed cleaning pass (mojibake -> Unicode form -> control
    strip -> whitespace collapse), row-local end to end.  Feed the result
    to the dedup fingerprints so visually-identical texts hash together."""
    c: Column = F.col(text_col)
    if repair_encoding:
        c = fix_mojibake(c)
    c = _norm_udf_col(c, form)
    c = collapse_whitespace(strip_control_chars(c))
    return df.withColumn(out_col or text_col, c)
