"""Non-ASCII casing parity for the Arrow language-ID twin (VERDICT r16 #7).

The r16 Arrow worker (text.detect_language_ngram) replays the former
built-in Column expression; the one acknowledged residual risk was Python
``str.lower()`` vs the JVM lowercase on exotic casing (Turkish dotted-İ,
Greek final sigma, Latin ligatures — characters whose lowercase changes
string LENGTH or is context-dependent). This fuzz pins assignment parity
document-by-document against the genuine pre-r16 Column form (recovered
from f38cbed^), on exactly those classes.
"""

from pyspark.sql import Column, functions as F

from hyperdx_spark.pipeline import text as T


def _column_twin(col, *, profiles=None, min_score: float = 0.02) -> Column:
    """The pre-r16 built-in-function implementation, verbatim shape."""
    profs = profiles or T.LANG_TRIGRAM_PROFILES
    c = F.col(col) if isinstance(col, str) else col
    norm = F.concat(
        F.lit(" "),
        F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "),
        F.lit(" "),
    )
    n = F.length(norm)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(2), F.lit(1))),
        lambda i: F.substring(norm, i, 3),
    )
    total = F.size(grams).cast("double")
    scored = F.array(
        *[
            F.struct(
                (
                    F.size(
                        F.filter(
                            grams,
                            lambda g: F.array_contains(
                                F.array(*[F.lit(t) for t in profs[lang]]), g
                            ),
                        )
                    ).cast("double")
                    / total
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(profs)
        ]
    )
    best = F.array_max(scored)
    return F.when(
        (n > 2) & (best["score"] >= min_score), best["lang"]
    ).otherwise(F.lit("unknown"))


DOCS = [
    # Turkish dotted capital İ (U+0130): lowercase expands to 'i' + U+0307
    "İstanbul İle İlgİlİ BİLGİLER the fox and the dog in the market",
    "İİİİ the quick brown fox jumps over the lazy dog",
    # Turkish dotless ı and capital I mixed
    "Isparta ILGIN the cat sat on the mat with the hat",
    # Greek final sigma: Σ lowers to ς word-finally, σ elsewhere
    "ΟΔΥΣΣΕΥΣ ΚΑΙ Ο ΣΚΥΛΟΣ the fox and the dog and the cat",
    "ΣΑΣ ΕΥΧΑΡΙΣΤΩ der schnelle braune fuchs und die hunde",
    # German sharp s and capital ẞ (U+1E9E): lowercases to ß
    "STRAẞE GROẞ der fuchs springt über den faulen hund und die",
    "straße groß weiß der schnelle braune fuchs und der hund",
    # Latin ligatures ﬁ ﬂ (lowercase already; uppercase FI as separate)
    "ﬁne ﬂow the ﬁsh and the ﬂies in the ﬁeld of the farm",
    # Lithuanian / combining accents: does lower() change combining marks
    "Ĩ Ǐ Ì Í the dog and the fox went to the market in the",
    # Cherokee (added lowercase in Unicode 8): uppercase <-> lowercase
    "ᏣᎳᎩ ᎦᏬᏂᎯᏍᏗ the fox and the dog and the market and the",
    # full-width Latin letters
    "ＴＨＥ ＱＵＩＣＫ ＢＲＯＷＮ the fox and the dog in the town",
    # mixed scripts with non-ASCII whitespace (NBSP, ideographic space):
    # Java \s and Python re.ASCII \s both leave these uncollapsed
    "the quick　brown fox the dog the cat the market and",
    # empty-ish / boundary
    "İ",
    "ß",
    "Σ",
]


def test_langid_arrow_matches_column_twin_on_exotic_casing(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string"
    )
    got = (
        df.select(
            "doc_id",
            T.detect_language_ngram("text").alias("arrow"),
            _column_twin("text").alias("column"),
        )
        .collect()
    )
    mismatches = [
        (r["doc_id"], DOCS[r["doc_id"]], r["arrow"], r["column"])
        for r in got
        if r["arrow"] != r["column"]
    ]
    assert not mismatches, mismatches
