"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (the point of each algorithm):

* exact:          one hash-shuffle on the fingerprint; no pairwise work.
* n-gram Jaccard: inverted-index join on shingles (pairs share >= 1 shingle),
                  count co-occurrences, Jaccard from set sizes. Never builds
                  the full cross product; hot shingles can be capped
                  (max_shingle_df) the way web-dedup pipelines drop stop-
                  shingles.
* MinHash+LSH:    signature = per-permutation min of a keyed hash; band the
                  signature; only rows sharing a banded bucket meet in the
                  join. Tunable (bands x rows) recall/cost curve; candidates
                  optionally verified with exact Jaccard.
* SimHash:        64-bit weighted-bit-vote fingerprint; near-dups differ in
                  <= k bits; blocking on rotated chunks finds candidates.
* embedding:      delegated to similarity.cosine_pairs (LSH-bucketed).

MinHash uses ``min(md5(seed || shingle))`` — a valid min-wise family over the
lexicographic order on hex digests, chosen (over xxhash64) because every SQL
engine computes the identical value, which makes results oracle-checkable.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hyperdx_spark.pipeline.text import TOKEN_SPLIT, fingerprint, tokens


# ---------------------------------------------------------------- exact

def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup via normalized-content fingerprint: one row per distinct
    content with the keeper id (min id), the duplicate count, and ids."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def drop_exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id row per distinct content."""
    keep = exact_duplicates(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


# ---------------------------------------------------------------- shingles

def word_shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the document."""
    toks = tokens(text_col)
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


# ---------------------------------------------------------------- jaccard

def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: Optional[int] = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via inverted-index join.

    Explode shingles -> self-join on shingle (only co-occurring docs meet) ->
    per-pair intersection count -> Jaccard with |A|+|B|-|inter|. Returns
    (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.

    ``max_shingle_df`` drops shingles appearing in more than that many docs
    (stop-shingles) — at corpus scale this bounds the join fan-out; the
    resulting measure is then approximate on those pairs.
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(text_col, n)).alias("s")
    )
    if max_shingle_df is not None:
        hot = sh.groupBy("s").count().where(F.col("count") > max_shingle_df).select("s")
        sh = sh.join(F.broadcast(hot), on="s", how="left_anti")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="s")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), on="id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), on="id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------- minhash

def minhash_signature(text_col: str, num_hashes: int = 32, ngram: int = 3) -> Column:
    """MinHash signature: per seed i, min over shingles of md5(i || ':' || s).

    Engine-portable (md5 + lexicographic min) and a correct min-wise hash
    family. array<string> of length num_hashes.
    """
    sh = word_shingles(text_col, ngram)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)))
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    ngram: int = 3,
    verify_threshold: Optional[float] = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash banding.

    num_hashes/bands rows per band; docs colliding in any band become
    candidates; optional exact-Jaccard verification on the (small) candidate
    set. Only bucket collisions are joined — all-pairs work never happens.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(text_col, num_hashes, ngram).alias("sig"),
        word_shingles(text_col, ngram).alias("sh"),
    )
    banded = sig.select(
        "id",
        "sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|", F.slice("sig", b * rows_per_band + 1, rows_per_band)
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, on=["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    if verify_threshold is None:
        return cand.select("id_a", "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b") - inter).cast("double")
    return (
        cand.withColumn("jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0)))
        .where(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------- simhash

def simhash(text_col: str, bits: int = 64) -> Column:
    """SimHash fingerprint: per bit, sign of the sum over tokens of +-1 votes
    (bit b of xxhash64(token)). Near-identical docs differ in few bits.

    Pure higher-order-function implementation (no UDF): for each bit, count
    tokens whose hash has that bit set; bit is 1 when votes > n_tokens/2.
    """
    toks = tokens(text_col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(toks)
    # bit b is 1 when more than half the token hashes have bit b set
    bit_vals = F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda b: F.when(
            F.size(F.filter(hashes, lambda h: F.bit_get(h, b) == 1)) * 2 > n,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    # fold MSB-first: acc = acc*2 + bit (long overflow wraps — deterministic)
    return F.aggregate(
        F.reverse(bit_vals),
        F.lit(0).cast("long"),
        lambda acc, x: acc * F.lit(2).cast("long") + x,
    )


def simhash_near_duplicates(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: by pigeonhole, two fingerprints within
    max_hamming bits (max_hamming < blocks) agree on at least one of
    ``blocks`` contiguous 16-bit chunks — block on each chunk, then verify
    the Hamming distance with bit_count(xor)."""
    hs = df.select(F.col(id_col).alias("id"), simhash(text_col).alias("h"))
    chunk_bits = 64 // blocks
    blocked = hs.select(
        "id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright(F.col("h"), b * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("key"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("bb"),
    ).select("id", "h", F.col("bb.blk").alias("blk"), F.col("bb.key").alias("key"))
    a, b = blocked.alias("a"), blocked.alias("b")
    ham = F.expr("bit_count(a.h ^ b.h)")
    return (
        a.join(b, on=["blk", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .where(ham <= max_hamming)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
