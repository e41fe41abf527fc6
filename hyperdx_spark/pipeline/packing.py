"""Sequence packing — the step between a filtered corpus and a training
run: documents become fixed-length token sequences.

Two strategies, both deterministic (replayable by a SQL / Python oracle):

* :func:`pack_sequences` — **concat-and-chunk** (the GPT pretraining
  convention): inside each shard, documents are concatenated in a
  deterministic order and the token stream is cut into consecutive
  ``seq_len`` windows; a document can straddle a sequence boundary. All
  JVM-side: one hash-shard shuffle, a per-shard running-sum window, and a
  ``sequence()`` + ``explode`` for the span/sequence mapping — no Python
  in the path, and the window parallelism is the shard count, so the
  cumsum never serializes the corpus through one task.
* :func:`pack_ffd` — **whole-document first-fit-decreasing** (the SFT /
  instruction-tuning convention: documents are never split; packs hold
  whole documents up to the budget). FFD is inherently sequential, so it
  runs per shard inside ``applyInPandas`` — each shard's state is a list
  of open-bin remainders, bounded by that shard's pack count. Documents
  longer than ``seq_len`` get a single oversized pack of their own
  (flagged), matching the common implementation.

Determinism contract: shard = ``pmod(xxhash64(id), num_shards)``, order
within a shard is ascending id (FFD: descending tokens, id tiebreak) —
given the same inputs the packing is byte-stable across runs and
cluster layouts, which is what makes a row-level oracle possible and
training-data manifests reproducible.

Scale shape: every shard packs independently — at 100 TB the job is
``num_shards``-way parallel with one shuffle on the shard key; skew is
bounded because shards are hash-assigned. ``pack_stats`` aggregates per
sequence with one further map-side-combined groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sharded(df: DataFrame, id_col: str, num_shards: int) -> DataFrame:
    return df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards))
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    *,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    num_shards: int = 64,
) -> DataFrame:
    """Concat-and-chunk packing: rows
    ``(shard, doc_id, seq_id, doc_tok_begin, doc_tok_end, seq_off)``.

    Each row says: tokens ``[doc_tok_begin, doc_tok_end)`` of ``doc_id``
    land in shard-local sequence ``seq_id`` starting at offset ``seq_off``
    within that sequence. A document shorter than ``seq_len`` yields one
    row per sequence it touches (1 or 2); longer documents span more.
    Every token of every document is covered exactly once, every sequence
    holds exactly ``seq_len`` tokens (except each shard's final partial
    sequence) — both properties are pytest-asserted.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    w = Window.partitionBy("shard").orderBy(F.col(id_col).asc())
    t = F.col(token_count_col).cast("long")
    base = (
        _sharded(df.select(id_col, token_count_col), id_col, num_shards)
        .where(t > 0)
        # ONE window pass: running sum is the span end; start derives from
        # it (two withColumn sums would stack two Window operators)
        .withColumn("__end", F.sum(t).over(w))
        .withColumn("__start", F.col("__end") - t)
    )
    L = F.lit(int(seq_len)).cast("long")
    # integer `div`, not `/`: double division loses exactness past 2^53
    # cumulative tokens, and floor(double) would hide it
    first_seq = F.expr(f"__start div {int(seq_len)}")
    last_seq = F.expr(f"(__end - 1) div {int(seq_len)}")
    out = base.select(
        "shard",
        F.col(id_col),
        F.col("__start"),
        F.col("__end"),
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * L
    seq_hi = seq_lo + L
    begin = F.greatest(F.col("__start"), seq_lo)
    end = F.least(F.col("__end"), seq_hi)
    return out.select(
        "shard",
        id_col,
        "seq_id",
        (begin - F.col("__start")).alias("doc_tok_begin"),
        (end - F.col("__start")).alias("doc_tok_end"),
        (begin - seq_lo).alias("seq_off"),
    )


def pack_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """Per-(shard, seq_id) fill metrics over :func:`pack_sequences` output:
    token fill, fill fraction, number of documents touching the sequence,
    and how many of those cross a boundary (continuation fragments)."""
    frag = F.col("doc_tok_end") - F.col("doc_tok_begin")
    return packed.groupBy("shard", "seq_id").agg(
        F.sum(frag).alias("n_tokens"),
        (F.sum(frag) / F.lit(float(seq_len))).alias("fill_frac"),
        F.count("*").alias("n_docs"),
        F.count_if(
            (F.col("seq_off") == 0) & (F.col("doc_tok_begin") > 0)
        ).alias("n_continuations"),
    )


def pack_ffd(
    df: DataFrame,
    seq_len: int,
    *,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    num_shards: int = 64,
) -> DataFrame:
    """Whole-document first-fit-decreasing packing: rows
    ``(shard, doc_id, pack_id, n_tokens, oversize)``.

    Within each shard, documents are taken in (tokens desc, id asc) order
    and placed into the first open pack with room (classic FFD — within
    11/9 OPT + 1 bins); a document with more than ``seq_len`` tokens gets
    its own single-document pack with ``oversize = true``. Pack ids are
    shard-local, dense, in pack-creation order.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    sharded = _sharded(df.select(id_col, token_count_col), id_col, num_shards)

    schema = (
        f"shard long, {id_col} long, pack_id long, n_tokens long, "
        "oversize boolean"
    )
    cap = int(seq_len)
    id_name, tok_name = id_col, token_count_col

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            [tok_name, id_name], ascending=[False, True], kind="mergesort"
        )
        remaining: list = []  # remainder per open pack, index = pack_id
        rows = []
        shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        for did, toks in zip(pdf[id_name], pdf[tok_name]):
            toks = int(toks)
            if toks <= 0:
                continue
            if toks > cap:
                rows.append((shard, int(did), len(remaining), toks, True))
                remaining.append(0)  # full: never receives another doc
                continue
            for pid, rem in enumerate(remaining):
                if rem >= toks:
                    remaining[pid] = rem - toks
                    rows.append((shard, int(did), pid, toks, False))
                    break
            else:
                rows.append((shard, int(did), len(remaining), toks, False))
                remaining.append(cap - toks)
        return pd.DataFrame(
            rows,
            columns=["shard", id_name, "pack_id", "n_tokens", "oversize"],
        )

    return sharded.groupBy("shard").applyInPandas(_pack, schema)
