"""Multimodal columns — image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image`` raises ``NotImplementedError`` unless ``fake=True``, which
substitutes a deterministic content-derived feature vector so the Spark-side
plumbing — schema, batch shape, partitioning — is real and testable.

Scale notes: mapInPandas streams Arrow batches; per-batch memory is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch``. Binary payloads never
pass through Python row-at-a-time. Repartition before decode to spread large
blobs evenly (size skew, not row-count skew, dominates here).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _fake_decode(payload: bytes, dim: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real decoder: derives (w, h, features)
    from the payload bytes. Replaced wholesale when codecs are available."""
    n = len(payload)
    w = 16 + (n % 64)
    h = 16 + ((n // 64) % 64)
    feats = [float((payload[i % max(n, 1)] if n else 0) + i) for i in range(dim)]
    return w, h, feats


def decode_media(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    kind_col: str = "kind",
    payload_col: str = "payload",
    fake: bool = False,
    feature_dim: int = 8,
) -> DataFrame:
    """Decode + feature-extract a binary media column via mapInPandas.

    With ``fake=False`` this raises NotImplementedError at execution time —
    the container has no codecs; the plan/schema path is still exercised.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decoding requires image/audio codecs not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            rows = []
            for mid, kind, payload in zip(
                pdf[id_col], pdf[kind_col], pdf[payload_col]
            ):
                data = bytes(payload) if payload is not None else b""
                w, h, feats = _fake_decode(data, feature_dim)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "n_bytes": len(data),
                        "width": w,
                        "height": h,
                        "features": feats,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.mapInPandas(decode_batches, FEATURE_SCHEMA)


def media_from_documents(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a synthetic media table from a text table (payload = utf-8
    bytes) — exercises the binary-column path with the data we have."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    *,
    width: int,
    height: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Resize plumbing: binary in → binary out at the target dimensions via
    Arrow-batched mapInPandas. The pixel work is STUBBED (no codecs here):
    ``fake=True`` substitutes a deterministic byte-downsample so the schema,
    batch shape, and payload round-trip are real; ``fake=False`` raises at
    execution, same contract as :func:`decode_media`."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires codecs not present in this "
                    "environment; pass fake=True for the deterministic stub"
                )
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                target = max(width * height, 1)
                step = max(len(data) // target, 1)
                rows.append(
                    {
                        "media_id": mid,
                        "width": width,
                        "height": height,
                        "payload": data[::step][:target],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.mapInPandas(resize_batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    *,
    every_ms: int = 1000,
    max_frames: int = 16,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling plumbing: one input row (video binary) fans out
    to ≤ max_frames rows (frame_idx, ts_ms, frame binary). Decode STUBBED:
    ``fake=True`` slices deterministic byte windows as stand-in frames; the
    explode shape, schema, and per-batch memory profile are the real ones
    (a mapInPandas generator may yield more rows than it consumes)."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decoding requires codecs not present in this "
                    "environment; pass fake=True for the deterministic stub"
                )
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                # fake duration: 100 bytes ~ 1 second of "video"
                n_frames = min(max(len(data) // 100, 1), max_frames)
                chunk = max(len(data) // max(n_frames, 1), 1)
                for i in range(n_frames):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "ts_ms": i * every_ms,
                            "frame": data[i * chunk : (i + 1) * chunk],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.mapInPandas(frame_batches, FRAME_SCHEMA)
