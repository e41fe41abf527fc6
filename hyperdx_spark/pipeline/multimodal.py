"""Multimodal columns — image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas``.

Decoding is REAL for the formats implementable without external codec
libraries (pipeline/codecs.py): PNG, 24-bit BMP, JPEG (baseline SOF0 and
progressive SOF2), PCM WAV, and YUV4MPEG2 (Y4M) uncompressed video.
Compressed video raises a clear unsupported-codec error (no libav in this
environment). The ``fake=True`` paths remain as cheap deterministic
stand-ins for tests that only exercise plumbing.

Scale notes: mapInPandas streams Arrow batches; per-batch memory is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch``. Binary payloads never
pass through Python row-at-a-time. Repartition before decode to spread large
blobs evenly (size skew, not row-count skew, dominates here).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from hyperdx_spark.pipeline import codecs

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


def _fit(feats: list[float], dim: int) -> list[float]:
    feats = [float(x) for x in feats[:dim]]
    return feats + [0.0] * (dim - len(feats))


def _image_features(arr: np.ndarray, dim: int) -> tuple[int, int, list[float]]:
    h, w = arr.shape[:2]
    channels = arr.shape[2] if arr.ndim == 3 else 1
    flat = arr.astype(np.float64)
    feats = [
        flat.mean(),
        flat.std(),
        flat.min(),
        flat.max(),
        np.abs(np.diff(flat, axis=0)).mean() if h > 1 else 0.0,
        np.abs(np.diff(flat, axis=1)).mean() if w > 1 else 0.0,
        float(channels),
        w / max(h, 1),
    ]
    return w, h, _fit(feats, dim)


def _audio_features(samples: np.ndarray, rate: int, dim: int) -> tuple[int, int, list[float]]:
    x = samples.astype(np.float64) / 32768.0
    n = len(x)
    zc = float(np.mean(np.abs(np.diff(np.signbit(x))))) if n > 1 else 0.0
    feats = [
        float(np.sqrt(np.mean(x * x))) if n else 0.0,  # rms
        float(np.mean(np.abs(x))) if n else 0.0,
        float(np.max(np.abs(x))) if n else 0.0,
        zc,
        float(rate),
        n / max(rate, 1),  # duration s
        float(np.percentile(x, 25)) if n else 0.0,
        float(np.percentile(x, 75)) if n else 0.0,
    ]
    return n, rate, _fit(feats, dim)


def _video_features(frames: np.ndarray, fps: int, dim: int) -> tuple[int, int, list[float]]:
    n, h, w = frames.shape
    flat = frames.astype(np.float64)
    inter = np.abs(np.diff(flat, axis=0)).mean() if n > 1 else 0.0
    feats = [float(n), float(fps), flat.mean(), flat.std(), inter,
             float(w), float(h), w / max(h, 1)]
    return w, h, _fit(feats, dim)


def _fake_decode(payload: bytes, dim: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic stand-in decoder (plumbing tests only)."""
    n = len(payload)
    w = 16 + (n % 64)
    h = 16 + ((n // 64) % 64)
    feats = [float((payload[i % max(n, 1)] if n else 0) + i) for i in range(dim)]
    return w, h, feats


def _real_decode(data: bytes, dim: int) -> tuple[int, int, list[float]]:
    kind = codecs.sniff(data)
    if kind in ("png", "bmp", "jpeg"):
        return _image_features(codecs.decode_image(data), dim)
    if kind == "wav":
        samples, rate = codecs.decode_wav(data)
        return _audio_features(samples, rate, dim)
    if kind == "y4m":
        frames, fps = codecs.decode_y4m(data)
        return _video_features(frames, fps, dim)
    raise ValueError(f"unsupported media codec: {kind}")


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

    Real decoding for PNG/BMP/WAV/Y4M payloads (pipeline/codecs.py);
    ``fake=True`` substitutes the deterministic stand-in."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf[id_col], pdf[kind_col], pdf[payload_col]
            ):
                data = bytes(payload) if payload is not None else b""
                if fake:
                    w, h, feats = _fake_decode(data, feature_dim)
                else:
                    w, h, feats = _real_decode(data, feature_dim)
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


MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def media_from_documents(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Synthesize a REAL media table from a text table: each document is
    rendered deterministically into an actual PNG or baseline-JPEG image,
    PCM WAV clip, or Y4M video (doc_id mod 4), so the decode path exercises
    true codecs end to end."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                data = (text or "").encode("utf-8")
                arr = np.frombuffer(data, np.uint8)
                sel = int(mid) % 4
                if sel in (0, 3):  # PNG/JPEG: text bytes tiled into gray
                    w = 32
                    h = max((len(arr) + w - 1) // w, 2)
                    img = np.resize(arr, (h, w))
                    enc = codecs.encode_png if sel == 0 else codecs.encode_jpeg
                    payload, kind = enc(img), "image"
                elif sel == 1:  # WAV: bytes as a centered waveform
                    samples = (arr.astype(np.int16) - 128) * 256
                    payload, kind = codecs.encode_wav(samples, rate=8000), "audio"
                else:  # Y4M: a few tiled frames
                    n_frames = min(max(len(arr) // 256, 1), 4)
                    frames = np.resize(arr, (n_frames, 16, 16))
                    payload, kind = codecs.encode_y4m(frames, fps=5), "video"
                rows.append({"media_id": mid, "kind": kind, "payload": payload})
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return df.select(F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)).mapInPandas(
        synth, MEDIA_SCHEMA
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
    method: str = "nearest",
) -> DataFrame:
    """Resize a binary image column via Arrow-batched mapInPandas: decode
    (PNG/BMP/JPEG), resample (``method``: nearest | bilinear), re-encode
    as PNG. ``fake=True`` keeps the deterministic byte-downsample
    stand-in."""
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown resize method: {method}")

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if fake:
                    target = max(width * height, 1)
                    step = max(len(data) // target, 1)
                    out = data[::step][:target]
                else:
                    arr = codecs.decode_image(data)
                    resampler = (
                        codecs.resize_bilinear
                        if method == "bilinear"
                        else codecs.resize_nearest
                    )
                    out = codecs.encode_png(resampler(arr, width, height))
                rows.append(
                    {
                        "media_id": mid,
                        "width": width,
                        "height": height,
                        "payload": out,
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
    per_shot: bool = False,
    shot_threshold: float = 20.0,
) -> DataFrame:
    """Video frame sampling: one input row (Y4M binary) fans out to
    <= max_frames rows (frame_idx, ts_ms, frame as PNG). A mapInPandas
    generator may yield more rows than it consumes — the explode shape and
    per-batch memory profile are the scale-relevant parts. ``fake=True``
    slices byte windows instead of decoding.

    ``per_shot=True`` switches from fixed-interval to shot-aware sampling:
    cut boundaries come from codecs.scene_changes and the MIDDLE frame of
    each shot is emitted — one representative frame per shot instead of
    interval frames that can all land in the same static scene."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if fake:
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
                    continue
                frames, fps = codecs.decode_y4m(data)
                n = frames.shape[0]
                if per_shot:
                    bounds = [0] + codecs.scene_changes(
                        frames, threshold=shot_threshold
                    ) + [n]
                    src_idxs = [
                        (bounds[i] + bounds[i + 1] - 1) // 2
                        for i in range(len(bounds) - 1)
                        if bounds[i] < bounds[i + 1]
                    ]
                else:
                    # sample one frame per every_ms of wall time
                    step = max(int(round(fps * every_ms / 1000.0)), 1)
                    src_idxs = list(range(0, n, step))
                for out_idx, src_idx in enumerate(src_idxs):
                    if out_idx >= max_frames:
                        break
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": out_idx,
                            "ts_ms": int(src_idx * 1000.0 / fps),
                            "frame": codecs.encode_png(frames[src_idx]),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.mapInPandas(frame_batches, FRAME_SCHEMA)


SPECTRAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("rate_hz", IntegerType()),
        StructField("dominant_hz", DoubleType()),
        StructField("centroid_hz", DoubleType()),
        StructField("rolloff_hz", DoubleType()),
        StructField("rms", DoubleType()),
    ]
)


def audio_spectral(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_fft: int = 512,
) -> DataFrame:
    """Spectral features of a binary WAV column (codecs.spectral_features:
    Hann-windowed rFFT -> dominant/centroid/rolloff frequency + RMS) via
    Arrow-batched mapInPandas — the audio tier's content signals beyond
    duration/rate."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                samples, rate = codecs.decode_wav(data)
                feats = codecs.spectral_features(samples, rate, n_fft=n_fft)
                rows.append({"media_id": mid, "rate_hz": rate, **feats})
            yield pd.DataFrame(
                rows, columns=[f.name for f in SPECTRAL_SCHEMA.fields]
            )

    return df.mapInPandas(batches, SPECTRAL_SCHEMA)


SCENE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("cuts", ArrayType(IntegerType())),
    ]
)


def video_scene_cuts(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    threshold: float = 20.0,
) -> DataFrame:
    """Shot-boundary detection over a binary Y4M column
    (codecs.scene_changes: mean-abs-luma frame deltas over the threshold)
    — feeds shot-aware frame sampling (one frame per detected shot instead
    of fixed-interval sampling)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                frames, _fps = codecs.decode_y4m(data)
                rows.append({
                    "media_id": mid,
                    "n_frames": int(frames.shape[0]),
                    "cuts": codecs.scene_changes(frames, threshold=threshold),
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in SCENE_SCHEMA.fields]
            )

    return df.mapInPandas(batches, SCENE_SCHEMA)
