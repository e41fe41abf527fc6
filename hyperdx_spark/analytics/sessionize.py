"""Sessionization — gap-based session windows over an event stream.

The Spark-first primitive is ``F.session_window`` (native session windows,
merge-on-gap, usable identically in batch and Structured Streaming with a
watermark); the reference's sessions UI derives session extents with ad-hoc
queries over rum.sessionId (sessions.ts), while this operator computes them
from raw event times for any key.

Scale shape: one shuffle on the session key; in streaming, state per open
session is bounded by the watermark (sessions idle past the gap close and
emit). No window-function self-ordering pass is needed — the native
operator merges intervals internally.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    gap: str = "30 minutes",
    watermark: Optional[str] = None,
) -> DataFrame:
    """Sessions per key: events closer than *gap* merge into one session.

    Returns (key..., session_start, session_end, n_events): start = first
    event, end = last event + gap (the native session_window contract).
    Works on batch DataFrames and, with ``watermark`` set, on streaming
    DataFrames (append mode emits a session once the watermark passes its
    close).
    """
    src = df
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    out = (
        src.groupBy(win, *[F.col(k) for k in key_cols])
        .agg(F.count("*").alias("n_events"))
    )
    return out.select(
        *key_cols,
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
    )
