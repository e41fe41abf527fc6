"""Custom stateful streaming operators.

Two operators the built-in streaming surface can't express:

* :func:`alert_state_stream` — the alert state machine (OK / PENDING /
  ALERT with an M-consecutive-windows streak, ``alerts.py`` semantics /
  checkAlerts task parity) evaluated CONTINUOUSLY over a streaming
  aggregation via ``applyInPandasWithState``: the streak survives across
  micro-batches in managed group state, so an alert that needs N
  consecutive breaching windows fires correctly even when the windows
  arrive in different triggers.
* :func:`dedup_stream` — exactly-once event dedup within a TTL via the
  native ``dropDuplicatesWithinWatermark``: state per key is bounded by
  the watermark delay (the 100 TB shape — no unbounded key set).

Scale notes: group state for the alert machine is one small struct per
alert series (streak int), partitioned by the series key — state size is
O(|series|), independent of event volume. The dedup operator's state is
bounded by (arrival rate × TTL) keys and evicted by the watermark.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from hyperdx_spark.alerts import AlertConfig, does_exceed_threshold

_STATE_SCHEMA = StructType([StructField("streak", IntegerType())])


def alert_state_stream(
    agg_df: DataFrame,
    cfg: AlertConfig,
    *,
    group_cols: Sequence[str] = (),
    ts_col: str = "__timestamp",
    value_col: str = "value",
) -> DataFrame:
    """Evaluate the alert state machine over a streaming (or batch-tested
    with availableNow) windowed aggregation.

    Input rows: (group_cols..., ts_col, value_col) — one row per closed
    window per series (feed it the append-mode output of ``windowed_agg``).
    Output rows add ``streak`` and ``state`` ('OK' | 'PENDING' | 'ALERT'),
    with the streak carried across micro-batches in group state.
    """
    group_cols = list(group_cols)
    out_fields = [agg_df.schema[c] for c in group_cols + [ts_col, value_col]]
    out_schema = StructType(
        list(out_fields)
        + [
            StructField("streak", IntegerType()),
            StructField("state", StringType()),
        ]
    )
    n_consecutive = cfg.num_consecutive_windows

    def fn(key, pdfs, state: GroupState):
        streak = state.get[0] if state.exists else 0
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for _, r in pdf.iterrows():
                v = float(r[value_col])
                exceeds = does_exceed_threshold(cfg, v)
                streak = streak + 1 if exceeds else 0
                if not exceeds:
                    st = "OK"
                elif streak >= n_consecutive:
                    st = "ALERT"
                else:
                    st = "PENDING"
                rows.append(
                    list(key)
                    + [r[ts_col], v, streak, st]
                )
        state.update((streak,))
        yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    grouped = agg_df.groupBy(*group_cols) if group_cols else agg_df.groupBy()
    return grouped.applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    df: DataFrame,
    *,
    keys: Sequence[str],
    ts_col: str = "ts",
    within: str = "10 minutes",
) -> DataFrame:
    """Exactly-once streaming dedup: drop rows whose key was already seen
    within the watermark TTL. Built on the native
    ``dropDuplicatesWithinWatermark`` so the key state is evicted as the
    watermark advances — bounded memory at any event rate."""
    return df.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(list(keys))
