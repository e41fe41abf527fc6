from hyperdx_spark.streaming.dedup_stream import start_incremental_dedup
from hyperdx_spark.streaming.live_tail import (
    live_tail,
    stream_alert,
    windowed_agg,
)

__all__ = [
    "live_tail",
    "windowed_agg",
    "stream_alert",
    "start_incremental_dedup",
]
