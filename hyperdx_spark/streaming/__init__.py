from hyperdx_spark.streaming.dedup_stream import start_incremental_dedup
from hyperdx_spark.streaming.live_tail import (
    live_tail,
    stream_alert,
    stream_alert_notifications,
    windowed_agg,
)

__all__ = [
    "live_tail",
    "windowed_agg",
    "stream_alert",
    "stream_alert_notifications",
    "start_incremental_dedup",
]
