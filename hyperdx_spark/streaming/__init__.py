from hyperdx_spark.streaming.live_tail import (
    live_tail,
    stream_alert,
    windowed_agg,
)

__all__ = ["live_tail", "windowed_agg", "stream_alert"]
