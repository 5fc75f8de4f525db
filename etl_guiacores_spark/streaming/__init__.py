from etl_guiacores_spark.streaming.discovery import discover_until_idle
from etl_guiacores_spark.streaming.drift import cusum_drift_stream
from etl_guiacores_spark.streaming.smooth import holt_smooth_stream
from etl_guiacores_spark.streaming.windows import (
    ohlc_bars,
    session_agg,
    sliding_counts,
    stream_dedupe,
    tumbling_counts,
)

__all__ = [
    "cusum_drift_stream",
    "discover_until_idle",
    "holt_smooth_stream",
    "ohlc_bars",
    "session_agg",
    "sliding_counts",
    "stream_dedupe",
    "tumbling_counts",
]
