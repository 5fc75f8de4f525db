from etl_guiacores_spark.streaming.discovery import discover_until_idle
from etl_guiacores_spark.streaming.windows import (
    session_agg,
    sliding_counts,
    stream_dedupe,
    tumbling_counts,
)

__all__ = [
    "discover_until_idle",
    "session_agg",
    "sliding_counts",
    "stream_dedupe",
    "tumbling_counts",
]
