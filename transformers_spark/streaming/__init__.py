from .sink import stream_into_table
from .windows import (
    run_available_now,
    sessionize,
    streaming_distinct,
    streaming_event_counts,
    streaming_view_purchase_join,
)

__all__ = [
    "streaming_event_counts",
    "streaming_distinct",
    "streaming_view_purchase_join",
    "sessionize",
    "run_available_now",
    "stream_into_table",
]
