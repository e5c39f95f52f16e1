from .sink import stream_into_table
from .windows import (
    run_available_now,
    sessionize,
    shuffle_partitions,
    streaming_distinct,
    streaming_event_counts,
    streaming_running_totals,
    streaming_static_enrichment,
    streaming_view_purchase_join,
)

__all__ = [
    "streaming_event_counts",
    "streaming_distinct",
    "streaming_view_purchase_join",
    "streaming_running_totals",
    "streaming_static_enrichment",
    "sessionize",
    "run_available_now",
    "stream_into_table",
    "shuffle_partitions",
]
