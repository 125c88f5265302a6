from .cooccurrence import (
    start_cells_query,
    start_model_refresh,
    stream_occurrences,
    streaming_cells,
    windowed_event_counts,
)
from .dedup import dedup_stream, start_dedup_query
from .sessions import sessionize_stream, start_sessions_query

__all__ = [
    "dedup_stream",
    "sessionize_stream",
    "start_cells_query",
    "start_dedup_query",
    "start_model_refresh",
    "start_sessions_query",
    "stream_occurrences",
    "streaming_cells",
    "windowed_event_counts",
]
