from .cooccurrence import (
    start_cells_query,
    start_model_refresh,
    stream_occurrences,
    streaming_cells,
    windowed_event_counts,
)

__all__ = [
    "start_cells_query",
    "start_model_refresh",
    "stream_occurrences",
    "streaming_cells",
    "windowed_event_counts",
]
