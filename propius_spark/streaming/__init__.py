from .cooccurrence import (
    stream_occurrences,
    streaming_cells,
    start_cells_query,
    windowed_event_counts,
)

__all__ = [
    "stream_occurrences",
    "streaming_cells",
    "start_cells_query",
    "windowed_event_counts",
]
