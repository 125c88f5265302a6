from .occurrences import (
    load_occurrences,
    occurrences_from_lineitem,
    occurrences_from_events,
    read_events,
)
from .model_io import save_pairs, load_pairs, load_reference_matrix, save_reference_matrix

__all__ = [
    "load_occurrences",
    "occurrences_from_lineitem",
    "occurrences_from_events",
    "read_events",
    "save_pairs",
    "load_pairs",
    "load_reference_matrix",
    "save_reference_matrix",
]
