from .cells import build_cells, vstack
from .context import encode_contexts, encode_contexts_replay
from .correlation import (
    context_count,
    corr_pairs,
    gram,
    item_stats,
    neighbor_stats,
    valid_item_stats,
)
from .publish import correlated_items, export_jdbc, publish_model
from .similarity import get_similar_items, similar_items_candidates, similar_items_exact

__all__ = [
    "build_cells",
    "vstack",
    "encode_contexts",
    "encode_contexts_replay",
    "context_count",
    "corr_pairs",
    "gram",
    "item_stats",
    "neighbor_stats",
    "valid_item_stats",
    "correlated_items",
    "export_jdbc",
    "publish_model",
    "get_similar_items",
    "similar_items_candidates",
    "similar_items_exact",
]
