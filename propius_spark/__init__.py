"""propius_spark — a PySpark-native co-occurrence similarity engine.

A from-scratch rebuild of the capabilities of dafevara/propius
(reference snapshot at /root/reference, surveyed in SURVEY.md) as
idiomatic Spark: long-form DataFrames end-to-end, closed-form Pearson
over a Gram self-join, zero Python UDFs in the parity surface, parquet
(optionally JDBC) publication, plus the large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) the reference never had.

Pipeline:  load_occurrences → build_cells → corr_pairs /
similar_items_exact → publish_model → serving queries.
"""

from .operators import (
    build_cells,
    corr_pairs,
    encode_contexts,
    get_similar_items,
    gram,
    item_stats,
    neighbor_stats,
    publish_model,
    similar_items_candidates,
    similar_items_exact,
    valid_item_stats,
    vstack,
)
from .session import get_spark
from .sources import load_occurrences

__all__ = [
    "get_spark",
    "load_occurrences",
    "build_cells",
    "vstack",
    "encode_contexts",
    "item_stats",
    "valid_item_stats",
    "gram",
    "corr_pairs",
    "neighbor_stats",
    "get_similar_items",
    "similar_items_candidates",
    "similar_items_exact",
    "publish_model",
]

__version__ = "0.1.0"
