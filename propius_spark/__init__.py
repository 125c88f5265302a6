"""propius_spark — a PySpark-native co-occurrence similarity engine.

A from-scratch rebuild of the capabilities of dafevara/propius
(reference snapshot at /root/reference, surveyed in SURVEY.md) as
idiomatic Spark: long-form DataFrames end-to-end, closed-form Pearson
over a Gram self-join, zero Python UDFs in the parity surface, parquet
(optionally JDBC) publication, plus the large-scale training-data
pipeline operators (dedup with cluster resolution, exact/IVF similarity
search, text analysis and corpus filtering, deterministic sampling,
sessionization and windowed rollups, multimodal plumbing, streaming
model maintenance) the reference never had.

Pipeline:  load_occurrences → build_cells → corr_pairs /
similar_items_exact → publish_model → serving queries.
"""

from .operators import (
    asof_join,
    build_cells,
    corr_pairs,
    cosine_topk,
    deterministic_sample,
    doc_stats,
    dup_clusters,
    encode_contexts,
    exact_dedup,
    filter_corpus,
    get_similar_items,
    gram,
    item_stats,
    ivf_knn_join,
    ivf_topk,
    jaccard_pairs,
    knn_join,
    minhash_lsh_pairs,
    neighbor_stats,
    publish_model,
    resolve_duplicates,
    sessionize,
    similar_items_candidates,
    similar_items_exact,
    simhash_pairs,
    stratified_sample,
    top_k_per_item,
    valid_item_stats,
    vstack,
    windowed_counts,
)
from .serving import (
    get_database_stats,
    get_item_info,
    register_model_views,
    retrieve_similar_items,
    search_items_by_name,
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
    "top_k_per_item",
    "publish_model",
    "register_model_views",
    "retrieve_similar_items",
    "get_item_info",
    "search_items_by_name",
    "get_database_stats",
    "exact_dedup",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "dup_clusters",
    "resolve_duplicates",
    "cosine_topk",
    "knn_join",
    "ivf_topk",
    "ivf_knn_join",
    "doc_stats",
    "filter_corpus",
    "deterministic_sample",
    "stratified_sample",
    "sessionize",
    "windowed_counts",
    "asof_join",
]

__version__ = "0.1.0"
