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
from .asof import asof_join
from .ann import (
    assign_centroids,
    multi_probe_assignments,
    cosine_topk,
    embedding_dup_pairs,
    ivf_knn_join,
    ivf_topk,
    kmeans_centroids,
    knn_join,
)
from .dedup import (
    dup_clusters,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    resolve_duplicates,
    shingle_ids,
    shingles,
    simhash,
    simhash_pairs,
)
from .publish import correlated_items, export_jdbc, publish_model
from .chunking import chunk_documents, pack_documents
from .events import cohort_retention, funnel, rolling_user_counts
from .ir import posting_lists, tf_idf
from .sampling import cap_per_group, deterministic_sample, stratified_sample
from .semistructured import json_field, props_rollup
from .sessions import sessionize, windowed_counts
from .similarity import (
    get_similar_items,
    similar_items_candidates,
    similar_items_exact,
    top_k_per_item,
)
from .textstats import (
    corpus_summary,
    decontaminate,
    doc_stats,
    filter_corpus,
    redact_pii,
    repetition_stats,
    split_corpus,
    token_distribution,
    vocabulary,
)

__all__ = [
    "asof_join",
    "assign_centroids",
    "multi_probe_assignments",
    "kmeans_centroids",
    "cosine_topk",
    "embedding_dup_pairs",
    "ivf_knn_join",
    "ivf_topk",
    "knn_join",
    "dup_clusters",
    "exact_dedup",
    "jaccard_pairs",
    "resolve_duplicates",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "shingle_ids",
    "shingles",
    "simhash",
    "simhash_pairs",
    "cap_per_group",
    "chunk_documents",
    "cohort_retention",
    "funnel",
    "pack_documents",
    "posting_lists",
    "tf_idf",
    "deterministic_sample",
    "json_field",
    "props_rollup",
    "doc_stats",
    "filter_corpus",
    "corpus_summary",
    "decontaminate",
    "redact_pii",
    "repetition_stats",
    "rolling_user_counts",
    "split_corpus",
    "token_distribution",
    "vocabulary",
    "stratified_sample",
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
    "sessionize",
    "similar_items_candidates",
    "similar_items_exact",
    "top_k_per_item",
    "windowed_counts",
]
