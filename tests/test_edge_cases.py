"""Empty/degenerate-input behavior across operator families: every
operator must return an empty (or correctly degenerate) result with the
right schema rather than throwing — at scale, empty partitions and
filtered-to-nothing slices are routine."""

from __future__ import annotations

from propius_spark.operators import (
    build_cells,
    corr_pairs,
    dup_clusters,
    exact_dedup,
    filter_corpus,
    jaccard_pairs,
    knn_join,
    resolve_duplicates,
    sessionize,
    similar_items_exact,
    stratified_sample,
    top_k_per_item,
    windowed_counts,
)
from propius_spark.session import clear_materialized


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_correlation_pipeline_empty_input(spark):
    cells = build_cells(_empty(spark, "reference_id long, item_id long"))
    assert corr_pairs(cells).count() == 0
    assert similar_items_exact(cells).count() == 0
    clear_materialized(spark)


def test_correlation_single_item(spark):
    """One item, one context: zero variance → no valid items, empty
    model (the reference's all-NaN matrix row)."""
    df = spark.createDataFrame([("r1", 1), ("r1", 1)], "reference_id string, item_id long")
    assert corr_pairs(build_cells(df)).count() == 0
    clear_materialized(spark)


def test_dedup_empty_corpus(spark):
    docs = _empty(spark, "doc_id long, text string")
    assert exact_dedup(docs).count() == 0
    assert jaccard_pairs(docs).count() == 0
    assert filter_corpus(docs).count() == 0
    clear_materialized(spark)


def test_clusters_empty_pairs_all_singletons(spark):
    docs = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    pairs = _empty(spark, "doc_a long, doc_b long")
    assert dup_clusters(pairs).count() == 0
    got = {r.doc_id: (r.cluster_id, r.is_keeper)
           for r in resolve_duplicates(docs, pairs).collect()}
    assert got == {1: (1, True), 2: (2, True)}
    clear_materialized(spark)


def test_knn_join_empty_queries_and_corpus(spark):
    emb = _empty(spark, "vec_id long, embedding array<double>")
    one = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    assert knn_join(emb, one).count() == 0  # no queries
    assert knn_join(one, emb).count() == 0  # no corpus


def test_event_time_empty(spark):
    ev = _empty(spark, "user_id long, ts timestamp, event_type string")
    assert sessionize(ev).count() == 0
    assert windowed_counts(ev).count() == 0
    assert stratified_sample(ev, {"click": 1.0}, "event_type", "user_id").count() == 0


def test_top_k_per_item_empty(spark):
    pairs = _empty(spark, "item_a long, item_b long, corr double")
    assert top_k_per_item(pairs, k=3).count() == 0
