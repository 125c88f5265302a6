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


def test_round2_text_ops_empty_and_degenerate(spark):
    """Round-2 ops on empty/degenerate corpora: empty in, empty out
    (or all-zero containment), never an error or a NaN."""
    from propius_spark.operators import (
        bm25_search,
        chunk_documents,
        decontaminate,
        funnel,
        pack_documents,
        repetition_stats,
        tf_idf,
        token_distribution,
        vocabulary,
    )

    docs = _empty(spark, "doc_id long, text string")
    some = spark.createDataFrame(
        [(1, "a b c d"), (2, "")], "doc_id long, text string"
    )
    assert chunk_documents(docs, 4).count() == 0
    assert pack_documents(docs).count() == 0
    assert vocabulary(docs).count() == 0
    assert tf_idf(docs).count() == 0
    assert bm25_search(docs, "a b").count() == 0
    assert repetition_stats(docs).count() == 0

    # empty benchmark → zero containment everywhere, no division error
    got = {r.doc_id: r.n_contaminated for r in decontaminate(some, docs).collect()}
    assert got == {1: 0}

    # distribution over a lang group containing an empty doc
    d2 = spark.createDataFrame(
        [("en", ""), ("en", "x y")], "lang string, text string"
    )
    row = token_distribution(d2).collect()[0]
    assert row.n_docs == 2 and row.min_tokens == 0 and row.max_tokens == 2

    # funnel: users whose first step never fires yield null chains, not
    # errors; all-counts still emitted per step
    ev = _empty(spark, "user_id long, ts timestamp, event_type string")
    steps = [
        (r.step_idx, r.n_users) for r in funnel(ev, ["a", "b"]).collect()
    ]
    assert sorted(steps) == [(0, 0), (1, 0)]


def test_search_fold_is_ascii_only(spark):
    """search_items_by_name folds A-Z ONLY — the reference's SQLite
    LIKE semantics and the only engine-portable fold: JVM lower('İ')
    is 'i' + combining dot while DuckDB's utf8proc gives 'i', so a
    full-lower() search matches 'WİDGET' on one engine and not the
    other (fuzz-parity find)."""
    from propius_spark.serving import search_items_by_name

    dim = spark.createDataFrame(
        [
            (1, "WIDGET plain", None),
            (2, "WİDGET dotted capital", None),
            (3, "nothing here", None),
        ],
        "id long, key string, human_label string",
    )
    got = [r["id"] for r in search_items_by_name(dim, "WIDGET", limit=10).collect()]
    assert got == [1]  # ASCII case-pair folds; İ stays distinct


def test_clear_materialized_releases_df_caches(spark):
    """persist_big uses DataFrame-level caching (CacheManager), which
    getPersistentRDDs does not list — clear_materialized must release
    those too or corpus-scale caches linger across pipelines."""
    from propius_spark.plans import persist_big
    from propius_spark.session import clear_materialized

    df = persist_big(spark.range(1000).selectExpr("id", "id * 2 AS x"))
    df.count()  # materialize the cache
    assert spark.catalog.isCached is not None  # API sanity
    storage = df.storageLevel
    assert storage.useDisk and not storage.useMemory  # DISK_ONLY
    clear_materialized(spark)
    assert df.storageLevel.useDisk is False  # released
