"""TF-IDF and inverted index (operators/ir.py) on hand-computed
corpora."""

from __future__ import annotations

import math

from propius_spark.operators import posting_lists, tf_idf


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tf_idf_hand_computed(spark):
    docs = _docs(spark, [(1, "a a b"), (2, "a c"), (3, "")])
    # N=3 (empty doc counts in the corpus size), df: a=2, b=1, c=1
    got = {
        (r.doc_id, r.token): (r.tf, r.df, r.tfidf)
        for r in tf_idf(docs).collect()
    }
    ln = lambda x: round(math.log(x), 6)
    assert got == {
        (1, "a"): (2, 2, round(2 * math.log(3 / 2), 6)),
        (1, "b"): (1, 1, ln(3)),
        (2, "a"): (1, 2, round(math.log(3 / 2), 6)),
        (2, "c"): (1, 1, ln(3)),
    }
    # min_df=2 keeps only 'a'
    assert {r.token for r in tf_idf(docs, min_df=2).collect()} == {"a"}


def test_posting_lists_sorted_and_bounded(spark):
    docs = _docs(spark, [(3, "x y"), (1, "x"), (2, "x y z")])
    got = {
        r.token: (r.df, r.postings)
        for r in posting_lists(docs).collect()
    }
    assert got == {
        "x": (3, [1, 2, 3]),
        "y": (2, [2, 3]),
        "z": (1, [2]),
    }
    bounded = {
        r.token for r in posting_lists(docs, min_df=2, max_df=2).collect()
    }
    assert bounded == {"y"}


def test_bm25_hand_computed(spark):
    """Two-doc corpus, query 'a b': BM25 with k1=1.2, b=0.75 computed
    by hand; doc containing both terms outranks the single-term doc;
    empty query yields an empty frame."""
    import math

    from propius_spark.operators import bm25_search

    docs = _docs(spark, [(1, "a b b"), (2, "a x y")])
    got = [(r.doc_id, r.score) for r in bm25_search(docs, "a b", k=10).collect()]

    n, avgdl, k1, b = 2.0, 3.0, 1.2, 0.75

    def idf(df):
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def w(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    s1 = round(idf(2) * w(1, 3) + idf(1) * w(2, 3), 6)
    s2 = round(idf(2) * w(1, 3), 6)
    assert got == [(1, s1), (2, s2)] and s1 > s2

    assert bm25_search(docs, "   ").count() == 0
    assert bm25_search(docs, "zzz").count() == 0


def test_bm25_null_text_counts_as_empty_doc(spark):
    """Family null posture: a null-text doc is an ordinary 0-token doc
    (counted in N and avgdl, matching nothing) — unguarded size(NULL)
    was -1 under legacy sizeOfNull and poisoned avgdl."""
    from propius_spark.operators import bm25_search

    docs = spark.createDataFrame(
        [(1, "apache spark streams"), (2, None), (3, "spark sql")],
        "doc_id long, text string",
    )
    rows = bm25_search(docs, "spark", k=10).collect()
    assert sorted(r.doc_id for r in rows) == [1, 3]
    # python reference with dl(null)=0, N=3, avgdl=5/3
    import math

    def score(tf, dl, n=3.0, avgdl=5.0 / 3.0, df=2.0, k1=1.2, b=0.75):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    got = {r.doc_id: r.score for r in rows}
    assert abs(got[1] - round(score(1.0, 3.0), 6)) < 1e-6
    assert abs(got[3] - round(score(1.0, 2.0), 6)) < 1e-6


def test_bm25_empty_query_schema_matches_id_type(spark):
    from propius_spark.operators import bm25_search

    docs = spark.createDataFrame(
        [("a", "x"), ("b", "y")], "uid string, text string"
    )
    out = bm25_search(docs, "   ", id_col="uid")
    assert dict(out.dtypes) == {"doc_id": "string", "score": "double"}
    assert out.count() == 0
