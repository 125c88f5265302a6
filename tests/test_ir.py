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
