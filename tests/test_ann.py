"""Unit tests for similarity search (operators/ann.py) on
hand-computed vectors."""

from __future__ import annotations

import math

from propius_spark.operators import (
    assign_centroids,
    cosine_topk,
    embedding_dup_pairs,
    ivf_topk,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_hand_computed(spark):
    df = _emb(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.0]),      # cos 1
            (2, [1.0, 1.0]),      # cos 1/sqrt(2)
            (3, [0.0, 1.0]),      # cos 0
            (4, [-1.0, 0.0]),     # cos -1
        ],
    )
    got = cosine_topk(df, query_id=0, k=3).collect()
    assert [r["vec_id"] for r in got] == [1, 2, 3]
    assert abs(got[0]["cosine"] - 1.0) < 1e-12
    assert abs(got[1]["cosine"] - 1 / math.sqrt(2)) < 1e-12
    assert abs(got[2]["cosine"]) < 1e-12


def test_embedding_dup_pairs_threshold(spark):
    df = _emb(
        spark,
        [(0, [1.0, 0.0]), (1, [2.0, 0.0]), (2, [0.0, 3.0]), (3, [1.0, 0.1])],
    )
    got = sorted(
        (r["vec_a"], r["vec_b"]) for r in embedding_dup_pairs(df, 0.95).collect()
    )
    # colinear 0-1 (cos 1) and near-colinear 0-3 / 1-3 (cos ~0.995)
    assert got == [(0, 1), (0, 3), (1, 3)]


def test_assign_centroids_nearest(spark):
    df = _emb(
        spark,
        [
            (0, [1.0, 0.0]),   # centroid 0
            (1, [0.0, 1.0]),   # centroid 1
            (2, [0.9, 0.1]),   # -> centroid 0
            (3, [0.1, 0.9]),   # -> centroid 1
        ],
    )
    cents, assign = assign_centroids(df, n_centroids=2)
    got = {r["vec_id"]: r["centroid_id"] for r in assign.collect()}
    assert got == {0: 0, 1: 1, 2: 0, 3: 1}


def test_ivf_topk_subset_of_exact_when_probing_all(spark):
    df = _emb(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [0.9, 0.1]),
            (3, [0.1, 0.9]),
            (4, [0.8, 0.2]),
            (5, [-1.0, 0.0]),
        ],
    )
    exact = [r["vec_id"] for r in cosine_topk(df, 0, k=3).collect()]
    # probing all centroids recovers the exact answer
    approx = [
        r["vec_id"]
        for r in ivf_topk(df, 0, k=3, n_centroids=2, n_probe=2).collect()
    ]
    assert approx == exact
    # probing 1 of 2 lists only searches centroid-0's partition
    pruned = [
        r["vec_id"]
        for r in ivf_topk(df, 0, k=3, n_centroids=2, n_probe=1).collect()
    ]
    assert set(pruned).issubset({2, 4})
