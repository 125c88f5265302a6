"""Deterministic sampling (operators/sampling.py): selection must be a
pure function of the key — identical under re-partitioning — and match
the explicit modular arithmetic computed in plain Python."""

from __future__ import annotations

from propius_spark.operators import deterministic_sample, stratified_sample
from propius_spark.operators.sampling import (
    SAMPLE_A,
    SAMPLE_B,
    SAMPLE_P,
    SAMPLE_RES,
)


def _bucket(key: int) -> int:
    return ((SAMPLE_A * key + SAMPLE_B) % SAMPLE_P) % SAMPLE_RES


def test_deterministic_sample_matches_arithmetic_and_partitioning(spark):
    rows = [(i,) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long")
    rate = 0.3
    want = sorted(i for (i,) in rows if _bucket(i) < int(rate * SAMPLE_RES))
    got1 = sorted(r.k for r in deterministic_sample(df, rate, "k").collect())
    got7 = sorted(
        r.k for r in deterministic_sample(df.repartition(7), rate, "k").collect()
    )
    assert got1 == want == got7
    assert 0 < len(want) < 2000


def test_stratified_sample_rates_and_missing_strata(spark):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "k long, s string")
    out = stratified_sample(df, {"a": 1.0, "b": 0.25}, "s", "k").collect()
    got = {(r.k, r.s) for r in out}
    want = {
        (i, s)
        for i, s in rows
        if (s == "a") or (s == "b" and _bucket(i) < int(0.25 * SAMPLE_RES))
    }
    assert got == want
    assert not any(s == "c" for _, s in got)  # absent stratum dropped
    assert len({k for k, s in got if s == "a"}) == 1000  # rate 1.0 keeps all


def test_cap_per_group_hand_computed(spark):
    """Top-2 per group by score desc, id asc tiebreak; a group smaller
    than the cap passes through whole."""
    from propius_spark.operators import cap_per_group

    df = spark.createDataFrame(
        [
            ("a", 1, 10), ("a", 2, 30), ("a", 3, 30), ("a", 4, 20),
            ("b", 5, 1),
        ],
        "g string, id long, score long",
    )
    got = sorted(
        (r.g, r.id)
        for r in cap_per_group(
            df, "g", n=2, order_col="score", tiebreak_col="id"
        ).collect()
    )
    # a: score-30 ties broken by id → ids 2,3; b: passes through
    assert got == [("a", 2), ("a", 3), ("b", 5)]

    asc = sorted(
        (r.g, r.id)
        for r in cap_per_group(
            df, "g", n=1, order_col="score", descending=False,
            tiebreak_col="id",
        ).collect()
    )
    assert asc == [("a", 1), ("b", 5)]


def test_weighted_sample_clamps_and_is_partition_invariant(spark):
    from propius_spark.operators import weighted_sample

    df = spark.createDataFrame(
        [(i, w) for i, w in [(1, 0.0), (2, 10.0), (3, 0.5), (4, -1.0),
                             (5, 10.0), (6, 0.5), (7, 2.0), (8, 0.1)]],
        "k long, w double",
    )
    kept = sorted(
        r.k for r in weighted_sample(df, rate=1.0, weight_col="w",
                                     key_col="k").collect()
    )
    # weight 0 / negative never kept; weight >= 1 always kept
    assert 1 not in kept and 4 not in kept
    assert {2, 5, 7} <= set(kept)
    # pure key arithmetic: identical set under repartitioning
    kept2 = sorted(
        r.k for r in weighted_sample(df.repartition(5), rate=1.0,
                                     weight_col="w", key_col="k").collect()
    )
    assert kept == kept2
