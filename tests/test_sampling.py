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


def test_mix_sources_hits_targets_and_keeps_binding_group(spark):
    from propius_spark.operators import mix_sources
    from propius_spark.operators.sampling import SAMPLE_RES, sample_bucket  # noqa: F401

    # src a: 100 rows, b: 60, c: 40; targets 50/30/20.
    # S = min(100/.5, 60/.3, 40/.2) = 200 -> every group binds exactly:
    # cuts are all RES -> everything kept, mixture already exact.
    rows = [(i, "a") for i in range(100)] + \
           [(1000 + i, "b") for i in range(60)] + \
           [(2000 + i, "c") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mix_sources(df, {"a": 0.5, "b": 0.3, "c": 0.2},
                      group_col="source", key_col="doc_id")
    assert out.count() == 200

    # skewed input: a dominates; b binds (S = min(400/.5, 60/.3, 200/.2)
    # = 200): b kept whole, a/c down-sampled toward 100/40
    rows = [(i, "a") for i in range(400)] + \
           [(1000 + i, "b") for i in range(60)] + \
           [(2000 + i, "c") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mix_sources(df, {"a": 0.5, "b": 0.3, "c": 0.2},
                      group_col="source", key_col="doc_id")
    got = {r.source: r.cnt for r in
           out.groupBy("source").agg(__import__("pyspark").sql.functions
                                     .count("*").alias("cnt")).collect()}
    assert got["b"] == 60                      # binding group kept whole
    # LCG buckets are approximately uniform: 10% slack on the others
    assert abs(got["a"] - 100) <= 20
    assert abs(got["c"] - 40) <= 10
    # groups without a target are dropped entirely
    df2 = df.union(spark.createDataFrame([(9000, "junk")],
                                         "doc_id long, source string"))
    out2 = mix_sources(df2, {"a": 0.5, "b": 0.3, "c": 0.2},
                       group_col="source", key_col="doc_id")
    assert out2.filter("source = 'junk'").count() == 0
    # partition-invariant
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(r.doc_id for r in
                  mix_sources(df.repartition(7), {"a": 0.5, "b": 0.3,
                                                  "c": 0.2},
                              group_col="source",
                              key_col="doc_id").collect())
    assert ids1 == ids2


def test_mix_sources_validates(spark):
    import pytest

    from propius_spark.operators import mix_sources

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        mix_sources(df, {}, group_col="source", key_col="doc_id")
    with pytest.raises(ValueError):
        mix_sources(df, {"a": 0.0}, group_col="source", key_col="doc_id")


def test_mix_sources_refuses_key_cardinality_targets(spark):
    """ADVICE r6: everything driver-side in mix_sources (target table,
    broadcast, the targets-keyed collect) is O(len(targets)) — a
    key-cardinality targets dict must fail LOUDLY at entry, before any
    job or broadcast, in the bounded_rank posture."""
    import pytest

    from propius_spark.operators import mix_sources
    from propius_spark.operators.sampling import MAX_MIX_GROUPS

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    huge = dict.fromkeys(range(MAX_MIX_GROUPS + 1), 1.0)
    with pytest.raises(ValueError, match="documented bound"):
        mix_sources(df, huge, group_col="source", key_col="doc_id")


def test_shuffle_shards_permutation_properties(spark):
    from propius_spark.operators import shuffle_shards
    from propius_spark.operators.sampling import (
        SAMPLE_P, SHARD_A, SHARD_B, SHUFFLE_A, SHUFFLE_B,
    )

    n = 500
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    out = shuffle_shards(df, n_shards=8, key_col="doc_id").collect()
    assert len(out) == n
    # every row assigned; pos is dense 0..k-1 within each shard
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) <= set(range(8))
    for rows in by_shard.values():
        assert sorted(r.pos for r in rows) == list(range(len(rows)))
    # pinned arithmetic: shard and within-shard order match the two LCGs
    for r in out:
        assert r.shard == ((SHARD_A * r.doc_id + SHARD_B) % SAMPLE_P) % 8
    for shard, rows in by_shard.items():
        want = sorted(
            (r.doc_id for r in rows),
            key=lambda k: ((SHUFFLE_A * k + SHUFFLE_B) % SAMPLE_P, k),
        )
        got = [r.doc_id for r in sorted(rows, key=lambda r: r.pos)]
        assert got == want
    # roughly uniform shards (n/8 = 62.5; generous slack)
    assert all(30 <= len(v) <= 95 for v in by_shard.values())
    # partition-invariant permutation
    out2 = shuffle_shards(df.repartition(11), n_shards=8,
                          key_col="doc_id").collect()
    assert {(r.doc_id, r.shard, r.pos) for r in out2} == {
        (r.doc_id, r.shard, r.pos) for r in out
    }


def test_mix_sources_raises_on_absent_target_group(spark):
    import pytest

    from propius_spark.operators import mix_sources

    df = spark.createDataFrame(
        [(i, "a") for i in range(40)] + [(100 + i, "b") for i in range(6)],
        "doc_id long, source string",
    )
    with pytest.raises(ValueError, match="absent from the data.*'c'"):
        mix_sources(df, {"a": 0.5, "b": 0.3, "c": 0.2},
                    group_col="source", key_col="doc_id")


def test_lcg_lanes_survive_huge_keys(spark):
    """Keys above ~3.5e9 overflowed the raw a*key multiply (ANSI crash
    / silent wrap); the lanes now pre-reduce mod P, which is exact."""
    from propius_spark.operators import deterministic_sample, shuffle_shards
    from propius_spark.operators.sampling import (
        SAMPLE_P, SHARD_A, SHARD_B,
    )

    big = [5_000_000_000, 2**62, 2**63 - 1, 2_147_483_647]
    df = spark.createDataFrame([(k,) for k in big], "doc_id long")
    out = shuffle_shards(df, n_shards=8, key_col="doc_id").collect()
    assert len(out) == len(big)
    for r in out:
        assert r.shard == ((SHARD_A * (r.doc_id % SAMPLE_P) + SHARD_B)
                           % SAMPLE_P) % 8
    # sampling lane too: must evaluate, not crash
    deterministic_sample(df, 0.5, "doc_id").collect()


def test_shard_lane_decorrelated_from_sample_lane(spark):
    """Sampling at a tiny rate then sharding must still fill all
    shards: with shard = sample-lane % 8 (8 | SAMPLE_RES), survivors of
    a small cut landed only in low shards."""
    from propius_spark.operators import deterministic_sample, shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(200_000)], "doc_id long")
    survivors = deterministic_sample(df, 0.004, "doc_id")
    out = shuffle_shards(survivors, n_shards=8, key_col="doc_id").collect()
    assert len(out) > 400
    shards = {r.shard for r in out}
    assert shards == set(range(8))


def test_seed_decorrelates_composed_samples(spark):
    """Composing two sampling decisions on the same key with distinct
    seeds is ~independent; same seed is fully correlated (the
    documented hazard)."""
    from propius_spark.operators import deterministic_sample

    df = spark.createDataFrame([(i,) for i in range(100_000)], "k long")
    first = deterministic_sample(df, 0.1, "k")
    n1 = first.count()
    assert abs(n1 - 10_000) < 600
    # same seed: the second cut at 0.5 keeps EVERYTHING the first kept
    same = deterministic_sample(first, 0.5, "k").count()
    assert same == n1
    # distinct seed: approximately the product rate
    indep = deterministic_sample(first, 0.5, "k", seed=7).count()
    assert abs(indep - n1 / 2) < n1 * 0.1
    # seed=0 reproduces the historical (oracle) arithmetic
    from propius_spark.operators.sampling import (
        SAMPLE_A, SAMPLE_B, SAMPLE_P, SAMPLE_RES,
    )
    keys = sorted(r.k for r in first.limit(50).collect())
    for k in keys:
        assert ((SAMPLE_A * k + SAMPLE_B) % SAMPLE_P) % SAMPLE_RES < 100_000


def test_sampling_rejects_non_numeric_keys(spark):
    import pytest

    from propius_spark.operators import (
        deterministic_sample,
        mix_sources,
        shuffle_shards,
    )

    df = spark.createDataFrame([("u1", "web")], "uid string, source string")
    with pytest.raises(ValueError, match="integer column"):
        deterministic_sample(df, 0.5, "uid")
    with pytest.raises(ValueError, match="integer column"):
        shuffle_shards(df, 8, "uid")
    with pytest.raises(ValueError, match="integer column"):
        mix_sources(df, {"web": 1.0}, group_col="source", key_col="uid")


def test_stratified_sample_integer_strata_keys(spark):
    """Round-4 review fix: integer-keyed strata (accepted by
    df.sampleBy, the stated analogue) must work — the rate table's
    key type now derives from the data instead of hardcoded string."""
    from propius_spark.operators import stratified_sample

    df = spark.createDataFrame(
        [(i, i % 2) for i in range(200)], "doc_id long, label int"
    )
    out = stratified_sample(df, {0: 1.0, 1: 0.0}, "label", "doc_id")
    rows = out.collect()
    assert rows and all(r.label == 0 for r in rows)
    assert len(rows) == 100


def test_mix_sources_raises_on_count_like_targets(spark):
    """Round-4 review fix: a 'proportion' larger than a group's row
    count implies sample size zero — raise loudly (same posture as the
    missing-group check) instead of returning an empty mixture."""
    import pytest

    from propius_spark.operators import mix_sources

    df = spark.createDataFrame(
        [(i, "web") for i in range(20)] + [(i + 100, "code") for i in range(20)],
        "doc_id long, source string",
    )
    with pytest.raises(ValueError, match="proportion"):
        mix_sources(df, {"web": 50.0, "code": 30.0}, "source", "doc_id")
