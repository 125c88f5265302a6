"""As-of join (operators/asof.py): hand-computed backward-as-of
semantics including the left-join null, equal-timestamp visibility,
and epoch normalization from both timestamp and long-nanos inputs."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from propius_spark.operators import asof_join


def _ts(us: int):
    return datetime.utcfromtimestamp(us / 1_000_000)


def test_asof_join_hand_computed(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(5), 101), (2, _ts(7), 102), (3, _ts(1), 103)],
        "k long, ts timestamp, x long",
    )
    right = spark.createDataFrame(
        [(1, _ts(4), 1.5), (1, _ts(9), 2.5), (2, _ts(8), 3.5), (2, _ts(7), 4.5)],
        "k long, ts timestamp, v double",
    )
    got = sorted(
        (r.k, r.ts_us, r.x, r.v)
        for r in asof_join(left, right, on="k").collect()
    )
    assert got == [
        (1, 5, 101, 1.5),   # latest right ≤ 5 is t=4
        (1, 10, 100, 2.5),  # latest right ≤ 10 is t=9
        (2, 7, 102, 4.5),   # equal timestamps match (right t=7 visible)
        (3, 1, 103, None),  # no right row for key → null (left join)
    ]


def test_asof_join_long_nanos_and_clash(spark):
    import pytest

    left = spark.createDataFrame([(1, 5_000, 9)], "k long, ts long, v long")
    right = spark.createDataFrame([(1, 4_000, 1.0)], "k long, ts long, v double")
    with pytest.raises(ValueError):
        asof_join(left, right, on="k")  # v on both sides
    got = asof_join(
        left.withColumnRenamed("v", "x"), right, on="k"
    ).collect()
    assert [(r.k, r.ts_us, r.x, r.v) for r in got] == [(1, 5, 9, 1.0)]


def test_asof_null_right_ts_never_matches(spark):
    """A NULL right timestamp can never satisfy r.ts <= l.ts (pandas /
    DuckDB posture); Spark's NULLS-FIRST sort would have carried its
    values into every left row."""
    from propius_spark.operators import asof_join

    left = spark.createDataFrame(
        [(1, 5_000_000)], "k long, us long"
    ).select("k", F.timestamp_micros("us").alias("ts"))
    right = spark.createDataFrame(
        [(1, None, 99)], "k long, us long, v long"
    ).select("k", F.timestamp_micros("us").alias("ts"), "v")
    out = asof_join(left, right, on="k").collect()
    assert len(out) == 1 and out[0].v is None


def test_asof_join_rejects_reserved_name_collisions(spark):
    """Round-4 review fix: value_cols colliding with the join key or
    the normalized `{ts_col}_us` output must raise HERE, not emit
    duplicate column names that fail far downstream."""
    import pytest

    from propius_spark.operators import asof_join

    left = spark.createDataFrame(
        [(1, 1000, "x")], "k long, ts long, payload string"
    )
    right = spark.createDataFrame(
        [(1, 500, 2.0)], "k long, ts long, v double"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", value_cols=["k", "v"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", value_cols=["ts_us", "v"])
    left2 = left.withColumnRenamed("payload", "ts_us")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left2, right, on="k", value_cols=["v"])
