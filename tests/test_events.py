"""Funnel and cohort-retention analytics (operators/events.py) on
hand-computed event streams."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from propius_spark.operators import cohort_retention, funnel

T0 = datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_ordered_progression(spark):
    ev = _ev(spark, [
        (1, T0, "click"), (1, T0 + timedelta(minutes=5), "view"),
        (1, T0 + timedelta(minutes=9), "purchase"),
        (2, T0, "click"), (2, T0 + timedelta(minutes=50), "view"),
        # user 3's view PRECEDES the click — must not count as step 2
        (3, T0, "view"), (3, T0 + timedelta(minutes=1), "click"),
        (4, T0 + timedelta(days=8), "click"),
    ])
    got = sorted(
        (r.step_idx, r.step, r.n_users)
        for r in funnel(ev, ["click", "view", "purchase"]).collect()
    )
    assert got == [(0, "click", 4), (1, "view", 2), (2, "purchase", 1)]

    # 10-minute window drops user 2's late view
    got10 = sorted(
        (r.step_idx, r.n_users)
        for r in funnel(
            ev, ["click", "view", "purchase"], within_minutes=10
        ).collect()
    )
    assert got10 == [(0, 4), (1, 1), (2, 1)]


def test_funnel_equal_ts_counts_and_empty_steps_raise(spark):
    ev = _ev(spark, [(1, T0, "click"), (1, T0, "view")])
    got = {r.step_idx: r.n_users for r in funnel(ev, ["click", "view"]).collect()}
    assert got == {0: 1, 1: 1}  # same-instant conversion counts
    with pytest.raises(ValueError):
        funnel(ev, [])


def test_funnel_hot_user_matches_reference(spark):
    # Round-2 verdict item 4: one pathological user (bot) with a large
    # event stream must neither OOM (window buffers spill; no
    # collect_list agg) nor change the counts. Reference = a Python
    # fold of the same chained-min formula.
    import random

    rng = random.Random(7)
    steps = ["click", "view", "purchase"]
    rows = []
    # hot user 0: 50k events, random types/timestamps
    for _ in range(50_000):
        rows.append((0, T0 + timedelta(seconds=rng.randrange(10_000_000)),
                     rng.choice(steps + ["noise"])))
    # 50 normal users
    for u in range(1, 51):
        for _ in range(rng.randrange(0, 6)):
            rows.append((u, T0 + timedelta(seconds=rng.randrange(10_000_000)),
                         rng.choice(steps + ["noise"])))
    window_min = 30.0

    def ref_counts():
        by_user = {}
        for u, ts, et in rows:
            by_user.setdefault(u, []).append((ts, et))
        n = [0] * len(steps)
        for evs in by_user.values():
            t = [None] * len(steps)
            for i, s in enumerate(steps):
                cand = [
                    ts for ts, et in evs
                    if et == s
                    and (i == 0 or (t[i - 1] is not None and ts >= t[i - 1]
                                    and ts <= t[0] + timedelta(minutes=window_min)))
                ]
                t[i] = min(cand) if cand else None
            for i in range(len(steps)):
                if t[i] is not None:
                    n[i] += 1
        return n

    ev = _ev(spark, rows)
    got = {r.step_idx: r.n_users
           for r in funnel(ev, steps, within_minutes=window_min).collect()}
    want = ref_counts()
    assert got == {i: want[i] for i in range(len(steps))}
    assert got[0] > 0 and got[0] >= got[1] >= got[2]


def test_cohort_retention_weekly_offsets(spark):
    wk = timedelta(days=7)
    ev = _ev(spark, [
        (1, T0, "a"), (1, T0 + wk, "a"), (1, T0 + 3 * wk, "a"),
        (2, T0, "a"), (2, T0 + timedelta(days=1), "a"),  # same week
        (3, T0 + wk, "a"),
    ])
    got = sorted(
        (r.cohort_week, r.week_offset, r.n_users)
        for r in cohort_retention(ev).collect()
    )
    w0 = (int(T0.timestamp() * 1_000_000) // 86_400_000_000) // 7
    assert got == [
        (w0, 0, 2),       # users 1, 2 start week 0
        (w0, 1, 1),       # user 1 returns week 1
        (w0, 3, 1),       # user 1 returns week 3
        (w0 + 1, 0, 1),   # user 3's own cohort
    ]


def test_rolling_user_counts_hand_computed(spark):
    from propius_spark.operators import rolling_user_counts

    d = timedelta(days=1)
    ev = _ev(spark, [
        (1, T0, "a"), (1, T0 + 3 * d, "a"), (1, T0 + 7 * d, "a"),
        (1, T0 + 11 * d, "a"),
        (2, T0, "a"), (2, T0, "a"),  # equal-ts peers both in-frame
    ])
    got = sorted(
        (r.user_id, r.t_us, r.n_trailing)
        for r in rolling_user_counts(ev, window_days=7).collect()
    )
    us = lambda days: int(T0.timestamp() * 1_000_000) + days * 86_400_000_000
    # day 7 is inclusive of day 0 (trailing window closed on both ends)
    assert got == [
        (1, us(0), 1), (1, us(3), 2), (1, us(7), 3), (1, us(11), 2),
        (2, us(0), 2), (2, us(0), 2),
    ]


def test_funnel_rejects_repeated_steps(spark, sf_dir):
    import pytest

    from propius_spark.operators import funnel
    from propius_spark.sources import read_events

    ev = read_events(spark, sf_dir)
    with pytest.raises(ValueError, match="repeated step"):
        funnel(ev, ["click", "click"])


def test_cohort_retention_pre_epoch_floor_weeks(spark):
    """Round-4 review fix: epoch-week must FLOOR (DuckDB `//`
    semantics), not truncate toward zero — otherwise days -6..6
    collapse into one double-width week-0 cohort and pre-epoch data
    diverges from the oracle."""
    from datetime import datetime

    from propius_spark.operators import cohort_retention

    rows = [
        # 1969-12-30 = epoch day -2 -> week floor(-2/7) = -1
        (1, datetime(1969, 12, 30)),
        # 1970-01-02 = epoch day +1 -> week 0
        (2, datetime(1970, 1, 2)),
        (2, datetime(1970, 1, 9)),  # day 8 -> week 1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in cohort_retention(df).collect()
    }
    # user 1 is its own week -1 cohort (NOT merged into week 0);
    # user 2 is the week-0 cohort, returning at offset 1
    assert got == {(-1, 0): 1, (0, 0): 1, (0, 1): 1}


def test_props_rollup_non_numeric_value_nulls_not_crashes(spark):
    """Round-4 review fix: a present-but-non-numeric JSON value must
    null out (try_cast; skipped by AVG) — under ANSI mode a plain cast
    crashed the whole job."""
    from propius_spark.operators import props_rollup

    rows = [
        ("click", 1.0, '{"k": 4}'),
        ("click", 1.0, '{"k": "abc"}'),   # mistyped -> null
        ("click", 1.0, '{"k": {"x":1}}'), # nested -> null
        ("view", 2.0, None),              # absent props
    ]
    df = spark.createDataFrame(rows, "event_type string, value double, props string")
    got = {r.event_type: (r.n_events, r.avg_field) for r in props_rollup(df).collect()}
    assert got["click"] == (3, 4.0)  # avg over the single valid value
    assert got["view"] == (1, None)
