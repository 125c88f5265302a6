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
