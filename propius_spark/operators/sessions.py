"""Event-time operators: sessionization and tumbling-window rollups.

Beyond-reference training-pipeline operator (the reference has no
event-time concepts at all — SURVEY.md §2.9): split each user's event
stream into sessions separated by more than `gap` of inactivity. The
classic gaps-and-islands computation, expressed with pure window
functions so the whole pipeline stays in Tungsten codegen — and so a
DuckDB oracle computes the identical answer (LAG + running SUM).

Scale notes (100 TB): one shuffle, partitioned by the entity key — the
minimum any per-entity ordering needs. Per-user data is tiny (events
per user ≪ partition size) so the sort is in-memory per group; hot
entities (bot traffic) are the skew hazard and AQE's skew handling
plus an optional per-(user, day) pre-split bound them. The streaming
twin (streaming/sessions.py) maintains the same sessions incrementally
with applyInPandasWithState instead of re-sorting history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import require_columns


def _ts_micros(events: DataFrame, ts_col: str) -> F.Column:
    """Event time as epoch micros (long), for any of the three
    encodings event data arrives in:

    - long nanos — parquet TIMESTAMP(NANOS) read under
      spark.sql.legacy.parquet.nanosAsLong (sources/occurrences.py
      read_events sets it at runtime so a default session works too);
    - TIMESTAMP_NTZ — parquet TIMESTAMP(isAdjustedToUTC=false), the
      driver-testdata encoding; converted via timestampdiff from the
      NTZ epoch, which is session-timezone-independent and equals
      DuckDB's epoch_us (unix_micros rejects NTZ; casting through
      TIMESTAMP would shift by the session zone);
    - TIMESTAMP — unix_micros.
    """
    dt = dict(events.dtypes)[ts_col]
    if dt in ("bigint", "long"):
        # integer div, not `/`: double division loses micros on
        # nanosecond epochs (> 2^53)
        return F.expr(f"`{ts_col}` div 1000")
    if dt == "timestamp_ntz":
        return F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
        )
    return F.unix_micros(F.col(ts_col))


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, session_start_us, session_end_us, n_events): maximal
    runs of a user's events where consecutive gaps are ≤ gap_minutes.

    Session boundaries via LAG (a new session starts where the gap
    exceeds the threshold), session ids via running SUM of the break
    flags — ties in ts cannot break a session (gap 0), so the result is
    order-deterministic even though ties sort arbitrarily.
    """
    require_columns(events, [user_col, ts_col], "sessionize")
    gap_us = int(gap_minutes * 60_000_000)
    e = events.select(
        F.col(user_col).alias("user_id"), _ts_micros(events, ts_col).alias("t")
    ).filter(F.col("t").isNotNull())
    # null-ts exclusion is EXPLICIT (and mirrored in the oracle twins):
    # without it, Spark's NULLS FIRST ordering silently folds null-time
    # events into the user's first session while an oracle replaying
    # with NULLS LAST attaches them to the last — an event with no time
    # belongs to no session in either engine
    wo = Window.partitionBy("user_id").orderBy("t")
    brk = F.when(F.col("t") - F.lag("t").over(wo) > gap_us, 1).otherwise(0)
    sid = F.sum(brk).over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        e.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(
            F.min("t").alias("session_start_us"),
            F.max("t").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )


def windowed_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts per group — the batch twin of
    streaming/cooccurrence.windowed_event_counts (same `F.window`
    semantics, no watermark needed on bounded data). Window bounds are
    emitted as epoch micros so results are engine-portable: `F.window`
    aligns tumbling windows to the epoch in the session's UTC zone,
    which is exactly integer bucketing of the micros timeline — the
    form a SQL oracle replays. One shuffle on (window, group); the
    partial aggregation makes the map side do the bucketing."""
    require_columns(events, [ts_col, group_col], "windowed_counts")
    t = _ts_micros(events, ts_col)
    w = F.window(F.timestamp_micros(t), window_duration)
    return (
        events.select(w.alias("w"), F.col(group_col))
        .groupBy("w", group_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            F.unix_micros("w.end").alias("window_end_us"),
            group_col,
            "n_events",
        )
    )
