"""Streaming sessionization: the custom stateful operator surface.

Incremental twin of operators/sessions.sessionize: per-user session
state maintained with applyInPandasWithState (Arrow-batched grouped
state — the idiomatic Spark surface for operators the built-in
aggregates can't express). Sessions close two ways:

- by DATA: a new event more than `gap` after the open session's end
  closes it (emitted immediately, exactly the batch boundary rule);
- by TIME: EventTimeTimeout fires once the watermark passes
  session_end + gap — no later event can extend the session, so it is
  finalized and its state evicted. Bounded state at 100 TB: one small
  tuple per ACTIVE user, not per user ever seen.

Late events inside the watermark merge into the open session (interval
extension with min/max); events later than the watermark are dropped
by Spark before reaching the operator (standard semantics).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..schemas import require_columns

SESSION_OUT = (
    "user_id long, session_start_us long, session_end_us long, n_events long"
)
SESSION_STATE = "start long, last long, n long"


def sessionize_stream(
    events: DataFrame,
    gap_minutes: float = 30.0,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Append-mode stream of CLOSED sessions
    (user_id, session_start_us, session_end_us, n_events)."""
    require_columns(events, [user_col, ts_col], "sessionize_stream")
    gap_us = int(gap_minutes * 60_000_000)
    gap_ms = gap_us // 1000
    # testdata parquet stores TIMESTAMP(NANOS) → long nanos under the
    # session's nanosAsLong conf; watermarks need a timestamp column
    if dict(events.dtypes)[ts_col] in ("bigint", "long"):
        events = events.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000"))
        )

    def close_sessions(
        key: tuple, pdfs: Iterable[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        cols = ["user_id", "session_start_us", "session_end_us", "n_events"]
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([[user, start, last, n]], columns=cols)
            return
        ts: list[int] = []
        for pdf in pdfs:
            # unit-safe: datetime64[ns] or [us] both land on micros
            ts.extend(
                pdf[ts_col].values.astype("datetime64[us]").astype("int64").tolist()
            )
        ts.sort()
        cur = tuple(state.get) if state.exists else None
        closed: list[list[int]] = []
        for t in ts:
            if cur is None:
                cur = (t, t, 1)
            elif cur[0] - gap_us <= t <= cur[1] + gap_us:
                cur = (min(cur[0], t), max(cur[1], t), cur[2] + 1)
            else:
                closed.append([user, *cur])
                cur = (t, t, 1)
        if cur is not None:
            state.update(cur)
            # finalize once no in-watermark event can extend the session
            state.setTimeoutTimestamp(
                max(cur[1] // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame(closed, columns=cols)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col).alias("user_id"))
        .applyInPandasWithState(
            close_sessions,
            SESSION_OUT,
            SESSION_STATE,
            "append",
            "EventTimeTimeout",
        )
    )


def start_sessions_query(
    sessions: DataFrame,
    checkpoint_dir: str,
    query_name: str = "propius_sessions",
    available_now: bool = True,
) -> StreamingQuery:
    """Run the closed-session stream into a memory sink (append mode —
    each closed session is final). Swap in a parquet/Delta sink for a
    durable session log."""
    writer = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
