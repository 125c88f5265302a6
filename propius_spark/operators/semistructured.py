"""Semi-structured (JSON) column extraction for event ingestion.

Event logs routinely carry a free-form JSON properties column
(`events.props` in the testdata). Extraction is pure Catalyst
(`get_json_object` — JVM-side JSON path evaluation, no Python), so
parsing fuses into the scan stage and pipelines into whatever runs
next; the oracle replays it with DuckDB's json_extract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import require_columns


def json_field(col: Column, field: str, cast: str = "string") -> Column:
    """One top-level JSON field as a typed column (null when absent or
    mistyped — standard lax-JSON-path semantics in both engines).
    try_cast, not cast: under Spark 4's default ANSI mode a plain cast
    of a present-but-non-numeric value ('{"k": "abc"}' as long) throws
    CAST_INVALID_INPUT and crashes the whole ingest job; try_cast
    yields the promised NULL, matching the oracle's TRY_CAST."""
    return F.get_json_object(col, f"$.{field}").try_cast(cast)


def props_rollup(
    events: DataFrame,
    field: str = "k",
    cast: str = "long",
    group_col: str = "event_type",
    value_col: str = "value",
    props_col: str = "props",
) -> DataFrame:
    """Per-group rollup over an extracted JSON property:
    (group, n_events, sum_value, avg_field) — the shape of an ingest
    health report over semi-structured payloads. Extraction is
    map-side; the aggregation is one partial-agg shuffle on the
    (small-cardinality) group key."""
    require_columns(events, [group_col, value_col, props_col], "props_rollup")
    k = json_field(F.col(props_col), field, cast)
    return (
        events.select(F.col(group_col), F.col(value_col), k.alias("__k"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
            F.round(F.avg("__k"), 6).alias("avg_field"),
        )
    )
