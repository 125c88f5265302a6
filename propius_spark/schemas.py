"""Canonical schemas for the engine's tables.

The reference duck-types its inputs (hard-coded attribute access on
`reference_id` / `item_id`, reference propius/similarity.py:74-77, and
`title`, propius/data.py:106). The engine makes them explicit StructTypes
and validates on ingest.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Co-occurrence event log (reference propius/utils.py:6-35 input contract).
# reference_id may be any comparable key; we keep it as a string superset
# unless the caller supplies a typed schema.
OCCURRENCES = T.StructType(
    [
        T.StructField("reference_id", T.LongType(), False),
        T.StructField("item_id", T.LongType(), False),
    ]
)

OCCURRENCES_STR_REF = T.StructType(
    [
        T.StructField("reference_id", T.StringType(), False),
        T.StructField("item_id", T.LongType(), False),
    ]
)

# Item dictionary (reference propius/data.py:90-113).
ITEM_DICTIONARY = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("title", T.StringType(), True),
    ]
)

# Published store tables (reference propius/data.py:44-87 DDL).
CORRELATED_ITEMS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("key", T.StringType(), True),
        T.StructField("human_label", T.StringType(), True),
    ]
)

SIMILAR_ITEMS = T.StructType(
    [
        T.StructField("item_a_id", T.LongType(), False),
        T.StructField("item_b_id", T.LongType(), False),
        T.StructField("scaled_score", T.DoubleType(), True),
    ]
)


def require_columns(df, cols: list[str], where: str) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"{where}: missing required columns {missing}; got {df.columns}")
